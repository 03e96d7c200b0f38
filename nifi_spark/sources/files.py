"""File content sources — GetFile / FetchFile / GetSFTP analogs.

NiFi ancestors: GetFile (standard/GetFile.java, 480 LoC — directory
scan, one FlowFile per file, content into the content repo, optional
keep/delete) and FetchFile (standard/FetchFile.java — fetch a known
path's content into an existing FlowFile).

Spark-first: the built-in `binaryFile` datasource IS the operator —
(path, modificationTime, length, content) rows, distributed read,
pushdown on pathGlobFilter/modifiedAfter. `get_files` layers the NiFi
property surface (glob, min age / listing-lag guard, text decode) on
it; `fetch_files` is the join form (fetch content for an existing
listing). The delete/move-after-read half is a filesystem side effect
that a lake engine deliberately does NOT do — sources are immutable
inputs, the offset ledger (sources.listing) remembers what was
consumed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def get_files(spark: SparkSession, path: str, glob: str | None = None,
              text_charset: str | None = None,
              modified_after: str | None = None) -> DataFrame:
    """One row per file: (path, mtime, length, content). `text_charset`
    adds a decoded `text` column; `modified_after` (ISO timestamp) is
    the listing watermark pushed into the file index."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if modified_after:
        reader = reader.option("modifiedAfter", modified_after)
    df = (reader.load(path)
          .select(F.col("path"),
                  F.col("modificationTime").alias("mtime"),
                  F.col("length"), F.col("content")))
    if text_charset:
        df = df.withColumn("text", F.decode(F.col("content"), text_charset))
    return df


def fetch_files(listing: DataFrame, spark: SparkSession, root: str,
                path_col: str = "path",
                text_charset: str | None = None) -> DataFrame:
    """FetchFile: join an existing listing against file contents —
    files are read distributed by the binaryFile source, then matched
    to the listing rows (broadcast/shuffle decided by AQE)."""
    contents = get_files(spark, root, text_charset=text_charset)
    # binaryFile emits URI paths (file:/…); accept scheme-less listings
    norm = F.regexp_replace(F.col("path"), "^file:", "").alias(path_col)
    contents = contents.select(norm, *[c for c in contents.columns
                                       if c != "path"])
    return listing.join(contents, path_col)
