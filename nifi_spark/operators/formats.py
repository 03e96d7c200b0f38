"""Format conversion — the Avro/ORC/CSV/JSON conversion family.

NiFi ancestors:
* ConvertAvroToJSON (nifi-avro-bundle/.../ConvertAvroToJSON.java:62),
  ConvertCSVToAvro / ConvertJSONToAvro (nifi-kite-bundle/.../
  ConvertCSVToAvro.java:64), ConvertAvroToORC, SplitAvro,
  ExtractAvroMetadata, InferAvroSchema.
* ConvertAvroSchema (nifi-kite-bundle/.../ConvertAvroSchema.java:67):
  field rename-map + type coercion between schemas — here
  `convert_schema` (the rename half of the engine's schema evolution,
  applied as a projection).

Spark-first: format conversion is a reader + writer pair — Catalyst owns
parsing/serialization, conversion is distributed by construction, and
"convert then query" collapses into one plan when the target is consumed
directly. Row-level record conversion inside a column (a CSV line or
JSON document in `content`) is from_csv/from_json/to_json — already
operator-covered (validate_csv, evaluate_json_path, reshape_json,
attributes_to_json).

Avro note: the sandbox's Spark build ships WITHOUT the external
spark-avro module (the avro datasource since Spark 2.4). 'avro' is
served by the datasource when it resolves, and otherwise by the in-repo
pure-Python codec (operators/avro_codec.py — spec-complete container
read/write, interop-tested against org.apache.avro), so format
conversion works either way. ORC is built in and fully exercised.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

BUILTIN_FORMATS = ("parquet", "orc", "json", "csv", "text")


def avro_available(spark: SparkSession) -> bool:
    """True when the spark-avro datasource is on the classpath.
    Class.forName, not attribute access — py4j hands back a JavaPackage
    stub for missing classes instead of raising."""
    try:
        # the class the external module registers as the 'avro' source;
        # a same-named shim of AvroFileFormat exists inside Spark itself
        # (it backs the "deploy spark-avro" error message), so probing
        # that one false-positives.
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.v2.avro.AvroDataSourceV2")
        return True
    except Exception:
        return False


def _check_format(spark: SparkSession, fmt: str) -> None:
    if fmt in BUILTIN_FORMATS or fmt == "avro":
        return
    raise ValueError(f"unknown format {fmt!r} (have {BUILTIN_FORMATS}+avro)")


def convert_format(spark: SparkSession, in_path: str, in_format: str,
                   out_path: str, out_format: str,
                   schema: str | None = None,
                   read_options: dict | None = None,
                   write_options: dict | None = None,
                   transform=None) -> DataFrame:
    """Read `in_path` as `in_format`, optionally transform, write
    `out_path` as `out_format`; returns a DataFrame over the OUTPUT so
    callers can verify/consume the converted data. The ConvertXToY
    processor family as one distributed reader→writer plan."""
    _check_format(spark, in_format)
    _check_format(spark, out_format)
    pure_py_avro = not avro_available(spark)
    if in_format == "avro" and pure_py_avro:
        from nifi_spark.operators.avro_codec import read_avro_path
        df = read_avro_path(spark, in_path)
    else:
        reader = spark.read.format(in_format).options(**(read_options or {}))
        if schema:
            reader = reader.schema(schema)
        elif in_format == "csv":
            reader = reader.option("inferSchema", "true")
        df = reader.load(in_path)
    if transform is not None:
        df = transform(df)
    if out_format == "avro" and pure_py_avro:
        from nifi_spark.operators.avro_codec import (read_avro_path,
                                                     write_avro_path)
        write_avro_path(df, out_path)
        return read_avro_path(spark, out_path)
    (df.write.format(out_format).options(**(write_options or {}))
     .mode("overwrite").save(out_path))
    return spark.read.format(out_format).load(out_path)


def convert_schema(df: DataFrame, rename: dict[str, str] | None = None,
                   casts: dict[str, str] | None = None,
                   select: list[str] | None = None,
                   defaults: dict[str, Column] | None = None) -> DataFrame:
    """Schema-to-schema projection (ConvertAvroSchema): rename fields,
    coerce types, drop/keep fields, backfill constants — one narrow
    select, no data rewrite."""
    out = df
    for old, new in (rename or {}).items():
        out = out.withColumnRenamed(old, new)
    for name, dtype in (casts or {}).items():
        out = out.withColumn(name, F.col(name).cast(dtype))
    for name, expr in (defaults or {}).items():
        if name not in out.columns:
            out = out.withColumn(name, expr)
    if select:
        out = out.select(*select)
    return out


def infer_ddl(spark: SparkSession, path: str, fmt: str = "csv",
              options: dict | None = None) -> str:
    """Schema inference → DDL string (InferAvroSchema analog: NiFi
    samples records to produce an Avro schema; Spark's readers sample to
    a StructType — return its DDL for reuse in explicit-schema reads)."""
    _check_format(spark, fmt)
    reader = spark.read.format(fmt).options(**(options or {}))
    if fmt == "csv":
        reader = reader.option("inferSchema", "true").option("header", "true")
    schema = reader.load(path).schema
    return ", ".join(f"{f.name} {f.dataType.simpleString()}"
                     for f in schema.fields)
