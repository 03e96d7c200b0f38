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
spark-avro module (the avro datasource since Spark 2.4), so 'avro' is
accepted only when the datasource resolves — `avro_available` gates it
with a clear error instead of an AnalysisException mid-pipeline. ORC is
built in and fully exercised.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

BUILTIN_FORMATS = ("parquet", "orc", "json", "csv", "text")


def avro_available(spark: SparkSession) -> bool:
    """True when the spark-avro datasource is on the classpath."""
    try:
        spark._jvm.org.apache.spark.sql.avro.AvroFileFormat  # noqa: B018
        return True
    except Exception:
        return False


def _check_format(spark: SparkSession, fmt: str) -> None:
    if fmt in BUILTIN_FORMATS:
        return
    if fmt == "avro":
        if not avro_available(spark):
            raise ValueError(
                "avro requires the external spark-avro module "
                "(--packages org.apache.spark:spark-avro_2.13:<ver>); "
                "not present on this classpath")
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
    reader = spark.read.format(in_format).options(**(read_options or {}))
    if schema:
        reader = reader.schema(schema)
    elif in_format == "csv":
        reader = reader.option("inferSchema", "true")
    df = reader.load(in_path)
    if transform is not None:
        df = transform(df)
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
