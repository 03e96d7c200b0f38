"""Avro codec: pure-Python spec roundtrips, JVM reference interop, and the
Spark operator surface (SplitAvro / ConvertAvroToJSON / ExtractAvroMetadata /
ConvertJSONToAvro analogs).

Interop tests exchange files with org.apache.avro (the Apache reference
implementation, present on Spark's own classpath) — wire-format parity,
not just self-consistency."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from nifi_spark.operators.avro_codec import (
    avro_to_records, extract_avro_metadata, read_avro_path, read_container,
    record_to_json, records_to_avro, schema_to_ddl, write_avro_path,
    write_container)

FULL_SCHEMA = {
    "type": "record", "name": "Ev", "namespace": "t", "fields": [
        {"name": "id", "type": "long"},
        {"name": "small", "type": "int"},
        {"name": "name", "type": "string"},
        {"name": "score", "type": "double"},
        {"name": "ratio", "type": "float"},
        {"name": "flag", "type": "boolean"},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "props", "type": {"type": "map", "values": "long"}},
        {"name": "kind",
         "type": {"type": "enum", "name": "K", "symbols": ["A", "B"]}},
        {"name": "blob", "type": "bytes"},
        {"name": "fx", "type": {"type": "fixed", "name": "Fx", "size": 4}},
        {"name": "opt", "type": ["null", "string"]},
        {"name": "nested", "type": {"type": "record", "name": "N",
                                    "fields": [{"name": "x", "type": "int"}]}},
        {"name": "again", "type": "N"},  # named-type reference
    ]}


def _full_records(n=300):
    import struct
    out = []
    for i in range(n):
        out.append({
            "id": i * (1 << 40) - 7, "small": -i, "name": f"n{i}",
            "score": i * 0.5,
            # float32 roundtrip: use values exactly representable
            "ratio": struct.unpack("<f", struct.pack("<f", i * 0.25))[0],
            "flag": i % 2 == 0,
            "tags": [f"t{i}", "u"], "props": {"a": i, "b": -i},
            "kind": "A" if i % 2 else "B",
            "blob": bytes([i % 256, 1, 2]), "fx": b"\x00\x01\x02\x03",
            "opt": None if i % 3 == 0 else f"o{i}",
            "nested": {"x": i}, "again": {"x": -i}})
    return out


def test_container_roundtrip_all_types():
    recs = _full_records()
    for codec in ("null", "deflate"):
        blob = write_container(FULL_SCHEMA, recs, codec=codec,
                               records_per_block=64)
        schema_json, c, out, n_blocks, _ = read_container(blob)
        assert c == codec
        assert out == recs
        assert n_blocks == (len(recs) + 63) // 64
        assert json.loads(schema_json) == FULL_SCHEMA


def test_container_empty_and_errors():
    blob = write_container(FULL_SCHEMA, [])
    _, _, out, n_blocks, _ = read_container(blob)
    assert out == [] and n_blocks == 0
    with pytest.raises(ValueError, match="magic"):
        read_container(b"NOT AVRO")
    with pytest.raises(ValueError, match="codec"):
        write_container(FULL_SCHEMA, [], codec="snappy")


def test_schema_to_ddl():
    ddl = schema_to_ddl(json.dumps(FULL_SCHEMA))
    assert "id: bigint" in ddl and "opt: string" in ddl
    assert "props: map<string, bigint>" in ddl
    assert "nested: struct<x: int>" in ddl and "again: struct<x: int>" in ddl


INTEROP_SCHEMA = json.dumps({
    "type": "record", "name": "Row", "namespace": "interop", "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": "string"},
        {"name": "score", "type": "double"},
        {"name": "opt", "type": ["null", "string"]}]})

INTEROP_RECORDS = [
    {"id": (1 << 45) + i, "name": f"row{i}", "score": i / 8,
     "opt": None if i % 2 else f"v{i}"} for i in range(50)]


def _jvm_avro(spark):
    try:
        spark._jvm.org.apache.avro.Schema  # noqa: B018
        return spark._jvm
    except Exception:
        pytest.skip("org.apache.avro not on the classpath")


def test_jvm_writes_python_reads(spark, tmp_path):
    """Reference implementation writes (deflate), pure-Python decoder
    reads — byte-level wire-format parity."""
    jvm = _jvm_avro(spark)
    sch = jvm.org.apache.avro.Schema.Parser().parse(INTEROP_SCHEMA)
    writer = jvm.org.apache.avro.generic.GenericDatumWriter(sch)
    dfw = jvm.org.apache.avro.file.DataFileWriter(writer)
    dfw.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    path = os.path.join(str(tmp_path), "jvm.avro")
    dfw.create(sch, jvm.java.io.File(path))
    for r in INTEROP_RECORDS:
        rec = jvm.org.apache.avro.generic.GenericData.Record(sch)
        rec.put("id", jvm.java.lang.Long(r["id"]))
        rec.put("name", r["name"])
        rec.put("score", float(r["score"]))
        rec.put("opt", r["opt"])
        dfw.append(rec)
    dfw.close()
    with open(path, "rb") as fh:
        schema_json, codec, out, _, _ = read_container(fh.read())
    assert codec == "deflate"
    assert out == INTEROP_RECORDS
    assert json.loads(schema_json)["name"] == "Row"


def test_python_writes_jvm_reads(spark, tmp_path):
    """Pure-Python encoder writes, reference implementation reads."""
    jvm = _jvm_avro(spark)
    for codec in ("null", "deflate"):
        path = os.path.join(str(tmp_path), f"py-{codec}.avro")
        with open(path, "wb") as fh:
            fh.write(write_container(INTEROP_SCHEMA, INTEROP_RECORDS,
                                     codec=codec, records_per_block=16))
        reader = jvm.org.apache.avro.file.DataFileReader(
            jvm.java.io.File(path),
            jvm.org.apache.avro.generic.GenericDatumReader())
        got = []
        while reader.hasNext():
            rec = reader.next()
            opt = rec.get("opt")
            got.append({"id": rec.get("id"),
                        "name": str(rec.get("name")),
                        "score": rec.get("score"),
                        "opt": None if opt is None else str(opt)})
        reader.close()
        assert got == INTEROP_RECORDS, codec


def test_spark_records_roundtrip(spark):
    """records_to_avro → avro_to_records inverse over a grouped frame."""
    df = spark.range(200).select(
        F.col("id"),
        (F.col("id") % 7).alias("grp"),
        F.concat(F.lit("name-"), F.col("id")).alias("name"),
        (F.col("id") * 2).cast("double").alias("score"))
    schema = json.dumps({
        "type": "record", "name": "R", "fields": [
            {"name": "id", "type": "long"},
            {"name": "name", "type": "string"},
            {"name": "score", "type": "double"}]})
    packed = records_to_avro(df, ["grp"], schema,
                             ["id", "name", "score"], order_col="id")
    assert packed.count() == 7
    meta = extract_avro_metadata(packed, "avro", id_cols=["grp"])
    m = {r["grp"]: r for r in meta.collect()}
    assert all(m[g]["codec"] == "deflate" for g in m)
    assert sum(r["item_count"] for r in m.values()) == 200
    back = avro_to_records(packed, "avro", id_cols=["grp"])
    typed = back.select(
        "grp", "record_index", "record_count",
        F.from_json("record_json", schema_to_ddl(schema)).alias("r")) \
        .select("grp", "record_index", "record_count", "r.*")
    rows = typed.orderBy("id").collect()
    assert len(rows) == 200
    assert rows[0]["name"] == "name-0" and rows[13]["score"] == 26.0
    # record order within a container is the order_col order
    assert all(r["record_index"] == r["id"] // 7 for r in rows)


def test_path_level_read_write(spark, tmp_path):
    """write_avro_path → read_avro_path (and JVM readability of the
    written files)."""
    df = spark.range(100).select(
        "id", F.concat(F.lit("u"), F.col("id")).alias("user"),
        (F.col("id") % 2 == 0).alias("even"))
    out = os.path.join(str(tmp_path), "avrodir")
    n_files = write_avro_path(df.repartition(3), out)
    assert n_files == 3
    back = read_avro_path(spark, out)
    assert back.count() == 100
    assert set(back.columns) == {"id", "user", "even"}
    assert back.filter("even").count() == 50
    got = {r["id"]: r["user"] for r in back.collect()}
    assert got[42] == "u42"


def test_record_json_bytes_base64():
    assert record_to_json({"b": b"\x00\x01"}) == '{"b":"AAE="}'
