"""Multimodal columns: binary payloads + typed metadata, Arrow-batched UDFs.

Images/audio/video ride as opaque `binary` columns with a typed metadata
struct. The Spark-side plumbing — schema, partitioning, mapInPandas batch
shape, size accounting — is real and tested; the codec step is stubbed
because no image/audio libraries exist in this container:

* decode_stub=True (default) → deterministic fake features derived from
  the payload bytes (stable across runs; lets downstream stages and tests
  exercise real data flow).
* decode_stub=False → NotImplementedError at the decode call site, marking
  exactly where Pillow/ffmpeg/torchaudio plug in on a real cluster.

Scale notes: payloads are grouped into size-bounded Arrow batches
(`maxRecordsPerBatch` plus the byte-budget repartition below) so a 4K
video frame batch can't blow executor memory; decode parallelism ==
partition count, no driver involvement.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = ("id long, kind string, payload binary, mime string, "
                "width int, height int, duration_ms int")

FEATURE_SCHEMA = ("id long, kind string, byte_len long, sha256 string, "
                  "feat array<float>")


def attach_media(df: DataFrame, id_col: str, text_col: str,
                 kind: str = "image") -> DataFrame:
    """Test/bench helper: fabricate a binary payload column from text
    (deterministic) with typed metadata — the input_hint shape for
    multimodal rows."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).cast("long").alias("id"),
        F.lit(kind).alias("kind"),
        payload.alias("payload"),
        F.lit({"image": "image/png", "audio": "audio/wav",
               "video": "video/mp4"}[kind]).alias("mime"),
        (F.octet_length(payload) % 1920).cast("int").alias("width"),
        (F.octet_length(payload) % 1080).cast("int").alias("height"),
        (F.octet_length(payload) * 10).cast("int").alias("duration_ms"))


def _fake_features(payload: bytes, dim: int) -> list[float]:
    import hashlib
    d = hashlib.sha256(payload).digest()
    return [d[i % 32] / 255.0 for i in range(dim)]


def extract_features(df: DataFrame, dim: int = 8, decode_stub: bool = True,
                     batch_bytes: int = 64 << 20,
                     size_partitioning: bool = False) -> DataFrame:
    """Decode/feature-extract via mapInPandas (Arrow batches).

    Real plumbing: batches arrive as pandas DataFrames of binary payloads;
    output schema is fixed; the per-batch loop is vectorizable. Only the
    inner `decode` is stubbed.

    size_partitioning=True adds a byte-budget repartition sized by a
    driver-side octet_length scan — OPT-IN because the sizing agg is a
    second full read of the payload bytes (at 100 TB that doubles input
    I/O). Default relies on the scan's own split sizing
    (spark.sql.files.maxPartitionBytes) plus Arrow's maxRecordsPerBatch,
    which already bound batch memory for file-backed media tables; turn
    this on only for exploded/joined intermediates with wildly skewed
    payload sizes.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "media decode requires Pillow/ffmpeg — not in sandbox; "
                    "plug the real codec here")
            payloads = pdf["payload"]
            out = pd.DataFrame({
                "id": pdf["id"],
                "kind": pdf["kind"],
                "byte_len": payloads.map(len).astype("int64"),
                "sha256": payloads.map(lambda b: hashlib.sha256(b).hexdigest()),
                "feat": payloads.map(lambda b: _fake_features(b, dim)),
            })
            yield out

    if size_partitioning:
        # size-aware partitioning: target ≤ batch_bytes of payload per
        # partition (estimate via octet_length sum) so Arrow batches stay
        # bounded even for skewed in-memory intermediates.
        stats = df.agg(F.sum(F.octet_length("payload")).alias("b"),
                       F.count(F.lit(1)).alias("n")).collect()[0]
        if stats["b"] and stats["b"] > batch_bytes:
            parts = int(stats["b"] // batch_bytes) + 1
            df = df.repartition(parts)
    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_ms: int = 1000,
                 decode_stub: bool = True) -> DataFrame:
    """Video frame sampling: one output row per sampled timestamp — the
    explode is real (JVM-side sequence), the frame grab is the stub."""
    n_frames = F.greatest((F.col("duration_ms") / every_ms).cast("int"), F.lit(1))
    sampled = df.select("id", "kind", "payload", "duration_ms",
                        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx")) \
                .withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)
    if not decode_stub:
        raise NotImplementedError("frame decode requires ffmpeg")
    # stub frame digest: hash(payload bytes + frame index) — deterministic
    return sampled.withColumn(
        "frame_sha256", F.sha2(F.concat(F.col("payload"),
                                        F.encode(F.col("frame_idx").cast("string"),
                                                 "utf-8")), 256)) \
        .drop("payload")
