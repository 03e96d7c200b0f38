"""Multimodal columns: binary payloads + typed metadata, Arrow-batched UDFs.

Images/audio/video ride as opaque `binary` columns with a typed metadata
struct. The Spark-side plumbing — schema, partitioning, mapInPandas batch
shape, size accounting — is real and tested. The codec layer is REAL for
every format the container can handle without Pillow/ffmpeg: PNG (stdlib
zlib), BMP, PPM/PGM, and PCM WAV decode+encode live in
datalib/media_codec.py; `decode_media_stats` below runs them inside
mapInPandas and `synthesize_media` builds payloads through the same
encoders from a deterministic formula (so the DuckDB oracle can regenerate
the expected integer stats via generate_series — the EVTX pack→parse gate
strategy).

JPEG (baseline, datalib/jpeg.py) and MP4 (ISO-BMFF demux + PNG-codec
frame decode, datalib/mp4.py) are now REAL too. The remaining declared
seam is compressed A/V bitstreams the sandbox genuinely can't decode
(H.264/H.265/Opus frame payloads — the MP4 container still parses):
* decode_stub=True (default in extract_features) → deterministic fake
  features derived from the payload bytes.
* decode_stub=False → real decode via media_codec for supported mimes;
  NotImplementedError only for codecs that genuinely need ffmpeg.

Scale notes: payloads are grouped into size-bounded Arrow batches
(`maxRecordsPerBatch` plus the byte-budget repartition below) so a 4K
video frame batch can't blow executor memory; decode parallelism ==
partition count, no driver involvement.
"""

from __future__ import annotations

import struct
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


def _real_features(payload: bytes, dim: int) -> list[float]:
    """REAL decode path: per-channel means + shape for images, PCM stats
    for audio (PNG/BMP/PPM/WAV/GIF + baseline & progressive JPEG +
    PNG-codec MP4 all decode for real). Raises only for the genuinely
    ffmpeg-class leftovers (H.264-in-MP4 frames)."""
    from nifi_spark.datalib import media_codec as mc
    mime = mc.sniff_media(payload)
    if mime.startswith("image/"):
        w, h, c, px = mc.decode_image(payload)
        sums = [0] * c
        for i, v in enumerate(px):
            sums[i % c] += v
        n = w * h
        feat = [w / 4096.0, h / 4096.0, float(c)]
        feat += [s / n / 255.0 for s in sums]
    elif mime == "audio/wav":
        rate, ch, samples = mc.decode_wav(payload)
        n = max(len(samples), 1)
        feat = [rate / 48000.0, float(ch), len(samples) / 1e6,
                sum(abs(s) for s in samples) / n / 32768.0]
    elif mime == "video/mp4":
        from nifi_spark.datalib import mp4
        tr = mp4.parse_mp4(payload)
        feat = [tr.width / 4096.0, tr.height / 4096.0,
                float(tr.n_samples), tr.duration_ms() / 1e6]
        # first-frame pixel mean when the sample codec is one we decode
        samples = mp4.extract_samples(payload, tr)
        if samples:
            try:
                w, h, c, px = mc.decode_image(samples[0])
                feat.append(sum(px) / max(len(px), 1) / 255.0)
            except ValueError:
                pass  # e.g. avc1 payloads: container stats only
    else:
        raise NotImplementedError(
            f"no sandbox decoder for {mime} — compressed A/V bitstreams "
            "(H.264/Opus) need ffmpeg; plug them here on a real cluster")
    feat = feat[:dim]
    return feat + [0.0] * (dim - len(feat))


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
            payloads = pdf["payload"]
            if decode_stub:
                feats = payloads.map(lambda b: _fake_features(b, dim))
            else:
                feats = payloads.map(lambda b: _real_features(bytes(b), dim))
            out = pd.DataFrame({
                "id": pdf["id"],
                "kind": pdf["kind"],
                "byte_len": payloads.map(len).astype("int64"),
                "sha256": payloads.map(lambda b: hashlib.sha256(b).hexdigest()),
                "feat": feats,
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
    explode is real (JVM-side sequence); decode_stub=False runs the REAL
    container demux + frame decode path (sample_video_frames)."""
    if not decode_stub:
        return sample_video_frames(df, every_ms=every_ms)
    n_frames = F.greatest((F.col("duration_ms") / every_ms).cast("int"), F.lit(1))
    sampled = df.select("id", "kind", "payload", "duration_ms",
                        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx")) \
                .withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)
    # stub frame digest: hash(payload bytes + frame index) — deterministic
    return sampled.withColumn(
        "frame_sha256", F.sha2(F.concat(F.col("payload"),
                                        F.encode(F.col("frame_idx").cast("string"),
                                                 "utf-8")), 256)) \
        .drop("payload")


FRAME_STATS_SCHEMA = (
    "id long, sample_idx int, frame_idx int, frame_ts_ms long, "
    "width int, height int, px_sum long, px_min int, px_max int")


def sample_video_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """REAL video frame sampling: demux the MP4 box tree (datalib/mp4.py),
    join the stsz/stsc/stco/stts sample tables, pick the latest sample at
    each every_ms tick, decode the frame payload with the pure-Python
    codecs, and emit integer-exact raster stats per sampled frame.

    Frames whose codec the sandbox can't decode (avc1/hev1) still yield
    rows — container-level fields filled, pixel stats NULL (the quarantine
    convention decode_media_stats uses). Arrow-batched mapInPandas; one
    output row per (video, tick)."""
    from bisect import bisect_right

    from nifi_spark.datalib import media_codec as mc
    from nifi_spark.datalib import mp4

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf["id"], pdf["payload"]):
                blob = bytes(payload)
                tr = mp4.parse_mp4(blob)
                ts_ms = [tr.sample_ts_ms(k) for k in range(tr.n_samples)]
                dur = tr.duration_ms()
                for sidx, tick in enumerate(range(0, max(dur, 1), every_ms)):
                    fj = max(bisect_right(ts_ms, tick) - 1, 0)
                    row = {"id": int(i), "sample_idx": sidx, "frame_idx": fj,
                           "frame_ts_ms": ts_ms[fj] if ts_ms else 0,
                           "width": None, "height": None, "px_sum": None,
                           "px_min": None, "px_max": None}
                    frame = blob[tr.offsets[fj]:tr.offsets[fj] + tr.sizes[fj]]
                    try:
                        w, h, _c, px = mc.decode_image(frame)
                        row.update(width=w, height=h, px_sum=sum(px),
                                   px_min=min(px), px_max=max(px))
                    except ValueError:
                        pass  # undecodable codec → container fields only
                    rows.append(row)
            yield pd.DataFrame(rows, columns=["id", "sample_idx", "frame_idx",
                                              "frame_ts_ms", "width", "height",
                                              "px_sum", "px_min", "px_max"])

    return df.select("id", "payload").mapInPandas(run, schema=FRAME_STATS_SCHEMA)


# ------------------------------------------------------------------
# REAL codec path (media_codec.py): deterministic fixtures + decode stats
# ------------------------------------------------------------------
#
# Fixture formulas — shared contract between synthesize_media (encode side)
# and the DuckDB gate oracle (which regenerates the raster/PCM stream with
# generate_series and aggregates the SAME integers):
#   image(id): w = 8 + id%5, h = 6 + id%4, c = 3,
#              pixel[k] = (id + 3*k) % 256 for k in [0, w*h*3)
#              container = id%3 → PNG / BMP / PPM
#   audio(id): rate = 8000, ch = 1 + id%2, frames = 64 + id%37,
#              sample[j] = (id*17 + j*13) % 4001 - 2000,
#              j in [0, frames*ch)
#   jpeg(id):  grayscale, wb = 2 + id%3 / hb = 1 + id%2 blocks of 8x8,
#              pixel(x,y) = (id*7 + (y//8)*wb + (x//8)) % 256 — constant
#              per block, encoded with an all-ones quant table, which
#              makes the DCT path LOSSLESS (single integer DC coeff), so
#              the oracle regenerates decoded pixels from the formula;
#              restart_interval = 2 when id%5 == 0 (exercises DRI/RSTn)
#   video(id): n = 3 + id%4 PNG frames of (8 + (id%3)*4) x 8 RGB,
#              frame j pixel k = (id*11 + j*5 + 3*k) % 256, 500 ms/frame
#              (PNG is lossless, so frame stats are closed-form exact)

MEDIA_STATS_SCHEMA = (
    "id long, kind string, mime string, width int, height int, "
    "channels int, px_sum long, px_min int, px_max int, "
    "sample_rate int, n_samples int, duration_ms int, abs_sum long, peak int")


def _synth_image(i: int) -> bytes:
    from nifi_spark.datalib import media_codec as mc
    w, h = 8 + i % 5, 6 + i % 4
    px = bytes((i + 3 * k) % 256 for k in range(w * h * 3))
    fmt = i % 3
    if fmt == 0:
        # every 2nd PNG fixture is Adam7-interlaced — pixel stats are
        # container-invariant, so the same oracle also proves the
        # interlaced decode path
        return mc.encode_png(w, h, 3, px, interlace=(i % 6 == 3))
    if fmt == 1:
        return mc.encode_bmp(w, h, 3, px)
    return mc.encode_pnm(w, h, 3, px)


def _synth_audio(i: int) -> bytes:
    from nifi_spark.datalib import media_codec as mc
    ch, frames = 1 + i % 2, 64 + i % 37
    samples = [(i * 17 + j * 13) % 4001 - 2000 for j in range(frames * ch)]
    return mc.encode_wav(8000, ch, samples)


def synthesize_media(df: DataFrame, id_col: str = "id") -> DataFrame:
    """Fixture source: encode deterministic rasters/PCM through the REAL
    encoders (PNG/BMP/PPM/WAV), one media row per input id — even ids
    become images, odd ids audio. Runs in mapInPandas so encoding is
    distributed exactly like a production ingest of raw media files."""
    ids = df.select(F.col(id_col).cast("long").alias("id"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                if i % 2 == 0:
                    rows.append((i, "image", _synth_image(i)))
                else:
                    rows.append((i, "audio", _synth_audio(i)))
            yield pd.DataFrame(rows, columns=["id", "kind", "payload"])

    return ids.mapInPandas(gen, schema="id long, kind string, payload binary")


def _synth_jpeg(i: int) -> bytes:
    from nifi_spark.datalib.jpeg import encode_jpeg
    wb, hb = 2 + i % 3, 1 + i % 2
    w, h = 8 * wb, 8 * hb
    px = bytes(((i * 7 + (y // 8) * wb + (x // 8)) % 256)
               for y in range(h) for x in range(w))
    # every third id takes the progressive (SOF2) scan script so the gate
    # proves both entropy layouts against the same pixel-formula oracle
    prog = i % 3 == 1
    return encode_jpeg(w, h, 1, px, quant=1, progressive=prog,
                       restart_interval=2 if (i % 5 == 0 and not prog) else 0)


def _synth_video(i: int) -> bytes:
    from nifi_spark.datalib import media_codec as mc
    from nifi_spark.datalib.mp4 import encode_mp4
    n, w, h = 3 + i % 4, 8 + (i % 3) * 4, 8
    frames = [mc.encode_png(w, h, 3,
                            bytes(((i * 11 + j * 5 + 3 * k) % 256)
                                  for k in range(w * h * 3)))
              for j in range(n)]
    return encode_mp4(frames, w, h, sample_duration=500, timescale=1000)


def synthesize_jpeg(df: DataFrame, id_col: str = "id") -> DataFrame:
    """Fixture source: block-constant grayscale rasters through the REAL
    baseline-JPEG encoder (lossless under the all-ones quant contract)."""
    ids = df.select(F.col(id_col).cast("long").alias("id"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                [(int(i), "image", _synth_jpeg(int(i))) for i in pdf["id"]],
                columns=["id", "kind", "payload"])

    return ids.mapInPandas(gen, schema="id long, kind string, payload binary")


def _synth_gif(i: int) -> bytes:
    """Formula contract (mirrored by the gate oracle): w = 8 + i%5,
    h = 6 + i%4; palette index at raster position j = (i + 3j) % 8;
    palette color c = ((c·31)%256, (c·57)%256, (c·91)%256). Every 4th
    id % condition isn't needed — interlace is exercised by the decode
    tests against real files; the gate proves LZW + palette mapping."""
    from nifi_spark.datalib.gif import encode_gif
    w, h = 8 + i % 5, 6 + i % 4
    px = bytearray()
    for j in range(w * h):
        c = (i + 3 * j) % 8
        px += bytes(((c * 31) % 256, (c * 57) % 256, (c * 91) % 256))
    return encode_gif(w, h, 3, bytes(px))


def synthesize_gif(df: DataFrame, id_col: str = "id") -> DataFrame:
    """Fixture source: 8-color palette rasters through the REAL GIF
    encoder (palette build + variable-width LZW)."""
    ids = df.select(F.col(id_col).cast("long").alias("id"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                [(int(i), "image", _synth_gif(int(i))) for i in pdf["id"]],
                columns=["id", "kind", "payload"])

    return ids.mapInPandas(gen, schema="id long, kind string, payload binary")


def synthesize_quantized_gif(df: DataFrame,
                             id_col: str = "id") -> DataFrame:
    """Fixture source: 256-gray TRUECOLOR gradients (w=256,
    h=2+id%5, value (x+id)%256) pushed through the REAL median-cut
    quantizer (gif.quantize_colors, max_colors=64) inside the GIF
    encoder — distributed, Arrow-batched. The uniform gradient makes
    the quantized raster closed-form (every value v lands exactly on
    4*(v//4)+1), so decode stats replay in SQL without re-running the
    quantizer."""
    from nifi_spark.datalib.gif import encode_gif
    ids = df.select(F.col(id_col).cast("long").alias("id"))

    def synth(i: int) -> bytes:
        h = 2 + i % 5
        rgb = bytes(v for _ in range(h) for x in range(256)
                    for v in ((x + i) % 256,) * 3)
        return encode_gif(256, h, 3, rgb, max_colors=64)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                [(int(i), "image", synth(int(i))) for i in pdf["id"]],
                columns=["id", "kind", "payload"])

    return ids.mapInPandas(gen, schema="id long, kind string, payload binary")


def synthesize_video(df: DataFrame, id_col: str = "id") -> DataFrame:
    """Fixture source: PNG-codec MP4s through the REAL muxer — every byte
    of the container (box tree, sample tables, mdat) is produced by
    encode_mp4, every frame by encode_png."""
    ids = df.select(F.col(id_col).cast("long").alias("id"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                [(int(i), "video", _synth_video(int(i))) for i in pdf["id"]],
                columns=["id", "kind", "payload"])

    return ids.mapInPandas(gen, schema="id long, kind string, payload binary")


def decode_media_stats(df: DataFrame) -> DataFrame:
    """REAL decode: sniff each payload's magic, run the pure-Python codec,
    and emit integer-exact stats (image: raster sum/min/max + shape; audio:
    PCM abs-sum/peak/duration). Integer outputs keep the DuckDB oracle
    bit-exact. Arrow-batched; unsupported formats surface as mime with NULL
    stats rather than failing the batch (quarantine-friendly)."""
    from nifi_spark.datalib import media_codec as mc

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, kind, payload in zip(pdf["id"], pdf["kind"], pdf["payload"]):
                blob = bytes(payload) if payload is not None else b""
                mime = mc.sniff_media(blob)
                base = {"id": int(i), "kind": kind, "mime": mime,
                        "width": None, "height": None, "channels": None,
                        "px_sum": None, "px_min": None, "px_max": None,
                        "sample_rate": None, "n_samples": None,
                        "duration_ms": None, "abs_sum": None, "peak": None}
                try:
                    if mime.startswith("image/"):
                        base.update(mc.image_stats(blob))
                        base.pop("n_bytes", None)
                    elif mime == "audio/wav":
                        base.update(mc.audio_stats(blob))
                except ValueError:
                    pass  # undecodable → NULL stats row (quarantine path)
                base["mime"] = mime
                rows.append(base)
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=MEDIA_STATS_SCHEMA)


# ------------------------------------------------------------------
# ExtractImageMetadata / ExtractMediaMetadata analog (datalib/exif.py)
# ------------------------------------------------------------------
# Fixture formulas (synthesize_tagged_media — the oracle regenerates every
# key/value pair from these):
#   id%3==0 JPEG 8x8 gray const (id%256), EXIF:
#     IFD0.Make="Maker-"+(id%5)  IFD0.Model="Model "+(id%11)
#     IFD0.Orientation=1+id%8    IFD0.XResolution=(72+id%4)+"/1"
#     IFD0.Software="nifi_spark" IFD0.DateTime="2020:01:DD hh:mm:ss"
#       with DD=1+id%28, hh=id%24, mm=id%60, ss=(id*7)%60
#     ExifIFD.ExposureTime="1/"+(30+id%60)  ExifIFD.FNumber=(28+id%10)+"/10"
#     ExifIFD.ISOSpeedRatings=100*(1+id%16) ExifIFD.PixelXDimension=8
#     (+ the constant JFIF.*/JPEG.* header keys the encoder emits)
#   id%3==1 PNG 4x2 RGB const (id%251), tEXt:
#     Title="Doc "+id, Software="nifi_spark", Comment="c"+(id%97)
#   id%3==2 WAV 8000 Hz, ch=1+id%2, 16 zero samples, LIST/INFO:
#     Title="Track "+id, Artist="A"+(id%13), Software="nifi_spark"

METADATA_SCHEMA = "id long, key string, value string"


def extract_media_metadata(df: DataFrame, key_prefix: str = "",
                           key_filter: str | None = None,
                           max_attrs: int | None = None) -> DataFrame:
    """One row per (payload, metadata key) — the exploded form of the
    reference's `<directory name>.<tag name>` attribute map.

    Knob parity with ExtractMediaMetadata (nifi-media-bundle/.../media/
    ExtractMediaMetadata.java:74-136): `key_filter` is a regex applied to
    the raw key BEFORE prefixing, `max_attrs` caps pairs per payload
    (deterministically: container document order, unlike the reference's
    declared no-order-guarantee), `key_prefix` is prepended last.
    Arrow-batched mapInPandas; the TIFF/PNG/RIFF walks are pure offset
    arithmetic over in-memory bytes."""
    import re as _re

    from nifi_spark.datalib.exif import extract_metadata_blob

    pat = _re.compile(key_filter) if key_filter else None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf["id"], pdf["payload"]):
                try:
                    pairs = extract_metadata_blob(bytes(payload))
                except (ValueError, IndexError, KeyError, EOFError,
                        struct.error) as e:
                    # FAILURE relationship analog: one `_error` pair,
                    # no metadata keys (route on key == '_error').
                    # Truncated/malformed blobs surface as IndexError or
                    # struct.error from the offset walks, not ValueError —
                    # all must land here, not crash the Arrow task.
                    rows.append({"id": int(i), "key": "_error",
                                 "value": f"{type(e).__name__}: {e}"})
                    continue
                if pat is not None:
                    pairs = [(k, v) for k, v in pairs if pat.search(k)]
                if max_attrs is not None:
                    pairs = pairs[:max_attrs]
                rows += [{"id": int(i), "key": key_prefix + k, "value": v}
                         for k, v in pairs]
            yield pd.DataFrame(rows, columns=["id", "key", "value"])

    return df.select("id", "payload").mapInPandas(run, schema=METADATA_SCHEMA)


def _synth_tagged(i: int) -> bytes:
    from nifi_spark.datalib import exif, media_codec as mc
    from nifi_spark.datalib.jpeg import encode_jpeg
    if i % 3 == 0:
        j = encode_jpeg(8, 8, 1, bytes([i % 256] * 64), quant=1)
        app1 = exif.build_exif_app1(
            {0x010F: f"Maker-{i % 5}", 0x0110: f"Model {i % 11}",
             0x0112: 1 + i % 8, 0x011A: (72 + i % 4, 1),
             0x0131: "nifi_spark",
             0x0132: f"2020:01:{1 + i % 28:02d} {i % 24:02d}:{i % 60:02d}:{i * 7 % 60:02d}"},
            {0x829A: (1, 30 + i % 60), 0x829D: (28 + i % 10, 10),
             0x8827: 100 * (1 + i % 16), 0xA002: 8})
        return exif.insert_app1(j, app1)
    if i % 3 == 1:
        png = mc.encode_png(4, 2, 3, bytes([i % 251] * 24))
        return exif.insert_png_text(png, [("Title", f"Doc {i}"),
                                          ("Software", "nifi_spark"),
                                          ("Comment", f"c{i % 97}")])
    wav = mc.encode_wav(8000, 1 + i % 2, [0] * 16)
    return exif.insert_wav_info(wav, [("Title", f"Track {i}"),
                                      ("Artist", f"A{i % 13}"),
                                      ("Software", "nifi_spark")])


def synthesize_tagged_media(df: DataFrame, id_col: str = "id") -> DataFrame:
    """Fixture source: metadata-bearing payloads through the REAL encoders
    (JPEG+Exif APP1 / PNG+tEXt / WAV+LIST-INFO) — formulas in the module
    comment above."""
    ids = df.select(F.col(id_col).cast("long").alias("id"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                [(int(i), "media", _synth_tagged(int(i))) for i in pdf["id"]],
                columns=["id", "kind", "payload"])

    return ids.mapInPandas(gen, schema="id long, kind string, payload binary")


def resize_images(df: DataFrame, width: int, height: int,
                  algorithm: str = "nearest") -> DataFrame:
    """ResizeImage analog (nifi-media-bundle/.../image/ResizeImage.java:
    69-134): decode whatever container the payload sniffs as, resize the
    raster (media_codec.resize_raster), re-encode as PNG. Arrow-batched;
    undecodable payloads yield NULL payloads (quarantine convention)."""
    from nifi_spark.datalib import media_codec as mc

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf["id"], pdf["payload"]):
                try:
                    w, h, c, px = mc.decode_image(bytes(payload))
                    out = mc.resize_raster(w, h, c, px, width, height,
                                           algorithm)
                    blob = mc.encode_png(width, height, c, out)
                except ValueError:
                    blob = None
                rows.append({"id": int(i), "mime": "image/png",
                             "width": width, "height": height,
                             "payload": blob})
            yield pd.DataFrame(rows, columns=["id", "mime", "width",
                                              "height", "payload"])

    return df.select("id", "payload").mapInPandas(
        run, schema="id long, mime string, width int, height int, payload binary")


def gif_animation_stats(df: DataFrame, id_col: str = "id") -> DataFrame:
    """Animated-GIF path end-to-end: per id a moving-box frame sequence
    (closed-form pixels) runs through the REAL animation encoder
    (per-frame local palettes + minimal-bounding-rect deltas) and the
    REAL composing decoder (GCE delays/disposal), emitting integer
    stats of the COMPOSED frames — so the delta encode/compose cycle
    must reproduce every canvas exactly for the formula oracle to
    match. Columns: (id, n_frames, delays_sum, first_px_sum,
    last_px_sum)."""
    from nifi_spark.datalib.gif import (decode_gif_frames,
                                        encode_gif_animation)
    ids = df.select(F.col(id_col).cast("long").alias("id"))
    W, H = 16, 10

    def build_frame(i: int, t: int) -> bytes:
        f = bytearray()
        for y in range(H):
            for x in range(W):
                if t <= x < t + 4 and 3 <= y < 7:
                    f += bytes([255, (10 * (t + i % 5)) % 256, i % 7])
                else:
                    f += bytes([(x % 8) * 30, (y % 4) * 60,
                                (i % 5) * 9])
        return bytes(f)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                nf = 2 + i % 3
                frames = [build_frame(i, t) for t in range(nf)]
                blob = encode_gif_animation(
                    W, H, frames, delays_cs=[4 + t for t in range(nf)])
                _sw, _sh, got = decode_gif_frames(blob)
                rows.append((i, len(got),
                             sum(d for d, _ in got),
                             sum(got[0][1]), sum(got[-1][1])))
            yield pd.DataFrame(rows, columns=[
                "id", "n_frames", "delays_sum", "first_px_sum",
                "last_px_sum"])

    return ids.mapInPandas(
        run, schema="id long, n_frames int, delays_sum long, "
                    "first_px_sum long, last_px_sum long")
