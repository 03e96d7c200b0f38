"""Baseline JPEG codec (datalib/jpeg.py) + MP4 demux (datalib/mp4.py).

Strategy mirrors test_media_codec.py: roundtrip through our own encoder,
plus hand-built streams for decode paths the encoder never emits (4:2:0
subsampling, multi-chunk stsc runs), plus env-gated parity against the
reference repo's own JPEG test artifacts (simple.jpg is a real-world
SOF0 4:2:0 file — it exercises the subsampled-MCU + upsampling path with
bytes this repo did not produce).
"""

from __future__ import annotations

import os
import random
import struct

import numpy as np
import pytest

from nifi_spark.datalib import media_codec as mc
from nifi_spark.datalib import mp4
from nifi_spark.datalib.jpeg import (_BitWriter, _fixed_length_table,
                                     _HuffEncoder, decode_jpeg, encode_jpeg)

REF = "/root/reference/nifi-nar-bundles/nifi-standard-bundle/nifi-standard-processors/src/test/resources"


def _raster(w, h, c, seed=0):
    rng = random.Random(seed)
    return bytes(rng.randrange(256) for _ in range(w * h * c))


def _err(a: bytes, b: bytes) -> int:
    return int(np.abs(np.frombuffer(a, np.uint8).astype(int)
                      - np.frombuffer(b, np.uint8).astype(int)).max())


# ------------------------------------------------------------------ JPEG

def test_jpeg_flat_blocks_lossless():
    # all-ones quant + block-constant image => single integer DC coeff per
    # block, zero ACs: the whole entropy/DCT pipeline is exactly invertible
    w, h = 32, 16
    px = bytes(((y // 8) * 4 + (x // 8) * 37 + 5) % 256
               for y in range(h) for x in range(w))
    blob = encode_jpeg(w, h, 1, px, quant=1)
    assert mc.sniff_media(blob) == "image/jpeg"
    assert decode_jpeg(blob) == (w, h, 1, px)
    assert mc.decode_image(blob) == (w, h, 1, px)


def test_jpeg_flat_blocks_lossless_with_restarts():
    w, h = 40, 8
    px = bytes(((x // 8) * 19 + 200) % 256 for _ in range(h) for x in range(w))
    blob = encode_jpeg(w, h, 1, px, quant=1, restart_interval=2)
    assert b"\xFF\xDD" in blob and b"\xFF\xD0" in blob  # DRI + RST0 present
    assert decode_jpeg(blob) == (w, h, 1, px)


@pytest.mark.parametrize("channels", [1, 3])
def test_jpeg_gradient_near_lossless_q95(channels):
    w, h = 24, 16
    px = bytes(((x * 3 + y * 5 + k * 11) % 256)
               for y in range(h) for x in range(w) for k in range(channels))
    out = decode_jpeg(encode_jpeg(w, h, channels, px, quality=95))
    assert out[:3] == (w, h, channels)
    assert _err(out[3], px) <= 4  # smooth content at q95: tiny error


def test_jpeg_random_noise_bounded_error():
    # worst case for DCT coding; q90 keeps every sample within a loose bound
    w, h = 16, 16
    px = _raster(w, h, 3, seed=7)
    out = decode_jpeg(encode_jpeg(w, h, 3, px, quality=90))
    assert _err(out[3], px) <= 48
    assert np.abs(np.frombuffer(out[3], np.uint8).astype(int)
                  - np.frombuffer(px, np.uint8).astype(int)).mean() <= 8


def test_jpeg_odd_dimensions_edge_padding():
    w, h = 21, 13  # forces edge-replication padding to 24x16
    px = bytes(((x * 2 + y * 9) % 256) for y in range(h) for x in range(w))
    out = decode_jpeg(encode_jpeg(w, h, 1, px, quality=95))
    assert out[:3] == (w, h, 1)
    assert _err(out[3], px) <= 4


def test_jpeg_quality_tradeoff():
    w, h = 32, 32
    px = bytes(((x * x + y * 3) % 256) for y in range(h) for x in range(w))
    lo = encode_jpeg(w, h, 1, px, quality=10)
    hi = encode_jpeg(w, h, 1, px, quality=95)
    assert len(lo) < len(hi)
    assert _err(decode_jpeg(hi)[3], px) < _err(decode_jpeg(lo)[3], px)


def test_jpeg_420_subsampled_decode():
    """Hand-built 4:2:0 stream (the encoder only emits 4:4:4): one MCU of
    four distinct flat Y blocks + flat chroma at 128, quant=1 — decode
    must reproduce each 8x8 quadrant exactly, with R=G=B=Y."""
    vals = [40, 90, 160, 230]
    dc_bits, dc_vals = _fixed_length_table(
        [abs(8 * (v - 128)).bit_length() for v in vals] + [0])
    ac_bits, ac_vals = _fixed_length_table([0x00])
    dc_enc = _HuffEncoder(dc_bits, dc_vals)
    ac_enc = _HuffEncoder(ac_bits, ac_vals)

    out = bytearray(b"\xFF\xD8")
    zz_ones = bytes([0]) + bytes([1] * 64)
    out += b"\xFF\xDB" + struct.pack(">H", len(zz_ones) + 2) + zz_ones
    sof = (bytes([8]) + struct.pack(">HH", 16, 16) + bytes([3])
           + bytes([1, 0x22, 0]) + bytes([2, 0x11, 0]) + bytes([3, 0x11, 0]))
    out += b"\xFF\xC0" + struct.pack(">H", len(sof) + 2) + sof
    for tc, (bits, hv) in ((0, (dc_bits, dc_vals)), (1, (ac_bits, ac_vals))):
        body = bytes([tc << 4]) + bytes(bits[1:17]) + bytes(hv)
        out += b"\xFF\xC4" + struct.pack(">H", len(body) + 2) + body
    sos = bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])
    out += b"\xFF\xDA" + struct.pack(">H", len(sos) + 2) + sos

    bw = _BitWriter()
    pred = 0
    for v in vals:                       # 4 Y blocks of the single MCU
        dc = 8 * (v - 128)
        diff = dc - pred
        pred = dc
        t = abs(diff).bit_length()
        dc_enc.emit(bw, t)
        if t:
            bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
        ac_enc.emit(bw, 0x00)            # EOB
    for _ in range(2):                   # Cb, Cr: DC 0 (=128 after shift)
        dc_enc.emit(bw, 0)
        ac_enc.emit(bw, 0x00)
    bw.align()
    out += bw.out + b"\xFF\xD9"

    w, h, c, px = decode_jpeg(bytes(out))
    assert (w, h, c) == (16, 16, 3)
    arr = np.frombuffer(px, np.uint8).reshape(16, 16, 3)
    for qi, v in enumerate(vals):
        qy, qx = divmod(qi, 2)
        quad = arr[qy * 8:(qy + 1) * 8, qx * 8:(qx + 1) * 8, :]
        assert (quad == v).all(), (qi, v, np.unique(quad))


def test_jpeg_rejects_unsupported_and_garbage():
    # SOF3 (lossless) and SOF9 (arithmetic) stay out of scope; SOF2
    # (progressive) is now decoded, covered by the tests below.
    for sof in (0xC3, 0xC9):
        blob = (b"\xFF\xD8\xFF" + bytes([sof]) + struct.pack(">H", 11)
                + bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]))
        with pytest.raises(ValueError, match="SOF"):
            decode_jpeg(blob)
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01\x02")
    with pytest.raises(ValueError):
        encode_jpeg(4, 4, 2, bytes(32))  # 2-channel unsupported
    with pytest.raises(ValueError):     # restarts not wired for progressive
        encode_jpeg(8, 8, 1, bytes(64), progressive=True, restart_interval=2)


def test_jpeg_progressive_flat_blocks_lossless():
    # the exactness contract holds for the progressive scan script too:
    # same coefficients, different transmission order
    w, h = 32, 16
    px = bytes(((y // 8) * 4 + (x // 8) * 37 + 5) % 256
               for y in range(h) for x in range(w))
    blob = encode_jpeg(w, h, 1, px, quant=1, progressive=True)
    assert b"\xFF\xC2" in blob and blob.count(b"\xFF\xDA") >= 6
    assert mc.sniff_media(blob) == "image/jpeg"
    assert decode_jpeg(blob) == (w, h, 1, px)


@pytest.mark.parametrize("dims,channels", [((16, 16), 1), ((24, 16), 3),
                                           ((37, 23), 3), ((129, 65), 1)])
def test_jpeg_progressive_matches_baseline(dims, channels):
    """Pixel-identical to the baseline decode on arbitrary content: the
    progressive path transmits the identical quantized coefficients, so any
    divergence is an entropy-coding bug (EOB runs, ZRL, correction bits)."""
    w, h = dims
    px = _raster(w, h, channels, seed=w * h + channels)
    base = decode_jpeg(encode_jpeg(w, h, channels, px, quality=85))
    prog = decode_jpeg(encode_jpeg(w, h, channels, px, quality=85,
                                   progressive=True))
    assert base == prog


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference repo absent")
def test_jpeg_decodes_reference_artifacts():
    """Real-world parity: the reference's own test JPEGs decode — simple.jpg
    is SOF0 4:2:0 800x600 from a real encoder (stock Huffman tables, real
    entropy stream); blueBtnBg.jpg must come out blue-dominant."""
    with open(f"{REF}/simple.jpg", "rb") as f:
        w, h, c, px = decode_jpeg(f.read())
    assert (w, h, c) == (800, 600, 3)
    a = np.frombuffer(px, np.uint8).reshape(h, w, 3)
    assert 0 < a.mean() < 255 and a.std() > 1  # non-degenerate image
    with open(f"{REF}/TestIdentifyMimeType/blueBtnBg.jpg", "rb") as f:
        w, h, c, px = decode_jpeg(f.read())
    assert (w, h, c) == (1, 24, 3)
    m = np.frombuffer(px, np.uint8).reshape(-1, 3).mean(axis=0)
    assert m[2] > m[1] > m[0]  # blue button: B > G > R


# ------------------------------------------------------------------- MP4

def _frames(n, w=16, h=8, seed=0):
    return [mc.encode_png(w, h, 3, _raster(w, h, 3, seed=seed + j))
            for j in range(n)]


def test_mp4_mux_demux_roundtrip():
    frames = _frames(5)
    blob = mp4.encode_mp4(frames, 16, 8, sample_duration=500, timescale=1000)
    assert mc.sniff_media(blob) == "video/mp4"
    tr = mp4.parse_mp4(blob)
    assert (tr.codec, tr.width, tr.height) == ("png", 16, 8)
    assert tr.n_samples == 5 and tr.timescale == 1000
    assert tr.pts == [0, 500, 1000, 1500, 2000]
    assert tr.duration_ms() == 2500
    assert mp4.extract_samples(blob, tr) == frames
    # every extracted frame decodes through the image dispatch
    for f in mp4.extract_samples(blob):
        assert mc.decode_image(f)[:3] == (16, 8, 3)


def test_mp4_multi_chunk_stsc_join():
    """Hand-edit the sample tables into a 2-chunk layout (3 + 2 samples,
    second chunk offset past a gap) — the demux must walk stsc runs and
    cumulate sizes within each chunk, not assume one chunk."""
    frames = _frames(5, seed=50)
    blob = bytearray(mp4.encode_mp4(frames, 16, 8))
    # split mdat payload: insert 7 junk bytes between samples 3 and 4
    sizes = [len(f) for f in frames]
    ftyp_len = blob.index(b"mdat") - 4
    first_off = ftyp_len + 8
    gap_at = first_off + sum(sizes[:3])
    blob[gap_at:gap_at] = b"\x00" * 7
    # grow mdat box size
    (mdat_sz,) = struct.unpack_from(">I", blob, ftyp_len)
    struct.pack_into(">I", blob, ftyp_len, mdat_sz + 7)
    def _replace_box(tag: bytes, new_body: bytes) -> int:
        i = bytes(blob).index(tag) - 4
        (old_sz,) = struct.unpack_from(">I", blob, i)
        new_box = struct.pack(">I", len(new_body) + 8) + tag + new_body
        blob[i:i + old_sz] = new_box
        return len(new_box) - old_sz

    # stsc: run1 = chunks from 1 with 3/chunk, run2 = from chunk 2 with 2
    delta = _replace_box(b"stsc", struct.pack(">II", 0, 2)
                         + struct.pack(">III", 1, 3, 1)
                         + struct.pack(">III", 2, 2, 1))
    # stco: 2 chunk offsets (second one past the junk gap)
    delta += _replace_box(b"stco", struct.pack(">II", 0, 2)
                          + struct.pack(">II", first_off, gap_at + 7))
    # fix ancestor container sizes by the accumulated delta
    for tag in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
        j = bytes(blob).index(tag) - 4
        (sz,) = struct.unpack_from(">I", blob, j)
        struct.pack_into(">I", blob, j, sz + delta)
    tr = mp4.parse_mp4(bytes(blob))
    assert tr.n_samples == 5
    assert mp4.extract_samples(bytes(blob), tr) == frames


def test_mp4_rejects_non_bmff():
    with pytest.raises(ValueError, match="ftyp"):
        mp4.parse_mp4(b"\x00" * 64)
    with pytest.raises(ValueError):
        mp4.encode_mp4([], 8, 8)


# ------------------------------------------------------ Spark-side paths

def test_sample_video_frames_spark(spark):
    from nifi_spark.datalib.multimodal import sample_video_frames, synthesize_video
    df = spark.range(6).withColumnRenamed("id", "doc_id")
    rows = sample_video_frames(synthesize_video(df, "doc_id"),
                               every_ms=700).collect()
    assert rows
    for r in rows:
        i, n, w = r["id"], 3 + r["id"] % 4, 8 + (r["id"] % 3) * 4
        fj = min((r["sample_idx"] * 700) // 500, n - 1)
        exp = sum((i * 11 + fj * 5 + 3 * k) % 256 for k in range(w * 8 * 3))
        assert (r["frame_idx"], r["frame_ts_ms"], r["width"],
                r["px_sum"]) == (fj, fj * 500, w, exp)


def test_sample_video_frames_undecodable_codec_nulls(spark):
    """avc1 payloads: container fields real, pixel stats NULL (quarantine
    convention) — frame decode is the declared ffmpeg seam."""
    import pandas as pd
    blob = mp4.encode_mp4([b"\x00\x00\x01\x65" + bytes(60)], 64, 48,
                          fourcc=b"avc1")
    pdf = pd.DataFrame({"id": [1], "payload": [blob]})
    df = spark.createDataFrame(pdf)
    from nifi_spark.datalib.multimodal import sample_video_frames
    rows = sample_video_frames(df, every_ms=400).collect()
    assert rows and all(r["px_sum"] is None and r["width"] is None
                        for r in rows)
    assert rows[0]["frame_ts_ms"] == 0


def test_decode_media_stats_jpeg_spark(spark):
    from nifi_spark.datalib.multimodal import decode_media_stats, synthesize_jpeg
    df = spark.range(8).withColumnRenamed("id", "doc_id")
    rows = {r["id"]: r for r in
            decode_media_stats(synthesize_jpeg(df, "doc_id")).collect()}
    for i in range(8):
        wb, hb = 2 + i % 3, 1 + i % 2
        vals = [(i * 7 + b) % 256 for b in range(wb * hb)]
        r = rows[i]
        assert r["mime"] == "image/jpeg"
        assert (r["width"], r["height"], r["channels"]) == (wb * 8, hb * 8, 1)
        assert r["px_sum"] == 64 * sum(vals)
        assert (r["px_min"], r["px_max"]) == (min(vals), max(vals))


def test_extract_features_video_real(spark):
    from nifi_spark.datalib.multimodal import extract_features, synthesize_video
    df = spark.range(2).withColumnRenamed("id", "doc_id")
    rows = extract_features(synthesize_video(df, "doc_id"), dim=8,
                            decode_stub=False).collect()
    for r in rows:
        n = 3 + r["id"] % 4
        assert r["feat"][2] == pytest.approx(float(n))   # sample count
        assert 0.0 < r["feat"][4] < 1.0                  # first-frame mean
