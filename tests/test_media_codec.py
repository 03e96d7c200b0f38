"""Pure-Python media codecs (PNG/BMP/PPM/PGM/WAV) + the Spark decode path.

Roundtrip strategy mirrors the EVTX tests: encode with our own encoder,
decode with our own decoder, assert byte equality — plus hand-built PNGs
exercising every filter type the encoder never emits, and malformed-input
error paths (the quarantine contract of decode_media_stats).
"""

from __future__ import annotations

import os
import random
import struct
import zlib

import pytest
from pyspark.sql import functions as F

from nifi_spark.datalib import media_codec as mc


def _raster(w, h, c, seed=0):
    rng = random.Random(seed)
    return bytes(rng.randrange(256) for _ in range(w * h * c))


# ------------------------------------------------------------- roundtrips

@pytest.mark.parametrize("channels", [1, 3, 4])
def test_png_roundtrip(channels):
    w, h = 13, 9
    px = _raster(w, h, channels, seed=channels)
    blob = mc.encode_png(w, h, channels, px)
    assert mc.sniff_media(blob) == "image/png"
    assert mc.decode_png(blob) == (w, h, channels, px)
    assert mc.decode_image(blob) == (w, h, channels, px)


def test_bmp_roundtrip_and_padding():
    # width 10 -> stride 30 -> 2 pad bytes/row: exercises row padding
    w, h = 10, 7
    px = _raster(w, h, 3, seed=2)
    blob = mc.encode_bmp(w, h, 3, px)
    assert mc.sniff_media(blob) == "image/bmp"
    assert mc.decode_bmp(blob) == (w, h, 3, px)


def test_bmp_gray_and_alpha_inputs_normalize_to_rgb():
    w, h = 4, 3
    gray = _raster(w, h, 1, seed=3)
    dw, dh, dc, dpx = mc.decode_bmp(mc.encode_bmp(w, h, 1, gray))
    assert (dw, dh, dc) == (w, h, 3)
    assert dpx == bytes(v for v in gray for _ in range(3))
    rgba = _raster(w, h, 4, seed=4)
    _, _, _, dpx = mc.decode_bmp(mc.encode_bmp(w, h, 4, rgba))
    assert dpx == bytes(v for i, v in enumerate(rgba) if i % 4 != 3)


@pytest.mark.parametrize("channels,mime", [
    (1, "image/x-portable-graymap"), (3, "image/x-portable-pixmap")])
def test_pnm_roundtrip(channels, mime):
    w, h = 6, 5
    px = _raster(w, h, channels, seed=channels)
    blob = mc.encode_pnm(w, h, channels, px)
    assert mc.sniff_media(blob) == mime
    assert mc.decode_pnm(blob) == (w, h, channels, px)


def test_pnm_comment_header():
    px = _raster(2, 2, 3)
    blob = b"P6\n# a comment line\n2 2\n255\n" + px
    assert mc.decode_pnm(blob) == (2, 2, 3, px)


def test_wav_roundtrip_and_extra_chunk():
    samples = [((j * 13) % 4001) - 2000 for j in range(250)]
    blob = mc.encode_wav(8000, 2, samples)
    assert mc.sniff_media(blob) == "audio/wav"
    assert mc.decode_wav(blob) == (8000, 2, samples)
    # splice a LIST chunk (odd length -> word-align pad) before data:
    # the RIFF walker must skip it
    head, fmt_and_rest = blob[:12], blob[12:]
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = head + extra + fmt_and_rest
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    assert mc.decode_wav(spliced) == (8000, 2, samples)


# ------------------------------------------------- PNG filters 1-4 decode

def _png_with_filters(w, h, c, px, filters):
    """Hand-build a PNG whose rows use the given filter types."""
    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    def paeth(a, b, cc):
        p = a + b - cc
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else cc)

    stride = w * c
    raw, prev = bytearray(), bytes(stride)
    for y in range(h):
        line = px[y * stride:(y + 1) * stride]
        f = filters[y % len(filters)]
        enc = bytearray()
        for i in range(stride):
            left = line[i - c] if i >= c else 0
            up, ul = prev[i], (prev[i - c] if i >= c else 0)
            pred = {0: 0, 1: left, 2: up, 3: (left + up) >> 1,
                    4: paeth(left, up, ul)}[f]
            enc.append((line[i] - pred) & 0xFF)
        raw.append(f)
        raw += enc
        prev = line
    color = {1: 0, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b""))


@pytest.mark.parametrize("filters", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_png_decode_all_filter_types(filters):
    w, h, c = 7, 6, 3
    px = _raster(w, h, c, seed=sum(filters))
    assert mc.decode_png(_png_with_filters(w, h, c, px, filters)) == (w, h, c, px)


# ----------------------------------------------------------- error paths

def test_unsupported_inputs_raise():
    with pytest.raises(ValueError):
        mc.decode_png(b"\x89PNG\r\n\x1a\ngarbage")
    with pytest.raises(ValueError):
        mc.decode_image(b"\xff\xd8\xff\xe0 jpeg-ish")  # no JPEG decoder
    with pytest.raises(ValueError):
        mc.decode_wav(b"RIFF\x00\x00\x00\x00AVI ")  # not WAVE
    # Adam7 interlace is supported (r5); an UNKNOWN interlace method
    # still fails loudly
    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))
    ihdr_il = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 2)
    with pytest.raises(ValueError, match="interlace method"):
        mc.decode_png(b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr_il))
    # an ILLEGAL depth/color-type pair still gets a clear message
    ihdr_bad = struct.pack(">IIBBBBB", 2, 2, 4, 2, 0, 0, 0)
    with pytest.raises(ValueError, match="bit depth"):
        mc.decode_png(b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr_bad))


def test_image_stats_integer_exact():
    w, h = 9, 8
    px = bytes((5 + 3 * k) % 256 for k in range(w * h * 3))
    st = mc.image_stats(mc.encode_png(w, h, 3, px))
    assert st["px_sum"] == sum(px) and st["px_min"] == min(px)
    assert (st["width"], st["height"], st["channels"]) == (w, h, 3)


# --------------------------------------------------------- Spark plumbing

def test_decode_media_stats_spark(spark):
    from nifi_spark.datalib.multimodal import (decode_media_stats,
                                               synthesize_media)
    ids = spark.range(0, 20).select(F.col("id"))
    stats = decode_media_stats(synthesize_media(ids, "id")).collect()
    assert len(stats) == 20
    by_id = {r["id"]: r for r in stats}
    for i in range(20):
        r = by_id[i]
        if i % 2 == 0:
            w, h = 8 + i % 5, 6 + i % 4
            exp = [(i + 3 * k) % 256 for k in range(w * h * 3)]
            assert (r["width"], r["height"], r["channels"]) == (w, h, 3)
            assert r["px_sum"] == sum(exp) and r["px_max"] == max(exp)
            assert r["mime"] == ["image/png", "image/bmp",
                                 "image/x-portable-pixmap"][i % 3]
        else:
            ch, frames = 1 + i % 2, 64 + i % 37
            exp = [abs((i * 17 + 13 * j) % 4001 - 2000)
                   for j in range(ch * frames)]
            assert r["n_samples"] == ch * frames
            assert r["abs_sum"] == sum(exp) and r["peak"] == max(exp)
            assert r["duration_ms"] == frames * 1000 // 8000


def test_decode_media_stats_quarantines_bad_payloads(spark):
    bad = spark.createDataFrame(
        [(1, "image", bytearray(b"\x89PNG\r\n\x1a\nbroken")),
         (2, "other", bytearray(b"not media at all"))],
        "id long, kind string, payload binary")
    from nifi_spark.datalib.multimodal import decode_media_stats
    rows = {r["id"]: r for r in decode_media_stats(bad).collect()}
    assert rows[1]["mime"] == "image/png" and rows[1]["width"] is None
    assert rows[2]["mime"] == "application/octet-stream"
    assert rows[2]["px_sum"] is None and rows[2]["abs_sum"] is None


def test_extract_features_real_decode(spark):
    """decode_stub=False now REALLY decodes the supported formats."""
    from nifi_spark.datalib.multimodal import (extract_features,
                                               synthesize_media)
    ids = spark.range(0, 8)
    media = synthesize_media(ids, "id")
    feats = {r["id"]: r["feat"]
             for r in extract_features(media, dim=8,
                                       decode_stub=False).collect()}
    # image row 0: w=8,h=6 -> feat[0]=8/4096, feat[2]=3 channels
    assert abs(feats[0][0] - 8 / 4096) < 1e-9 and feats[0][2] == 3.0
    # audio row 1: rate 8000 -> feat[0]=8000/48000, feat[1]=channels
    assert abs(feats[1][0] - 8000 / 48000) < 1e-6 and feats[1][1] == 2.0
    # JPEG is now a REAL decoder (datalib/jpeg.py): a valid file decodes…
    from nifi_spark.datalib.jpeg import encode_jpeg
    jpeg_blob = encode_jpeg(8, 8, 1, bytes([77] * 64), quant=1)
    jpeg = spark.createDataFrame(
        [(9, "image", bytearray(jpeg_blob))],
        "id long, kind string, payload binary")
    feats = extract_features(jpeg, dim=4, decode_stub=False).collect()
    assert feats[0]["feat"][2] == 1.0  # grayscale channel count
    # …a truncated one fails with the codec's own error…
    bad = spark.createDataFrame(
        [(10, "image", bytearray(b"\xff\xd8\xff\xe0fake-jpeg"))],
        "id long, kind string, payload binary")
    with pytest.raises(Exception, match="SOF|marker|JPEG"):
        extract_features(bad, dim=4, decode_stub=False).collect()
    # …and a format with no sandbox decoder still raises the declared seam
    unknown = spark.createDataFrame(
        [(11, "audio", bytearray(b"OggS\x00opus-ish"))],
        "id long, kind string, payload binary")
    with pytest.raises(Exception, match="ffmpeg|NotImplemented"):
        extract_features(unknown, dim=4, decode_stub=False).collect()


def _mk_png(width, height, depth, ct, rows, plte=None, trns=None):
    """Hand-build a PNG from PACKED scanline rows (filter 0)."""
    import struct as _s
    import zlib as _z
    from nifi_spark.datalib.media_codec import _png_chunk
    ihdr = _s.pack(">IIBBBBB", width, height, depth, ct, 0, 0, 0)
    raw = b"".join(b"\x00" + r for r in rows)
    out = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _png_chunk(b"PLTE", plte)
    if trns is not None:
        out += _png_chunk(b"tRNS", trns)
    out += _png_chunk(b"IDAT", _z.compress(raw))
    return out + _png_chunk(b"IEND", b"")


def test_png_palette_decode_with_and_without_trns():
    from nifi_spark.datalib.media_codec import decode_png
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])   # R G B
    rows = [bytes([0, 1, 2]), bytes([2, 1, 0])]
    w, h, ch, px = decode_png(_mk_png(3, 2, 8, 3, rows, plte=plte))
    assert (w, h, ch) == (3, 2, 3)
    assert px[:9] == plte
    # tRNS: palette 0 transparent, rest default 255
    w, h, ch, px = decode_png(_mk_png(3, 2, 8, 3, rows, plte=plte,
                                      trns=bytes([0])))
    assert ch == 4
    assert px[3] == 0 and px[7] == 255


def test_png_sub_byte_gray_scaling():
    from nifi_spark.datalib.media_codec import decode_png
    # 1-bit: 0b10110000 -> pixels 1,0,1,1 scaled to 255/0
    w, h, ch, px = decode_png(_mk_png(4, 1, 1, 0, [bytes([0b10110000])]))
    assert (w, h, ch) == (4, 1, 1)
    assert list(px) == [255, 0, 255, 255]
    # 2-bit: 0b00011011 -> 0,1,2,3 -> 0,85,170,255
    w, h, ch, px = decode_png(_mk_png(4, 1, 2, 0, [bytes([0b00011011])]))
    assert list(px) == [0, 85, 170, 255]
    # 4-bit: 0x0F 0xA0 -> 0,15,10 (width 3 leaves 4 pad bits)
    w, h, ch, px = decode_png(_mk_png(3, 1, 4, 0, [bytes([0x0F, 0xA0])]))
    assert list(px) == [0, 255, 170]


def test_png_16bit_and_gray_alpha():
    from nifi_spark.datalib.media_codec import decode_png
    # 16-bit gray: samples 0x1234, 0xFF00 -> high bytes 0x12, 0xFF
    row = bytes([0x12, 0x34, 0xFF, 0x00])
    w, h, ch, px = decode_png(_mk_png(2, 1, 16, 0, [row]))
    assert (ch, list(px)) == (1, [0x12, 0xFF])
    # 8-bit gray+alpha passes through as 2 channels
    w, h, ch, px = decode_png(_mk_png(2, 1, 8, 4,
                                      [bytes([10, 20, 30, 40])]))
    assert (ch, list(px)) == (2, [10, 20, 30, 40])
    # 16-bit RGB
    rgb = bytes([0xAA, 0x01, 0xBB, 0x02, 0xCC, 0x03])
    w, h, ch, px = decode_png(_mk_png(1, 1, 16, 2, [rgb]))
    assert (ch, list(px)) == (3, [0xAA, 0xBB, 0xCC])


REF_PNG_ROOT = "/root/reference"


@pytest.mark.skipif(not os.path.isdir(REF_PNG_ROOT),
                    reason="reference repo absent")
def test_png_decodes_every_reference_png():
    """Conformance: every PNG the reference ships (179 files spanning
    1/2-bit gray, palette, gray+alpha, 16-bit, RGBA) decodes to a
    raster of exactly width*height*channels bytes."""
    from nifi_spark.datalib.media_codec import decode_png
    n = 0
    for root, _, files in os.walk(REF_PNG_ROOT):
        for f in files:
            if not f.endswith(".png"):
                continue
            blob = open(os.path.join(root, f), "rb").read()
            w, h, ch, px = decode_png(blob)
            assert len(px) == w * h * ch, f
            n += 1
    assert n >= 170, n


def test_bmp_paletted_and_32bit():
    from nifi_spark.datalib.media_codec import decode_bmp
    # 4-bit paletted 3x2, palette: black, red, green, blue
    pal = bytes([0, 0, 0, 0,  0, 0, 255, 0,  0, 255, 0, 0,  255, 0, 0, 0])
    # rows bottom-up; 3 px/row -> 2 nibble bytes, padded to 4
    rows = bytes([0x12, 0x30, 0, 0,     # bottom row: 1,2,3
                  0x01, 0x20, 0, 0])    # top row: 0,1,2
    hdr = (b"BM" + struct.pack("<IHHI", 14 + 40 + 16 + 8, 0, 0, 70)
           + struct.pack("<IiiHHIIiiII", 40, 3, 2, 1, 4, 0, 8,
                         0, 0, 4, 0))
    w, h, c, px = decode_bmp(hdr + pal + rows)
    assert (w, h, c) == (3, 2, 3)
    assert px[:9] == bytes([0, 0, 0, 255, 0, 0, 0, 255, 0])   # top row
    assert px[9:] == bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    # 32-bit BGRA, 1x1, alpha ignored
    hdr32 = (b"BM" + struct.pack("<IHHI", 14 + 40 + 4, 0, 0, 54)
             + struct.pack("<IiiHHIIiiII", 40, 1, 1, 1, 32, 0, 4,
                           0, 0, 0, 0))
    w, h, c, px = decode_bmp(hdr32 + bytes([10, 20, 30, 99]))
    assert (c, list(px)) == (3, [30, 20, 10])


REF_MEDIA = "/root/reference/nifi-nar-bundles/nifi-media-bundle"


@pytest.mark.skipif(not os.path.isdir(REF_PNG_ROOT),
                    reason="reference repo absent")
def test_reference_image_assets_all_decode():
    """Every image asset the reference ships — png/gif/jpg/bmp/ico —
    decodes through the sniffer dispatch (incl. its 4-bit paletted BMP
    resize fixture and the 32-bit nifi16.ico with AND-mask alpha)."""
    from nifi_spark.datalib.media_codec import decode_image, sniff_media
    counts: dict = {}
    for root, _, files in os.walk(REF_PNG_ROOT):
        for f in files:
            if f.rsplit(".", 1)[-1].lower() not in (
                    "png", "gif", "jpg", "jpeg", "bmp", "ico"):
                continue
            blob = open(os.path.join(root, f), "rb").read()
            mime = sniff_media(blob)
            w, h, ch, px = decode_image(blob)
            assert len(px) == w * h * ch, f
            counts[mime] = counts.get(mime, 0) + 1
    assert counts.get("image/x-icon", 0) >= 2
    assert counts.get("image/bmp", 0) >= 1
    assert counts.get("image/gif", 0) >= 8
    assert counts.get("image/jpeg", 0) >= 3
    # the media bundle's PCM fixture decodes too (44.1 kHz stereo)
    wav = open(os.path.join(
        REF_MEDIA, "nifi-media-processors/src/test/resources/"
        "testWAV.wav"), "rb").read()
    from nifi_spark.datalib.media_codec import decode_wav
    rate, nch, samples = decode_wav(wav)
    assert (rate, nch) == (44100, 2) and len(samples) == 1920


# ------------------------------------------------------- PNG Adam7

def test_png_adam7_roundtrip_all_shapes():
    """Adam7 encode→decode is identity across sizes that exercise
    empty passes (<8 px), ragged pass widths, and every channel
    count."""
    rng = random.Random(7)
    for w, h in [(1, 1), (2, 2), (3, 5), (7, 7), (8, 8), (9, 10),
                 (16, 17), (31, 4)]:
        for ch in (1, 3, 4):
            px = bytes(rng.randrange(256) for _ in range(w * h * ch))
            blob = mc.encode_png(w, h, ch, px, interlace=True)
            assert blob[28] == 1          # IHDR interlace flag
            got = mc.decode_png(blob)
            assert got == (w, h, ch, px), (w, h, ch)
            # differential: interlaced and sequential decodes agree
            seq = mc.decode_png(mc.encode_png(w, h, ch, px))
            assert got == seq


def test_png_adam7_pass_structure():
    """The encoder's pass layout matches spec §8.2: pixel (x, y) of an
    8x8 tile belongs to the documented pass, proven by decoding a
    raster whose value encodes its coordinate."""
    w = h = 8
    px = bytes((y * w + x) for y in range(h) for x in range(w))
    blob = mc.encode_png(w, h, 1, px, interlace=True)
    # strip IDAT, check raw pass sizes: 1+1, 1+1, 2+1... per row
    sizes = []
    raw = zlib.decompress(
        blob[blob.index(b"IDAT") + 4:blob.rindex(b"IEND") - 8])
    # pass dims for 8x8: (1x1),(1x1),(2x1),(2x2),(4x2),(4x4),(8x4)
    expect_rows = [(1, 1), (1, 1), (2, 1), (2, 2), (4, 2), (4, 4),
                   (8, 4)]
    pos = 0
    for pw, ph in expect_rows:
        for _ in range(ph):
            assert raw[pos] == 0
            pos += 1 + pw
        sizes.append((pw, ph))
    assert pos == len(raw)
    assert mc.decode_png(blob)[3] == px


def test_png_adam7_sub_byte_gray():
    """A hand-packed 1-bit gray interlaced PNG: each pass has its own
    packed stride ((pw*depth+7)//8), and sub-byte samples scale
    255/(2^d-1) exactly."""
    w = h = 9
    bit = lambda x, y: (x + y) % 2            # checkerboard
    passes = []
    for x0, y0, dx, dy in mc._ADAM7:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        stride = (pw + 7) // 8
        rows = bytearray()
        for j in range(ph):
            rows.append(0)
            packed = bytearray(stride)
            for i in range(pw):
                if bit(x0 + i * dx, y0 + j * dy):
                    packed[i >> 3] |= 0x80 >> (i & 7)
            rows += packed
        passes.append(bytes(rows))
    ihdr = struct.pack(">IIBBBBB", w, h, 1, 0, 0, 0, 1)
    blob = (b"\x89PNG\r\n\x1a\n"
            + mc._png_chunk(b"IHDR", ihdr)
            + mc._png_chunk(b"IDAT",
                            zlib.compress(b"".join(passes)))
            + mc._png_chunk(b"IEND", b""))
    got = mc.decode_png(blob)
    want = bytes(255 * bit(x, y) for y in range(h) for x in range(w))
    assert got == (w, h, 1, want)
