"""GIF codec (datalib/gif.py): LZW roundtrips across width boundaries,
interlace, frame counting, sniff/dispatch, and decode conformance
against the reference repo's own .gif artifacts."""

from __future__ import annotations

import glob
import os
import struct

import pytest

from nifi_spark.datalib.gif import (GifError, _lzw_decode, _lzw_encode,
                                    decode_gif, encode_gif,
                                    gif_frame_count)

_REF_GIF_DIR = ("/root/reference/nifi-nar-bundles/nifi-framework-bundle/"
                "nifi-framework/nifi-web/nifi-web-ui/src/main/webapp")


def _raster(w, h, n_colors):
    px = bytearray()
    for j in range(w * h):
        c = (7 * j) % n_colors
        px += bytes(((c * 31) % 256, (c * 57) % 256, (c * 91) % 256))
    return bytes(px)


@pytest.mark.parametrize("colors", [2, 5, 16, 17, 64, 256])
def test_roundtrip_across_width_boundaries(colors):
    w, h = 40, 30
    px = _raster(w, h, colors)
    got = decode_gif(encode_gif(w, h, 3, px))
    assert got == (w, h, 3, px)


def test_gray_input_and_limits():
    px = bytes(i % 4 for i in range(12 * 10))
    w, h, c, out = decode_gif(encode_gif(12, 10, 1, px))
    assert (w, h, c) == (12, 10, 3)
    assert out == bytes(v for p in px for v in (p, p, p))
    with pytest.raises(GifError, match="256 distinct"):
        rgb = bytes(v for i in range(300)
                    for v in (i % 256, i // 256, 0))
        encode_gif(30, 10, 3, rgb)
    with pytest.raises(GifError, match="not a GIF"):
        decode_gif(b"PNG????")


def test_lzw_table_reset_at_4096():
    # enough distinct runs to overflow the 12-bit table and force a
    # mid-stream CLEAR + rebuild
    idx = bytes((i * 31 + (i >> 3)) % 251 for i in range(30000))
    enc = _lzw_encode(idx, 8)
    assert _lzw_decode(enc, 8, len(idx)) == idx


def test_interlaced_decode():
    # hand-assemble an interlaced GIF: pass-ordered rows, flag 0x40
    w, h = 6, 11
    palette = [(i * 9 % 256, i * 5 % 256, i * 3 % 256) for i in range(8)]
    rows = [bytes(((r * w + x) % 8) for x in range(w)) for r in range(h)]
    order = ([r for r in range(0, h, 8)] + [r for r in range(4, h, 8)]
             + [r for r in range(2, h, 4)] + [r for r in range(1, h, 2)])
    indices = b"".join(rows[r] for r in order)
    gct = b"".join(bytes(c) for c in palette)
    blob = bytearray(b"GIF89a")
    blob += struct.pack("<HHBBB", w, h, 0x80 | (2 << 4) | 2, 0, 0)
    blob += gct
    blob += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, 0x40)
    blob.append(3)
    lzw = _lzw_encode(indices, 3)
    for off in range(0, len(lzw), 255):
        chunk = lzw[off:off + 255]
        blob.append(len(chunk))
        blob += chunk
    blob += b"\x00\x3B"
    w2, h2, c2, px = decode_gif(bytes(blob))
    assert (w2, h2, c2) == (w, h, 3)
    want = b"".join(bytes(palette[i][k] for k in range(3))
                    for r in rows for i in r)
    assert px == want


def test_sniff_and_image_stats_dispatch():
    from nifi_spark.datalib.media_codec import image_stats, sniff_media
    blob = encode_gif(8, 6, 3, _raster(8, 6, 8))
    assert sniff_media(blob) == "image/gif"
    s = image_stats(blob)
    assert (s["width"], s["height"], s["channels"]) == (8, 6, 3)
    px = _raster(8, 6, 8)
    assert s["px_sum"] == sum(px)


@pytest.mark.skipif(not os.path.isdir(_REF_GIF_DIR),
                    reason="reference checkout not present")
def test_reference_artifacts_decode():
    """Decode conformance against third-party-encoded files: the
    reference UI ships real GIFs (incl. multi-frame animations)."""
    files = sorted(glob.glob(os.path.join(_REF_GIF_DIR, "**", "*.gif"),
                             recursive=True))
    assert files, "no reference gifs found"
    decoded = 0
    animated = 0
    for f in files[:25]:
        blob = open(f, "rb").read()
        w, h, c, px = decode_gif(blob)
        assert c == 3 and len(px) == w * h * 3
        if gif_frame_count(blob) > 1:
            animated += 1
        decoded += 1
    assert decoded >= 5
    assert animated >= 1          # iconLoading.gif etc.
