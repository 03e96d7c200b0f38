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


# --------------------------------------------------------- animation


def _anim_frames(W=21, H=13, N=4):
    frames = []
    for t in range(N):
        f = bytearray()
        for y in range(H):
            for x in range(W):
                if t <= x < t + 4 and 3 <= y < 7:
                    f += bytes([255, 10 * t, 0])
                else:
                    f += bytes([(x % 8) * 30, (y % 4) * 60, 30])
        frames.append(bytes(f))
    return frames


def test_animation_delta_roundtrip():
    from nifi_spark.datalib.gif import (decode_gif_frames,
                                        encode_gif_animation,
                                        gif_frame_count)
    W, H = 21, 13
    frames = _anim_frames(W, H, 4)
    blob = encode_gif_animation(W, H, frames,
                                delays_cs=[5, 10, 15, 20])
    sw, sh, got = decode_gif_frames(blob)
    assert (sw, sh) == (W, H)
    assert [d for d, _ in got] == [5, 10, 15, 20]
    assert [r for _, r in got] == frames
    assert gif_frame_count(blob) == 4
    # delta encoding genuinely shrinks vs full frames
    full = encode_gif_animation(W, H, frames, delta=False)
    assert len(blob) < len(full)
    _, _, got_full = decode_gif_frames(full)
    assert [r for _, r in got_full] == frames


def test_animation_unchanged_frame():
    from nifi_spark.datalib.gif import (decode_gif_frames,
                                        encode_gif_animation)
    W, H = 6, 5
    a = bytes([10, 20, 30]) * (W * H)
    b = (bytes([10, 20, 30]) * (W * 2)
         + bytes([200, 0, 0]) * W + bytes([10, 20, 30]) * (W * 2))
    blob = encode_gif_animation(W, H, [a, a, b])
    _, _, got = decode_gif_frames(blob)
    assert [r for _, r in got] == [a, a, b]


def _hand_gif(disposals, transparent_second=False):
    """3-color GCT GIF: frame1 fills 4x3 with color 1; frame2 paints a
    2x1 rect at (1,1) with color 2 (optionally transparent index 0
    in a 2x2 rect so only half paints)."""
    import struct
    W, H = 4, 3
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", W, H, 0x80 | 0x00, 0, 0)  # 2-entry GCT
    out += bytes([9, 9, 9, 200, 100, 50])                  # bg, paint
    from nifi_spark.datalib.gif import _lzw_encode

    def frame(lx, ly, iw, ih, indices, disposal, transparent=None):
        f = bytearray(b"\x21\xF9\x04")
        flags = (disposal << 2) | (1 if transparent is not None else 0)
        f += bytes([flags]) + struct.pack("<H", 7) \
            + bytes([transparent or 0, 0])
        f += b"\x2C" + struct.pack("<HHHHB", lx, ly, iw, ih, 0)
        f.append(2)
        lzw = _lzw_encode(bytes(indices), 2)
        for off in range(0, len(lzw), 255):
            f.append(len(lzw[off:off + 255]))
            f += lzw[off:off + 255]
        f += b"\x00"
        return f

    out += frame(0, 0, W, H, [1] * (W * H), disposals[0])
    if transparent_second:
        out += frame(1, 1, 2, 2, [1, 0, 0, 1], disposals[1],
                     transparent=0)
    else:
        out += frame(1, 1, 2, 1, [0, 0], disposals[1])
    out += frame(0, 0, 1, 1, [1], 0)
    out += b"\x3B"
    return W, H, bytes(out)


def test_disposal_restore_background():
    from nifi_spark.datalib.gif import decode_gif_frames
    W, H, blob = _hand_gif([0, 2])
    _, _, got = decode_gif_frames(blob)
    paint, bg = bytes([200, 100, 50]), bytes([9, 9, 9])
    f2 = got[1][1]
    # frame2 rect painted with color 0 (=bg color 9,9,9)
    assert f2[3 * (1 * W + 1):3 * (1 * W + 3)] == bg * 2
    # frame3: disposal 2 restored the rect to BACKGROUND before drawing
    f3 = got[2][1]
    assert f3[3 * (1 * W + 1):3 * (1 * W + 3)] == bg * 2
    assert f3[0:3] == paint                    # 1x1 repaint at origin
    assert f3[3 * (2 * W):3 * (2 * W) + 3] == paint  # untouched row


def test_disposal_restore_previous_and_transparency():
    from nifi_spark.datalib.gif import decode_gif_frames
    W, H, blob = _hand_gif([0, 3], transparent_second=True)
    _, _, got = decode_gif_frames(blob)
    paint, bg = bytes([200, 100, 50]), bytes([9, 9, 9])
    f2 = got[1][1]
    # transparent index 0 left the canvas (paint) visible; index 1 drew
    assert f2[3 * (1 * W + 1):3 * (1 * W + 2)] == paint   # drew color 1
    assert f2[3 * (1 * W + 2):3 * (1 * W + 3)] == paint   # transparent
    # frame3: disposal 3 restored the full pre-frame canvas
    f3 = got[2][1]
    assert f3[3 * (1 * W + 1):3 * (1 * W + 3)] == paint * 2


# ------------------------------------------------------ quantize_colors


def test_quantize_gray_gradient_closed_form():
    from nifi_spark.datalib.gif import quantize_colors
    h = 4
    rgb = bytes(v for _ in range(h) for x in range(256)
                for v in (x, x, x))
    out = quantize_colors(rgb, 64)
    # uniform 256-gray gradient → boxes of 4 → weighted avg 4*(v//4)+1
    for x in range(256):
        want = 4 * (x // 4) + 1
        assert out[3 * x:3 * x + 3] == bytes([want] * 3)
    assert len(set(zip(out[0::3], out[1::3], out[2::3]))) == 64
    assert quantize_colors(rgb, 64) == out       # deterministic


def test_quantize_passthrough_within_budget():
    from nifi_spark.datalib.gif import quantize_colors
    rgb = bytes(v for x in range(64) for v in ((x % 16) * 17,) * 3)
    assert quantize_colors(rgb, 64) == rgb


def test_quantize_weighted_median_respects_counts():
    from nifi_spark.datalib.gif import quantize_colors
    # 300 black + one pixel each of 299 other grays → 2 colors:
    # the dominant black must sit alone in its box and survive exact
    px = [(0, 0, 0)] * 300 + [(v, v, v) for v in range(1, 300) if v < 256]
    rgb = b"".join(bytes(c) for c in px)
    out = quantize_colors(rgb, 2)
    assert out[:3] == b"\x00\x00\x00"
    assert len(set(zip(out[0::3], out[1::3], out[2::3]))) == 2


def test_encode_gif_truecolor_roundtrip_via_quantizer():
    from nifi_spark.datalib.gif import (decode_gif, encode_gif,
                                        quantize_colors)
    w, h = 256, 3
    rgb = bytearray(v for _ in range(h) for x in range(256)
                    for v in (x, x, x))
    rgb[0:3] = b"\x0a\x14\x1e"                  # 257th distinct color
    rgb = bytes(rgb)
    with pytest.raises(GifError):
        encode_gif(w, h, 3, rgb)                 # >256 colors refused
    blob = encode_gif(w, h, 3, rgb, max_colors=64)
    _, _, _, back = decode_gif(blob)
    assert back == quantize_colors(rgb, 64)      # exact roundtrip


def test_encode_animation_with_quantizer():
    from nifi_spark.datalib.gif import (decode_gif_frames,
                                        encode_gif_animation,
                                        quantize_colors)
    w, h = 256, 2
    frames = [bytes(v for _ in range(h) for x in range(256)
                    for v in ((x + s) % 256,) * 3) for s in (0, 7)]
    blob = encode_gif_animation(w, h, frames, max_colors=32)
    w2, h2, got = decode_gif_frames(blob)
    assert (w2, h2, len(got)) == (w, h, 2)
    for (_delay, raster), src in zip(got, frames):
        assert raster == quantize_colors(src, 32)
