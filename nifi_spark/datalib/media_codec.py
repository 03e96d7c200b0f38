"""Pure-Python (stdlib-only) media codecs: PNG / BMP / PPM / PGM / WAV.

Closes the multimodal "codec = declared stub" seam for every format the
container can actually handle without Pillow/ffmpeg: PNG rides on stdlib
zlib, BMP/PPM/PGM are raw rasters, WAV is RIFF + PCM. Each format has BOTH
an encoder and a decoder so tests and gate rows can prove encode→decode
roundtrips bit-for-bit (the same strategy as the EVTX pack→parse gates).

Decoded images are returned as (width, height, channels, pixels) where
``pixels`` is a flat ``bytes`` of rows top-to-bottom, channels interleaved
— the canonical raster the feature stage consumes regardless of source
format. Audio decodes to (sample_rate, channels, int16-sample list).

Format coverage (and the declared remaining boundary):
* PNG — decode covers every legal (bit depth, color type) pair of spec
  §11.2.2: gray 1/2/4/8/16, RGB 8/16, palette 1/2/4/8 via PLTE (+tRNS
  palette alpha → RGBA), gray+alpha 8/16, RGBA 8/16; all five filter
  types over packed scanlines; 16-bit reduces to the high byte; Adam7
  interlacing decodes as seven reduced images with per-pass strides
  and filter context. The encoder emits 8-bit filter-0 images,
  sequential or Adam7. No declared PNG boundary remains (conformance
  is pinned by decoding all 179 PNGs in the reference tree).
* BMP — 24-bit uncompressed BI_RGB, bottom-up or top-down.
* PPM/PGM — binary P6/P5, maxval 255.
* WAV — PCM 16-bit, any channel count; extra RIFF chunks are skipped.
* JPEG — baseline sequential (SOF0) AND progressive (SOF2)
  encode+decode in datalib/jpeg.py (Huffman entropy coding, numpy IDCT,
  4:2:0/4:2:2 upsampling, restart markers, multi-scan spectral
  selection / successive approximation); registered in the dispatch
  below. Decodes the reference's own simple.jpg / blueBtnBg.jpg test
  artifacts.
* MP4 — real ISO-BMFF mux/demux in datalib/mp4.py (box walk +
  stsz x stsc x stco x stts sample-table join); frame payloads decode for
  codecs this repo implements (PNG-in-MP4); H.264 frames = the remaining
  declared seam (container parse works, frame decode needs ffmpeg).

Reference parity: NiFi 1.1.2 has no image processors in the standard
bundle (media handling rides ExtractMediaMetadata in the media bundle,
nifi-nar-bundles/nifi-media-bundle/.../ExtractMediaMetadata.java which
wraps Tika); this module provides the training-data-pipeline analog the
task brief mandates, with the decode math done here instead of a library.

Scale shape: all functions are plain bytes→tuple transforms, invoked from
Arrow-batched mapInPandas in datalib/multimodal.py — per-partition, no
driver involvement, no Python per-row UDF registration.
"""

from __future__ import annotations

import struct
import zlib

# ---------------------------------------------------------------- PNG

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel (8-bit depth only)
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}
# color type -> SOURCE samples per pixel (before palette expansion)
_PNG_SRC_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# legal bit depths per color type (PNG spec §11.2.2)
_PNG_DEPTHS = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
               4: (8, 16), 6: (8, 16)}


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def encode_png(width: int, height: int, channels: int, pixels: bytes,
               compresslevel: int = 6, interlace: bool = False) -> bytes:
    """Encode a flat raster as an 8-bit PNG (filter 0 on every row).
    `interlace=True` writes Adam7 (spec §8.2): seven reduced images in
    pass order, each with its own scanlines; empty passes emit no
    bytes."""
    if channels not in (1, 3, 4):
        raise ValueError(f"PNG encoder supports 1/3/4 channels, got {channels}")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer size mismatch")
    color_type = {1: 0, 3: 2, 4: 6}[channels]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0,
                       1 if interlace else 0)
    stride = width * channels
    raw = bytearray()
    if interlace:
        for x0, y0, dx, dy in _ADAM7:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            for y in range(ph):
                raw.append(0)          # filter type 0 = None
                oy = y0 + y * dy
                if dx == 1:
                    o = (oy * width + x0) * channels
                    raw += pixels[o:o + pw * channels]
                else:
                    for x in range(pw):
                        o = (oy * width + x0 + x * dx) * channels
                        raw += pixels[o:o + channels]
    else:
        for y in range(height):
            raw.append(0)              # filter type 0 = None
            raw += pixels[y * stride:(y + 1) * stride]
    return (_PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw), compresslevel))
            + _png_chunk(b"IEND", b""))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def decode_png(blob: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG → (width, height, channels, raster).

    Full spec §11.2.2 format coverage: every legal (bit depth, color
    type) pair — gray 1/2/4/8/16, RGB 8/16, palette 1/2/4/8 (PLTE,
    expanded to RGB, or RGBA when a tRNS chunk assigns palette alphas),
    gray+alpha 8/16, RGBA 8/16. Filtering is applied to the PACKED
    scanline bytes (bpp = max(1, bits-per-pixel // 8), spec §9), then
    rows unpack: sub-byte grays scale exactly by 255/(2^d - 1), 16-bit
    samples reduce to their high byte (the standard 8-bit reduction),
    palette indexes expand through PLTE/tRNS. Adam7 interlacing (spec
    §8.2) decodes as seven independent reduced images — each pass has
    its own packed strides and filter context, empty passes contribute
    no bytes — scattered to (x0 + i·dx, y0 + j·dy)."""
    if blob[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, width = 8, None
    height = depth = color_type = 0
    plte: "bytes | None" = None
    trns: "bytes | None" = None
    idat = bytearray()
    while pos + 8 <= len(blob):
        (length,) = struct.unpack_from(">I", blob, pos)
        tag = blob[pos + 4:pos + 8]
        body = blob[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + tag + body + crc
        if tag == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", body)
            if color_type not in _PNG_SRC_CHANNELS:
                raise ValueError(f"unsupported PNG color type {color_type}")
            if depth not in _PNG_DEPTHS[color_type]:
                raise ValueError(f"illegal bit depth {depth} for color "
                                 f"type {color_type}")
            if interlace not in (0, 1):
                raise ValueError(f"bad PNG interlace method {interlace}")
        elif tag == b"PLTE":
            plte = body
        elif tag == b"tRNS":
            trns = body
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if color_type == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE")
    src_ch = _PNG_SRC_CHANNELS[color_type]
    bits_pp = depth * src_ch
    bpp = max(1, bits_pp // 8)
    raw = zlib.decompress(bytes(idat))
    # palette / alpha expansion plan
    if color_type == 3:
        channels = 4 if trns else 3
    else:
        channels = src_ch
    maxval = (1 << depth) - 1
    out = bytearray(width * channels * height)
    if interlace:
        passes = [(x0, y0, dx, dy,
                   (width - x0 + dx - 1) // dx,
                   (height - y0 + dy - 1) // dy)
                  for x0, y0, dx, dy in _ADAM7]
        # empty passes contribute no scanline bytes at all (spec §8.2)
        passes = [p for p in passes if p[4] > 0 and p[5] > 0]
    else:
        passes = [(0, 0, 1, 1, width, height)]
    pos = 0
    for x0, y0, dx, dy, pw, ph in passes:
        stride = (pw * bits_pp + 7) // 8
        need = (stride + 1) * ph
        if pos + need > len(raw):
            raise ValueError("PNG scanline data size mismatch")
        seg = raw[pos:pos + need]
        pos += need
        prev = bytes(stride)
        samples = bytearray(pw * channels)
        for y in range(ph):
            ftype = seg[y * (stride + 1)]
            line = bytearray(seg[y * (stride + 1) + 1:
                                 (y + 1) * (stride + 1)])
            if ftype == 1:    # Sub
                for i in range(bpp, stride):
                    line[i] = (line[i] + line[i - bpp]) & 0xFF
            elif ftype == 2:  # Up
                for i in range(stride):
                    line[i] = (line[i] + prev[i]) & 0xFF
            elif ftype == 3:  # Average
                for i in range(stride):
                    left = line[i - bpp] if i >= bpp else 0
                    line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
            elif ftype == 4:  # Paeth
                for i in range(stride):
                    left = line[i - bpp] if i >= bpp else 0
                    ul = prev[i - bpp] if i >= bpp else 0
                    line[i] = (line[i] + _paeth(left, prev[i], ul)) \
                        & 0xFF
            elif ftype != 0:
                raise ValueError(f"bad PNG filter type {ftype}")
            prev = bytes(line)
            # unpack the filtered packed row into 8-bit pass samples
            if depth == 8 and color_type != 3:
                samples[:] = line
            elif depth == 16:
                for x in range(pw * src_ch):
                    samples[x] = line[2 * x]
            else:
                # depth 1/2/4/8, one source sample per pixel (ct 0 or 3)
                for x in range(pw):
                    if depth == 8:
                        v = line[x]
                    else:
                        bit = x * depth
                        v = (line[bit >> 3]
                             >> (8 - depth - (bit & 7))) & maxval
                    if color_type == 0:
                        samples[x] = v * 255 // maxval
                    else:
                        if 3 * v + 2 >= len(plte):
                            raise ValueError(
                                "palette index out of range")
                        samples[x * channels:x * channels + 3] = \
                            plte[3 * v:3 * v + 3]
                        if channels == 4:
                            samples[x * channels + 3] = (
                                trns[v] if v < len(trns) else 255)
            # scatter the pass row into the full image
            oy = y0 + y * dy
            if dx == 1:
                o = (oy * width + x0) * channels
                out[o:o + pw * channels] = samples
            else:
                for x in range(pw):
                    o = (oy * width + x0 + x * dx) * channels
                    out[o:o + channels] = \
                        samples[x * channels:x * channels + channels]
    if pos != len(raw):
        raise ValueError("PNG scanline data size mismatch")
    return width, height, channels, bytes(out)


# ---------------------------------------------------------------- BMP

def encode_bmp(width: int, height: int, channels: int, pixels: bytes) -> bytes:
    """Encode as a 24-bit uncompressed bottom-up BMP (gray is expanded)."""
    if channels == 1:
        pixels = bytes(v for v in pixels for _ in range(3))
        channels = 3
    if channels == 4:  # drop alpha
        pixels = bytes(v for i, v in enumerate(pixels) if i % 4 != 3)
        channels = 3
    if channels != 3:
        raise ValueError("BMP encoder needs 1/3/4-channel input")
    pad = (-width * 3) % 4
    rows = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up
        row = pixels[y * width * 3:(y + 1) * width * 3]
        # RGB -> BGR
        for x in range(width):
            r, g, b = row[x * 3:x * 3 + 3]
            rows += bytes((b, g, r))
        rows += bytes(pad)
    data_off = 14 + 40
    file_size = data_off + len(rows)
    header = (b"BM" + struct.pack("<IHHI", file_size, 0, 0, data_off)
              + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                            len(rows), 2835, 2835, 0, 0))
    return header + bytes(rows)


def decode_bmp(blob: bytes) -> tuple[int, int, int, bytes]:
    """Decode an uncompressed BMP → (w, h, 3, RGB raster).

    Bit depths 1/4/8 (BGRX palette from the color table after the DIB
    header — the reference's own 16color-10x10.bmp resize fixture is
    4-bit), 24, and 32 (BGRA stored, alpha dropped — BI_RGB 32-bit has
    no meaningful alpha); bottom-up or top-down. RLE stays out."""
    if blob[:2] != b"BM":
        raise ValueError("not a BMP")
    (data_off,) = struct.unpack_from("<I", blob, 10)
    (hdr_size,) = struct.unpack_from("<I", blob, 14)
    if hdr_size < 40:
        # OS/2 BITMAPCOREHEADER: 16-bit dims, 3-byte RGBTRIPLE palette —
        # the absolute-offset reads below would decode garbage silently.
        raise ValueError(f"unsupported BMP DIB header size {hdr_size} "
                         "(BITMAPINFOHEADER-family required)")
    _, width, height = struct.unpack_from("<Iii", blob, 14)
    planes, bpp = struct.unpack_from("<HH", blob, 26)
    (compression,) = struct.unpack_from("<I", blob, 30)
    if bpp not in (1, 4, 8, 24, 32) or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, "
                         f"compression={compression})")
    palette: "list[bytes] | None" = None
    if bpp <= 8:
        (used,) = struct.unpack_from("<I", blob, 46)
        n_colors = used or (1 << bpp)
        pal_off = 14 + hdr_size
        palette = [bytes((blob[pal_off + 4 * i + 2],
                          blob[pal_off + 4 * i + 1],
                          blob[pal_off + 4 * i]))
                   for i in range(n_colors)]
    top_down = height < 0
    height = abs(height)
    row_bits = width * bpp
    stride = ((row_bits + 31) // 32) * 4
    out = bytearray(width * height * 3)
    for row_i in range(height):
        y = row_i if top_down else height - 1 - row_i
        line = blob[data_off + row_i * stride:
                    data_off + (row_i + 1) * stride]
        for x in range(width):
            o = (y * width + x) * 3
            if bpp == 24:
                b, g, r = line[x * 3:x * 3 + 3]
                out[o:o + 3] = bytes((r, g, b))
            elif bpp == 32:
                b, g, r = line[x * 4:x * 4 + 3]
                out[o:o + 3] = bytes((r, g, b))
            else:
                bit = x * bpp
                idx = (line[bit >> 3] >> (8 - bpp - (bit & 7))) \
                    & ((1 << bpp) - 1)
                if idx >= len(palette):
                    raise ValueError("BMP palette index out of range")
                out[o:o + 3] = palette[idx]
    return width, height, 3, bytes(out)


def decode_ico(blob: bytes) -> tuple[int, int, int, bytes]:
    """Decode the largest image of a Windows ICO → (w, h, 4, RGBA).

    Each directory entry is either a PNG (sniffed, delegated) or a DIB:
    a BITMAPINFOHEADER with DOUBLED height covering the XOR (color)
    bitmap and the 1-bit AND (transparency) mask. 32-bit entries take
    alpha from their BGRA bytes; lower depths derive it from the AND
    mask (1 = transparent). The reference's nifi16.ico entries are
    32-bit DIBs."""
    if blob[:4] != b"\x00\x00\x01\x00":
        raise ValueError("not an ICO")
    (count,) = struct.unpack_from("<H", blob, 4)
    if count == 0:
        raise ValueError("empty ICO")
    best = None
    for i in range(count):
        w8, h8, _pal, _res, _planes, _bc, size, off = \
            struct.unpack_from("<BBBBHHII", blob, 6 + 16 * i)
        w, h = w8 or 256, h8 or 256
        if best is None or w * h > best[0] * best[1]:
            best = (w, h, size, off)
    w, h, size, off = best
    sub = blob[off:off + size]
    if sub[:8] == _PNG_SIG:
        return decode_png(sub)
    hdr_size, dw, dh = struct.unpack_from("<Iii", sub, 0)
    planes, bpp = struct.unpack_from("<HH", sub, 12)
    (compression,) = struct.unpack_from("<I", sub, 16)
    if compression != 0 or bpp not in (1, 4, 8, 24, 32):
        raise ValueError(f"unsupported ICO DIB (bpp={bpp}, "
                         f"compression={compression})")
    # dh covers XOR + AND stacked; decode XOR via the BMP path by
    # synthesizing a BMP file around the DIB
    palette_bytes = (0 if bpp > 8 else
                     4 * (struct.unpack_from("<I", sub, 32)[0]
                          or (1 << bpp)))
    xor_stride = ((w * bpp + 31) // 32) * 4
    and_stride = ((w + 31) // 32) * 4
    dib = bytearray(sub)
    struct.pack_into("<i", dib, 8, h)     # un-double the height
    data_off = 14 + hdr_size + palette_bytes
    bmp = (b"BM" + struct.pack("<IHHI", 14 + len(dib), 0, 0, data_off)
           + bytes(dib))
    _, _, _, rgb = decode_bmp(bmp)
    and_off = hdr_size + palette_bytes + xor_stride * h
    out = bytearray(w * h * 4)
    for y in range(h):
        mask_row = sub[and_off + (h - 1 - y) * and_stride:
                       and_off + (h - y) * and_stride]
        for x in range(w):
            o = (y * w + x) * 4
            out[o:o + 3] = rgb[(y * w + x) * 3:(y * w + x) * 3 + 3]
            if bpp == 32:
                # BGRA alpha lives in the XOR bitmap's 4th byte
                row_i = h - 1 - y
                out[o + 3] = sub[hdr_size + palette_bytes
                                 + row_i * xor_stride + x * 4 + 3]
            else:
                transparent = (mask_row[x >> 3] >> (7 - (x & 7))) & 1 \
                    if x >> 3 < len(mask_row) else 0
                out[o + 3] = 0 if transparent else 255
    return w, h, 4, bytes(out)


# ---------------------------------------------------------------- PPM/PGM

def encode_pnm(width: int, height: int, channels: int, pixels: bytes) -> bytes:
    """Encode as binary PPM (P6, 3ch) or PGM (P5, 1ch)."""
    if channels == 3:
        magic = b"P6"
    elif channels == 1:
        magic = b"P5"
    else:
        raise ValueError("PNM supports 1 or 3 channels")
    return magic + f"\n{width} {height}\n255\n".encode() + pixels


def decode_pnm(blob: bytes) -> tuple[int, int, int, bytes]:
    """Decode binary P5/P6 (maxval 255, '#' comments allowed)."""
    if blob[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary PGM/PPM")
    channels = 3 if blob[:2] == b"P6" else 1
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(blob) and blob[pos:pos + 1].isspace():
            pos += 1
        if blob[pos:pos + 1] == b"#":
            while pos < len(blob) and blob[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(blob) and not blob[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(blob[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported PNM maxval {maxval}")
    n = width * height * channels
    return width, height, channels, blob[pos:pos + n]


# ---------------------------------------------------------------- WAV

def encode_wav(sample_rate: int, channels: int, samples: list[int]) -> bytes:
    """Encode interleaved int16 samples as PCM WAV."""
    body = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate,
                      channels * 2, 16)
    riff = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(body)) + body)
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def decode_wav(blob: bytes) -> tuple[int, int, list[int]]:
    """Decode PCM-16 WAV → (sample_rate, channels, interleaved samples).

    Walks RIFF chunks explicitly (LIST/INFO etc. are skipped) rather than
    assuming the canonical 44-byte layout.
    """
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    sample_rate = channels = bits = None
    data = None
    while pos + 8 <= len(blob):
        tag = blob[pos:pos + 4]
        (length,) = struct.unpack_from("<I", blob, pos + 4)
        body = blob[pos + 8:pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            fmt_code, channels, sample_rate, _, _, bits = \
                struct.unpack_from("<HHIIHH", body)
            if fmt_code != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV (fmt={fmt_code}, bits={bits}) — PCM16 only")
        elif tag == b"data":
            data = body
    if sample_rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    n = len(data) // 2
    return sample_rate, channels, list(struct.unpack(f"<{n}h", data[:n * 2]))


# ---------------------------------------------------------------- sniff + dispatch

def sniff_media(blob: bytes) -> str:
    """MIME sniff over the magic bytes of the supported formats."""
    if blob[:8] == _PNG_SIG:
        return "image/png"
    if blob[:3] == b"\xFF\xD8\xFF":
        return "image/jpeg"
    if blob[:2] == b"BM":
        return "image/bmp"
    if blob[:2] == b"P6":
        return "image/x-portable-pixmap"
    if blob[:2] == b"P5":
        return "image/x-portable-graymap"
    if blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
        return "audio/wav"
    if blob[4:8] == b"ftyp":
        return "video/mp4"
    if blob[:6] in (b"GIF87a", b"GIF89a"):
        return "image/gif"
    if blob[:4] == b"\x00\x00\x01\x00":
        return "image/x-icon"
    if blob[:3] == b"ID3" or (len(blob) > 1 and blob[0] == 0xFF
                              and blob[1] & 0xE0 == 0xE0):
        return "audio/mpeg"
    if blob[:4] == b"OggS":
        return "audio/ogg"
    return "application/octet-stream"


def _decode_jpeg(blob: bytes) -> tuple[int, int, int, bytes]:
    from nifi_spark.datalib.jpeg import decode_jpeg
    return decode_jpeg(blob)


def _decode_gif(blob: bytes) -> tuple[int, int, int, bytes]:
    from nifi_spark.datalib.gif import decode_gif
    return decode_gif(blob)


_IMAGE_DECODERS = {
    "image/png": decode_png,
    "image/jpeg": _decode_jpeg,
    "image/bmp": decode_bmp,
    "image/x-portable-pixmap": decode_pnm,
    "image/x-portable-graymap": decode_pnm,
    "image/gif": _decode_gif,
    "image/x-icon": decode_ico,
}


def decode_image(blob: bytes) -> tuple[int, int, int, bytes]:
    """Sniff + decode any supported image format to the canonical raster."""
    mime = sniff_media(blob)
    dec = _IMAGE_DECODERS.get(mime)
    if dec is None:
        raise ValueError(f"no image decoder for {mime}")
    return dec(blob)


def image_stats(blob: bytes) -> dict:
    """Decode + integer-exact raster stats (oracle-friendly: no floats).

    Returns per-image: width, height, channels, and over all samples the
    sum / min / max — integers, so a SQL oracle that regenerates the same
    raster matches bit-for-bit.
    """
    w, h, c, px = decode_image(blob)
    return {"mime": sniff_media(blob), "width": w, "height": h,
            "channels": c, "px_sum": sum(px), "px_min": min(px),
            "px_max": max(px), "n_bytes": len(px)}


def audio_stats(blob: bytes) -> dict:
    """Decode + integer-exact PCM stats (sum of abs, peak, counts)."""
    rate, ch, samples = decode_wav(blob)
    n_frames = len(samples) // ch if ch else 0
    return {"mime": "audio/wav", "sample_rate": rate, "channels": ch,
            "n_samples": len(samples),
            "duration_ms": (n_frames * 1000) // rate if rate else 0,
            "abs_sum": sum(abs(s) for s in samples),
            "peak": max((abs(s) for s in samples), default=0)}


def resize_raster(width: int, height: int, channels: int, pixels: bytes,
                  dst_w: int, dst_h: int,
                  algorithm: str = "nearest") -> bytes:
    """Resize a flat interleaved raster — the ResizeImage core
    (nifi-media-bundle/.../image/ResizeImage.java:69-105: width/height
    properties + Scaling Algorithm).

    `nearest` uses the floor mapping src = (dst * src_dim) // dst_dim —
    pure integer arithmetic, so a SQL oracle can regenerate the resized
    raster from the source formula bit-for-bit. `bilinear` is the
    quality path (float sample-center mapping, half-up rounding); its
    output is deterministic but not SQL-regenerable, so it is
    pytest-verified against a numpy reference instead of gate-verified.
    """
    import numpy as np
    src = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, channels)
    if algorithm == "nearest":
        xs = (np.arange(dst_w) * width) // dst_w
        ys = (np.arange(dst_h) * height) // dst_h
        out = src[ys][:, xs]
    elif algorithm == "bilinear":
        # sample-center mapping (the standard align-corners=False form)
        xs = np.clip((np.arange(dst_w) + 0.5) * width / dst_w - 0.5, 0, width - 1)
        ys = np.clip((np.arange(dst_h) + 0.5) * height / dst_h - 0.5, 0, height - 1)
        x0 = np.floor(xs).astype(int); y0 = np.floor(ys).astype(int)
        x1 = np.minimum(x0 + 1, width - 1); y1 = np.minimum(y0 + 1, height - 1)
        fx = (xs - x0)[None, :, None]; fy = (ys - y0)[:, None, None]
        s = src.astype(np.float64)
        top = s[y0][:, x0] * (1 - fx) + s[y0][:, x1] * fx
        bot = s[y1][:, x0] * (1 - fx) + s[y1][:, x1] * fx
        out = np.floor(top * (1 - fy) + bot * fy + 0.5).astype(np.uint8)
    else:
        raise ValueError(f"unknown scaling algorithm {algorithm!r}")
    return out.tobytes()
