"""GIF87a/89a codec — pure stdlib, real LZW both directions.

Closes the GIF member of the media seam (the reference ships GIF
fixtures through IdentifyMimeType and its image viewer bundle renders
them; here decode feeds the same canonical raster the PNG/BMP/JPEG
decoders produce, so image_stats/resize compose unchanged).

Scope: GIFs end-to-end — header, logical screen descriptor,
global/local color tables, interlaced and sequential scan order,
graphic-control/comment/application extensions, variable-width
LSB-first LZW (3..12-bit codes, table growth, CLEAR reset, EOI).
`decode_gif` returns the FIRST frame as (w, h, 3, raster);
`decode_gif_frames` composes the full ANIMATION onto the logical
screen (GCE delays, transparency, disposal 0/1 leave / 2
restore-to-background / 3 restore-to-previous, per-frame local color
tables). `encode_gif_animation` writes animations with per-frame
LOCAL palettes and minimal-bounding-rect frame deltas (plus the
NETSCAPE2.0 loop extension). `encode_gif` palettizes a single raster;
truecolor input quantizes through `quantize_colors` (deterministic
integer median-cut) when `max_colors` is passed — without it both
encoders refuse >256 distinct colors per frame (GIF's own limit).
With the quantizer the GIF scope is closed end-to-end.
"""

from __future__ import annotations

import struct


class GifError(ValueError):
    pass


# ------------------------------------------------------------- LZW


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # bit reader: LSB-first across the concatenated sub-block bytes
    acc = 0
    nbits = 0
    pos = 0

    def init_table():
        return {i: bytes([i]) for i in range(clear)}

    table = init_table()
    next_code = eoi + 1
    width = min_code_size + 1
    prev: "bytes | None" = None
    while len(out) < n_pixels:
        while nbits < width:
            if pos >= len(data):
                return bytes(out)       # truncated stream: best effort
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = init_table()
            next_code = eoi + 1
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + prev[:1]
        else:
            raise GifError(f"bad LZW code {code}")
        out += entry
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    return bytes(out)


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    run = b""
    for b in indices:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        if next_code < 4096:
            table[cand] = next_code
            # GIF encoders grow the width when the NEXT code to assign
            # no longer fits (deferred-clear variant: reset at 4096)
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        run = bytes([b])
    if run:
        emit(table[run], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ------------------------------------------------------------ encode


def quantize_colors(rgb: bytes, max_colors: int = 256) -> bytes:
    """Median-cut color quantization (Heckbert 1982) in pure integer
    arithmetic: distinct colors are recursively split along the box's
    widest channel at the pixel-count-weighted median until
    `max_colors` boxes exist; every pixel maps to its box's weighted
    integer-average color. Deterministic — ties pick the lowest box
    index / lowest channel; colors sort by (split channel, full
    tuple); averages floor-divide — so a uniform 256-gray gradient
    quantized to 64 colors lands EXACTLY on 4*(v//4)+1 (the closed
    form the gate oracle replays). Rasters already within the budget
    pass through unchanged."""
    from collections import Counter

    if not 1 <= max_colors <= 256:
        raise GifError("max_colors must be 1..256")
    counts = Counter(zip(rgb[0::3], rgb[1::3], rgb[2::3]))
    if len(counts) <= max_colors:
        return rgb

    def ranges(box: list) -> list[int]:
        return [max(c[ch] for c in box) - min(c[ch] for c in box)
                for ch in range(3)]

    boxes: list[list] = [sorted(counts)]
    while len(boxes) < max_colors:
        widths = [max(ranges(b)) if len(b) > 1 else -1 for b in boxes]
        bi = max(range(len(boxes)), key=lambda j: (widths[j], -j))
        if widths[bi] <= 0:
            break                       # every box is a single color
        box = boxes[bi]
        r = ranges(box)
        ch = r.index(max(r))
        box.sort(key=lambda c: (c[ch], c))
        total = sum(counts[c] for c in box)
        cum, cut = 0, len(box) - 1
        for i, c in enumerate(box):
            cum += counts[c]
            if 2 * cum >= total:
                cut = i + 1
                break
        cut = min(max(cut, 1), len(box) - 1)
        boxes[bi] = box[:cut]
        boxes.append(box[cut:])

    mapping: dict = {}
    for box in boxes:
        total = sum(counts[c] for c in box)
        avg = bytes(sum(c[ch] * counts[c] for c in box) // total
                    for ch in range(3))
        for c in box:
            mapping[c] = avg
    return b"".join(mapping[c]
                    for c in zip(rgb[0::3], rgb[1::3], rgb[2::3]))


def encode_gif(width: int, height: int, channels: int, pixels: bytes,
               *, max_colors: "int | None" = None) -> bytes:
    """Raster → single-frame GIF89a. channels 1 (gray) or 3 (RGB).
    With `max_colors` the raster is median-cut-quantized first;
    without it, >256 distinct colors raise (GIF's palette limit)."""
    if channels == 1:
        rgb = bytes(v for p in pixels for v in (p, p, p))
    elif channels == 3:
        rgb = pixels
    else:
        raise GifError(f"channels must be 1 or 3, got {channels}")
    if len(rgb) != width * height * 3:
        raise GifError("pixel buffer does not match dimensions")
    if max_colors is not None:
        rgb = quantize_colors(rgb, max_colors)
    palette: dict[bytes, int] = {}
    indices = bytearray()
    for i in range(0, len(rgb), 3):
        col = rgb[i:i + 3]
        idx = palette.get(col)
        if idx is None:
            if len(palette) == 256:
                raise GifError(">256 distinct colors — palettize first")
            idx = len(palette)
            palette[col] = idx
        indices.append(idx)
    bits = max(1, (len(palette) - 1).bit_length())
    table_size = 1 << bits
    gct = bytearray()
    for col in palette:
        gct += col
    gct += b"\x00" * (3 * (table_size - len(palette)))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height,
                       0x80 | ((bits - 1) << 4) | (bits - 1), 0, 0)
    out += gct
    out += b"\x2C" + struct.pack("<HHHHB", 0, 0, width, height, 0)
    mcs = max(2, bits)
    out.append(mcs)
    lzw = _lzw_encode(bytes(indices), mcs)
    for off in range(0, len(lzw), 255):
        block = lzw[off:off + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3B"
    return bytes(out)


# ------------------------------------------------------------ decode

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(blob: bytes) -> tuple[int, int, int, bytes]:
    """First frame → (width, height, 3, RGB raster)."""
    w, h, _nf, raster = _parse_gif(blob, want_pixels=True)
    return w, h, 3, raster


def gif_frame_count(blob: bytes) -> int:
    return _parse_gif(blob, want_pixels=False)[2]


def _parse_gif(blob: bytes, want_pixels: bool
               ) -> tuple[int, int, int, bytes]:
    if blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifError("not a GIF")
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", blob[6:13])
    pos = 13
    gct = b""
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = blob[pos:pos + 3 * n]
        pos += 3 * n
    frames = 0
    first: "bytes | None" = None
    fw = fh = 0
    while pos < len(blob):
        b0 = blob[pos]
        pos += 1
        if b0 == 0x3B:                      # trailer
            break
        if b0 == 0x21:                      # extension: skip sub-blocks
            pos += 1                        # label
            while blob[pos] != 0:
                pos += 1 + blob[pos]
            pos += 1
            continue
        if b0 != 0x2C:
            raise GifError(f"unexpected block 0x{b0:02x}")
        lx, ly, iw, ih, iflags = struct.unpack("<HHHHB",
                                               blob[pos:pos + 9])
        pos += 9
        lct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            lct = blob[pos:pos + 3 * n]
            pos += 3 * n
        mcs = blob[pos]
        pos += 1
        data = bytearray()
        while blob[pos] != 0:
            ln = blob[pos]
            data += blob[pos + 1:pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        frames += 1
        if frames == 1 and want_pixels:
            idx = _lzw_decode(bytes(data), mcs, iw * ih)
            if len(idx) < iw * ih:
                raise GifError("short LZW stream")
            if iflags & 0x40:               # interlaced: 4-pass order
                deinterlaced = bytearray(iw * ih)
                src = 0
                for start, step in _INTERLACE_PASSES:
                    for row in range(start, ih, step):
                        deinterlaced[row * iw:(row + 1) * iw] = \
                            idx[src:src + iw]
                        src += iw
                idx = bytes(deinterlaced)
            raster = bytearray()
            for i in idx[:iw * ih]:
                off = 3 * i
                raster += lct[off:off + 3]
            first = bytes(raster)
            fw, fh = iw, ih
    if want_pixels and first is None:
        raise GifError("no image data")
    return (fw or sw), (fh or sh), frames, (first or b"")


# --------------------------------------------------------- animation


def _decode_indices(data: bytes, mcs: int, iw: int, ih: int,
                    interlaced: bool) -> bytes:
    idx = _lzw_decode(data, mcs, iw * ih)
    if len(idx) < iw * ih:
        raise GifError("short LZW stream")
    if interlaced:
        deinterlaced = bytearray(iw * ih)
        src = 0
        for start, step in _INTERLACE_PASSES:
            for row in range(start, ih, step):
                deinterlaced[row * iw:(row + 1) * iw] = \
                    idx[src:src + iw]
                src += iw
        idx = bytes(deinterlaced)
    return bytes(idx[:iw * ih])


def decode_gif_frames(blob: bytes
                      ) -> tuple[int, int, list[tuple[int, bytes]]]:
    """Full animation decode → (screen_w, screen_h,
    [(delay_cs, composed RGB raster), ...]).

    Composes every frame onto the logical screen honoring the Graphic
    Control Extension: transparency (transparent pixels leave the
    canvas untouched), delay, and disposal methods 0/1 (leave), 2
    (restore the frame RECT to the background color) and 3 (restore
    the canvas to its pre-frame state). Local color tables override
    the global one per frame. The canvas starts as the background
    color (GCT[bg], black without a GCT) — the same convention
    browsers use for the first composition."""
    if blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifError("not a GIF")
    sw, sh, flags, bg, _ar = struct.unpack("<HHBBB", blob[6:13])
    pos = 13
    gct = b""
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = blob[pos:pos + 3 * n]
        pos += 3 * n
    bg_rgb = (gct[3 * bg:3 * bg + 3]
              if gct and 3 * bg + 3 <= len(gct) else b"\x00\x00\x00")
    canvas = bytearray(bg_rgb * (sw * sh))
    frames: list[tuple[int, bytes]] = []
    # pending GCE state (applies to the NEXT image only)
    delay = 0
    disposal = 0
    transparent: "int | None" = None
    while pos < len(blob):
        b0 = blob[pos]
        pos += 1
        if b0 == 0x3B:
            break
        if b0 == 0x21:
            label = blob[pos]
            pos += 1
            if label == 0xF9:               # Graphic Control Extension
                ln = blob[pos]
                gce = blob[pos + 1:pos + 1 + ln]
                disposal = (gce[0] >> 2) & 0x07
                delay = struct.unpack("<H", gce[1:3])[0]
                transparent = gce[3] if gce[0] & 0x01 else None
                pos += 1 + ln
                if blob[pos] != 0:
                    raise GifError("GCE not zero-terminated")
                pos += 1
            else:                           # other extensions: skip
                while blob[pos] != 0:
                    pos += 1 + blob[pos]
                pos += 1
            continue
        if b0 != 0x2C:
            raise GifError(f"unexpected block 0x{b0:02x}")
        lx, ly, iw, ih, iflags = struct.unpack("<HHHHB",
                                               blob[pos:pos + 9])
        pos += 9
        lct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            lct = blob[pos:pos + 3 * n]
            pos += 3 * n
        mcs = blob[pos]
        pos += 1
        data = bytearray()
        while blob[pos] != 0:
            ln = blob[pos]
            data += blob[pos + 1:pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = _decode_indices(bytes(data), mcs, iw, ih,
                              bool(iflags & 0x40))
        saved = bytes(canvas) if disposal == 3 else b""
        for r in range(ih):
            crow = (ly + r) * sw
            for c in range(iw):
                v = idx[r * iw + c]
                if transparent is not None and v == transparent:
                    continue
                off = 3 * (crow + lx + c)
                canvas[off:off + 3] = lct[3 * v:3 * v + 3]
        frames.append((delay, bytes(canvas)))
        if disposal == 2:                   # restore rect to background
            for r in range(ih):
                crow = (ly + r) * sw
                for c in range(iw):
                    off = 3 * (crow + lx + c)
                    canvas[off:off + 3] = bg_rgb
        elif disposal == 3:                 # restore to previous
            canvas = bytearray(saved)
        delay, disposal, transparent = 0, 0, None
    return sw, sh, frames


def _palettize(rgb: bytes) -> tuple[bytes, bytes]:
    """RGB raster → (palette bytes, index bytes); raises past 256."""
    palette: dict[bytes, int] = {}
    indices = bytearray()
    for i in range(0, len(rgb), 3):
        col = rgb[i:i + 3]
        idx = palette.get(col)
        if idx is None:
            if len(palette) == 256:
                raise GifError(">256 distinct colors — palettize first")
            idx = len(palette)
            palette[col] = idx
        indices.append(idx)
    return b"".join(palette), bytes(indices)


def _color_table_field(n_colors: int) -> tuple[int, int]:
    """(size-field bits-1 value, padded table entries)."""
    bits = max(1, (max(n_colors, 2) - 1).bit_length())
    return bits - 1, 1 << bits


def encode_gif_animation(width: int, height: int,
                         frames: list[bytes],
                         delays_cs: "list[int] | None" = None,
                         loop: bool = True,
                         delta: bool = True,
                         max_colors: "int | None" = None) -> bytes:
    """Full-canvas RGB frames → animated GIF89a with PER-FRAME LOCAL
    color tables (each frame palettizes independently — no shared
    256-color budget) and, with `delta`, minimal-bounding-rect frame
    deltas: each frame after the first emits only the sub-rectangle
    that changed vs the previous canvas (disposal 1 leaves the rest in
    place). Includes the NETSCAPE2.0 looping extension when `loop`.
    Frames must each stay within GIF's 256 colors per frame."""
    if not frames:
        raise GifError("need at least one frame")
    for f in frames:
        if len(f) != width * height * 3:
            raise GifError("frame buffer does not match dimensions")
    if max_colors is not None:
        frames = [quantize_colors(f, max_colors) for f in frames]
    delays = delays_cs or [10] * len(frames)
    if len(delays) != len(frames):
        raise GifError("delays/frames length mismatch")
    out = bytearray(b"GIF89a")
    # no global color table; bg index 0
    out += struct.pack("<HHBBB", width, height, 0x00, 0, 0)
    if loop:
        out += b"\x21\xFF\x0BNETSCAPE2.0\x03\x01\x00\x00\x00"
    prev: "bytes | None" = None
    for fi, frame in enumerate(frames):
        lx = ly = 0
        iw, ih = width, height
        if delta and prev is not None:
            rows = [r for r in range(height)
                    if frame[r * width * 3:(r + 1) * width * 3]
                    != prev[r * width * 3:(r + 1) * width * 3]]
            if not rows:
                # unchanged frame: 1×1 rect re-painting one pixel
                rows = [0]
                cols = [0]
            else:
                cols = []
                for c in range(width):
                    for r in rows:
                        o = 3 * (r * width + c)
                        if frame[o:o + 3] != prev[o:o + 3]:
                            cols.append(c)
                            break
            lx, ly = min(cols), min(rows)
            iw = max(cols) - lx + 1
            ih = max(rows) - ly + 1
        rect = bytearray()
        for r in range(ly, ly + ih):
            o = 3 * (r * width + lx)
            rect += frame[o:o + 3 * iw]
        palette, indices = _palettize(bytes(rect))
        szfield, entries = _color_table_field(len(palette) // 3)
        # GCE: disposal 1 (leave), no transparency
        out += b"\x21\xF9\x04" + bytes([0x04]) \
            + struct.pack("<H", delays[fi]) + b"\x00\x00"
        out += b"\x2C" + struct.pack("<HHHHB", lx, ly, iw, ih,
                                     0x80 | szfield)
        out += palette + b"\x00" * (3 * entries - len(palette))
        mcs = max(2, (entries - 1).bit_length())
        out.append(mcs)
        lzw = _lzw_encode(indices, mcs)
        for off in range(0, len(lzw), 255):
            block = lzw[off:off + 255]
            out.append(len(block))
            out += block
        out += b"\x00"
        prev = frame
    out += b"\x3B"
    return bytes(out)
