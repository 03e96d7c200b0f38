"""Pure-Python baseline JPEG (ITU-T T.81 / ISO 10918-1) encoder + decoder.

Closes the last image-format seam in datalib/media_codec.py: the container
has no Pillow, so the entropy-coding stack lives here — marker parsing,
DQT/DHT/SOF0/SOS/DRI segments, Huffman entropy decode with byte-unstuffing
and restart markers, dequantize + dezigzag, batched numpy IDCT, chroma
upsampling (4:4:4 / 4:2:2 / 4:2:0), and BT.601 YCbCr<->RGB.

Scope (baseline sequential + progressive DCT — the formats ~all
camera/web JPEGs use):
* decode: SOF0/SOF1 frames AND SOF2 progressive frames (spectral
  selection + successive approximation: DC first/refine, AC first with
  EOB runs, AC refinement with correction bits — T.81 G.1.2/G.2), 8-bit,
  1 or 3 components, sampling factors up to 2x2, multiple DQT/DHT per
  segment (tables may be redefined between scans), 16-bit quant entries,
  DRI/RSTn (per-scan in progressive). Arithmetic coding and
  hierarchical/lossless SOFs raise a clear error.
* encode: grayscale or YCbCr 4:4:4, quality-scaled Annex-K quant tables
  (or caller-provided, e.g. all-ones for the lossless-on-flat-blocks gate
  fixtures), per-image canonical Huffman tables written to DHT (the
  decoder reads whatever DHT declares, so table choice is private to the
  encoder), optional restart intervals (baseline). progressive=True
  emits a 6-scan-per-component successive-approximation script (DC
  Al=1→0, AC 1-5/6-63 first at Al=2, two refinement passes) so every
  progressive decode path is exercised by our own fixtures; the
  progressive entropy paths are additionally proven by the
  pixel-identical-to-baseline property (same coefficients, different
  transmission order — tests/test_jpeg_mp4.py).

Exactness contract used by the driver gate (media_decode_jpeg_stats):
with an all-ones quant table and an image whose every 8x8 block is a
constant value, the DCT has a single integer DC coefficient (8*(v-128))
and zero ACs, so encode->decode is bit-for-bit LOSSLESS and a DuckDB
oracle can regenerate the decoded raster from the closed-form pixel
formula. Natural images are covered by tolerance tests in pytest.

Reference parity: NiFi 1.1.2 itself only sniffs JPEG magic
(nifi-standard-processors .../util/StandardFlowFileMediaType via Tika in
IdentifyMimeType; test artifact simple.jpg) — decode is the
training-data-pipeline mandate, implemented from the public spec.

Scale shape: plain bytes->tuple functions called from Arrow-batched
mapInPandas (datalib/multimodal.py); the per-block transform loops are
numpy matmuls over (n_blocks, 8, 8) arrays, not per-pixel Python.
"""

from __future__ import annotations

import struct

import numpy as np

# ------------------------------------------------------------------ tables

# zigzag scan: generated, not memorized — diagonal s = r + c, even
# diagonals walk row-descending, odd ones row-ascending (T.81 Figure 5).
ZIGZAG: list[int] = []
for _s in range(15):
    _rows = range(max(0, _s - 7), min(7, _s) + 1)
    for _r in (reversed(_rows) if _s % 2 == 0 else _rows):
        ZIGZAG.append(_r * 8 + (_s - _r))
assert len(ZIGZAG) == 64 and ZIGZAG[1] == 1 and ZIGZAG[2] == 8

# Annex K.1/K.2 example quantization tables (public spec constants).
QUANT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
QUANT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

# orthonormal 8-point DCT-II basis: coeff = T @ block @ T.T reproduces the
# T.81 FDCT scaling (1/4 * C(u)C(v) * sum) exactly.
_T = np.zeros((8, 8))
_T[0, :] = 1.0 / np.sqrt(8.0)
for _u in range(1, 8):
    for _x in range(8):
        _T[_u, _x] = 0.5 * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def scale_quant(base: list[int], quality: int) -> list[int]:
    """libjpeg-compatible quality scaling of a base table (public formula)."""
    quality = min(max(quality, 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return [min(max((b * scale + 50) // 100, 1), 255) for b in base]


# ------------------------------------------------------------------ bits

class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._nbits += nbits
        while self._nbits >= 8:
            self._nbits -= 8
            byte = (self._acc >> self._nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:          # byte stuffing
                self.out.append(0x00)
        self._acc &= (1 << self._nbits) - 1

    def align(self) -> None:
        """Pad to a byte boundary with 1-bits (T.81 F.1.2.3)."""
        if self._nbits:
            self.write((1 << (8 - self._nbits)) - 1, 8 - self._nbits)


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; RST markers are
    stripped by the caller (segment boundaries reset the reader)."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self._acc = 0
        self._nbits = 0

    def read_bit(self) -> int:
        if self._nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy data exhausted")
            self._acc = self.data[self.pos]
            self.pos += 1
            self._nbits = 8
        self._nbits -= 1
        return (self._acc >> self._nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _extend(v: int, t: int) -> int:
    """T.81 F.12 EXTEND: map t additional bits to a signed value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _category(v: int) -> int:
    return abs(v).bit_length()


# ------------------------------------------------------------------ huffman

def _fixed_length_table(symbols: list[int]) -> tuple[list[int], list[int]]:
    """Canonical fixed-length Huffman table over the used symbols: every
    symbol gets length L with 2**L >= n+1, reserving the all-ones code as
    T.81 Annex C requires. Valid (just not size-optimal) — the decoder
    reads lengths from DHT, so this is an encoder-private choice."""
    syms = sorted(set(symbols)) or [0]
    n = len(syms)
    length = max((n + 1 - 1).bit_length(), 1)
    if (1 << length) < n + 1:
        length += 1
    bits = [0] * 17
    bits[length] = n
    return bits, syms


class _HuffEncoder:
    def __init__(self, bits: list[int], huffval: list[int]) -> None:
        self.codes: dict[int, tuple[int, int]] = {}
        code = 0
        k = 0
        for ln in range(1, 17):
            for _ in range(bits[ln]):
                self.codes[huffval[k]] = (code, ln)
                code += 1
                k += 1
            code <<= 1

    def emit(self, bw: _BitWriter, symbol: int) -> None:
        code, ln = self.codes[symbol]
        bw.write(code, ln)


class _HuffDecoder:
    def __init__(self, bits: list[int], huffval: list[int]) -> None:
        self.lut: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for ln in range(1, 17):
            for _ in range(bits[ln]):
                self.lut[(ln, code)] = huffval[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | br.read_bit()
            sym = self.lut.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


# ------------------------------------------------------------------ encode

def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 -> (h, w, 3) float64 YCbCr (JFIF / BT.601)."""
    r = px[:, :, 0].astype(np.float64)
    g = px[:, :, 1].astype(np.float64)
    b = px[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.stack([y, cb, cr], axis=-1)


def _plane_blocks(plane: np.ndarray) -> np.ndarray:
    """Pad a (h, w) plane to 8-multiples by edge replication and split
    into (n_blocks, 8, 8) in raster block order."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    hh, ww = plane.shape
    return (plane.reshape(hh // 8, 8, ww // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


def encode_jpeg(width: int, height: int, channels: int, pixels: bytes,
                quality: int = 90,
                quant: list[int] | int | None = None,
                restart_interval: int = 0,
                progressive: bool = False) -> bytes:
    """Encode a flat raster as a baseline sequential JPEG (SOF0, 4:4:4),
    or a progressive one (SOF2) with progressive=True.

    quant: None -> Annex-K tables scaled by `quality`; an int -> that
    constant for every entry of both tables (quant=1 makes flat-block
    images lossless — the gate-fixture mode); a 64-list -> used verbatim
    for all components.
    """
    if channels not in (1, 3):
        raise ValueError("JPEG encoder supports 1 or 3 channels")
    if progressive and restart_interval:
        raise ValueError("restart intervals unsupported with progressive=True")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer size mismatch")
    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, channels)
    if channels == 3:
        planes = _rgb_to_ycbcr(arr)
        plane_list = [planes[:, :, i] for i in range(3)]
    else:
        plane_list = [arr[:, :, 0].astype(np.float64)]

    if quant is None:
        qtabs = [scale_quant(QUANT_LUMA, quality),
                 scale_quant(QUANT_CHROMA, quality)]
    elif isinstance(quant, int):
        qtabs = [[quant] * 64, [quant] * 64]
    else:
        qtabs = [list(quant), list(quant)]
    if channels == 1:
        qtabs = qtabs[:1]

    # FDCT + quantize per component -> zigzagged integer blocks
    comp_blocks: list[np.ndarray] = []
    for ci, plane in enumerate(plane_list):
        blocks = _plane_blocks(plane) - 128.0
        coeffs = _T @ blocks @ _T.T                       # (n, 8, 8)
        q = np.array(qtabs[min(ci, 1)], dtype=np.float64).reshape(8, 8)
        quantized = np.floor(coeffs / q + 0.5).astype(np.int32)
        zz = quantized.reshape(-1, 64)[:, ZIGZAG]
        comp_blocks.append(zz)

    n_blocks_y = (height + 7) // 8
    n_blocks_x = (width + 7) // 8
    n_blocks = n_blocks_y * n_blocks_x

    if progressive:
        out = bytearray(b"\xFF\xD8")
        out += (b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00"
                + bytes((1, 1, 0)) + struct.pack(">HH", 1, 1) + bytes((0, 0)))
        for ti, q in enumerate(qtabs):
            body = bytes([ti]) + bytes(q[z] for z in ZIGZAG)
            out += b"\xFF\xDB" + struct.pack(">H", len(body) + 2) + body
        sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([channels])
        for ci in range(channels):
            sof += bytes([ci + 1, 0x11, min(ci, 1)])
        out += b"\xFF\xC2" + struct.pack(">H", len(sof) + 2) + sof
        out += _encode_progressive_scans(comp_blocks, channels, n_blocks)
        out += b"\xFF\xD9"
        return bytes(out)

    # pass 1: symbol statistics per table class (0 = luma, 1 = chroma) —
    # must mirror pass 2 exactly, including the DC predictor reset at
    # restart boundaries, or pass 2 emits a symbol pass 1 never saw.
    def _symbols_for(ci: int) -> tuple[list[int], list[int]]:
        dc_syms, ac_syms = [], []
        pred = 0
        for b in range(n_blocks):
            if restart_interval and b and b % restart_interval == 0:
                pred = 0
            blk = comp_blocks[ci][b]
            diff = int(blk[0]) - pred
            pred = int(blk[0])
            dc_syms.append(_category(diff))
            run = 0
            for k in range(1, 64):
                v = int(blk[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    ac_syms.append(0xF0)
                    run -= 16
                ac_syms.append((run << 4) | _category(v))
                run = 0
            if run:
                ac_syms.append(0x00)
        return dc_syms, ac_syms

    table_syms = {0: ([], []), 1: ([], [])}
    for ci in range(channels):
        dc_s, ac_s = _symbols_for(ci)
        cls = min(ci, 1)
        table_syms[cls][0].extend(dc_s)
        table_syms[cls][1].extend(ac_s)

    huff: dict[tuple[int, int], tuple[list[int], list[int]]] = {}
    encoders: dict[tuple[int, int], _HuffEncoder] = {}
    n_tables = 1 if channels == 1 else 2
    for cls in range(n_tables):
        for is_ac in (0, 1):
            bits, vals = _fixed_length_table(table_syms[cls][is_ac])
            huff[(is_ac, cls)] = (bits, vals)
            encoders[(is_ac, cls)] = _HuffEncoder(bits, vals)

    # ---- assemble segments
    out = bytearray(b"\xFF\xD8")                              # SOI
    out += (b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00"
            + bytes((1, 1, 0)) + struct.pack(">HH", 1, 1) + bytes((0, 0)))
    for ti, q in enumerate(qtabs):
        body = bytes([ti]) + bytes(q[z] for z in ZIGZAG)
        out += b"\xFF\xDB" + struct.pack(">H", len(body) + 2) + body
    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([channels])
    for ci in range(channels):
        sof += bytes([ci + 1, 0x11, min(ci, 1)])              # H=V=1, 4:4:4
    out += b"\xFF\xC0" + struct.pack(">H", len(sof) + 2) + sof
    for (is_ac, cls), (bits, vals) in sorted(huff.items()):
        body = bytes([(is_ac << 4) | cls]) + bytes(bits[1:17]) + bytes(vals)
        out += b"\xFF\xC4" + struct.pack(">H", len(body) + 2) + body
    if restart_interval:
        out += b"\xFF\xDD" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([channels])
    for ci in range(channels):
        cls = min(ci, 1)
        sos += bytes([ci + 1, (cls << 4) | cls])
    sos += bytes((0, 63, 0))
    out += b"\xFF\xDA" + struct.pack(">H", len(sos) + 2) + sos

    # pass 2: entropy-coded data (MCU = one block per component at 4:4:4)
    bw = _BitWriter()
    preds = [0] * channels
    rst = 0
    for b in range(n_blocks):
        if restart_interval and b and b % restart_interval == 0:
            bw.align()
            bw.out += bytes((0xFF, 0xD0 + (rst & 7)))
            rst += 1
            preds = [0] * channels
        for ci in range(channels):
            cls = min(ci, 1)
            blk = comp_blocks[ci][b]
            diff = int(blk[0]) - preds[ci]
            preds[ci] = int(blk[0])
            t = _category(diff)
            encoders[(0, cls)].emit(bw, t)
            if t:
                bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
            run = 0
            for k in range(1, 64):
                v = int(blk[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    encoders[(1, cls)].emit(bw, 0xF0)
                    run -= 16
                t = _category(v)
                encoders[(1, cls)].emit(bw, (run << 4) | t)
                bw.write(v if v >= 0 else v + (1 << t) - 1, t)
                run = 0
            if run:
                encoders[(1, cls)].emit(bw, 0x00)
    bw.align()
    out += bw.out
    out += b"\xFF\xD9"                                        # EOI
    return bytes(out)


# ------------------------------------------------------ progressive encode

class _SymbolSink:
    """Scan emitters run twice: a stats pass (record Huffman symbols only)
    and a write pass (real codes + raw bits). Same algorithm both times or
    the write pass emits a symbol the table never saw."""

    def __init__(self, encoders: dict[int, _HuffEncoder] | None = None):
        self.symbols: dict[int, list[int]] = {}
        self.encoders = encoders
        self.bw = _BitWriter() if encoders is not None else None

    def symbol(self, cls: int, sym: int) -> None:
        if self.encoders is None:
            self.symbols.setdefault(cls, []).append(sym)
        else:
            self.encoders[cls].emit(self.bw, sym)

    def bits(self, value: int, nbits: int) -> None:
        if self.bw is not None and nbits:
            self.bw.write(value, nbits)


def _scan_dc(comp_blocks: list, comp_ids: list[int], n_blocks: int,
             ah: int, al: int, sink: _SymbolSink) -> None:
    """Interleaved DC scan (4:4:4 ⇒ MCU order == block raster order).
    First scan (ah=0): Huffman-coded diffs of dc >> al (arithmetic
    shift — T.81 point transform for DC); refinement: one raw bit per
    block, bit `al` of the DC coefficient."""
    preds = {ci: 0 for ci in comp_ids}
    for b in range(n_blocks):
        for ci in comp_ids:
            dc = int(comp_blocks[ci][b][0])
            if ah == 0:
                v = dc >> al
                diff = v - preds[ci]
                preds[ci] = v
                t = _category(diff)
                sink.symbol(min(ci, 1), t)
                sink.bits(diff if diff >= 0 else diff + (1 << t) - 1, t)
            else:
                sink.bits((dc >> al) & 1, 1)


def _scan_ac_first(blocks, n_blocks: int, cls: int, ss: int, se: int,
                   al: int, sink: _SymbolSink) -> None:
    """Non-interleaved AC first scan: RLE over the band of
    sign(v)·(|v| >> al) with EOB-run coding (T.81 G.1.2.2)."""
    eobrun = 0

    def flush_eob() -> None:
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            sink.symbol(cls, r << 4)
            sink.bits(eobrun - (1 << r), r)
            eobrun = 0

    for b in range(n_blocks):
        blk = blocks[b]
        vals = []
        for k in range(ss, se + 1):
            v = int(blk[k])
            vals.append(-((-v) >> al) if v < 0 else v >> al)
        if not any(vals):
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
            continue
        flush_eob()
        run = 0
        last_nz = max(i for i, v in enumerate(vals) if v)
        for i, v in enumerate(vals):
            if i > last_nz:
                run = 0
                eobrun += 1          # trailing zeros fold into the EOB run
                break
            if v == 0:
                run += 1
                continue
            while run > 15:
                sink.symbol(cls, 0xF0)
                run -= 16
            t = _category(v)
            sink.symbol(cls, (run << 4) | t)
            sink.bits(v if v >= 0 else v + (1 << t) - 1, t)
            run = 0
    flush_eob()


def _scan_ac_refine(blocks, n_blocks: int, cls: int, ss: int, se: int,
                    al: int, sink: _SymbolSink) -> None:
    """Non-interleaved AC refinement scan (T.81 G.1.2.3): newly-nonzero
    coefficients (|v| >> al == 1) carry (run, 1)+sign; already-nonzero
    ones (|v| >> (al+1) != 0) contribute buffered correction bits; blocks
    whose band has no newly-nonzero coefficient join the EOB run."""
    eobrun = 0
    eob_bits: list[int] = []

    def flush_eob() -> None:
        nonlocal eobrun, eob_bits
        if eobrun:
            r = eobrun.bit_length() - 1
            sink.symbol(cls, r << 4)
            sink.bits(eobrun - (1 << r), r)
            for bit in eob_bits:
                sink.bits(bit, 1)
            eobrun = 0
            eob_bits = []

    for b in range(n_blocks):
        blk = blocks[b]
        absv = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
        eob = -1                     # index of the LAST newly-nonzero coef
        for i, a in enumerate(absv):
            if a == 1:
                eob = i
        run = 0
        pend: list[int] = []         # correction bits since the last symbol
        for i in range(eob + 1):     # past eob everything folds into EOBRUN
            a = absv[i]
            if a == 0:
                run += 1
                continue
            # any nonzero position flushes pending ZRLs first (libjpeg's
            # ordering invariant: buffered bits always land within the
            # span the decoder walks for the symbol they follow)
            while run > 15:
                flush_eob()
                sink.symbol(cls, 0xF0)
                run -= 16
                for bit in pend:
                    sink.bits(bit, 1)
                pend = []
            if a > 1:                # already nonzero: one correction bit,
                pend.append(a & 1)   # buffered (does NOT reset the run)
                continue
            flush_eob()              # newly nonzero: (run, 1) + sign
            sink.symbol(cls, (run << 4) | 1)
            sink.bits(0 if int(blk[ss + i]) < 0 else 1, 1)
            for bit in pend:
                sink.bits(bit, 1)
            pend = []
            run = 0
        # tail past the last newly-nonzero coefficient joins the EOB run;
        # its already-nonzero coefs ride along as buffered correction bits.
        # A block whose last newly-nonzero coefficient IS the band end has
        # no tail: the decoder leaves it when k passes Se and must not be
        # handed an EOB symbol for it.
        if eob < len(absv) - 1:
            eobrun += 1
            eob_bits.extend(absv[i] & 1 for i in range(eob + 1, len(absv))
                            if absv[i] > 1)
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def _encode_progressive_scans(comp_blocks: list, channels: int,
                              n_blocks: int) -> bytes:
    """Emit the scan script: interleaved DC first (Al=1) + DC refine,
    then per component AC 1-5 / 6-63 first at Al=2 and two refinement
    passes — every progressive decode path (EOB runs, ZRL, correction
    bits, DC refinement) appears in our own fixtures."""
    out = bytearray()
    comp_ids = list(range(channels))
    scans: list[tuple] = [("dc", comp_ids, 0, 0, 0, 1),
                          ("dc", comp_ids, 0, 0, 1, 0)]
    for ci in comp_ids:
        scans += [("ac_first", [ci], 1, 5, 0, 2),
                  ("ac_first", [ci], 6, 63, 0, 2),
                  ("ac_refine", [ci], 1, 63, 2, 1),
                  ("ac_refine", [ci], 1, 63, 1, 0)]

    for kind, cids, ss, se, ah, al in scans:
        def run(sink: _SymbolSink) -> None:
            if kind == "dc":
                _scan_dc(comp_blocks, cids, n_blocks, ah, al, sink)
            elif kind == "ac_first":
                _scan_ac_first(comp_blocks[cids[0]], n_blocks,
                               min(cids[0], 1), ss, se, al, sink)
            else:
                _scan_ac_refine(comp_blocks[cids[0]], n_blocks,
                                min(cids[0], 1), ss, se, al, sink)

        stats = _SymbolSink()
        run(stats)
        encoders: dict[int, _HuffEncoder] = {}
        is_ac = 1 if kind != "dc" else 0
        # DC refinement scans carry raw bits only — no symbols, no DHT
        for cls in sorted(stats.symbols):
            bits, vals = _fixed_length_table(stats.symbols[cls])
            body = bytes([(is_ac << 4) | cls]) + bytes(bits[1:17]) + bytes(vals)
            out += b"\xFF\xC4" + struct.pack(">H", len(body) + 2) + body
            encoders[cls] = _HuffEncoder(bits, vals)
        sos = bytes([len(cids)])
        for ci in cids:
            cls = min(ci, 1)
            sos += bytes([ci + 1, (cls << 4) | cls])
        sos += bytes((ss, se, (ah << 4) | al))
        out += b"\xFF\xDA" + struct.pack(">H", len(sos) + 2) + sos
        sink = _SymbolSink(encoders if encoders else {})
        run(sink)
        sink.bw.align()
        out += sink.bw.out
    return bytes(out)


# ------------------------------------------------------------------ decode

class _Component:
    __slots__ = ("cid", "h", "v", "tq", "td", "ta", "blocks", "bx", "by")

    def __init__(self, cid: int, h: int, v: int, tq: int) -> None:
        self.cid, self.h, self.v, self.tq = cid, h, v, tq
        self.td = self.ta = 0
        self.blocks: list[np.ndarray] | None = None
        self.bx = self.by = 0


def _unit_baseline(br: _BitReader, blk: np.ndarray, dct: _HuffDecoder,
                   act: _HuffDecoder, preds: dict[int, int], cid: int) -> None:
    """Full-band sequential data unit (T.81 F.2.2)."""
    t = dct.decode(br)
    diff = _extend(br.read_bits(t), t) if t else 0
    preds[cid] += diff
    blk[0] = preds[cid]
    k = 1
    while k < 64:
        rs = act.decode(br)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16
                continue
            break                                             # EOB
        k += r
        if k > 63:
            raise ValueError("JPEG AC run past block end")
        blk[k] = _extend(br.read_bits(s), s)
        k += 1


def _unit_dc_prog(br: _BitReader, blk: np.ndarray, dct: _HuffDecoder,
                  preds: dict[int, int], cid: int, ah: int, al: int) -> None:
    """Progressive DC data unit: first scan (ah=0) Huffman-codes diffs of
    the point-transformed DC; refinement appends one raw bit (T.81 G.2)."""
    if ah == 0:
        t = dct.decode(br)
        diff = _extend(br.read_bits(t), t) if t else 0
        preds[cid] += diff
        blk[0] = preds[cid] << al
    elif br.read_bit():
        blk[0] = int(blk[0]) | (1 << al)


def _unit_ac_first(br: _BitReader, blk: np.ndarray, act: _HuffDecoder,
                   ss: int, se: int, al: int, state: list[int]) -> None:
    """Progressive AC first scan for one data unit (T.81 G.1.2.2):
    RLE over the band with EOB-run coding; state[0] = pending EOBRUN."""
    if state[0]:
        state[0] -= 1
        return
    k = ss
    while k <= se:
        rs = act.decode(br)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16                                       # ZRL
                continue
            state[0] = (1 << r) - 1
            if r:
                state[0] += br.read_bits(r)
            return                                            # EOB run
        k += r
        if k > se:
            raise ValueError("JPEG AC run past band end")
        blk[k] = _extend(br.read_bits(s), s) << al
        k += 1


def _unit_ac_refine(br: _BitReader, blk: np.ndarray, act: _HuffDecoder,
                    ss: int, se: int, al: int, state: list[int]) -> None:
    """Progressive AC refinement for one data unit (T.81 G.1.2.3):
    newly-nonzero coefficients arrive as (run,1)+sign; every
    already-nonzero coefficient passed on the walk reads one correction
    bit; EOB runs carry the correction bits of the blocks they cover."""
    p1, m1 = 1 << al, -(1 << al)
    k = ss
    if state[0] == 0:
        while k <= se:
            rs = act.decode(br)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r != 15:
                    state[0] = 1 << r
                    if r:
                        state[0] += br.read_bits(r)
                    break                                     # EOB run
                # r == 15: ZRL — consume 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("JPEG AC refinement size != 1")
                val = p1 if br.read_bit() else m1
            while k <= se:
                if blk[k] != 0:
                    if br.read_bit() and not (int(blk[k]) & p1):
                        blk[k] += p1 if blk[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s:
                if k > se:
                    raise ValueError("JPEG AC refinement past band end")
                blk[k] = val
            k += 1
    if state[0] > 0:
        while k <= se:                                        # EOB'd tail
            if blk[k] != 0:
                if br.read_bit() and not (int(blk[k]) & p1):
                    blk[k] += p1 if blk[k] >= 0 else m1
            k += 1
        state[0] -= 1


def _split_restart_segments(scan_data: bytes) -> list[bytes]:
    """Split entropy data on RSTn markers and undo 0xFF00 byte stuffing;
    each segment resets predictors, EOB runs, and bit phase."""
    segments: list[bytes] = []
    cur = bytearray()
    i = 0
    while i < len(scan_data):
        if scan_data[i] == 0xFF and i + 1 < len(scan_data):
            nxt = scan_data[i + 1]
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
        cur.append(scan_data[i])
        i += 1
    segments.append(bytes(cur))
    return segments


def _run_scan(segments: list[bytes], restart_interval: int,
              scan_comps: list[_Component], comps: list[_Component],
              dc_tabs: dict[int, _HuffDecoder], ac_tabs: dict[int, _HuffDecoder],
              progressive: bool, ss: int, se: int, ah: int, al: int,
              mcux: int, width: int, height: int,
              hmax: int, vmax: int) -> None:
    """Decode one entropy-coded scan into the components' coefficient
    blocks. Interleaved scans (ns > 1) walk MCUs; single-component scans
    walk the component's own block raster (T.81 A.2.2 — its natural
    dimensions, NOT the MCU-padded ones)."""
    interleaved = len(scan_comps) > 1
    if interleaved:
        if progressive and ss != 0:
            raise ValueError("progressive AC scans must be single-component")
        n_units = mcux * (scan_comps[0].by // scan_comps[0].v)  # mcux * mcuy
    else:
        c0 = scan_comps[0]
        cw = -(-width * c0.h // hmax)
        ch = -(-height * c0.v // vmax)
        bx_nat, by_nat = -(-cw // 8), -(-ch // 8)
        n_units = bx_nat * by_nat

    seg_idx = 0
    br = _BitReader(segments[0])
    preds = {c.cid: 0 for c in scan_comps}
    eob_state = [0]

    for u in range(n_units):
        if restart_interval and u and u % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ValueError("JPEG missing restart segment")
            br = _BitReader(segments[seg_idx])
            preds = {c.cid: 0 for c in scan_comps}
            eob_state[0] = 0
        if interleaved:
            my, mx = divmod(u, mcux)
            for c in scan_comps:
                for by in range(c.v):
                    for bx in range(c.h):
                        bi = (my * c.v + by) * c.bx + (mx * c.h + bx)
                        blk = c.blocks[bi]
                        if not progressive:
                            _unit_baseline(br, blk, dc_tabs[c.td],
                                           ac_tabs[c.ta], preds, c.cid)
                        else:
                            _unit_dc_prog(br, blk, dc_tabs[c.td],
                                          preds, c.cid, ah, al)
        else:
            c = scan_comps[0]
            row, col = divmod(u, bx_nat)
            blk = c.blocks[row * c.bx + col]
            if not progressive:
                _unit_baseline(br, blk, dc_tabs[c.td], ac_tabs[c.ta],
                               preds, c.cid)
            elif ss == 0:
                _unit_dc_prog(br, blk, dc_tabs[c.td], preds, c.cid, ah, al)
            elif ah == 0:
                _unit_ac_first(br, blk, ac_tabs[c.ta], ss, se, al, eob_state)
            else:
                _unit_ac_refine(br, blk, ac_tabs[c.ta], ss, se, al, eob_state)


def decode_jpeg(blob: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline-sequential (SOF0/1) or progressive (SOF2) JPEG
    -> (width, height, channels, RGB/gray raster)."""
    if blob[:3] != b"\xFF\xD8\xFF":
        raise ValueError("not a JPEG (bad SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, _HuffDecoder] = {}
    ac_tabs: dict[int, _HuffDecoder] = {}
    comps: list[_Component] = []
    width = height = 0
    restart_interval = 0
    progressive = False
    got_scan = False
    hmax = vmax = mcux = 1

    while pos + 4 <= len(blob):
        if blob[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = blob[pos + 1]
        pos += 2
        if marker == 0xD9:                                    # EOI
            break
        (seg_len,) = struct.unpack_from(">H", blob, pos)
        body = blob[pos + 2:pos + seg_len]
        pos += seg_len
        if marker == 0xDB:                                    # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                p += 1
                if pq:
                    vals = struct.unpack_from(f">{64}H", body, p)
                    p += 128
                else:
                    vals = body[p:p + 64]
                    p += 64
                tab = np.zeros(64)
                for i, z in enumerate(ZIGZAG):
                    tab[z] = vals[i]
                qtabs[tq] = tab.reshape(8, 8)
        elif marker == 0xC4:                                  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                bits = [0] + list(body[p + 1:p + 17])
                n = sum(bits)
                vals = list(body[p + 17:p + 17 + n])
                p += 17 + n
                dec = _HuffDecoder(bits, vals)
                (ac_tabs if tc else dc_tabs)[th] = dec
        elif marker in (0xC0, 0xC1, 0xC2):                    # SOF0/1/2
            progressive = marker == 0xC2
            prec, height, width, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i:9 + 3 * i]
                comps.append(_Component(cid, hv >> 4, hv & 0x0F, tq))
            hmax = max(c.h for c in comps)
            vmax = max(c.v for c in comps)
            mcux = (width + 8 * hmax - 1) // (8 * hmax)
            mcuy = (height + 8 * vmax - 1) // (8 * vmax)
            for c in comps:
                c.bx, c.by = mcux * c.h, mcuy * c.v
                c.blocks = [np.zeros(64, dtype=np.int32)
                            for _ in range(c.bx * c.by)]
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG frame type SOF{marker - 0xC0} "
                "(baseline sequential + progressive only)")
        elif marker == 0xDD:                                  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:                                  # SOS
            if not comps:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            scan_comps = []
            for i in range(ns):
                cs, tdta = body[1 + 2 * i], body[2 + 2 * i]
                comp = next(c for c in comps if c.cid == cs)
                comp.td, comp.ta = tdta >> 4, tdta & 0x0F
                scan_comps.append(comp)
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            # entropy-coded data runs to the next non-RST marker
            p = pos
            while p + 1 < len(blob):
                if blob[p] == 0xFF and blob[p + 1] not in (0x00,) \
                        and not (0xD0 <= blob[p + 1] <= 0xD7):
                    break
                p += 1
            segments = _split_restart_segments(blob[pos:p])
            pos = p
            _run_scan(segments, restart_interval, scan_comps, comps,
                      dc_tabs, ac_tabs, progressive, ss, se, ah, al,
                      mcux, width, height, hmax, vmax)
            got_scan = True
        # APPn / COM / others: skipped

    if not comps or not got_scan:
        raise ValueError("JPEG missing SOF/SOS")

    # dequant + batched IDCT + reassembly per component
    planes = []
    for c in comps:
        zz = np.stack(c.blocks)                               # (n, 64)
        deq = np.zeros((zz.shape[0], 64))
        q = qtabs[c.tq].reshape(64)
        for i, z in enumerate(ZIGZAG):
            deq[:, z] = zz[:, i] * q[z]
        coeffs = deq.reshape(-1, 8, 8)
        spatial = _T.T @ coeffs @ _T + 128.0                  # (n, 8, 8)
        plane = (spatial.reshape(c.by, c.bx, 8, 8)
                 .transpose(0, 2, 1, 3).reshape(c.by * 8, c.bx * 8))
        # upsample to full-resolution grid by sample replication
        fy, fx = vmax // c.v, hmax // c.h
        if fy > 1 or fx > 1:
            plane = np.repeat(np.repeat(plane, fy, axis=0), fx, axis=1)
        planes.append(plane[:height, :width])

    if len(comps) == 1:
        gray = np.clip(np.floor(planes[0] + 0.5), 0, 255).astype(np.uint8)
        return width, height, 1, gray.tobytes()
    if len(comps) != 3:
        raise ValueError(f"unsupported JPEG component count {len(comps)}")
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    rgb = np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.uint8)
    return width, height, 3, rgb.tobytes()
