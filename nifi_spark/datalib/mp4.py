"""Pure-Python ISO Base Media File Format (MP4 / ISO 14496-12) mux + demux.

Closes the video-container seam in datalib/multimodal.py. The sandbox has
no ffmpeg, so frame PAYLOAD decode is bounded to codecs this repo can
decode itself — the muxer writes PNG-in-MP4 (sample entry fourcc 'png ',
a real QuickTime/ISO-BMFF video codec) so the whole chain
mux -> box walk -> sample-table join -> frame extract -> PNG decode is
REAL end-to-end. H.264/H.265 sample payloads parse fine at the container
level (sample table, timestamps, offsets) and raise only at frame decode.

Demux walks the real box tree (ftyp/moov/trak/mdia/minf/stbl) and joins
the four sample tables exactly the way the spec defines:
  stsz (sizes) x stsc (chunk mapping) x stco/co64 (chunk offsets)
  -> absolute byte ranges;  stts (decode deltas) -> timestamps.

Reference parity: NiFi 1.1.2 handles media only via Tika metadata
(nifi-media-bundle .../ExtractMediaMetadata.java); real demux is the
training-data-pipeline mandate (frame sampling for vision corpora),
implemented from the public ISO 14496-12 box layout.

Scale shape: bytes -> list transforms called from Arrow-batched
mapInPandas; no per-row Python UDFs, no driver involvement.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field


def _box(tag: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body) + 8) + tag + body


def _full(tag: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(tag, struct.pack(">I", (version << 24) | flags) + body)


# ------------------------------------------------------------------ mux

def encode_mp4(samples: list[bytes], width: int, height: int,
               sample_duration: int = 500, timescale: int = 1000,
               fourcc: bytes = b"png ") -> bytes:
    """Mux frame payloads into a single-track video MP4.

    All samples land in ONE chunk (stsc run of len(samples)), so the demux
    side must do the real stsc/stco/stsz offset arithmetic. Durations are
    uniform `sample_duration` ticks of `timescale`.
    """
    if not samples:
        raise ValueError("encode_mp4 needs at least one sample")
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mdat_body = b"".join(samples)
    mdat = _box(b"mdat", mdat_body)
    # chunk data starts right after the mdat header, after ftyp
    chunk_offset = len(ftyp) + 8
    duration = sample_duration * len(samples)

    # VisualSampleEntry (86-byte body after the 8-byte box header)
    entry = (b"\x00" * 6 + struct.pack(">H", 1)          # data_reference_index
             + b"\x00" * 16                               # pre_defined/reserved
             + struct.pack(">HH", width, height)
             + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
             + b"\x00" * 4 + struct.pack(">H", 1)         # frame_count
             + b"\x00" * 32                               # compressorname
             + struct.pack(">Hh", 24, -1))
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + _box(fourcc, entry))
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, len(samples),
                                            sample_duration))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, len(samples), 1))
    stsz = _full(b"stsz", 0, 0,
                 struct.pack(">II", 0, len(samples))
                 + b"".join(struct.pack(">I", len(s)) for s in samples))
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, chunk_offset))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)

    url = _full(b"url ", 0, 1, b"")                       # self-contained
    dinf = _box(b"dinf", _full(b"dref", 0, 0, struct.pack(">I", 1) + url))
    vmhd = _full(b"vmhd", 0, 1, b"\x00" * 8)
    minf = _box(b"minf", vmhd + dinf + stbl)
    hdlr = _full(b"hdlr", 0, 0,
                 b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"nifi_spark\x00")
    mdhd = _full(b"mdhd", 0, 0,
                 struct.pack(">IIII", 0, 0, timescale, duration)
                 + struct.pack(">HH", 0x55C4, 0))         # lang 'und'
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(b"tkhd", 0, 7,
                 struct.pack(">IIIII", 0, 0, 1, 0, duration)
                 + b"\x00" * 8 + struct.pack(">hhhh", 0, 0, 0, 0)
                 + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                               0x40000000)
                 + struct.pack(">II", width << 16, height << 16))
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(b"mvhd", 0, 0,
                 struct.pack(">IIII", 0, 0, timescale, duration)
                 + struct.pack(">IH", 0x00010000, 0x0100) + b"\x00" * 10
                 + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                               0x40000000)
                 + b"\x00" * 24 + struct.pack(">I", 2))
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


# ------------------------------------------------------------------ demux

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"dinf",
               b"edts", b"udta", b"mvex"}


def walk_boxes(blob: bytes, start: int = 0, end: int | None = None,
               depth: int = 0):
    """Yield (tag, body_start, body_end, depth) over the box tree."""
    end = len(blob) if end is None else end
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", blob, pos)
        tag = blob[pos + 4:pos + 8]
        body_start = pos + 8
        if size == 1:                                     # 64-bit largesize
            (size,) = struct.unpack_from(">Q", blob, pos + 8)
            body_start = pos + 16
        elif size == 0:                                   # to end of file
            size = end - pos
        box_end = pos + size
        if size < 8 or box_end > end:
            raise ValueError(f"bad MP4 box size {size} at {pos}")
        yield tag, body_start, box_end, depth
        if tag in _CONTAINERS:
            yield from walk_boxes(blob, body_start, box_end, depth + 1)
        pos = box_end


@dataclass
class Mp4Track:
    codec: str = ""
    width: int = 0
    height: int = 0
    timescale: int = 1
    duration: int = 0
    # parallel lists: one entry per sample
    offsets: list[int] = field(default_factory=list)
    sizes: list[int] = field(default_factory=list)
    pts: list[int] = field(default_factory=list)          # in timescale ticks

    @property
    def n_samples(self) -> int:
        return len(self.sizes)

    def duration_ms(self) -> int:
        return (self.duration * 1000) // self.timescale if self.timescale else 0

    def sample_ts_ms(self, i: int) -> int:
        return (self.pts[i] * 1000) // self.timescale


def parse_mp4(blob: bytes) -> Mp4Track:
    """Box-walk + sample-table join for the first video track."""
    if blob[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF file (missing ftyp)")
    tr = Mp4Track()
    stsz: list[int] = []
    stsc: list[tuple[int, int]] = []                      # (first_chunk, per)
    stco: list[int] = []
    stts: list[tuple[int, int]] = []
    in_video = False
    for tag, s, e, _ in walk_boxes(blob):
        body = blob[s:e]
        if tag == b"hdlr":
            in_video = body[8:12] == b"vide"
        elif tag == b"mdhd" and not tr.timescale > 1:
            version = body[0]
            if version == 1:
                tr.timescale, tr.duration = struct.unpack_from(">IQ", body, 20)
            else:
                tr.timescale, tr.duration = struct.unpack_from(">II", body, 12)
        elif tag == b"stsd":
            (n,) = struct.unpack_from(">I", body, 4)
            if n >= 1:
                tr.codec = body[12:16].decode("latin-1").strip()
                tr.width, tr.height = struct.unpack_from(">HH", body, 16 + 8 + 16)
        elif tag == b"stsz":
            default, count = struct.unpack_from(">II", body, 4)
            if default:
                stsz = [default] * count
            else:
                stsz = list(struct.unpack_from(f">{count}I", body, 12))
        elif tag == b"stsc":
            (n,) = struct.unpack_from(">I", body, 4)
            for i in range(n):
                first, per, _desc = struct.unpack_from(">III", body, 8 + 12 * i)
                stsc.append((first, per))
        elif tag == b"stco":
            (n,) = struct.unpack_from(">I", body, 4)
            stco = list(struct.unpack_from(f">{n}I", body, 8))
        elif tag == b"co64":
            (n,) = struct.unpack_from(">I", body, 4)
            stco = list(struct.unpack_from(f">{n}Q", body, 8))
        elif tag == b"stts":
            (n,) = struct.unpack_from(">I", body, 4)
            for i in range(n):
                cnt, delta = struct.unpack_from(">II", body, 8 + 8 * i)
                stts.append((cnt, delta))
    if not stsz or not stco or not stsc:
        raise ValueError("MP4 missing sample tables (stsz/stco/stsc)")

    # stsc runs -> samples-per-chunk for every chunk index (1-based)
    per_chunk: list[int] = []
    for i, (first, per) in enumerate(stsc):
        last = stsc[i + 1][0] if i + 1 < len(stsc) else len(stco) + 1
        per_chunk.extend([per] * (last - first))
    # absolute offsets: walk chunks, cumulate sizes inside each
    si = 0
    for ci, chunk_off in enumerate(stco):
        off = chunk_off
        for _ in range(per_chunk[ci] if ci < len(per_chunk) else 0):
            if si >= len(stsz):
                break
            tr.offsets.append(off)
            off += stsz[si]
            si += 1
    tr.sizes = stsz
    # stts runs -> cumulative decode timestamps
    t = 0
    for cnt, delta in stts:
        for _ in range(cnt):
            tr.pts.append(t)
            t += delta
    # tolerate missing/short stts: pad with last-known cadence
    while len(tr.pts) < tr.n_samples:
        tr.pts.append(t)
        t += stts[-1][1] if stts else 0
    if not tr.duration:
        tr.duration = t
    return tr


def extract_samples(blob: bytes, track: Mp4Track | None = None) -> list[bytes]:
    track = track or parse_mp4(blob)
    return [blob[o:o + sz] for o, sz in zip(track.offsets, track.sizes)]
