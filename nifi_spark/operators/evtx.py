"""ParseEvtx analog: distributed Windows-event-log (EVTX) container
parsing over binary content columns.

Reimplements the record/chunk extraction of the reference's ParseEvtx
(nifi-nar-bundles/nifi-evtx-bundle/nifi-evtx-processors/src/main/java/org/
apache/nifi/processors/evtx/ParseEvtx.java:1-100 — granularity
record/chunk/file, emitting one event per record) against the PUBLIC
EVTX container layout (the format documented by the libevtx project and
standard forensics references):

* file header block — 4096 bytes, magic ``ElfFile\\x00``,
  number-of-chunks u16 at offset 42;
* chunk — 65536 bytes, magic ``ElfChnk\\x00``, records start at
  offset 512;
* record — magic ``\\x2a\\x2a\\x00\\x00``, total size u32, record id
  u64, written FILETIME u64 (100 ns ticks since 1601-01-01), payload
  (binary XML), trailing size u32 copy.

The walk (header → chunks → records) is REAL and runs distributed: one
Arrow-batched ``mapInPandas`` pass, parallelism == partition count, no
driver involvement.

The *binary-XML → XML text* decode implements the SELF-CONTAINED subset
of the BinXML token stream (the layout libevtx documents): fragment
headers, element start/close/end tokens with INLINE names, attribute
lists, value-text tokens, and template instances whose definition is
embedded inline (how real files carry a template's first use), with
normal/optional substitutions over the value-spec list — UTF-16 and
ANSI (cp1252) strings, signed/unsigned 8/16/32/64-bit ints, float/
double, bool, binary (hex), size_t and hex32/hex64 (0x-prefixed),
FILETIME (ISO-8601 with microseconds), SYSTEMTIME, GUID (canonical
mixed-endian form), SID (S-R-A-S... form), and NULL. CDATA sections,
character/entity references, and processing instructions decode to
their XML text forms, in element content and (refs) inside multi-piece
attribute values. CHUNK-RESIDENT state also resolves: when a name or template
offset points at an EARLIER chunk position (a back-reference to a
prior record — how real EVTX writers dedup names/templates within a
chunk), the decode retries with the whole chunk as offset context
(decode_binxml_in_chunk) and reads the referenced name data / template
definition in place. The encoder mirrors this (base/registry mode), so
back-referencing blobs are synthesized and round-trip-tested. Array
value types (0x80|T) render comma-joined: fixed-size element types,
UTF-16 string arrays (NUL-terminated back-to-back), ANSI string arrays
(single-NUL-terminated), and SID arrays (self-describing length).
Embedded-BinXML substitution values (0x21) decode recursively and
splice in as MARKUP (how EventData rides inside real event records);
the encoder defers their packing so internal offsets land correct in
both payload- and chunk-relative modes. The one shape left outside the
subset: arrays of binary values — the format carries no per-element
length for them, so they are not representable; unknown future value
types raise (decode_stub=False) or yield the digest placeholder
(decode_stub=True).

``build_evtx`` is the deterministic synthesizer for tests and gate
queries, emitting real CRC32 checksums and the trailing in-progress
chunk. Conformance is pinned on the reference's own checked-in
application-logs.evtx: the walker reproduces ParseEvtx's EXACT
lifecycle numbers — bad chunks {1 (data-checksum), 2 (record stream
breaks after 5 records)}, current chunk skipped, 960 records parsed,
every record's BinXML decoding byte-faithfully (including the file's
genuine 'TimeCrešted' corrupted name node) — see
tests/test_codec_formats.py's env-gated sweep and evtx_chunk_status /
parse_evtx_chunks for the BAD_CHUNK relationship analog.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

FILE_MAGIC = b"ElfFile\x00"
CHUNK_MAGIC = b"ElfChnk\x00"
RECORD_MAGIC = b"\x2a\x2a\x00\x00"
FILE_HEADER_SIZE = 4096
CHUNK_SIZE = 65536
CHUNK_HEADER_SIZE = 512
RECORD_HEADER_SIZE = 24  # magic(4) + size(4) + record_id(8) + filetime(8)
RECORD_OVERHEAD = RECORD_HEADER_SIZE + 4  # + trailing size copy
# FILETIME epoch (1601-01-01) to Unix epoch (1970-01-01), in microseconds
_FILETIME_EPOCH_US = 11_644_473_600_000_000

PARSED_SCHEMA = ("src_id long, chunk_index int, record_id long, "
                 "record_time_us long, payload_len int, payload_md5 string, "
                 "xml string")


def _us_to_filetime(us: int) -> int:
    return (us + _FILETIME_EPOCH_US) * 10


def _filetime_to_us(ft: int) -> int:
    return ft // 10 - _FILETIME_EPOCH_US


def build_evtx(records: list[tuple[int, int, object]]) -> bytes:
    """Pack (record_id, unix_micros, payload) rows into a spec-shaped
    EVTX blob: real magics, sizes, chunking, FILETIME encoding, VALID
    CRC32 checksums (file-header, chunk-header, chunk-data — the same
    ranges the reference's FileHeader/ChunkHeader constructors verify),
    and a trailing empty "current" chunk (real logs always carry the
    in-progress chunk; readers skip it — FileHeader.java:146
    ``count < chunkCount``). Deterministic — same records, same bytes.

    ``payload`` is either raw bytes, or a CALLABLE
    ``f(chunk_relative_base, registry) -> bytes`` — the hook the
    chunk-relative BinXML encoder uses: the builder passes each
    record's chunk-relative payload offset plus a per-chunk
    name/template registry, so repeated names and template definitions
    across records in one chunk encode as back-references (the
    chunk-resident layout real EVTX writers produce). The registry is
    reset at chunk boundaries and the overflowing record re-encoded
    fresh, since back-references never cross chunks."""
    import zlib as _z
    chunks: list[bytes] = []
    buf = b""
    first_id = last_id = None
    last_rec_off = CHUNK_HEADER_SIZE
    meta: list[tuple[int, int]] = []  # (first_record_id, last_record_id)
    registry: dict = {}

    def _chunk_bytes(first, last, data: bytes, last_off: int) -> bytes:
        hdr = (CHUNK_MAGIC
               + struct.pack("<QQQQ", first, last, first, last)
               + struct.pack("<III", 128, last_off,
                             CHUNK_HEADER_SIZE + len(data)))
        hdr += struct.pack("<I", _z.crc32(data) & 0xFFFFFFFF)
        chunk = bytearray(hdr.ljust(CHUNK_HEADER_SIZE, b"\x00") + data)
        struct.pack_into("<I", chunk, 124,
                         _z.crc32(bytes(chunk[:120])
                                  + bytes(chunk[128:512])) & 0xFFFFFFFF)
        return bytes(chunk).ljust(CHUNK_SIZE, b"\x00")

    def flush():
        nonlocal buf, first_id, last_id, registry, last_rec_off
        if first_id is None:
            return
        chunks.append(_chunk_bytes(first_id, last_id, buf, last_rec_off))
        meta.append((first_id, last_id))
        buf, first_id, last_id, registry = b"", None, None, {}
        last_rec_off = CHUNK_HEADER_SIZE

    def encode(payload, base):
        return payload(base, registry) if callable(payload) else payload

    for rid, us, payload in records:
        base = CHUNK_HEADER_SIZE + len(buf) + RECORD_HEADER_SIZE
        data = encode(payload, base)
        rec_size = RECORD_OVERHEAD + len(data)
        if rec_size > CHUNK_SIZE - CHUNK_HEADER_SIZE:
            raise ValueError(f"record {rid} larger than a chunk")
        if len(buf) + rec_size > CHUNK_SIZE - CHUNK_HEADER_SIZE:
            flush()
            data = encode(payload, CHUNK_HEADER_SIZE + RECORD_HEADER_SIZE)
            rec_size = RECORD_OVERHEAD + len(data)
        last_rec_off = CHUNK_HEADER_SIZE + len(buf)
        buf += (RECORD_MAGIC
                + struct.pack("<IQQ", rec_size, rid, _us_to_filetime(us))
                + data + struct.pack("<I", rec_size))
        first_id = rid if first_id is None else first_id
        last_id = rid
    flush()
    # the empty in-progress chunk readers skip (first=last=next id)
    nid = (meta[-1][1] + 1) if meta else 0
    chunks.append(_chunk_bytes(nid, nid, b"", CHUNK_HEADER_SIZE))

    header = bytearray(
        (FILE_MAGIC
         + struct.pack("<QQQ", 0, len(chunks) - 1, nid)
         + struct.pack("<IHHHH", 128, 1, 3, FILE_HEADER_SIZE,
                       len(chunks))).ljust(FILE_HEADER_SIZE, b"\x00"))
    struct.pack_into("<I", header, 124,
                     _z.crc32(bytes(header[:120])) & 0xFFFFFFFF)
    return bytes(header) + b"".join(chunks)


def evtx_chunk_status(blob: bytes) -> list[dict]:
    """Per-chunk validation verdicts with the reference's exact
    semantics (ParseEvtx.java processing loop + ChunkHeader.java
    constructor): chunks are numbered 1-based, the trailing current
    chunk (count == chunkCount) is never processed, a chunk whose
    header fails (magic / header CRC32 over [0,120)∪[128,512) /
    data CRC32 over [512, nextRecordOffset)) is 'bad_header' with zero
    records, and a chunk whose record stream breaks mid-iteration
    (bad record magic, size bounds, or trailing size copy) is
    'bad_records' — with the records BEFORE the break still emitted,
    exactly like the reference's 960-record behavior on its own
    application-logs.evtx test file."""
    import zlib as _z
    if blob[:8] != FILE_MAGIC:
        raise ValueError("not an EVTX file (bad magic)")
    if struct.unpack_from("<I", blob, 124)[0] != \
            _z.crc32(blob[:120]) & 0xFFFFFFFF:
        raise ValueError("bad file-header checksum")
    n_chunks = struct.unpack_from("<H", blob, 42)[0]
    out = []
    for count in range(1, n_chunks):          # skip the current chunk
        base = FILE_HEADER_SIZE + (count - 1) * CHUNK_SIZE
        chunk = blob[base:base + CHUNK_SIZE]
        st = {"chunk": count, "status": "ok", "n_records": 0}
        out.append(st)
        if chunk[:8] != CHUNK_MAGIC or \
                struct.unpack_from("<I", chunk, 124)[0] != \
                _z.crc32(chunk[:120] + chunk[128:512]) & 0xFFFFFFFF:
            st["status"] = "bad_header"
            continue
        next_rec, data_crc = struct.unpack_from("<II", chunk, 48)
        if next_rec > CHUNK_SIZE or \
                _z.crc32(chunk[CHUNK_HEADER_SIZE:next_rec]) \
                & 0xFFFFFFFF != data_crc:
            st["status"] = "bad_header"
            continue
        off = CHUNK_HEADER_SIZE
        while off < next_rec:
            if chunk[off:off + 4] != RECORD_MAGIC:
                st["status"] = "bad_records"
                break
            size = struct.unpack_from("<I", chunk, off + 4)[0]
            if (size < RECORD_OVERHEAD or off + size > next_rec
                    or struct.unpack_from("<I", chunk,
                                          off + size - 4)[0] != size):
                st["status"] = "bad_records"
                break
            st["n_records"] += 1
            off += size
    return out


def _walk_records(blob: bytes):
    """Yield (chunk_index, record_id, filetime, payload, chunk_bytes,
    chunk_relative_payload_offset) with the reference's exact record
    iteration (see evtx_chunk_status): bad-header chunks contribute
    nothing, a broken record stream keeps its records before the
    break, the current chunk is skipped, chunk_index is the 1-based
    reference chunk number. Raises ValueError on a bad file magic or
    file-header checksum (caller routes to quarantine)."""
    import zlib as _z
    if blob[:8] != FILE_MAGIC:
        raise ValueError("not an EVTX file (bad magic)")
    if struct.unpack_from("<I", blob, 124)[0] != \
            _z.crc32(blob[:120]) & 0xFFFFFFFF:
        raise ValueError("bad file-header checksum")
    n_chunks = struct.unpack_from("<H", blob, 42)[0]
    for count in range(1, n_chunks):
        base = FILE_HEADER_SIZE + (count - 1) * CHUNK_SIZE
        chunk = blob[base:base + CHUNK_SIZE]
        if chunk[:8] != CHUNK_MAGIC or \
                struct.unpack_from("<I", chunk, 124)[0] != \
                _z.crc32(chunk[:120] + chunk[128:512]) & 0xFFFFFFFF:
            continue
        next_rec, data_crc = struct.unpack_from("<II", chunk, 48)
        if next_rec > CHUNK_SIZE or \
                _z.crc32(chunk[CHUNK_HEADER_SIZE:next_rec]) \
                & 0xFFFFFFFF != data_crc:
            continue
        off = CHUNK_HEADER_SIZE
        while off < next_rec:
            if chunk[off:off + 4] != RECORD_MAGIC:
                break
            size, rid, ft = struct.unpack_from("<IQQ", chunk, off + 4)
            if (size < RECORD_OVERHEAD or off + size > next_rec
                    or struct.unpack_from("<I", chunk,
                                          off + size - 4)[0] != size):
                break
            yield (count, rid, ft,
                   chunk[off + RECORD_HEADER_SIZE:off + size - 4],
                   chunk, off + RECORD_HEADER_SIZE)
            off += size


# ---------------------------------------------------------------------------
# BinXML — encoder/decoder for the self-contained token subset
# ---------------------------------------------------------------------------

_TOK_EOF = 0x00
_TOK_OPEN = 0x01          # | 0x40 when the element carries attributes
_TOK_CLOSE_START = 0x02
_TOK_CLOSE_EMPTY = 0x03
_TOK_END = 0x04
_TOK_VALUE = 0x05         # | 0x40 inside attribute lists
_TOK_ATTR = 0x06          # | 0x40 when more attributes follow
_TOK_CDATA = 0x07         # | 0x40 inside attribute lists
_TOK_CHARREF = 0x08       # &#NNNN;
_TOK_ENTITYREF = 0x09     # &name;
_TOK_PI_TARGET = 0x0A
_TOK_PI_DATA = 0x0B
_TOK_TEMPLATE = 0x0C
_TOK_SUBST = 0x0D         # normal substitution
_TOK_SUBST_OPT = 0x0E     # optional substitution (null → omit)
_TOK_FRAGMENT = 0x0F

_VT_NULL = 0x00
_VT_STRING = 0x01
_VT_ANSI = 0x02
_VT_INT8 = 0x03
_VT_UINT8 = 0x04
_VT_INT16 = 0x05
_VT_UINT16 = 0x06
_VT_INT32 = 0x07
_VT_UINT32 = 0x08
_VT_INT64 = 0x09
_VT_UINT64 = 0x0A
_VT_REAL32 = 0x0B
_VT_REAL64 = 0x0C
_VT_BOOL = 0x0D
_VT_BINARY = 0x0E
_VT_GUID = 0x0F
_VT_SIZET = 0x10
_VT_FILETIME = 0x11
_VT_SYSTIME = 0x12
_VT_SID = 0x13
_VT_HEX32 = 0x14
_VT_HEX64 = 0x15
_VT_BINXML = 0x21         # value is itself a BinXML fragment (EventData)

_VT_INTS = {_VT_INT8: ("<b", 1), _VT_UINT8: ("<B", 1),
            _VT_INT16: ("<h", 2), _VT_UINT16: ("<H", 2),
            _VT_INT32: ("<i", 4), _VT_UINT32: ("<I", 4),
            _VT_INT64: ("<q", 8), _VT_UINT64: ("<Q", 8)}


class BinXmlResidentRef(NotImplementedError):
    """A name/template offset points OUTSIDE this record's payload —
    chunk-resident state, the declared remaining seam."""


def _render_guid(b: bytes) -> str:
    d1, d2, d3 = struct.unpack_from("<IHH", b, 0)
    return (f"{d1:08x}-{d2:04x}-{d3:04x}-"
            f"{b[8:10].hex()}-{b[10:16].hex()}")


def _render_filetime(ft: int) -> str:
    from datetime import datetime, timedelta
    us = ft // 10 - _FILETIME_EPOCH_US
    dt = datetime(1970, 1, 1) + timedelta(microseconds=us)
    return dt.strftime("%Y-%m-%dT%H:%M:%S.") + f"{dt.microsecond:06d}Z"


def _render_sid(b: bytes) -> str:
    rev, nsub = b[0], b[1]
    auth = int.from_bytes(b[2:8], "big")
    subs = struct.unpack_from(f"<{nsub}I", b, 8)
    return "S-" + "-".join(str(x) for x in (rev, auth, *subs))


def _render_systime(b: bytes) -> str:
    y, mo, _dow, d, h, mi, s, ms = struct.unpack("<8H", b)
    return f"{y:04d}-{mo:02d}-{d:02d}T{h:02d}:{mi:02d}:{s:02d}.{ms:03d}Z"


def _render_value(vtype: int, data: bytes) -> str:
    if vtype == _VT_NULL:
        return ""
    if vtype == _VT_STRING:
        return data.decode("utf-16-le")
    if vtype == _VT_ANSI:
        return data.decode("cp1252")
    if vtype in _VT_INTS:
        fmt, _ = _VT_INTS[vtype]
        return str(struct.unpack(fmt, data)[0])
    if vtype == _VT_REAL32:
        return f"{struct.unpack('<f', data)[0]:g}"
    if vtype == _VT_REAL64:
        return f"{struct.unpack('<d', data)[0]:g}"
    if vtype == _VT_BOOL:
        return "true" if struct.unpack("<I", data)[0] else "false"
    if vtype == _VT_BINARY:
        return data.hex()
    if vtype == _VT_SIZET:
        v = struct.unpack("<I" if len(data) == 4 else "<Q", data)[0]
        return f"0x{v:x}"
    if vtype == _VT_FILETIME:
        return _render_filetime(struct.unpack("<Q", data)[0])
    if vtype == _VT_SYSTIME:
        return _render_systime(data)
    if vtype == _VT_GUID:
        return _render_guid(data)
    if vtype == _VT_SID:
        return _render_sid(data)
    if vtype == _VT_HEX32:
        return f"0x{struct.unpack('<I', data)[0]:x}"
    if vtype == _VT_HEX64:
        return f"0x{struct.unpack('<Q', data)[0]:x}"
    if vtype & 0x80:
        return ",".join(_render_value(vtype & 0x7F, el)
                        for el in _split_array(vtype & 0x7F, data))
    raise NotImplementedError(f"BinXML value type 0x{vtype:02x}")


_VT_FIXED_SIZES = {_VT_REAL32: 4, _VT_REAL64: 8, _VT_BOOL: 4,
                   _VT_GUID: 16, _VT_SIZET: 8, _VT_FILETIME: 8,
                   _VT_SYSTIME: 16, _VT_HEX32: 4, _VT_HEX64: 8}


def _split_array(base: int, data: bytes) -> list[bytes]:
    """Array value payload → element payloads. Fixed-size types pack
    back-to-back; UTF-16/ANSI string arrays are NUL-terminated strings
    back-to-back; SIDs are self-describing (8 + 4·subauth-count bytes).
    Binary arrays stay out — the format carries no per-element length,
    so they are not representable (matching the reference's behavior)."""
    if base == _VT_STRING:
        out, i = [], 0
        while i < len(data):
            j = i
            while j < len(data) and data[j:j + 2] != b"\x00\x00":
                j += 2
            out.append(data[i:j])
            i = j + 2
        return out
    if base == _VT_ANSI:
        out, i = [], 0
        while i < len(data):
            j = data.find(b"\x00", i)
            if j < 0:
                j = len(data)
            out.append(data[i:j])
            i = j + 1
        return out
    if base == _VT_SID:
        out, i = [], 0
        while i < len(data):
            size = 8 + 4 * data[i + 1]
            out.append(data[i:i + size])
            i += size
        return out
    size = _VT_INTS[base][1] if base in _VT_INTS \
        else _VT_FIXED_SIZES.get(base)
    if size is None:
        raise NotImplementedError(
            f"array of value type 0x{base:02x}")
    return [data[i:i + size] for i in range(0, len(data), size)]


def _xml_escape(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;").replace('"', "&quot;"))


class _BinXmlReader:
    """Token-stream reader. ``buf`` is either one record payload
    (self-contained decode: offsets are payload-relative) or a WHOLE
    CHUNK (chunk-context decode: offsets are chunk-relative, and
    name/template offsets pointing at EARLIER positions resolve as
    back-references — the chunk-resident case). ``resident=False``
    keeps the strict self-contained behavior (raises
    BinXmlResidentRef)."""

    def __init__(self, buf: bytes, pos: int = 0, resident: bool = False):
        self.buf = buf
        self.pos = pos
        self.resident = resident

    def u8(self):
        v = self.buf[self.pos]
        self.pos += 1
        return v

    def take(self, fmt: str):
        v = struct.unpack_from(fmt, self.buf, self.pos)
        self.pos += struct.calcsize(fmt)
        return v if len(v) > 1 else v[0]

    def raw(self, n: int) -> bytes:
        b = self.buf[self.pos:self.pos + n]
        self.pos += n
        return b

    def peek(self) -> int:
        return self.buf[self.pos] if self.pos < len(self.buf) else _TOK_EOF

    def _name_at(self, off: int) -> str:
        """Parse a NameStringNode (next-string offset u32, hash u16,
        nchars u16, utf-16 chars, nul — the real chunk string-table
        entry layout) at an arbitrary offset without moving the
        cursor."""
        nchars = struct.unpack_from("<H", self.buf, off + 6)[0]
        return self.buf[off + 8:off + 8 + nchars * 2].decode("utf-16-le")

    # -- grammar ----------------------------------------------------------
    def name(self) -> str:
        off = self.take("<I")
        if off != self.pos:
            # back-reference to name data stored earlier in the chunk
            if not (self.resident and 0 <= off < self.pos):
                raise BinXmlResidentRef(
                    f"name offset 0x{off:x} is chunk-resident")
            return self._name_at(off)
        # inline: the full NameStringNode follows the offset field
        self.take("<I")   # next-string offset (hash-bucket chain)
        self.take("<H")   # name hash (unverified, like the checksums)
        nchars = self.take("<H")
        s = self.raw(nchars * 2).decode("utf-16-le")
        self.take("<H")  # nul terminator
        return s

    def value_text(self) -> str:
        tok = self.u8()
        assert tok & 0x3F == _TOK_VALUE, f"expected value token, got {tok:#x}"
        vtype = self.u8()
        if vtype != _VT_STRING:
            raise NotImplementedError(
                f"value-text type 0x{vtype:02x} (spec says string)")
        nchars = self.take("<H")
        return self.raw(nchars * 2).decode("utf-16-le")

    def cdata(self) -> str:
        tok = self.u8()
        assert tok & 0x3F == _TOK_CDATA, f"expected CDATA, got {tok:#x}"
        nchars = self.take("<H")
        return "<![CDATA[" + self.raw(nchars * 2).decode("utf-16-le") \
            + "]]>"

    def charref(self) -> str:
        tok = self.u8()
        assert tok & 0x3F == _TOK_CHARREF, f"expected charref, got {tok:#x}"
        return f"&#{self.take('<H')};"

    def entityref(self) -> str:
        tok = self.u8()
        assert tok & 0x3F == _TOK_ENTITYREF, \
            f"expected entityref, got {tok:#x}"
        return f"&{self.name()};"

    def pi(self) -> str:
        tok = self.u8()
        assert tok == _TOK_PI_TARGET, f"expected PI target, got {tok:#x}"
        target = self.name()
        data = ""
        if self.peek() == _TOK_PI_DATA:
            self.u8()
            nchars = self.take("<H")
            data = self.raw(nchars * 2).decode("utf-16-le")
        return f"<?{target} {data}?>" if data else f"<?{target}?>"

    def _attr_piece(self, subs) -> str | None:
        """One piece of an attribute value (values concatenate per the
        spec); None when the next token ends the attribute."""
        nxt = self.peek()
        low = nxt & 0x3F
        if low == _TOK_VALUE:
            return _xml_escape(self.value_text())
        if low == _TOK_CHARREF:
            return self.charref()
        if low == _TOK_ENTITYREF:
            return self.entityref()
        if nxt in (_TOK_SUBST, _TOK_SUBST_OPT):
            self.u8()
            sid = self.take("<H")
            self.u8()  # declared type; actual comes with the value
            return _xml_escape(subs[sid][1]) if subs else f"{{sub:{sid}}}"
        return None

    def element(self, subs: list[tuple[int, str]] | None) -> str:
        tok = self.u8()
        has_attrs = bool(tok & 0x40)
        assert tok & 0x3F == _TOK_OPEN, f"expected element, got {tok:#x}"
        self.take("<h")   # dependency id (template context; -1 outside)
        self.take("<I")   # data size
        nm = self.name()
        parts = [f"<{nm}"]
        if has_attrs:
            self.take("<I")  # attribute-list byte size
            while True:
                atok = self.peek()
                if atok & 0x3F != _TOK_ATTR:
                    break
                self.u8()
                aname = self.name()
                pieces = []
                while True:
                    piece = self._attr_piece(subs)
                    if piece is None:
                        break
                    pieces.append(piece)
                if not pieces:
                    raise NotImplementedError(
                        f"attribute value token {self.peek():#x}")
                parts.append(f' {aname}="{"".join(pieces)}"')
                if not (atok & 0x40):   # 0x06 (no continue flag) = last
                    break
        closer = self.u8()
        if closer == _TOK_CLOSE_EMPTY:
            parts.append("/>")
            return "".join(parts)
        assert closer == _TOK_CLOSE_START, f"bad closer {closer:#x}"
        parts.append(">")
        while True:
            nxt = self.peek()
            if nxt == _TOK_END:
                self.u8()
                break
            if nxt & 0x3F == _TOK_OPEN:
                parts.append(self.element(subs))
            elif nxt & 0x3F == _TOK_VALUE:
                parts.append(_xml_escape(self.value_text()))
            elif nxt & 0x3F == _TOK_CDATA:
                parts.append(self.cdata())
            elif nxt & 0x3F == _TOK_CHARREF:
                parts.append(self.charref())
            elif nxt & 0x3F == _TOK_ENTITYREF:
                parts.append(self.entityref())
            elif nxt == _TOK_PI_TARGET:
                parts.append(self.pi())
            elif nxt in (_TOK_SUBST, _TOK_SUBST_OPT):
                self.u8()
                sid = self.take("<H")
                self.u8()
                if subs is not None:
                    vt, rendered = subs[sid]
                    if not (nxt == _TOK_SUBST_OPT and vt == _VT_NULL):
                        # embedded-BinXML substitutions are MARKUP — they
                        # splice in unescaped (how EventData rides in real
                        # events); every scalar type escapes as text.
                        parts.append(rendered if vt == _VT_BINXML
                                     else _xml_escape(rendered))
                else:
                    parts.append(f"{{sub:{sid}}}")
            else:
                raise NotImplementedError(f"content token {nxt:#x}")
        parts.append(f"</{nm}>")
        return "".join(parts)

    def fragment(self) -> str:
        tok = self.u8()
        assert tok == _TOK_FRAGMENT, f"expected fragment header, got {tok:#x}"
        self.raw(3)  # major, minor, flags
        nxt = self.peek()
        if nxt == _TOK_TEMPLATE:
            return self.template_instance()
        return self.element(None)

    def template_instance(self) -> str:
        self.u8()          # 0x0c
        self.u8()          # version
        self.take("<I")    # template id
        def_off = self.take("<I")
        if def_off != self.pos:
            # back-reference: the definition (next-offset, guid, size,
            # fragment body, EOF) lives at an earlier chunk offset; the
            # instance continues directly with the substitution values.
            if not (self.resident and 0 <= def_off < self.pos):
                raise BinXmlResidentRef(
                    f"template definition offset 0x{def_off:x} is "
                    "chunk-resident")
            rd = _BinXmlReader(self.buf, def_off, resident=self.resident)
            rd.take("<I")   # next-template offset
            rd.raw(16)      # template guid
            rd.take("<I")   # definition byte size
            tok = rd.u8()
            assert tok == _TOK_FRAGMENT, \
                "template body must open a fragment"
            rd.raw(3)
            body_start = rd.pos
        else:
            self.take("<I")    # next-template offset
            self.raw(16)       # template guid
            self.take("<I")    # definition byte size
            tok = self.u8()
            assert tok == _TOK_FRAGMENT, \
                "template body must open a fragment"
            self.raw(3)
            body_start = self.pos
            self.element(None)             # first pass: find extent
            if self.u8() != _TOK_EOF:
                raise ValueError("template body missing EOF")
        # substitution values: count, then (size u16, type u8, pad u8)*,
        # then the value bytes back-to-back
        count = self.take("<I")
        specs = [self.take("<HBB")[:2] for _ in range(count)]
        subs: list[tuple[int, str]] = []
        for size, vtype in specs:
            if vtype == _VT_BINXML:
                # the value bytes are themselves a BinXML fragment whose
                # internal offsets are relative to the SAME buffer — decode
                # in place (works for both payload- and chunk-relative
                # modes), then skip over the value bytes.
                start = self.pos
                self.raw(size)
                rd = _BinXmlReader(self.buf, start, resident=self.resident)
                subs.append((vtype, rd.fragment()))
            else:
                subs.append((vtype, _render_value(vtype, self.raw(size))))
        # second pass over the body with values bound
        rd = _BinXmlReader(self.buf, body_start, resident=self.resident)
        return rd.element(subs)


def decode_binxml(payload: bytes) -> str:
    """BinXML payload → XML text (self-contained: offsets are
    payload-relative). Raises BinXmlResidentRef for chunk-resident
    name/template references and NotImplementedError for tokens
    outside the subset."""
    return _BinXmlReader(payload).fragment()


def decode_binxml_in_chunk(chunk: bytes, payload_off: int) -> str:
    """BinXML decode with the WHOLE CHUNK as context: offsets are
    chunk-relative, and name/template offsets pointing at earlier
    chunk positions resolve as back-references — the chunk-resident
    case that a bare-payload decode cannot handle."""
    return _BinXmlReader(chunk, payload_off, resident=True).fragment()


class _BinXmlWriter:
    """Encoder emitting exactly the layout decode_binxml consumes — the
    test/gate synthesizer's analog of the reference's checked-in .evtx
    resources. With ``base``/``registry`` (chunk-relative mode), names
    and template definitions already in the registry encode as
    back-references to their first chunk occurrence, like real EVTX
    writers."""

    def __init__(self, base: int = 0, registry: dict | None = None):
        self.out = bytearray()
        self.base = base
        self.registry = registry

    def _name(self, s: str):
        key = ("name", s)
        if self.registry is not None and key in self.registry:
            self.out += struct.pack("<I", self.registry[key])
            return
        # inline name: offset == position right after the offset field;
        # the NameStringNode leads with its next-string chain offset
        # (0 here — the bucket chains live in real writers' hash table)
        off = self.base + len(self.out) + 4
        self.out += struct.pack("<I", off)
        if self.registry is not None:
            self.registry[key] = off
        self.out += struct.pack("<IHH", 0, 0, len(s))
        self.out += s.encode("utf-16-le") + b"\x00\x00"

    def _value_text(self, s: str, in_attr: bool = False):
        self.out.append(_TOK_VALUE | (0x40 if in_attr else 0))
        self.out.append(_VT_STRING)
        self.out += struct.pack("<H", len(s))
        self.out += s.encode("utf-16-le")

    def element(self, name: str, attrs: list[tuple[str, object]] = (),
                children: list = (), text: object = None):
        """children: nested ('name', attrs, children, text) tuples or
        callables; attr/text values: str, or ('sub', id) placeholders."""
        self.out.append(_TOK_OPEN | (0x41 - 0x01 if attrs else 0))
        self.out += struct.pack("<h", -1)
        size_pos = len(self.out)
        self.out += b"\x00\x00\x00\x00"      # data size, patched below
        self._name(name)
        if attrs:
            alist_pos = len(self.out)
            self.out += b"\x00\x00\x00\x00"  # attr-list size, patched
            for i, (an, av) in enumerate(attrs):
                self.out.append(_TOK_ATTR | (0x40 if i < len(attrs) - 1
                                             else 0))
                self._name(an)
                self._attr_value(av)
            struct.pack_into("<I", self.out, alist_pos,
                             len(self.out) - alist_pos - 4)
        if not children and text is None:
            self.out.append(_TOK_CLOSE_EMPTY)
        else:
            self.out.append(_TOK_CLOSE_START)
            if text is not None:
                self._content_value(text)
            for ch in children:
                self._child(ch)
            self.out.append(_TOK_END)
        struct.pack_into("<I", self.out, size_pos,
                         len(self.out) - size_pos - 4)

    def _child(self, ch):
        """A child spec: ('cdata', s) / ('charref', n) /
        ('entityref', name) / ('pi', target, data) special nodes, else
        a nested (name, attrs, children, text) element tuple. A tuple
        only dispatches as a special node when its SHAPE matches (second
        item scalar) — an element that happens to be named 'pi' carries
        a list of attrs there and still encodes as an element."""
        kind = ch[0] if ch else None
        is_special = (kind in ("cdata", "charref", "entityref", "pi")
                      and len(ch) >= 2 and len(ch) <= 3
                      and not isinstance(ch[1], (list, tuple)))
        if not is_special:
            self.element(*ch)
        elif kind == "cdata":
            self.out.append(_TOK_CDATA)
            self.out += struct.pack("<H", len(ch[1]))
            self.out += ch[1].encode("utf-16-le")
        elif kind == "charref":
            self.out.append(_TOK_CHARREF)
            self.out += struct.pack("<H", int(ch[1]))
        elif kind == "entityref":
            self.out.append(_TOK_ENTITYREF)
            self._name(ch[1])
        elif kind == "pi":
            self.out.append(_TOK_PI_TARGET)
            self._name(ch[1])
            data = ch[2] if len(ch) > 2 else ""
            self.out.append(_TOK_PI_DATA)
            self.out += struct.pack("<H", len(data))
            self.out += data.encode("utf-16-le")

    def _attr_value(self, v):
        if isinstance(v, tuple) and v[0] == "sub":
            self.out.append(_TOK_SUBST)
            self.out += struct.pack("<HB", v[1], _VT_STRING)
        else:
            self._value_text(str(v), in_attr=True)

    def _content_value(self, v):
        if isinstance(v, tuple) and v[0] == "sub":
            tok = _TOK_SUBST_OPT if len(v) > 2 and v[2] == "opt" \
                else _TOK_SUBST
            self.out.append(tok)
            self.out += struct.pack("<HB", v[1], _VT_STRING)
        else:
            self._value_text(str(v))


def encode_binxml(name: str, attrs=(), children=(), text=None,
                  base: int = 0, registry: dict | None = None) -> bytes:
    """One BinXML fragment with a literal element tree. Self-contained
    with the defaults; with base/registry, names dedup chunk-wide as
    back-references."""
    w = _BinXmlWriter(base, registry)
    w.out.append(_TOK_FRAGMENT)
    w.out += b"\x01\x01\x00"
    w.element(name, list(attrs), list(children), text)
    w.out.append(_TOK_EOF)
    return bytes(w.out)


def encode_binxml_template(name: str, attrs=(), children=(), text=None,
                           values: list[tuple[int, object]] = (),
                           template_id: int = 1, base: int = 0,
                           registry: dict | None = None) -> bytes:
    """A template-instance fragment: definition whose body uses
    ('sub', i) placeholders, plus typed substitution values
    [(value_type, python_value), ...]. FILETIME values are given as unix
    microseconds, GUIDs as canonical strings.

    Self-contained by default (inline definition). With base/registry,
    the FIRST instance of ``template_id`` in a chunk carries the inline
    definition and registers it; later instances encode only the
    back-reference offset plus their substitution values — the
    chunk-resident layout."""
    w = _BinXmlWriter(base, registry)
    w.out.append(_TOK_FRAGMENT)
    w.out += b"\x01\x01\x00"
    w.out.append(_TOK_TEMPLATE)
    w.out.append(0x01)
    w.out += struct.pack("<I", template_id)
    tkey = ("template", template_id)
    if registry is not None and tkey in registry:
        w.out += struct.pack("<I", registry[tkey])   # back-reference
    else:
        def_off = base + len(w.out) + 4
        w.out += struct.pack("<I", def_off)          # inline definition
        if registry is not None:
            registry[tkey] = def_off
        w.out += struct.pack("<I", 0)                # next-template
        w.out += b"\x00" * 16                        # template guid
        dsz_pos = len(w.out)
        w.out += b"\x00\x00\x00\x00"
        body_start = len(w.out)
        w.out.append(_TOK_FRAGMENT)
        w.out += b"\x01\x01\x00"
        w.element(name, list(attrs), list(children), text)
        w.out.append(_TOK_EOF)
        struct.pack_into("<I", w.out, dsz_pos, len(w.out) - body_start)
    # Embedded-BinXML values (0x21) need the absolute position of their
    # value bytes as encoding base (their internal name offsets are
    # buffer-relative). Sizes are base-independent (offsets are fixed
    # u32), so: size everything with base 0 first, then re-encode the
    # embedded fragments at their final positions.
    blobs: list[bytes] = []
    for vt, v in values:
        if vt == _VT_BINXML:
            blobs.append(encode_binxml(*v))        # sizing pass (base 0)
        else:
            blobs.append(_pack_value(vt, v))
    pos0 = base + len(w.out) + 4 + 4 * len(values)  # first value byte
    off = 0
    for i, (vt, v) in enumerate(values):
        if vt == _VT_BINXML:
            blobs[i] = encode_binxml(*v, base=pos0 + off)
        off += len(blobs[i])
    w.out += struct.pack("<I", len(blobs))
    for (vt, _), b in zip(values, blobs):
        w.out += struct.pack("<HBB", len(b), vt, 0)
    for b in blobs:
        w.out += b
    return bytes(w.out)


def _pack_value(vtype: int, v) -> bytes:
    if vtype == _VT_NULL:
        return b""
    if vtype == _VT_STRING:
        return str(v).encode("utf-16-le")
    if vtype in _VT_INTS:
        return struct.pack(_VT_INTS[vtype][0], int(v))
    if vtype == _VT_FILETIME:
        return struct.pack("<Q", _us_to_filetime(int(v)))
    if vtype == _VT_GUID:
        s = str(v).replace("-", "")
        return (struct.pack("<IHH", int(s[:8], 16), int(s[8:12], 16),
                            int(s[12:16], 16))
                + bytes.fromhex(s[16:]))
    if vtype == _VT_ANSI:
        return str(v).encode("cp1252")
    if vtype == _VT_REAL32:
        return struct.pack("<f", float(v))
    if vtype == _VT_REAL64:
        return struct.pack("<d", float(v))
    if vtype == _VT_BOOL:
        return struct.pack("<I", 1 if v else 0)
    if vtype == _VT_BINARY:
        return bytes(v)
    if vtype in (_VT_SIZET, _VT_HEX64):
        return struct.pack("<Q", int(v))
    if vtype == _VT_HEX32:
        return struct.pack("<I", int(v))
    if vtype == _VT_SYSTIME:
        y, mo, dow, d, h, mi, s, ms = v
        return struct.pack("<8H", y, mo, dow, d, h, mi, s, ms)
    if vtype == _VT_SID:
        parts = str(v).split("-")       # S-rev-auth-sub...
        rev, auth = int(parts[1]), int(parts[2])
        subs = [int(x) for x in parts[3:]]
        return (bytes([rev, len(subs)]) + auth.to_bytes(6, "big")
                + struct.pack(f"<{len(subs)}I", *subs))
    if vtype & 0x80:
        base = vtype & 0x7F
        if base == _VT_STRING:
            return b"".join(str(el).encode("utf-16-le") + b"\x00\x00"
                            for el in v)
        if base == _VT_ANSI:
            return b"".join(str(el).encode("cp1252") + b"\x00"
                            for el in v)
        return b"".join(_pack_value(base, el) for el in v)
    raise NotImplementedError(f"pack value type 0x{vtype:02x}")


def parse_evtx(df: DataFrame, content_col: str = "content",
               id_col: str | None = None,
               decode_stub: bool = True) -> DataFrame:
    """One output row per event record in each EVTX blob.

    Emits (src_id, chunk_index, record_id, record_time_us, payload_len,
    payload_md5, xml). record_time_us is the exact integer microsecond
    epoch recovered from the FILETIME field — integer arithmetic both
    ways, so a pack→parse roundtrip is lossless and SQL-oracle-checkable.
    The xml column is the real decode_binxml output for self-contained
    payloads; records needing chunk-resident state (or whose payload is
    not BinXML at all) yield the digest placeholder when
    decode_stub=True and raise when decode_stub=False (see module doc).
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                blob = bytes(r[content_col])
                src = int(r[id_col]) if id_col else -1
                for ci, rid, ft, payload, chunk, poff in \
                        _walk_records(blob):
                    md5 = hashlib.md5(payload).hexdigest()
                    try:
                        try:
                            # self-contained records decode standalone;
                            # chunk-resident back-references retry with
                            # the whole chunk as offset context
                            xml = decode_binxml(payload)
                        except BinXmlResidentRef:
                            xml = decode_binxml_in_chunk(chunk, poff)
                    except (NotImplementedError, AssertionError,
                            ValueError, IndexError, struct.error,
                            UnicodeDecodeError) as e:
                        if not decode_stub:
                            raise NotImplementedError(
                                f"BinXML decode failed for record "
                                f"{rid}: {e}") from e
                        xml = f'<Event RecordID="{rid}" MD5="{md5}"/>'
                    rows.append((src, ci, rid, _filetime_to_us(ft),
                                 len(payload), md5, xml))
            yield pd.DataFrame(rows, columns=[
                "src_id", "chunk_index", "record_id", "record_time_us",
                "payload_len", "payload_md5", "xml"])

    return df.mapInPandas(run, schema=PARSED_SCHEMA)


CHUNK_STATUS_SCHEMA = ("src_id long, chunk int, status string, "
                       "n_records int")


def parse_evtx_chunks(df: DataFrame, content_col: str = "content",
                      id_col: str | None = None) -> DataFrame:
    """One row per processed chunk with the reference's validation
    verdicts (evtx_chunk_status) — the BAD_CHUNK relationship analog:
    (src_id, chunk, status ok|bad_header|bad_records, n_records)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                src = int(r[id_col]) if id_col else -1
                for st in evtx_chunk_status(bytes(r[content_col])):
                    rows.append((src, st["chunk"], st["status"],
                                 st["n_records"]))
            yield pd.DataFrame(rows, columns=["src_id", "chunk",
                                              "status", "n_records"])

    return df.mapInPandas(run, schema=CHUNK_STATUS_SCHEMA)
