"""Parquet footer / row-group metadata walker + encoder companion — the
planner-side read a 100 TB lakehouse does before every scan (row-group
census, min/max pruning, column-chunk layout), implemented from the PUBLIC
parquet-format and Apache Thrift compact-protocol specs. Pure stdlib byte
walking; no parquet library involved on the read path, so the walker
cross-validates the engines that wrote the files (pytest pins it against
pyarrow's metadata on the driver's own fixture files, and the q338 oracle
replays the same census through DuckDB's independent C++ reader).

No reference parity (the reference has no columnar storage at all —
db.mjs is row-oriented SQLite); §7 extension surface in the q329 walker
discipline: an encoder companion (``encode_parquet``) emits REAL minimal
parquet files (PLAIN encoding, uncompressed, required columns, per-chunk
statistics) that pyarrow and DuckDB read back value-exact, so the walker
is exercised end-to-end without fixture blobs in the repo.

Format facts used (parquet-format THRIFT spec + thrift compact protocol):
  - file = "PAR1" .. data pages .. FileMetaData(thrift compact)
    .. 4-byte LE footer length .. "PAR1";
  - thrift compact: field header byte = (id_delta << 4) | ctype, id_delta
    0 -> explicit zigzag-varint field id; ints are zigzag ULEB128; binary
    is varint length + bytes; list header = (size << 4) | elem_ctype with
    size 15 -> explicit varint; bool is encoded IN the field header
    (ctype 1 true / 2 false) inside structs, one byte inside lists;
  - FileMetaData ids: 1 version, 2 schema, 3 num_rows, 4 row_groups,
    6 created_by; SchemaElement: 1 type, 2 type_length (FLBA width),
    3 repetition, 4 name, 5 num_children; RowGroup: 1 columns, 2 total_byte_size, 3 num_rows;
    ColumnChunk: 2 file_offset, 3 meta_data; ColumnMetaData: 1 type,
    2 encodings, 3 path_in_schema, 4 codec, 5 num_values,
    6 total_uncompressed_size, 7 total_compressed_size,
    9 data_page_offset, 11 dictionary_page_offset, 12 statistics;
    Statistics: 1 max(legacy), 2 min(legacy), 3 null_count,
    5 max_value, 6 min_value.

Truncation or framing damage raises ValueError naming the problem.
"""

from __future__ import annotations

import struct as _struct_mod

__all__ = ["encode_parquet", "parquet_footer", "footer_census", "read_values"]

MAGIC = b"PAR1"

# thrift compact wire types
_CT_BOOL_TRUE = 1
_CT_BOOL_FALSE = 2
_CT_BYTE = 3
_CT_I16 = 4
_CT_I32 = 5
_CT_I64 = 6
_CT_DOUBLE = 7
_CT_BINARY = 8
_CT_LIST = 9
_CT_SET = 10
_CT_MAP = 11
_CT_STRUCT = 12

PHYSICAL_TYPES = {
    0: "BOOLEAN",
    1: "INT32",
    2: "INT64",
    3: "INT96",
    4: "FLOAT",
    5: "DOUBLE",
    6: "BYTE_ARRAY",
    7: "FIXED_LEN_BYTE_ARRAY",
}
CODECS = {
    0: "UNCOMPRESSED",
    1: "SNAPPY",
    2: "GZIP",
    3: "LZO",
    4: "BROTLI",
    5: "LZ4",
    6: "ZSTD",
    7: "LZ4_RAW",
}
ENCODINGS = {
    0: "PLAIN",
    2: "PLAIN_DICTIONARY",
    3: "RLE",
    4: "BIT_PACKED",
    5: "DELTA_BINARY_PACKED",
    6: "DELTA_LENGTH_BYTE_ARRAY",
    7: "DELTA_BYTE_ARRAY",
    8: "RLE_DICTIONARY",
    9: "BYTE_STREAM_SPLIT",
}
REPETITIONS = {0: "REQUIRED", 1: "OPTIONAL", 2: "REPEATED"}


# ---------------------------------------------------------------- reader

class _Reader:
    __slots__ = ("b", "i")

    def __init__(self, b: bytes) -> None:
        self.b = b
        self.i = 0

    def u8(self) -> int:
        if self.i >= len(self.b):
            raise ValueError("truncated parquet footer: thrift walk past end")
        v = self.b[self.i]
        self.i += 1
        return v

    def take(self, n: int) -> bytes:
        if n < 0 or self.i + n > len(self.b):
            raise ValueError("truncated parquet footer: thrift walk past end")
        v = self.b[self.i : self.i + n]
        self.i += n
        return v

    def varint(self) -> int:
        out = shift = 0
        while True:
            byte = self.u8()
            out |= (byte & 0x7F) << shift
            if not byte & 0x80:
                return out
            shift += 7
            if shift > 70:
                raise ValueError("malformed parquet footer: varint too long")

    def zigzag(self) -> int:
        v = self.varint()
        return (v >> 1) ^ -(v & 1)


def _read_value(r: _Reader, ctype: int):
    if ctype == _CT_BOOL_TRUE:
        return True
    if ctype == _CT_BOOL_FALSE:
        return False
    if ctype == _CT_BYTE:
        v = r.u8()
        return v - 256 if v > 127 else v
    if ctype in (_CT_I16, _CT_I32, _CT_I64):
        return r.zigzag()
    if ctype == _CT_DOUBLE:
        return _struct_mod.unpack("<d", r.take(8))[0]
    if ctype == _CT_BINARY:
        return r.take(r.varint())
    if ctype in (_CT_LIST, _CT_SET):
        head = r.u8()
        size, etype = head >> 4, head & 0x0F
        if size == 15:
            size = r.varint()
        if etype in (_CT_BOOL_TRUE, _CT_BOOL_FALSE):
            return [r.u8() == _CT_BOOL_TRUE for _ in range(size)]
        return [_read_value(r, etype) for _ in range(size)]
    if ctype == _CT_MAP:
        size = r.varint()
        if size == 0:
            return {}
        kv = r.u8()
        kt, vt = kv >> 4, kv & 0x0F
        return {_read_value(r, kt): _read_value(r, vt) for _ in range(size)}
    if ctype == _CT_STRUCT:
        return _read_struct(r)
    raise ValueError(f"malformed parquet footer: unknown thrift type {ctype}")


def _read_struct(r: _Reader) -> dict:
    """Generic compact-protocol struct walk -> {field_id: value}. Unknown
    fields parse by wire type and land in the dict harmlessly — forward
    compatible with every writer extension (column orders, bloom offsets,
    encoding stats, logical types)."""
    out: dict = {}
    fid = 0
    while True:
        head = r.u8()
        if head == 0:
            return out
        delta, ctype = head >> 4, head & 0x0F
        fid = fid + delta if delta else r.zigzag()
        out[fid] = _read_value(r, ctype)


def _decode_stat(raw, ptype: int):
    """Decode a Statistics min/max payload by physical type (plain
    encoding per spec). BYTE_ARRAY decodes utf-8 best-effort (stats of
    string columns are truncatable byte prefixes)."""
    if raw is None:
        return None
    if ptype == 1:
        return _struct_mod.unpack("<i", raw[:4])[0] if len(raw) >= 4 else None
    if ptype == 2:
        return _struct_mod.unpack("<q", raw[:8])[0] if len(raw) >= 8 else None
    if ptype == 4:
        return _struct_mod.unpack("<f", raw[:4])[0] if len(raw) >= 4 else None
    if ptype == 5:
        return _struct_mod.unpack("<d", raw[:8])[0] if len(raw) >= 8 else None
    if ptype == 0:
        return bool(raw[0]) if raw else None
    if isinstance(raw, (bytes, bytearray)):
        return raw.decode("utf-8", "replace")
    return raw


def parquet_footer(blob: bytes) -> dict:
    """Walk a parquet file's footer (no data pages touched — exactly the
    fan-out-without-scan read a planner does): file-level facts plus the
    full row-group / column-chunk census with decoded min/max statistics."""
    if len(blob) < 12:
        raise ValueError("truncated parquet file: shorter than magic framing")
    if blob[:4] != MAGIC:
        raise ValueError("not a parquet file: missing leading PAR1 magic")
    if blob[-4:] != MAGIC:
        raise ValueError("truncated parquet file: missing trailing PAR1 magic")
    (flen,) = _struct_mod.unpack("<I", blob[-8:-4])
    if flen + 12 > len(blob):
        raise ValueError(
            f"truncated parquet file: footer length {flen} exceeds file size"
        )
    fmd = _read_struct(_Reader(bytes(blob[len(blob) - 8 - flen : len(blob) - 8])))
    schema = []
    for se in fmd.get(2, []) or []:
        schema.append(
            {
                "name": (se.get(4) or b"").decode("utf-8", "replace"),
                "type": PHYSICAL_TYPES.get(se.get(1)),
                "type_length": se.get(2),  # FIXED_LEN_BYTE_ARRAY width
                "repetition": REPETITIONS.get(se.get(3)),
                "num_children": se.get(5, 0) or 0,
            }
        )
    # Annotate each element with its dotted path and the Dremel level
    # geometry (max definition / repetition level = count of non-REQUIRED /
    # REPEATED ancestors incl. self) by replaying the flat depth-first
    # element list against each node's num_children — the same walk any
    # parquet reader does to recover the tree (parquet-format
    # LogicalTypes.md / Dremel record shredding).
    if schema:
        stack: list = []  # (remaining_children, path_parts, max_def, max_rep)
        root = schema[0]
        stack.append([root["num_children"], [], 0, 0])
        for el in schema[1:]:
            while stack and stack[-1][0] == 0:
                stack.pop()
            if not stack:
                raise ValueError("malformed parquet footer: schema tree overflow")
            stack[-1][0] -= 1
            _, parts, d, r = stack[-1]
            d = d + (0 if el["repetition"] == "REQUIRED" else 1)
            r = r + (1 if el["repetition"] == "REPEATED" else 0)
            el["path"] = ".".join(parts + [el["name"]])
            el["max_def"] = d
            el["max_rep"] = r
            if el["num_children"]:
                stack.append([el["num_children"], parts + [el["name"]], d, r])
    row_groups = []
    for rg in fmd.get(4, []) or []:
        cols = []
        for cc in rg.get(1, []) or []:
            md = cc.get(3) or {}
            ptype = md.get(1)
            st = md.get(12) or {}
            raw_min = st.get(6, st.get(2))
            raw_max = st.get(5, st.get(1))
            cols.append(
                {
                    "path": ".".join(
                        p.decode("utf-8", "replace") for p in md.get(3, [])
                    ),
                    "type": PHYSICAL_TYPES.get(ptype),
                    "codec": CODECS.get(md.get(4)),
                    "encodings": sorted(
                        ENCODINGS.get(e, str(e)) for e in md.get(2, [])
                    ),
                    "num_values": md.get(5),
                    "total_uncompressed_size": md.get(6),
                    "total_compressed_size": md.get(7),
                    "data_page_offset": md.get(9),
                    "dictionary_page_offset": md.get(11),
                    "stat_min": _decode_stat(raw_min, ptype),
                    "stat_max": _decode_stat(raw_max, ptype),
                    "null_count": st.get(3),
                    # page-index locators (PageIndex.md): the ColumnIndex /
                    # OffsetIndex structs live OUTSIDE the footer, between
                    # the last data page and the footer — these fields say
                    # where (round 13, read by read_page_index)
                    "offset_index_offset": cc.get(4),
                    "offset_index_length": cc.get(5),
                    "column_index_offset": cc.get(6),
                    "column_index_length": cc.get(7),
                }
            )
        row_groups.append(
            {
                "num_rows": rg.get(3),
                "total_byte_size": rg.get(2),
                "columns": cols,
            }
        )
    return {
        "version": fmd.get(1),
        "num_rows": fmd.get(3),
        "created_by": (fmd.get(6) or b"").decode("utf-8", "replace"),
        "footer_bytes": flen,
        "schema": schema,
        "row_groups": row_groups,
    }


def footer_census(blob: bytes) -> list:
    """Flatten parquet_footer into one dict per (row_group, column_chunk) —
    the shape of DuckDB's parquet_metadata() table, which q338's oracle
    uses as the independent C++ replay of this walk."""
    meta = parquet_footer(blob)
    out = []
    for gi, rg in enumerate(meta["row_groups"]):
        for col in rg["columns"]:
            row = {"row_group_id": gi, "row_group_num_rows": rg["num_rows"]}
            row.update(col)
            out.append(row)
    return out


def read_values(blob: bytes) -> dict:
    """Decode the data pages of an UNCOMPRESSED, PLAIN-encoded parquet
    file (the subset ``encode_parquet`` emits — REQUIRED leaves, v1 data
    pages) back into {column_path: [values...]}, driven entirely by the
    footer's column-chunk offsets. Closes the walker's loop: footer
    fields say where the pages are, this proves those offsets and value
    counts are REAL (pinned against the encoder's inputs and DuckDB's
    read of the same file in tests). Anything beyond the subset raises a
    loud NotImplementedError naming the feature (the multimodal codec
    discipline) — never a silent wrong decode."""
    meta = parquet_footer(blob)
    out: dict = {}
    for rg in meta["row_groups"]:
        for col in rg["columns"]:
            if col["codec"] != "UNCOMPRESSED":
                raise NotImplementedError(
                    f"read_values supports UNCOMPRESSED only, not {col['codec']}"
                )
            if col["encodings"] != ["PLAIN"]:
                raise NotImplementedError(
                    f"read_values supports PLAIN only, not {col['encodings']}"
                )
            r = _Reader(blob)
            r.i = col["data_page_offset"]
            header = _read_struct(r)
            if header.get(1) != 0:
                raise NotImplementedError(
                    f"read_values supports v1 data pages, not page type {header.get(1)}"
                )
            dph = header.get(5) or {}
            n = dph.get(1)
            if n != col["num_values"]:
                raise ValueError(
                    "malformed parquet page: header num_values "
                    f"{n} != chunk num_values {col['num_values']}"
                )
            data = r.take(header.get(2, 0))
            vals: list = []
            if col["type"] == "INT64":
                if len(data) != 8 * n:
                    raise ValueError("malformed parquet page: INT64 data size")
                vals = list(_struct_mod.unpack(f"<{n}q", data))
            elif col["type"] == "BYTE_ARRAY":
                pos = 0
                for _ in range(n):
                    if pos + 4 > len(data):
                        raise ValueError(
                            "malformed parquet page: BYTE_ARRAY length prefix"
                        )
                    (ln,) = _struct_mod.unpack("<I", data[pos : pos + 4])
                    pos += 4
                    if pos + ln > len(data):
                        raise ValueError(
                            "malformed parquet page: BYTE_ARRAY value overrun"
                        )
                    vals.append(data[pos : pos + ln])
                    pos += ln
                if pos != len(data):
                    raise ValueError("malformed parquet page: trailing bytes")
            else:
                raise NotImplementedError(
                    f"read_values supports INT64/BYTE_ARRAY, not {col['type']}"
                )
            out.setdefault(col["path"], []).extend(vals)
    return out


def _snappy_decompress(data: bytes, expected: int) -> bytes:
    """Pure-stdlib snappy raw-format decoder (the parquet page codec):
    varint uncompressed length, then a tag stream of literals and
    back-references — LZ77 with byte-granular copies. Built from the
    public snappy format description; length-checked against the page
    header."""
    r = _Reader(data)
    ulen = r.varint()
    out = bytearray()
    while r.i < len(data):
        tag = r.u8()
        ttype = tag & 3
        if ttype == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                nbytes = ln - 59
                ln = int.from_bytes(r.take(nbytes), "little")
            out += r.take(ln + 1)
            continue
        if ttype == 1:  # copy, 1-byte offset tail
            ln = ((tag >> 2) & 0x7) + 4
            off = ((tag >> 5) << 8) | r.u8()
        elif ttype == 2:  # copy, 2-byte offset
            ln = (tag >> 2) + 1
            off = int.from_bytes(r.take(2), "little")
        else:  # copy, 4-byte offset
            ln = (tag >> 2) + 1
            off = int.from_bytes(r.take(4), "little")
        if off == 0 or off > len(out):
            raise ValueError("malformed snappy page: copy offset out of range")
        # copies may overlap forward (run-length style) — byte loop
        start = len(out) - off
        for k in range(ln):
            out.append(out[start + k])
    if ulen != len(out) or (expected and expected != len(out)):
        raise ValueError(
            f"malformed snappy page: declared {ulen}/{expected} bytes, got {len(out)}"
        )
    return bytes(out)


def _lz4_raw_decompress(data: bytes, expected: int) -> bytes:
    """Pure-stdlib LZ4 raw-block decoder (parquet's LZ4_RAW page codec —
    the block format alone, no frame header; lz4.org block-format spec):
    a sequence stream of [token: literal-length nibble | match-length
    nibble] [extended literal length] [literals] [2-byte LE offset]
    [extended match length], where nibble 15 extends by 255-valued bytes
    until a byte < 255, match length is nibble + 4 (minmatch), and the
    final sequence carries literals only. Copies may overlap forward
    (run-length style). Length-checked against the page header; malformed
    offsets/overruns raise ValueError naming the problem. The LEGACY
    parquet LZ4 codec (Hadoop framing: 4-byte big-endian block headers
    around these same blocks) stays a loud refusal — ambiguity is why the
    format added LZ4_RAW."""
    r = _Reader(data)
    out = bytearray()
    while r.i < len(data):
        token = r.u8()
        lit = token >> 4
        if lit == 15:
            while True:
                b = r.u8()
                lit += b
                if b != 255:
                    break
        out += r.take(lit)
        if r.i >= len(data):
            break  # last sequence: literals only, no match part
        off = int.from_bytes(r.take(2), "little")
        if off == 0 or off > len(out):
            raise ValueError("malformed lz4 page: match offset out of range")
        mlen = (token & 0xF) + 4
        if (token & 0xF) == 15:
            while True:
                b = r.u8()
                mlen += b
                if b != 255:
                    break
        start = len(out) - off
        if off >= mlen:
            out += out[start : start + mlen]
        else:
            for k in range(mlen):
                out.append(out[start + k])
    if expected and expected != len(out):
        raise ValueError(
            f"malformed lz4 page: declared {expected} bytes, got {len(out)}"
        )
    return bytes(out)


def _read_rle_hybrid(r: _Reader, bit_width: int, count: int) -> list:
    """Parquet's RLE / bit-packed hybrid: varint header, LSB even -> RLE
    run (value in ceil(w/8) bytes LE), odd -> (header>>1) groups of 8
    bit-packed values, LSB-first within each byte."""
    out: list = []
    vbytes = (bit_width + 7) // 8
    mask = (1 << bit_width) - 1
    while len(out) < count:
        header = r.varint()
        if header & 1:  # bit-packed groups
            n = (header >> 1) * 8
            raw = r.take((n * bit_width + 7) // 8)
            acc = int.from_bytes(raw, "little")
            for k in range(n):
                if len(out) >= count:
                    break
                out.append((acc >> (k * bit_width)) & mask)
        else:  # RLE run
            run = header >> 1
            v = int.from_bytes(r.take(vbytes), "little") if vbytes else 0
            out.extend([v] * min(run, count - len(out)))
    return out[:count]


def _decode_plain_values(data: bytes, ptype: int, n: int,
                         flba_len: int | None = None) -> list:
    """PLAIN decode with the module's truncation contract: every read is
    bounds-checked first, so a short page raises ValueError naming the
    problem instead of struct.error (or silently decoding fewer values).
    FIXED_LEN_BYTE_ARRAY (decimals, UUIDs) decodes to raw bytes at the
    schema-declared width — logical interpretation (e.g. big-endian
    two's-complement decimal unscaled value) is the caller's."""
    fixed = {1: ("i", 4), 2: ("q", 8), 4: ("f", 4), 5: ("d", 8)}
    if ptype in fixed:
        code, width = fixed[ptype]
        if len(data) < width * n:
            raise ValueError(
                f"malformed parquet page: PLAIN {PHYSICAL_TYPES.get(ptype)} "
                f"data holds {len(data)} bytes, need {width * n} for {n} values"
            )
        return list(_struct_mod.unpack(f"<{n}{code}", data[: width * n]))
    if ptype == 6:  # BYTE_ARRAY
        out, pos = [], 0
        for _ in range(n):
            if pos + 4 > len(data):
                raise ValueError(
                    "malformed parquet page: truncated BYTE_ARRAY length prefix"
                )
            (ln,) = _struct_mod.unpack("<I", data[pos : pos + 4])
            pos += 4
            if pos + ln > len(data):
                raise ValueError(
                    "malformed parquet page: BYTE_ARRAY value runs past page end"
                )
            out.append(data[pos : pos + ln])
            pos += ln
        return out
    if ptype == 0:  # BOOLEAN, bit-packed LSB-first
        if len(data) * 8 < n:
            raise ValueError(
                f"malformed parquet page: BOOLEAN data holds {len(data) * 8} "
                f"bits, need {n}"
            )
        return [bool(data[k >> 3] >> (k & 7) & 1) for k in range(n)]
    if ptype == 7:  # FIXED_LEN_BYTE_ARRAY
        if not flba_len:
            raise ValueError(
                "malformed parquet footer: FIXED_LEN_BYTE_ARRAY leaf "
                "without a type_length"
            )
        if len(data) < flba_len * n:
            raise ValueError(
                f"malformed parquet page: FIXED_LEN_BYTE_ARRAY data holds "
                f"{len(data)} bytes, need {flba_len * n} for {n} values"
            )
        return [data[i * flba_len : (i + 1) * flba_len] for i in range(n)]
    raise NotImplementedError(
        f"plain decode unsupported for physical type {PHYSICAL_TYPES.get(ptype)}"
    )


def _decode_delta_binary_packed(r: _Reader) -> list:
    """DELTA_BINARY_PACKED (parquet-format Encodings.md): header of
    <block size in values> <miniblocks per block> <total value count>
    (varints) and the zigzag first value; then per block a zigzag min
    delta, one bit-width byte per miniblock, and LSB-first bit-packed
    delta payloads. The last block may ship only the miniblocks it needs
    — readers stop at the total count. Truncation raises ValueError via
    the bounds-checked reader."""
    block_size = r.varint()
    n_mini = r.varint()
    total = r.varint()
    if total == 0:
        return []
    first = r.zigzag()
    if n_mini == 0 or block_size % n_mini or (block_size // n_mini) % 8:
        raise ValueError(
            f"malformed delta-binary-packed header: block {block_size} / "
            f"{n_mini} miniblocks violates the divisibility contract"
        )
    per_mini = block_size // n_mini
    out = [first]
    prev = first
    while len(out) < total:
        min_delta = r.zigzag()
        widths = r.take(n_mini)
        for w in widths:
            if len(out) >= total:
                break
            raw = r.take((per_mini * w + 7) // 8)
            acc = int.from_bytes(raw, "little")
            mask = (1 << w) - 1
            for k in range(per_mini):
                if len(out) >= total:
                    break
                prev += min_delta + ((acc >> (k * w)) & mask)
                out.append(prev)
    return out


def _decode_delta_length_byte_array(r: _Reader) -> list:
    """DELTA_LENGTH_BYTE_ARRAY: one DELTA_BINARY_PACKED run of lengths,
    then the concatenated value bytes."""
    lengths = _decode_delta_binary_packed(r)
    if any(ln < 0 for ln in lengths):
        raise ValueError("malformed delta-length byte array: negative length")
    return [r.take(ln) for ln in lengths]


def _decode_delta_byte_array(r: _Reader) -> list:
    """DELTA_BYTE_ARRAY (incremental / front-coded strings): a
    DELTA_BINARY_PACKED run of shared-prefix lengths, then a
    DELTA_LENGTH_BYTE_ARRAY of suffixes; value i = prefix_len[i] bytes of
    value i-1 + suffix i."""
    prefixes = _decode_delta_binary_packed(r)
    suffixes = _decode_delta_length_byte_array(r)
    if len(prefixes) != len(suffixes):
        raise ValueError(
            "malformed delta byte array: prefix/suffix count mismatch"
        )
    out: list = []
    prev = b""
    for p, suf in zip(prefixes, suffixes):
        if p < 0 or p > len(prev):
            raise ValueError(
                "malformed delta byte array: prefix length exceeds previous value"
            )
        prev = prev[:p] + suf
        out.append(prev)
    return out


def _decode_page_values(body: bytes, encoding: int, ptype: int, n_set: int,
                        dictionary: list | None,
                        flba_len: int | None = None) -> list:
    """One data page's value stream by encoding id — shared between v1
    and v2 pages."""
    if encoding == 0:  # PLAIN
        return _decode_plain_values(body, ptype, n_set, flba_len)
    if encoding in (2, 8):  # PLAIN_DICTIONARY / RLE_DICTIONARY
        if dictionary is None:
            raise ValueError("dictionary-encoded page before dictionary")
        br = _Reader(body)
        width = br.u8()
        idx = _read_rle_hybrid(br, width, n_set)
        return [dictionary[i] for i in idx]
    if encoding == 5:  # DELTA_BINARY_PACKED
        if ptype not in (1, 2):
            raise NotImplementedError(
                "DELTA_BINARY_PACKED only applies to INT32/INT64"
            )
        vals = _decode_delta_binary_packed(_Reader(body))
        if len(vals) != n_set:
            raise ValueError(
                f"malformed delta page: header declares {len(vals)} values, "
                f"page carries {n_set}"
            )
        return vals
    if encoding == 6:  # DELTA_LENGTH_BYTE_ARRAY
        if ptype != 6:
            raise NotImplementedError(
                "DELTA_LENGTH_BYTE_ARRAY only applies to BYTE_ARRAY"
            )
        vals = _decode_delta_length_byte_array(_Reader(body))
        if len(vals) != n_set:
            raise ValueError(
                f"malformed delta page: header declares {len(vals)} values, "
                f"page carries {n_set}"
            )
        return vals
    if encoding == 7:  # DELTA_BYTE_ARRAY
        if ptype != 6:
            raise NotImplementedError("DELTA_BYTE_ARRAY only applies to BYTE_ARRAY")
        vals = _decode_delta_byte_array(_Reader(body))
        if len(vals) != n_set:
            raise ValueError(
                f"malformed delta page: header declares {len(vals)} values, "
                f"page carries {n_set}"
            )
        return vals
    if encoding == 9:  # BYTE_STREAM_SPLIT
        widths = {1: 4, 2: 8, 4: 4, 5: 8}
        if ptype not in widths:
            raise NotImplementedError(
                "BYTE_STREAM_SPLIT only applies to INT32/INT64/FLOAT/DOUBLE here"
            )
        w = widths[ptype]
        if len(body) != w * n_set:
            raise ValueError(
                f"malformed byte-stream-split page: {len(body)} bytes for "
                f"{n_set} x {w}-byte values"
            )
        # stream b holds byte b of every value; re-interleave then decode
        # as PLAIN (one pass, bytes(...) join per value)
        interleaved = bytes(
            body[b * n_set + i] for i in range(n_set) for b in range(w)
        )
        return _decode_plain_values(interleaved, ptype, n_set)
    raise NotImplementedError(
        f"data page encoding {ENCODINGS.get(encoding, encoding)} unsupported"
    )


_TYPE_IDS = {v: k for k, v in PHYSICAL_TYPES.items()}


def _read_levels(pr: _Reader, max_level: int, n: int) -> list:
    """One v1 level stream: 4-byte length prefix, then RLE/bit-packed
    hybrid at bit width = bits(max_level). max_level == 0 means the
    stream is absent and every entry sits at level 0."""
    if max_level == 0:
        return [0] * n
    raw = pr.take(4)
    if len(raw) < 4:
        raise ValueError("malformed parquet page: truncated level-stream length")
    (lvl_len,) = _struct_mod.unpack("<I", raw)
    lr = _Reader(pr.take(lvl_len))
    return _read_rle_hybrid(lr, max_level.bit_length(), n)


def read_column(blob: bytes, rg_idx: int, path: str, meta: dict | None = None) -> list:
    """Decode ONE column chunk of a REAL parquet file — dictionary +
    RLE_DICTIONARY / PLAIN data pages, SNAPPY / GZIP / UNCOMPRESSED
    codecs, definition levels (None for nulls), and REPETITION levels via
    GENERAL Dremel record assembly (Dremel paper §4.2 / parquet-format
    LogicalTypes.md; round 12 built the single-level case, round 13
    generalizes to ANY repetition depth): a leaf under R repeated
    ancestors reassembles into R-deep nested Python lists per record,
    with NULL at every ancestor level (def below that level's
    present-but-empty point), EMPTY lists (def exactly at a repeated
    group's parent-present level) and NULL elements (def between the
    last repeated level and the leaf's max) all distinguished exactly as
    the level algebra dictates — struct-of-list, list-of-struct, MAP,
    list-of-list, and deeper compositions. Round 12 also added
    DataPageV2 (uncompressed level sections at header-declared lengths)
    and the DELTA_BINARY_PACKED / DELTA_BYTE_ARRAY /
    DELTA_LENGTH_BYTE_ARRAY / BYTE_STREAM_SPLIT value encodings —
    everything pyarrow emits, pinned value-exact against it in pytest.
    Entirely driven by the walked footer's offsets — no parquet
    library. ``meta`` lets a caller reading many columns of one file parse
    the footer once and share it (it is pure derived state of ``blob``);
    omitted, the footer is walked here."""
    if meta is None:
        meta = parquet_footer(blob)
    rg = meta["row_groups"][rg_idx]
    col = next((c for c in rg["columns"] if c["path"] == path), None)
    leaf = next((s for s in meta["schema"] if s.get("path") == path), None)
    if col is None or leaf is None or leaf["num_children"]:
        raise ValueError(
            f"no leaf column chunk at path {path!r} (group elements and "
            f"unknown paths are not readable)"
        )
    max_def, max_rep = leaf["max_def"], leaf["max_rep"]
    ptype = _TYPE_IDS[col["type"]]
    flba_len = leaf.get("type_length")
    codec = col["codec"]
    if codec not in ("UNCOMPRESSED", "SNAPPY", "GZIP", "LZ4_RAW", "ZSTD"):
        raise NotImplementedError(f"codec {codec} not supported")

    pos = col["dictionary_page_offset"] or col["data_page_offset"]
    r = _Reader(blob)
    r.i = pos
    dictionary: list | None = None
    reps: list = []
    defs: list = []
    vals: list = []
    def _inflate(comp: bytes, expected: int) -> bytes:
        if codec == "SNAPPY":
            return _snappy_decompress(comp, expected)
        if codec == "GZIP":
            import zlib

            return zlib.decompress(comp, 16 + zlib.MAX_WBITS)
        if codec == "LZ4_RAW":
            return _lz4_raw_decompress(comp, expected)
        if codec == "ZSTD":
            from .zstd import zstd_decompress

            return zstd_decompress(comp, expected)
        return comp

    while len(defs) < col["num_values"]:
        header = _read_struct(r)
        comp = r.take(header.get(3, 0))
        ptype_page = header.get(1)
        if ptype_page == 2:  # DICTIONARY_PAGE
            dph = header.get(7) or {}
            dictionary = _decode_plain_values(
                _inflate(comp, header.get(2, 0)), ptype, dph.get(1, 0), flba_len
            )
            continue
        if ptype_page == 0:  # DATA_PAGE v1: whole page compressed,
            # levels length-prefixed (repetition first, then definition)
            data = _inflate(comp, header.get(2, 0))
            dph = header.get(5) or {}
            n_values = dph.get(1, 0)
            encoding = dph.get(2)
            pr = _Reader(data)
            p_reps = _read_levels(pr, max_rep, n_values)
            p_defs = _read_levels(pr, max_def, n_values)
            body = data[pr.i :]
        elif ptype_page == 3:  # DATA_PAGE_V2: levels NEVER compressed,
            # raw RLE at header-declared byte lengths, then the data
            # section (compressed iff is_compressed)
            dph = header.get(8) or {}
            n_values = dph.get(1, 0)
            encoding = dph.get(4)
            dl_len = dph.get(5, 0)
            rl_len = dph.get(6, 0)
            if rl_len + dl_len > len(comp):
                raise ValueError(
                    "malformed parquet v2 page: level lengths exceed page size"
                )
            p_reps = (
                _read_rle_hybrid(_Reader(comp[:rl_len]), max_rep.bit_length(), n_values)
                if max_rep
                else [0] * n_values
            )
            p_defs = (
                _read_rle_hybrid(
                    _Reader(comp[rl_len : rl_len + dl_len]),
                    max_def.bit_length(),
                    n_values,
                )
                if max_def
                else [0] * n_values
            )
            body = comp[rl_len + dl_len :]
            if dph.get(7, True):  # is_compressed (default true)
                body = _inflate(body, header.get(2, 0) - rl_len - dl_len)
        else:
            raise NotImplementedError(f"page type {ptype_page} not supported")
        n_set = sum(1 for d in p_defs if d == max_def)
        p_vals = _decode_page_values(
            body, encoding, ptype, n_set, dictionary, flba_len
        )
        reps.extend(p_reps)
        defs.extend(p_defs)
        vals.extend(p_vals)

    it = iter(vals)
    if max_rep == 0:
        return [next(it) if d == max_def else None for d in defs]

    # General Dremel record assembly: the chain of REPEATED ancestors in
    # root-to-leaf order gives dls[k] = def level at which an entry
    # EXISTS at repetition level k+1; dls[k]-1 means that list is present
    # but EMPTY; anything lower means the list (or an optional ancestor
    # between two repeated levels) is null — which a per-leaf projection
    # correctly collapses to None, the standard Dremel column semantics.
    rep_groups = [
        s
        for s in meta["schema"]
        if s.get("path")
        and (path == s["path"] or path.startswith(s["path"] + "."))
        and s["repetition"] == "REPEATED"
    ]
    dls = [g["max_def"] for g in rep_groups]  # ascending: root-to-leaf walk
    depth = len(dls)
    if depth != max_rep:
        raise ValueError(
            f"malformed parquet schema: {depth} repeated ancestors for leaf "
            f"max_rep {max_rep} at path {path!r}"
        )
    if reps and reps[0] != 0:
        raise ValueError("malformed parquet page: record split across chunks")
    rows: list = []
    # open_lists[k] = the list currently accepting entries at repetition
    # level k (None when that level's list is null/empty/closed)
    open_lists: list = [None] * (depth + 1)

    def build(k: int, d: int):
        """Entry content under repetition level k (0 = record level),
        opening deeper lists as the def level licenses."""
        if k == depth:
            return next(it) if d == max_def else None
        if d < dls[k] - 1:
            for j in range(k + 1, depth + 1):
                open_lists[j] = None
            return None
        if d == dls[k] - 1:  # present but empty: no entries may follow
            for j in range(k + 1, depth + 1):
                open_lists[j] = None
            return []
        lst: list = [None]
        open_lists[k + 1] = lst
        lst[0] = build(k + 1, d)
        return lst

    for rp, df in zip(reps, defs):
        if rp == 0:
            rows.append(build(0, df))
        else:
            tgt = open_lists[rp]
            if tgt is None:
                raise ValueError(
                    "malformed parquet levels: entry in null/empty ancestor"
                )
            tgt.append(build(rp, df))
    return rows


def read_table(blob: bytes, meta: dict | None = None) -> dict:
    """Full-file decode: {column_path: values} across all row groups for
    EVERY leaf column (values are raw physical — an INT64 timestamp stays
    an epoch integer in its stored unit; a leaf under R repeated
    ancestors arrives as R-deep nested Python lists per record under its
    dotted path, e.g. 'embedding.list.element'). ``meta`` shares an
    already-parsed footer (pure derived state of ``blob``), as in
    ``read_column``."""
    if meta is None:
        meta = parquet_footer(blob)
    out: dict = {}
    for gi in range(len(meta["row_groups"])):
        for col in meta["row_groups"][gi]["columns"]:
            out.setdefault(col["path"], []).extend(
                read_column(blob, gi, col["path"], meta=meta)
            )
    return out


def read_page_index(blob: bytes, rg_idx: int, path: str, meta: dict | None = None) -> dict:
    """Decode one column chunk's PAGE INDEX (parquet-format PageIndex.md
    — the planner structure one level below q338's row-group stats):
    ColumnIndex (per-page null flag, decoded min/max, null counts,
    boundary order) and OffsetIndex (per-page file offset, compressed
    size, first row index), read from the footer's locator fields via two
    ranged slices that never touch data pages. Raises ValueError when the
    chunk carries no index (the caller must fall back to scanning).
    ``meta`` shares an already-parsed footer, as in ``read_column``."""
    if meta is None:
        meta = parquet_footer(blob)
    col = next(
        (c for c in meta["row_groups"][rg_idx]["columns"] if c["path"] == path),
        None,
    )
    if col is None:
        raise ValueError(f"no column chunk at path {path!r}")
    if col["column_index_offset"] is None or col["offset_index_offset"] is None:
        raise ValueError(f"column chunk {path!r} carries no page index")
    ptype = _TYPE_IDS[col["type"]]
    r = _Reader(blob)
    r.i = col["column_index_offset"]
    ci = _read_struct(r)
    if r.i > col["column_index_offset"] + col["column_index_length"]:
        raise ValueError("malformed page index: ColumnIndex overruns its length")
    r.i = col["offset_index_offset"]
    oi = _read_struct(r)
    if r.i > col["offset_index_offset"] + col["offset_index_length"]:
        raise ValueError("malformed page index: OffsetIndex overruns its length")
    locations = [
        {
            "offset": pl.get(1),
            "compressed_page_size": pl.get(2),
            "first_row_index": pl.get(3),
        }
        for pl in oi.get(1, []) or []
    ]
    null_pages = [bool(b) for b in ci.get(1, []) or []]
    mins = [
        None if null_pages[i] else _decode_stat(v, ptype)
        for i, v in enumerate(ci.get(2, []) or [])
    ]
    maxs = [
        None if null_pages[i] else _decode_stat(v, ptype)
        for i, v in enumerate(ci.get(3, []) or [])
    ]
    if not (len(locations) == len(null_pages) == len(mins) == len(maxs)):
        raise ValueError(
            "malformed page index: ColumnIndex/OffsetIndex page counts differ"
        )
    return {
        "n_pages": len(locations),
        "null_pages": null_pages,
        "min_values": mins,
        "max_values": maxs,
        "boundary_order": ci.get(4),
        "null_counts": list(ci.get(5, []) or []),
        "page_locations": locations,
    }


def read_column_pages(blob: bytes, rg_idx: int, path: str,
                      page_indices: list, meta: dict | None = None) -> dict:
    """Decode ONLY the selected data pages of a flat column chunk —
    the execution half of page-index pruning: the OffsetIndex says where
    each page starts, so a reader seeks straight to the survivors and
    never inflates a skipped page. The dictionary page (when present) is
    decoded once up front. Returns {page_index: [values...]} with None
    for nulls. Repeated columns refuse (a record may split across pages,
    which per-page decode cannot reassemble). ``meta`` shares an
    already-parsed footer, as in ``read_column``."""
    if meta is None:
        meta = parquet_footer(blob)
    col = next(
        (c for c in meta["row_groups"][rg_idx]["columns"] if c["path"] == path),
        None,
    )
    leaf = next((s for s in meta["schema"] if s.get("path") == path), None)
    if col is None or leaf is None:
        raise ValueError(f"no leaf column chunk at path {path!r}")
    if leaf["max_rep"]:
        raise NotImplementedError(
            "page-selective decode of repeated columns not supported "
            "(records may split across pages)"
        )
    idx = read_page_index(blob, rg_idx, path, meta=meta)
    ptype = _TYPE_IDS[col["type"]]
    flba_len = leaf.get("type_length")
    max_def = leaf["max_def"]
    codec = col["codec"]

    def _inflate(comp: bytes, expected: int) -> bytes:
        if codec == "SNAPPY":
            return _snappy_decompress(comp, expected)
        if codec == "GZIP":
            import zlib

            return zlib.decompress(comp, 16 + zlib.MAX_WBITS)
        if codec == "LZ4_RAW":
            return _lz4_raw_decompress(comp, expected)
        if codec == "ZSTD":
            from .zstd import zstd_decompress

            return zstd_decompress(comp, expected)
        if codec == "UNCOMPRESSED":
            return comp
        raise NotImplementedError(f"codec {codec} not supported")

    dictionary = None
    if col["dictionary_page_offset"] is not None:
        r = _Reader(blob)
        r.i = col["dictionary_page_offset"]
        header = _read_struct(r)
        comp = r.take(header.get(3, 0))
        if header.get(1) == 2:
            dph = header.get(7) or {}
            dictionary = _decode_plain_values(
                _inflate(comp, header.get(2, 0)), ptype, dph.get(1, 0), flba_len
            )
    out: dict = {}
    for pi in page_indices:
        if not 0 <= pi < idx["n_pages"]:
            raise ValueError(f"page index {pi} out of range")
        loc = idx["page_locations"][pi]
        r = _Reader(blob)
        r.i = loc["offset"]
        header = _read_struct(r)
        comp = r.take(header.get(3, 0))
        if r.i > loc["offset"] + loc["compressed_page_size"]:
            raise ValueError("malformed page: exceeds its OffsetIndex size")
        ptype_page = header.get(1)
        if ptype_page == 0:
            data = _inflate(comp, header.get(2, 0))
            dph = header.get(5) or {}
            n_values = dph.get(1, 0)
            encoding = dph.get(2)
            pr = _Reader(data)
            p_defs = _read_levels(pr, max_def, n_values)
            body = data[pr.i :]
        elif ptype_page == 3:
            dph = header.get(8) or {}
            n_values = dph.get(1, 0)
            encoding = dph.get(4)
            dl_len = dph.get(5, 0)
            p_defs = (
                _read_rle_hybrid(
                    _Reader(comp[:dl_len]), max_def.bit_length(), n_values
                )
                if max_def
                else [0] * n_values
            )
            body = comp[dl_len:]
            if dph.get(7, True):
                body = _inflate(body, header.get(2, 0) - dl_len)
        else:
            raise ValueError(f"page {pi} is not a data page")
        n_set = sum(1 for d in p_defs if d == max_def)
        vals = _decode_page_values(body, encoding, ptype, n_set, dictionary,
                                   flba_len)
        it = iter(vals)
        out[pi] = [next(it) if d == max_def else None for d in p_defs]
    return out


def read_footer_bytes(path: str) -> bytes:
    """Read ONLY a parquet file's footer from disk — two ranged reads
    (8-byte length probe, then the footer slice), never the data pages.
    This is the planner-side access pattern that makes a row-group census
    of a 100 TB lakehouse cheap: cost is O(footer) per file regardless of
    file size. Returns a blob parquet_footer accepts (leading magic is
    re-attached so the full-file validator applies unchanged)."""
    import os

    size = os.path.getsize(path)
    if size < 12:
        raise ValueError("truncated parquet file: shorter than magic framing")
    with open(path, "rb") as f:
        f.seek(size - 8)
        tail = f.read(8)
        if tail[4:] != MAGIC:
            raise ValueError("truncated parquet file: missing trailing PAR1 magic")
        (flen,) = _struct_mod.unpack("<I", tail[:4])
        if flen + 12 > size:
            raise ValueError(
                f"truncated parquet file: footer length {flen} exceeds file size"
            )
        f.seek(size - 8 - flen)
        return MAGIC + f.read(flen + 8)


_CENSUS_FIELDS = (
    "row_group_id int, row_group_num_rows bigint, path_in_schema string, "
    "type string, codec string, num_values bigint, "
    "total_compressed_size bigint, total_uncompressed_size bigint, "
    "stat_min_int bigint, stat_max_int bigint, "
    "stat_min_str string, stat_max_str string, null_count bigint, "
    "file_num_rows bigint, file_num_row_groups int, version int"
)
_CENSUS_COLS = [f.split()[0] for f in _CENSUS_FIELDS.split(", ")]


def _census_rows(meta: dict) -> list:
    rows = []
    nrg = len(meta["row_groups"])
    for gi, rg in enumerate(meta["row_groups"]):
        for col in rg["columns"]:
            is_int = col["type"] in ("INT32", "INT64")
            rows.append(
                {
                    "row_group_id": gi,
                    "row_group_num_rows": rg["num_rows"],
                    "path_in_schema": col["path"],
                    "type": col["type"],
                    "codec": col["codec"],
                    "num_values": col["num_values"],
                    "total_compressed_size": col["total_compressed_size"],
                    "total_uncompressed_size": col["total_uncompressed_size"],
                    "stat_min_int": col["stat_min"] if is_int else None,
                    "stat_max_int": col["stat_max"] if is_int else None,
                    "stat_min_str": (
                        col["stat_min"] if col["type"] == "BYTE_ARRAY" else None
                    ),
                    "stat_max_str": (
                        col["stat_max"] if col["type"] == "BYTE_ARRAY" else None
                    ),
                    "null_count": col["null_count"],
                    "file_num_rows": meta["num_rows"],
                    "file_num_row_groups": nrg,
                    "version": meta["version"],
                }
            )
    return rows


def rowgroup_census_df(
    df: DataFrame, blob_col: str = "blob", id_col: str = "doc_id"
) -> DataFrame:
    """(id, parquet blob) -> one row per (row_group, column_chunk) — the
    shape of DuckDB's parquet_metadata() table, which is exactly what the
    q336/q338 oracles replay through an independent C++ reader. One Arrow
    map pass; only footer-sized census rows come out."""
    import pandas as pd

    id_type = {f.name: f.dataType.simpleString() for f in df.schema.fields}[id_col]
    schema = f"{id_col} {id_type}, {_CENSUS_FIELDS}"
    return df.mapInPandas(rowgroup_census_gen(blob_col, id_col), schema)


def rowgroup_census_gen(blob_col: str = "blob", id_col: str = "doc_id"):
    """The ``rowgroup_census_df`` walk as a pandas-iterator function, for
    fusing with an upstream generator inside ONE mapInPandas stage (the
    caller supplies the schema: ``f"{id_col} <type>, {_CENSUS_FIELDS}"``)."""
    import pandas as pd

    cols = [id_col] + _CENSUS_COLS

    def walk(batches):
        for pdf in batches:
            rows = []
            for fid, blob in zip(pdf[id_col], pdf[blob_col]):
                for row in _census_rows(parquet_footer(bytes(blob))):
                    row[id_col] = fid
                    rows.append(row)
            yield pd.DataFrame(rows, columns=cols)

    return walk


def rowgroup_census_paths(
    df: DataFrame, path_col: str = "path", passthrough: tuple = ()
) -> DataFrame:
    """(path, ...) -> per-(row_group, column_chunk) census via RANGED
    footer reads (read_footer_bytes) — the whole file is never loaded, so
    a census over a lakehouse's files costs O(files x footer bytes), not
    O(data). Passthrough columns (e.g. table_name, key column) ride along
    unchanged."""
    import pandas as pd

    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    extra = ", ".join(f"{c} {types[c]}" for c in passthrough)
    schema = f"{path_col} string, {extra + ', ' if extra else ''}{_CENSUS_FIELDS}"
    cols = [path_col, *passthrough, *_CENSUS_COLS]

    def walk(batches):
        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                meta = parquet_footer(read_footer_bytes(rec[path_col]))
                for row in _census_rows(meta):
                    row[path_col] = rec[path_col]
                    for c in passthrough:
                        row[c] = rec[c]
                    rows.append(row)
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(walk, schema)


# ---------------------------------------------------------------- writer

class _Writer:
    __slots__ = ("out", "_last_fid")

    def __init__(self) -> None:
        self.out = bytearray()

    def varint(self, v: int) -> None:
        if v < 0:
            raise ValueError("varint must be non-negative")
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                self.out.append(b | 0x80)
            else:
                self.out.append(b)
                return

    def zigzag(self, v: int) -> None:
        self.varint((v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1)


def _w_field(w: _Writer, last_fid: int, fid: int, ctype: int) -> int:
    delta = fid - last_fid
    if 0 < delta <= 15:
        w.out.append((delta << 4) | ctype)
    else:
        w.out.append(ctype)
        w.zigzag(fid)
    return fid


def _w_i(w: _Writer, last: int, fid: int, v: int, ctype: int = _CT_I64) -> int:
    last = _w_field(w, last, fid, ctype)
    w.zigzag(v)
    return last


def _w_bin(w: _Writer, last: int, fid: int, v: bytes) -> int:
    last = _w_field(w, last, fid, _CT_BINARY)
    w.varint(len(v))
    w.out += v
    return last


def _w_list_header(w: _Writer, size: int, etype: int) -> None:
    if size < 15:
        w.out.append((size << 4) | etype)
    else:
        w.out.append(0xF0 | etype)
        w.varint(size)


def _page_header(num_values: int, data_len: int) -> bytes:
    """Thrift-compact PageHeader for an uncompressed PLAIN v1 data page of
    a REQUIRED column (no def/rep levels on the wire)."""
    w = _Writer()
    last = _w_i(w, 0, 1, 0, _CT_I32)  # type = DATA_PAGE
    last = _w_i(w, last, 2, data_len, _CT_I32)  # uncompressed_page_size
    last = _w_i(w, last, 3, data_len, _CT_I32)  # compressed_page_size
    last = _w_field(w, last, 5, _CT_STRUCT)  # data_page_header
    dl = _w_i(w, 0, 1, num_values, _CT_I32)
    dl = _w_i(w, dl, 2, 0, _CT_I32)  # encoding = PLAIN
    dl = _w_i(w, dl, 3, 3, _CT_I32)  # definition_level_encoding = RLE
    dl = _w_i(w, dl, 4, 3, _CT_I32)  # repetition_level_encoding = RLE
    w.out.append(0)  # end DataPageHeader
    w.out.append(0)  # end PageHeader
    return bytes(w.out)


def _plain_encode(values: list, ptype: int) -> bytes:
    if ptype == 2:  # INT64
        return b"".join(_struct_mod.pack("<q", int(v)) for v in values)
    if ptype == 6:  # BYTE_ARRAY
        out = bytearray()
        for v in values:
            bv = v if isinstance(v, (bytes, bytearray)) else str(v).encode()
            out += _struct_mod.pack("<I", len(bv)) + bv
        return bytes(out)
    raise ValueError(f"encode_parquet supports INT64/BYTE_ARRAY, not type {ptype}")


def _stat_bytes(v, ptype: int) -> bytes:
    if ptype == 2:
        return _struct_mod.pack("<q", int(v))
    return v if isinstance(v, (bytes, bytearray)) else str(v).encode()


def encode_parquet(
    columns: list, row_groups: list, created_by: str = "hive-backend-spark 0.1"
) -> bytes:
    """Minimal REAL parquet writer: ``columns`` is [(name, 'INT64'|'BYTE_ARRAY')],
    ``row_groups`` is a list of row groups, each a list of per-column value
    lists. PLAIN encoding, UNCOMPRESSED, REQUIRED columns, v1 data pages,
    per-chunk min/max/null_count statistics — enough for pyarrow and DuckDB
    to read the file back value-exact (pinned in tests), which is what
    makes the walker's round trip a cross-engine check rather than a
    self-fulfilling one."""
    tmap = {"INT64": 2, "BYTE_ARRAY": 6}
    ptypes = []
    for _, t in columns:
        if t not in tmap:
            raise ValueError(f"unsupported column type {t!r}")
        ptypes.append(tmap[t])
    blob = bytearray(MAGIC)
    rg_meta = []
    total_rows = 0
    for group in row_groups:
        if len(group) != len(columns):
            raise ValueError("row group has wrong column count")
        nrows = len(group[0])
        if any(len(vals) != nrows for vals in group):
            raise ValueError("ragged row group: column lengths differ")
        total_rows += nrows
        chunks = []
        for (name, _), ptype, vals in zip(columns, ptypes, group):
            data = _plain_encode(vals, ptype)
            header = _page_header(nrows, len(data))
            offset = len(blob)
            blob += header + data
            if ptype == 2:
                mn, mx = (min(vals), max(vals)) if vals else (None, None)
            else:
                bl = [
                    v if isinstance(v, (bytes, bytearray)) else str(v).encode()
                    for v in vals
                ]
                mn, mx = (min(bl), max(bl)) if bl else (None, None)
            chunks.append(
                {
                    "name": name,
                    "ptype": ptype,
                    "num_values": nrows,
                    "size": len(header) + len(data),
                    "offset": offset,
                    "min": mn,
                    "max": mx,
                }
            )
        rg_meta.append({"num_rows": nrows, "chunks": chunks})

    w = _Writer()
    last = _w_i(w, 0, 1, 1, _CT_I32)  # version
    # schema: root group + leaves
    last = _w_field(w, last, 2, _CT_LIST)
    _w_list_header(w, len(columns) + 1, _CT_STRUCT)
    sl = _w_field(w, 0, 4, _CT_BINARY)  # root: name
    w.varint(len(b"schema"))
    w.out += b"schema"
    sl = _w_i(w, sl, 5, len(columns), _CT_I32)  # num_children
    w.out.append(0)
    for (name, _), ptype in zip(columns, ptypes):
        nl = _w_i(w, 0, 1, ptype, _CT_I32)  # type
        nl = _w_i(w, nl, 3, 0, _CT_I32)  # repetition = REQUIRED
        nl = _w_bin(w, nl, 4, name.encode())
        w.out.append(0)
    last = _w_i(w, last, 3, total_rows)  # num_rows
    last = _w_field(w, last, 4, _CT_LIST)  # row_groups
    _w_list_header(w, len(rg_meta), _CT_STRUCT)
    for rg in rg_meta:
        gl = _w_field(w, 0, 1, _CT_LIST)  # columns
        _w_list_header(w, len(rg["chunks"]), _CT_STRUCT)
        for ch in rg["chunks"]:
            cl = _w_i(w, 0, 2, ch["offset"])  # ColumnChunk.file_offset
            cl = _w_field(w, cl, 3, _CT_STRUCT)  # meta_data
            ml = _w_i(w, 0, 1, ch["ptype"], _CT_I32)  # type
            ml = _w_field(w, ml, 2, _CT_LIST)  # encodings
            _w_list_header(w, 1, _CT_I32)
            w.zigzag(0)  # PLAIN
            ml = _w_field(w, ml, 3, _CT_LIST)  # path_in_schema
            _w_list_header(w, 1, _CT_BINARY)
            w.varint(len(ch["name"].encode()))
            w.out += ch["name"].encode()
            ml = _w_i(w, ml, 4, 0, _CT_I32)  # codec = UNCOMPRESSED
            ml = _w_i(w, ml, 5, ch["num_values"])
            ml = _w_i(w, ml, 6, ch["size"])  # total_uncompressed_size
            ml = _w_i(w, ml, 7, ch["size"])  # total_compressed_size
            ml = _w_i(w, ml, 9, ch["offset"])  # data_page_offset
            if ch["min"] is not None:
                ml = _w_field(w, ml, 12, _CT_STRUCT)  # statistics
                stl = _w_i(w, 0, 3, 0)  # null_count (REQUIRED cols: 0)
                stl = _w_bin(w, stl, 5, _stat_bytes(ch["max"], ch["ptype"]))
                stl = _w_bin(w, stl, 6, _stat_bytes(ch["min"], ch["ptype"]))
                w.out.append(0)  # end Statistics
            w.out.append(0)  # end ColumnMetaData
            w.out.append(0)  # end ColumnChunk
        gl = _w_i(w, gl, 2, sum(c["size"] for c in rg["chunks"]))
        gl = _w_i(w, gl, 3, rg["num_rows"])
        w.out.append(0)  # end RowGroup
    last = _w_bin(w, last, 6, created_by.encode())
    w.out.append(0)  # end FileMetaData

    blob += w.out
    blob += _struct_mod.pack("<I", len(w.out))
    blob += MAGIC
    return bytes(blob)
