"""ORC file-tail walker — the THIRD columnar container in the ingestion
ladder (beside parquet, q336/q341, and Avro, q339): Hive/Trino warehouses
ship ORC, and its tail is what a 100 TB table scan plans from. Built from
the PUBLIC Apache ORC v1 specification (orc.apache.org/specification):

  - the file ends  ...footer | postscript | 1-byte postscript length;
  - the postscript is an UNCOMPRESSED protobuf carrying the footer length,
    the compression kind + block size, the writer version, and the "ORC"
    magic;
  - the footer (compressed per the postscript) is a protobuf with the
    stripe directory (offset / index+data+footer lengths / row count per
    stripe), the TYPE TREE (kind + subtype ids + field names), the row
    count, and FILE-LEVEL COLUMN STATISTICS (value counts, has-null,
    int min/max/sum, string min/max/total-length, …) — the planning
    metadata that decides which stripes of which files a predicate needs
    before any stripe is opened;
  - compressed streams are CHUNKED: each chunk has a 3-byte little-endian
    header ``(chunk_length << 1) | is_original`` followed by either the
    raw bytes (is_original) or a codec block — NONE / ZLIB (raw deflate)
    / SNAPPY (raw snappy, decoded by parquet_meta's stdlib decoder) /
    ZSTD (operators/zstd, the RFC 8878 decoder) / LZ4 (raw block,
    parquet_meta's LZ4_RAW decoder).

Protobuf decode is a ~40-line wire-format reader (varint / 64-bit /
length-delimited / 32-bit), no library. Scope is the TAIL (census +
statistics, the q336 discipline); stripe DATA decode (RLEv2 streams) is
out of scope and the reader never touches those byte ranges — which is
the point: planning cost is O(tail) per file regardless of file size.
Malformed framing raises ValueError naming the problem; unknown
compression kinds raise NotImplementedError.
"""

from __future__ import annotations

import zlib

__all__ = ["parse_orc_tail"]

_COMPRESSION = {0: "NONE", 1: "ZLIB", 2: "SNAPPY", 3: "LZO", 4: "LZ4", 5: "ZSTD"}

_TYPE_KINDS = {
    0: "boolean", 1: "byte", 2: "short", 3: "int", 4: "long", 5: "float",
    6: "double", 7: "string", 8: "binary", 9: "timestamp", 10: "list",
    11: "map", 12: "struct", 13: "union", 14: "decimal", 15: "date",
    16: "varchar", 17: "char", 18: "timestamp_instant",
}


def _pb_decode(data: bytes) -> dict:
    """Protobuf wire format -> {field_number: [raw values]}: varints as
    ints, length-delimited as bytes, fixed 32/64 as ints. Repeated fields
    accumulate in order; the caller interprets per the ORC .proto."""
    out: dict = {}
    i = 0
    n = len(data)

    def varint() -> int:
        nonlocal i
        v = shift = 0
        while True:
            if i >= n:
                raise ValueError("truncated ORC protobuf: varint past end")
            b = data[i]
            i += 1
            v |= (b & 0x7F) << shift
            if not b & 0x80:
                return v
            shift += 7
            if shift > 70:
                raise ValueError("malformed ORC protobuf: varint too long")

    while i < n:
        tag = varint()
        field, wt = tag >> 3, tag & 7
        if wt == 0:
            v = varint()
        elif wt == 1:
            if i + 8 > n:
                raise ValueError("truncated ORC protobuf: fixed64 past end")
            v = int.from_bytes(data[i : i + 8], "little")
            i += 8
        elif wt == 2:
            ln = varint()
            if i + ln > n:
                raise ValueError("truncated ORC protobuf: bytes past end")
            v = data[i : i + ln]
            i += ln
        elif wt == 5:
            if i + 4 > n:
                raise ValueError("truncated ORC protobuf: fixed32 past end")
            v = int.from_bytes(data[i : i + 4], "little")
            i += 4
        else:
            raise ValueError(f"malformed ORC protobuf: wire type {wt}")
        out.setdefault(field, []).append(v)
    return out


def _zigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _first(msg: dict, field: int, default=None):
    vs = msg.get(field)
    return vs[0] if vs else default


def _decompress_stream(data: bytes, kind: str) -> bytes:
    """ORC chunked stream decompression: 3-byte LE header per chunk,
    LSB = is_original, upper 23 bits = chunk length."""
    if kind == "NONE":
        return data
    out = bytearray()
    i = 0
    while i < len(data):
        if i + 3 > len(data):
            raise ValueError("truncated ORC compressed stream: chunk header")
        h = int.from_bytes(data[i : i + 3], "little")
        i += 3
        ln = h >> 1
        if i + ln > len(data):
            raise ValueError("truncated ORC compressed stream: chunk body")
        chunk = data[i : i + ln]
        i += ln
        if h & 1:  # original (stored) chunk
            out += chunk
        elif kind == "ZLIB":
            out += zlib.decompress(chunk, -15)
        elif kind == "SNAPPY":
            from .parquet_meta import _snappy_decompress

            out += _snappy_decompress(chunk, 0)
        elif kind == "ZSTD":
            from .zstd import zstd_decompress

            out += zstd_decompress(chunk)
        elif kind == "LZ4":
            from .parquet_meta import _lz4_raw_decompress

            out += _lz4_raw_decompress(chunk, 0)
        else:
            raise NotImplementedError(f"ORC compression {kind} not supported")
    return bytes(out)


def _column_stats(raw: bytes) -> dict:
    """One ColumnStatistics message: counts + the typed min/max/sum the
    planner prunes with (int and string variants; others pass through as
    a kind tag only)."""
    msg = _pb_decode(raw)
    out = {
        "n_values": _first(msg, 1, 0),
        "has_null": bool(_first(msg, 10, 0)),
    }
    if 2 in msg:  # IntegerStatistics {1 min, 2 max, 3 sum} (sint64 zigzag)
        s = _pb_decode(msg[2][0])
        out["kind"] = "int"
        for name, f in (("min", 1), ("max", 2), ("sum", 3)):
            if f in s:
                out[name] = _zigzag(s[f][0])
    elif 4 in msg:  # StringStatistics {1 min, 2 max, 3 total length}
        s = _pb_decode(msg[4][0])
        out["kind"] = "string"
        if 1 in s:
            out["min"] = s[1][0].decode("utf-8", "replace")
        if 2 in s:
            out["max"] = s[2][0].decode("utf-8", "replace")
        if 3 in s:
            out["total_length"] = _zigzag(s[3][0])
    elif 3 in msg:  # DoubleStatistics {1 min, 2 max, 3 sum} (fixed64)
        import struct as _struct

        s = _pb_decode(msg[3][0])
        out["kind"] = "double"
        for name, f in (("min", 1), ("max", 2), ("sum", 3)):
            if f in s:
                out[name] = _struct.unpack("<d", s[f][0].to_bytes(8, "little"))[0]
    else:
        out["kind"] = "other"
    return out


def parse_orc_tail(blob: bytes) -> dict:
    """Walk an ORC file's tail: postscript facts, stripe directory, type
    tree, row count, file-level column statistics. Never reads stripe
    data bytes."""
    if len(blob) < 4:
        raise ValueError("not an ORC file: shorter than its length byte")
    ps_len = blob[-1]
    if ps_len + 1 > len(blob):
        raise ValueError("malformed ORC tail: postscript exceeds file")
    ps = _pb_decode(blob[-1 - ps_len : -1])
    magic = _first(ps, 8000, b"")
    if magic != b"ORC":
        raise ValueError("not an ORC file: postscript magic missing")
    footer_len = _first(ps, 1, 0)
    comp_kind = _COMPRESSION.get(_first(ps, 2, 0))
    if comp_kind is None:
        raise NotImplementedError(
            f"ORC compression kind {_first(ps, 2)} not supported"
        )
    meta_len = _first(ps, 5, 0)
    tail_start = len(blob) - 1 - ps_len - footer_len
    if tail_start < 0:
        raise ValueError("malformed ORC tail: footer exceeds file")
    footer = _pb_decode(
        _decompress_stream(blob[tail_start : tail_start + footer_len], comp_kind)
    )
    stripes = []
    for raw in footer.get(3, []):
        s = _pb_decode(raw)
        stripes.append(
            {
                "offset": _first(s, 1),
                "index_length": _first(s, 2, 0),
                "data_length": _first(s, 3, 0),
                "footer_length": _first(s, 4, 0),
                "n_rows": _first(s, 5, 0),
            }
        )
    types = []
    for raw in footer.get(4, []):
        tmsg = _pb_decode(raw)
        types.append(
            {
                "kind": _TYPE_KINDS.get(_first(tmsg, 1), str(_first(tmsg, 1))),
                "subtypes": [v for v in tmsg.get(2, [])],
                "field_names": [
                    b.decode("utf-8", "replace") for b in tmsg.get(3, [])
                ],
            }
        )
    n_rows = _first(footer, 6, 0)
    stats = [_column_stats(raw) for raw in footer.get(7, [])]
    if stripes and sum(s["n_rows"] for s in stripes) != n_rows:
        raise ValueError(
            "malformed ORC footer: stripe row counts do not sum to the "
            "file row count"
        )
    return {
        "postscript_length": ps_len,
        "footer_length": footer_len,
        "metadata_length": meta_len,
        "compression": comp_kind,
        "compression_block_size": _first(ps, 3),
        "writer_version": _first(ps, 6),
        "n_stripes": len(stripes),
        "stripes": stripes,
        "types": types,
        "n_rows": n_rows,
        "column_stats": stats,
        "content_length": _first(footer, 2, 0),
    }
