"""Avro Object Container File (OCF) walker + encoder companion — the
row-oriented sibling of the parquet rung (q336/q338): Kafka pipelines and
lakehouse ingest layers ship Avro containers, and the block layout is what
lets a 100 TB topic dump split across workers at sync-marker boundaries.
Built from the PUBLIC Apache Avro 1.11 spec; pure stdlib (zlib for the
deflate codec, json for the schema document).

Format facts used (Avro spec, "Object Container Files" + binary encoding):
  - header: magic ``Obj\\x01``, a file-metadata MAP (avro.schema JSON,
    avro.codec), a 16-byte sync marker;
  - maps/arrays encode as blocks: zigzag-varint count (possibly negative:
    abs(count) then a block byte size), items, terminating 0;
  - each data block: zigzag-varint record count, zigzag-varint byte size
    of the (possibly deflate-compressed) serialized records, the bytes,
    then the 16-byte sync marker — mismatched sync is corruption;
  - primitive encodings: long/int = zigzag varint; string/bytes = length
    + bytes; boolean = 1 byte; double = 8-byte little-endian IEEE;
    null = zero bytes.

Record decode supports flat record schemas over {long, int, string,
bytes, boolean, double, null} plus — round 13 — the LOGICAL TYPES a
lakehouse actually ships (Avro spec "Logical Types"): ``decimal`` over
bytes (minimal big-endian two's-complement unscaled) or fixed
(sign-extended to the declared size, raw bytes with NO length prefix),
``date`` over int (epoch days), ``timestamp-millis`` / ``timestamp-micros``
over long — each decoded to the proper Python object (decimal.Decimal,
datetime.date, naive-UTC datetime.datetime); NESTED RECORDS (recursive
field walk — a subrecord encodes as its fields in order, no framing);
and NULLABLE UNIONS ["null", T] / [T, "null"] (zigzag branch index then
the branch value — the ubiquitous optional-field shape). Anything else
(wide unions, arrays, maps, enums, uuid/time logical types) raises a
loud NotImplementedError naming the type (the multimodal codec
discipline).
Truncation or framing damage raises ValueError naming the problem. No
reference parity (the reference ingests only JSON) — §7 extension
surface in the q329 walker discipline.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import json
import struct
import zlib

__all__ = ["encode_avro", "parse_avro", "avro_census"]

MAGIC = b"Obj\x01"
_SUPPORTED = {"long", "int", "string", "bytes", "boolean", "double", "null"}
_EPOCH = _dt.datetime(1970, 1, 1)
_EPOCH_DATE = _dt.date(1970, 1, 1)


def _logical_info(t) -> tuple:
    """Validate a schema field type and normalize it to
    (base_type, annotation_or_None). ``t`` is a plain primitive string or
    a dict {"type": base, ...}; supported dicts are the spec's logical
    combos — decimal(bytes|fixed) / date(int) / timestamp-millis|micros
    (long) — and (round 13) NESTED RECORDS, normalized recursively to
    {"kind": "record", "fields": [(name, base, annotation), ...]} (Avro
    encodes a nested record as its fields in order, no framing, so decode
    is pure recursion). Unions, arrays, maps, enums and other logical
    types refuse loudly."""
    if isinstance(t, str):
        if t not in _SUPPORTED:
            raise NotImplementedError(f"Avro field type {t!r} not supported")
        return t, None
    if isinstance(t, list):
        # round 13: NULLABLE UNIONS — the ubiquitous optional-field shape
        # ["null", T] / [T, "null"]. A union value encodes as the zigzag
        # branch index then the branch's value (null = no bytes). Wider
        # unions (genuine sum types) still refuse.
        if len(t) != 2 or "null" not in t:
            raise NotImplementedError(
                f"Avro union {t!r} not supported (only 2-branch nullable)"
            )
        inner = t[0] if t[1] == "null" else t[1]
        if inner == "null":
            raise NotImplementedError("Avro union of two nulls not supported")
        base, logical = _logical_info(inner)
        return base, {
            "kind": "nullable",
            "null_index": t.index("null"),
            "base": base,
            "inner": logical,
        }
    if not isinstance(t, dict):
        raise NotImplementedError(
            f"Avro field type {t!r} not supported (unions/arrays refuse)"
        )
    base = t.get("type")
    lt = t.get("logicalType")
    if base == "record":
        subs = [
            (f["name"], *_logical_info(f.get("type")))
            for f in t.get("fields", [])
        ]
        return "record", {"kind": "record", "fields": subs}
    if lt is None:
        raise NotImplementedError(
            f"Avro field type {base!r} without a supported logicalType"
        )
    if lt == "decimal" and base in ("bytes", "fixed"):
        scale = int(t.get("scale", 0))
        if scale < 0 or int(t.get("precision", 1)) <= 0:
            raise ValueError("malformed Avro decimal: bad precision/scale")
        size = None
        if base == "fixed":
            size = int(t.get("size", 0))
            if size <= 0:
                raise ValueError("malformed Avro fixed: size must be positive")
        return base, {"kind": "decimal", "scale": scale, "size": size}
    if lt == "date" and base == "int":
        return base, {"kind": "date"}
    if lt == "timestamp-millis" and base == "long":
        return base, {"kind": "timestamp-millis"}
    if lt == "timestamp-micros" and base == "long":
        return base, {"kind": "timestamp-micros"}
    raise NotImplementedError(
        f"Avro logical type {lt!r} over {base!r} not supported"
    )


def _zz_encode(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63) if n >= 0 else ((-n) << 1) - 1
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _snappy_literal(data: bytes) -> bytes:
    """Minimal spec-legal raw-snappy emitter: varint uncompressed length,
    then all-literal tokens (no back-references) — decodable by any
    snappy reader including parquet_meta._snappy_decompress, which pytest
    round-trips against."""
    out = bytearray()
    u = len(data)
    while True:
        b = u & 0x7F
        u >>= 7
        out.append(b | 0x80 if u else b)
        if not u:
            break
    i = 0
    while i < len(data):
        chunk = data[i : i + 65536]
        n = len(chunk)
        if n <= 60:
            out.append((n - 1) << 2)
        else:
            lb = (n - 1).to_bytes(1 if n - 1 < 256 else 2, "little")
            out.append((59 + len(lb)) << 2)
            out += lb
        out += chunk
        i += n
    return bytes(out)


class _Reader:
    __slots__ = ("b", "i")

    def __init__(self, b: bytes, i: int = 0) -> None:
        self.b = b
        self.i = i

    def take(self, n: int) -> bytes:
        if n < 0 or self.i + n > len(self.b):
            raise ValueError("truncated Avro container: read past end")
        v = self.b[self.i : self.i + n]
        self.i += n
        return v

    def zigzag(self) -> int:
        u = shift = 0
        while True:
            byte = self.take(1)[0]
            u |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
            if shift > 70:
                raise ValueError("malformed Avro container: varint too long")
        return (u >> 1) ^ -(u & 1)

    def bytes_(self) -> bytes:
        n = self.zigzag()
        if n < 0:
            raise ValueError("malformed Avro container: negative length")
        return self.take(n)


def _encode_value(v, typ, logical=None) -> bytes:
    if logical is not None:
        kind = logical["kind"]
        if kind == "nullable":  # union: zigzag branch index, then value
            if v is None:
                return _zz_encode(logical["null_index"])
            return _zz_encode(1 - logical["null_index"]) + _encode_value(
                v, logical["base"], logical["inner"]
            )
        if kind == "record":  # nested record: fields in order, no framing
            out = bytearray()
            for i, (name, sub_base, sub_lg) in enumerate(logical["fields"]):
                sv = v[name] if isinstance(v, dict) else v[i]
                out += _encode_value(sv, sub_base, sub_lg)
            return bytes(out)
        if kind == "decimal":
            if isinstance(v, _decimal.Decimal):
                unscaled = int(v.scaleb(logical["scale"]).to_integral_exact())
            else:
                unscaled = int(v)  # already-unscaled int accepted
            if logical["size"] is not None:  # fixed: raw, sign-extended
                return unscaled.to_bytes(logical["size"], "big", signed=True)
            n = max(1, (unscaled.bit_length() + 8) // 8)  # minimal tc width
            bv = unscaled.to_bytes(n, "big", signed=True)
            return _zz_encode(len(bv)) + bv
        if kind == "date":
            days = (v - _EPOCH_DATE).days if isinstance(v, _dt.date) else int(v)
            return _zz_encode(days)
        if kind == "timestamp-millis":
            if isinstance(v, _dt.datetime):
                v = (v - _EPOCH) // _dt.timedelta(milliseconds=1)
            return _zz_encode(int(v))
        if kind == "timestamp-micros":
            if isinstance(v, _dt.datetime):
                v = (v - _EPOCH) // _dt.timedelta(microseconds=1)
            return _zz_encode(int(v))
    if typ == "long" or typ == "int":
        return _zz_encode(int(v))
    if typ == "string":
        bv = v.encode() if isinstance(v, str) else bytes(v)
        return _zz_encode(len(bv)) + bv
    if typ == "bytes":
        bv = bytes(v)
        return _zz_encode(len(bv)) + bv
    if typ == "boolean":
        return b"\x01" if v else b"\x00"
    if typ == "double":
        return struct.pack("<d", float(v))
    if typ == "null":
        return b""
    raise NotImplementedError(f"encode_avro does not support type {typ!r}")


def encode_avro(
    fields: list,
    records: list,
    codec: str = "null",
    block_records: int = 0,
    sync: bytes = b"\x00\x01\x02\x03\x04\x05\x06\x07\x08\x09\x0a\x0b\x0c\x0d\x0e\x0f",
) -> bytes:
    """Build an Avro OCF: ``fields`` is [(name, type)] over the supported
    primitive types, ``records`` a list of per-field value tuples.
    ``block_records`` > 0 splits the file into multiple data blocks (the
    worker-split unit); ``codec`` is 'null', 'deflate' or 'snappy'
    (snappy per the Avro spec: raw-snappy block + 4-byte big-endian
    CRC-32 of the UNCOMPRESSED data; emitted all-literal, which any
    spec-complete snappy reader accepts). The 16-byte sync marker is
    caller-fixable for deterministic fixtures."""
    if codec not in ("null", "deflate", "snappy", "zstandard"):
        raise ValueError(f"unsupported Avro codec {codec!r}")
    if len(sync) != 16:
        raise ValueError("Avro sync marker must be 16 bytes")
    norm = [_logical_info(t) for _, t in fields]
    bases = [b for b, _ in norm]
    logicals = [lg for _, lg in norm]
    schema = {
        "type": "record",
        "name": "row",
        "fields": [{"name": n, "type": t} for n, t in fields],
    }
    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": codec.encode(),
    }
    out = bytearray(MAGIC)
    out += _zz_encode(len(meta))
    for k, v in sorted(meta.items()):
        kb = k.encode()
        out += _zz_encode(len(kb)) + kb + _zz_encode(len(v)) + v
    out += _zz_encode(0)  # end of metadata map
    out += sync

    n = len(records)
    step = block_records if block_records > 0 else max(n, 1)
    for lo in range(0, n, step) if n else []:
        chunk = records[lo : lo + step]
        body = bytearray()
        for rec in chunk:
            if len(rec) != len(fields):
                raise ValueError("record arity does not match schema")
            for v, base, lg in zip(rec, bases, logicals):
                body += _encode_value(v, base, lg)
        if codec == "deflate":
            payload = zlib.compress(bytes(body))[2:-4]
        elif codec == "snappy":
            payload = _snappy_literal(bytes(body)) + struct.pack(
                ">I", zlib.crc32(bytes(body))
            )
        elif codec == "zstandard":
            from .zstd import zstd_compress_stored

            payload = zstd_compress_stored(bytes(body))
        else:
            payload = bytes(body)
        out += _zz_encode(len(chunk))
        out += _zz_encode(len(payload))
        out += payload
        out += sync
    return bytes(out)


def _decode_field(br: "_Reader", typ, logical) -> object:
    """Decode one field value from the record stream — recursive for
    nested records (whose fields are encoded in order with no framing)
    and nullable unions (zigzag branch index, then the branch value)."""
    if logical is not None and logical["kind"] == "nullable":
        branch = br.zigzag()
        if branch not in (0, 1):
            raise ValueError(
                f"malformed Avro union: branch index {branch} out of range"
            )
        if branch == logical["null_index"]:
            return None
        return _decode_field(br, logical["base"], logical["inner"])
    if logical is not None and logical["kind"] == "record":
        return {
            name: _decode_field(br, sub_t, sub_lg)
            for name, sub_t, sub_lg in logical["fields"]
        }
    if typ == "fixed":  # raw bytes, size from schema, no prefix
        v = br.take(logical["size"])
    elif typ in ("long", "int"):
        v = br.zigzag()
    elif typ == "string":
        v = br.bytes_().decode("utf-8", "replace")
    elif typ == "bytes":
        v = br.bytes_()
    elif typ == "boolean":
        v = br.take(1) == b"\x01"
    elif typ == "double":
        v = struct.unpack("<d", br.take(8))[0]
    else:  # null
        v = None
    if logical is not None:
        kind = logical["kind"]
        if kind == "decimal":
            unscaled = int.from_bytes(bytes(v), "big", signed=True)
            v = _decimal.Decimal(unscaled).scaleb(-logical["scale"])
        elif kind == "date":
            v = _EPOCH_DATE + _dt.timedelta(days=v)
        elif kind == "timestamp-millis":
            v = _EPOCH + _dt.timedelta(milliseconds=v)
        elif kind == "timestamp-micros":
            v = _EPOCH + _dt.timedelta(microseconds=v)
    return v


def parse_avro(blob: bytes) -> dict:
    """Walk an Avro OCF: schema facts, per-block census (record count,
    compressed/serialized sizes, sync verification) and the decoded
    records — flat primitives, logical types, and nested records (as
    nested Python dicts)."""
    if len(blob) < 4 or blob[:4] != MAGIC:
        raise ValueError("not an Avro container: missing Obj\\x01 magic")
    r = _Reader(blob, 4)
    meta: dict = {}
    while True:
        count = r.zigzag()
        if count == 0:
            break
        if count < 0:
            # negative block count: abs(count) items preceded by byte size
            r.zigzag()
            count = -count
        for _ in range(count):
            k = r.bytes_().decode("utf-8", "replace")
            meta[k] = r.bytes_()
    sync = r.take(16)
    try:
        schema = json.loads(meta["avro.schema"])
    except (KeyError, ValueError):
        raise ValueError("malformed Avro container: missing/bad avro.schema") from None
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate", "snappy", "zstandard"):
        raise NotImplementedError(f"Avro codec {codec!r} not supported")
    if schema.get("type") != "record":
        raise NotImplementedError("only flat record schemas are supported")
    fields = []
    for f in schema.get("fields", []):
        t = f.get("type")
        base, logical = _logical_info(t)
        fields.append((f["name"], base, logical))

    blocks = []
    records = []
    while r.i < len(blob):
        n_rec = r.zigzag()
        if n_rec < 0:
            raise ValueError("malformed Avro container: negative block count")
        payload = r.bytes_()
        if r.take(16) != sync:
            raise ValueError("corrupt Avro container: sync marker mismatch")
        if codec == "deflate":
            body = zlib.decompress(payload, -15)
        elif codec == "zstandard":
            from .zstd import zstd_decompress

            body = zstd_decompress(payload)
        elif codec == "snappy":
            if len(payload) < 4:
                raise ValueError("malformed Avro snappy block: shorter than CRC")
            from .parquet_meta import _snappy_decompress

            body = _snappy_decompress(payload[:-4], 0)
            (want_crc,) = struct.unpack(">I", payload[-4:])
            if zlib.crc32(body) != want_crc:
                raise ValueError("corrupt Avro snappy block: CRC-32 mismatch")
        else:
            body = payload
        br = _Reader(body)
        for _ in range(n_rec):
            records.append(
                {name: _decode_field(br, typ, lg) for name, typ, lg in fields}
            )
        if br.i != len(body):
            raise ValueError("malformed Avro block: trailing bytes after records")
        blocks.append(
            {
                "n_records": n_rec,
                "payload_bytes": len(payload),
                "serialized_bytes": len(body),
            }
        )
    return {
        "schema_name": schema.get("name"),
        "codec": codec,
        "n_fields": len(fields),
        "fields": fields,
        "blocks": blocks,
        "records": records,
    }


AVRO_CENSUS_SCHEMA = (
    "doc_id bigint, n_blocks int, n_records bigint, n_fields int, "
    "codec string, payload_bytes bigint, serialized_bytes bigint, "
    "long_sum bigint, str_bytes bigint"
)


def avro_census_gen(blob_col: str = "blob", id_col: str = "doc_id"):
    """The ``avro_census`` walk as a pandas-iterator function, for fusing
    with an upstream generator inside ONE mapInPandas stage."""
    import pandas as pd

    def walk(batches):
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf[id_col], pdf[blob_col]):
                meta = parse_avro(bytes(blob))
                long_field = next(
                    (n for n, t, lg in meta["fields"]
                     if t == "long" and lg is None), None
                )
                str_field = next(
                    (n for n, t, lg in meta["fields"] if t == "string"), None
                )
                rows.append(
                    {
                        id_col: int(did),
                        "n_blocks": len(meta["blocks"]),
                        "n_records": len(meta["records"]),
                        "n_fields": meta["n_fields"],
                        "codec": meta["codec"],
                        "payload_bytes": sum(
                            b["payload_bytes"] for b in meta["blocks"]
                        ),
                        "serialized_bytes": sum(
                            b["serialized_bytes"] for b in meta["blocks"]
                        ),
                        "long_sum": (
                            sum(r[long_field] for r in meta["records"])
                            if long_field
                            else 0
                        ),
                        "str_bytes": (
                            sum(len(r[str_field].encode()) for r in meta["records"])
                            if str_field
                            else 0
                        ),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "n_blocks", "n_records", "n_fields", "codec",
                    "payload_bytes", "serialized_bytes", "long_sum", "str_bytes",
                ],
            )

    return walk


def avro_census(df, blob_col: str = "blob", id_col: str = "doc_id"):
    """(id, Avro OCF blob) -> per-file ingest facts in one Arrow map pass:
    block census, record counts, payload octets, and decoded-value
    aggregates over the first long field — the triage a topic-dump
    ingest runs before content processing. Blobs never shuffle."""
    schema = (
        f"{id_col} bigint, n_blocks int, n_records bigint, n_fields int, "
        "codec string, payload_bytes bigint, serialized_bytes bigint, "
        "long_sum bigint, str_bytes bigint"
    )
    return df.mapInPandas(avro_census_gen(blob_col, id_col), schema)
