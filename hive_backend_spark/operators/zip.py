"""ZIP archive walker + encoder companion — hand-rolled over the PKWARE
APPNOTE structures (no ``zipfile``): local file headers, central
directory, end-of-central-directory locator, STORED and DEFLATE methods
(raw zlib, wbits=-15), CRC-32 verification of every member. Training-data
drops routinely arrive zipped; the central directory is what makes a ZIP
listable WITHOUT scanning members — the property a 100 TB ingest planner
relies on to fan out per-member work from one tiny directory read.

Encoder companion builds real archives (both methods, correct CRCs and
offsets) so the walker is exercised end-to-end; a registered query
value-checks the analytic geometry. Truncation, bad signatures and CRC
mismatches raise ValueError naming the problem. No reference parity (the
reference has no archive surface) — §7 extension in the q328/q332 style.
"""

from __future__ import annotations

import struct
import zlib

from pyspark.sql import DataFrame

__all__ = ["encode_zip", "parse_zip", "zip_census"]

_LFH = b"PK\x03\x04"
_CEN = b"PK\x01\x02"
_EOCD = b"PK\x05\x06"


def encode_zip(entries: list) -> bytes:
    """Build a ZIP from (name, data, method) tuples; method is 0 (STORED)
    or 8 (DEFLATE). Emits real local headers, central directory and EOCD
    with correct CRCs, sizes and offsets."""
    out = bytearray()
    central = bytearray()
    for name, data, method in entries:
        nb = name.encode("ascii")
        crc = zlib.crc32(data) & 0xFFFFFFFF
        if method == 8:
            co = zlib.compressobj(6, zlib.DEFLATED, -15)
            payload = co.compress(data) + co.flush()
        elif method == 0:
            payload = data
        else:
            raise ValueError(f"unsupported zip method {method}")
        offset = len(out)
        fixed = struct.pack(
            "<HHHHHIIIHH", 20, 0, method, 0, 0x21, crc, len(payload), len(data),
            len(nb), 0,
        )
        out += _LFH + fixed + nb + payload
        central += (
            _CEN
            + struct.pack(
                "<HHHHHHIIIHHHHHII", 20, 20, 0, method, 0, 0x21, crc,
                len(payload), len(data), len(nb), 0, 0, 0, 0, 0, offset,
            )
            + nb
        )
    eocd = _EOCD + struct.pack(
        "<HHHHIIH", 0, 0, len(entries), len(entries), len(central), len(out), 0
    )
    return bytes(out + central + eocd)


def parse_zip(blob: bytes, verify: bool = True) -> list:
    """Walk the central directory (located via the EOCD record, scanning
    backward over a possible trailing comment) and return per-entry dicts:
    name, method, compressed/uncompressed sizes, and — with ``verify`` —
    whether the member data decompresses to the recorded CRC-32."""
    hunt_from = max(0, len(blob) - 22 - 0xFFFF)
    eocd_at = blob.rfind(_EOCD, hunt_from)
    if eocd_at < 0 or eocd_at + 22 > len(blob):
        raise ValueError("not a ZIP: no end-of-central-directory record")
    _, _, _, n_total, cd_size, cd_off, _ = struct.unpack(
        "<HHHHIIH", blob[eocd_at + 4 : eocd_at + 22]
    )
    if cd_off + cd_size > len(blob):
        raise ValueError("truncated ZIP: central directory overruns blob")
    out = []
    pos = cd_off
    for _ in range(n_total):
        if blob[pos : pos + 4] != _CEN:
            raise ValueError("bad central-directory signature")
        (
            _, _, _, method, _, _, crc, csize, usize, nlen, elen, clen,
            _, _, _, offset,
        ) = struct.unpack("<HHHHHHIIIHHHHHII", blob[pos + 4 : pos + 46])
        name = blob[pos + 46 : pos + 46 + nlen].decode("ascii", "replace")
        pos += 46 + nlen + elen + clen
        entry = {
            "name": name, "method": method, "csize": csize, "usize": usize,
            "crc_ok": None,
        }
        if verify:
            if blob[offset : offset + 4] != _LFH:
                raise ValueError(f"bad local-header signature for {name}")
            lf_nlen, lf_elen = struct.unpack(
                "<HH", blob[offset + 26 : offset + 30]
            )
            data_at = offset + 30 + lf_nlen + lf_elen
            if data_at + csize > len(blob):
                raise ValueError(f"truncated ZIP: member {name} overruns blob")
            payload = blob[data_at : data_at + csize]
            if method == 8:
                data = zlib.decompress(payload, -15)
            elif method == 0:
                data = payload
            else:
                raise ValueError(f"unsupported zip method {method} for {name}")
            entry["crc_ok"] = (
                len(data) == usize and (zlib.crc32(data) & 0xFFFFFFFF) == crc
            )
        out.append(entry)
    return out


ZIP_CENSUS_SCHEMA = (
    "doc_id bigint, n_entries int, n_deflated int, "
    "uncompressed_bytes bigint, stored_bytes bigint, n_crc_ok int"
)


def zip_census_gen(blob_col: str = "blob", id_col: str = "doc_id"):
    """The ``zip_census`` parse pass as a pandas-iterator function, so a
    caller can compose it with an upstream generator inside ONE
    mapInPandas stage (fixture pipelines fuse build+parse; the blobs then
    never cross the JVM<->Python boundary)."""
    import pandas as pd

    def parse(batches):
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf[id_col], pdf[blob_col]):
                entries = parse_zip(bytes(blob))
                rows.append(
                    (
                        int(did),
                        len(entries),
                        sum(1 for e in entries if e["method"] == 8),
                        sum(e["usize"] for e in entries),
                        sum(e["usize"] for e in entries if e["method"] == 0),
                        sum(1 for e in entries if e["crc_ok"]),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "n_entries", "n_deflated", "uncompressed_bytes",
                    "stored_bytes", "n_crc_ok",
                ],
            )

    return parse


def zip_census(df: DataFrame, blob_col: str = "blob", id_col: str = "doc_id") -> DataFrame:
    """(id, zip blob) -> directory census + member CRC audit in one Arrow
    map pass: entry/method counts, octet totals, and how many members
    decompress to their recorded CRC — the listability-without-scan
    property exercised with full verification."""
    return df.mapInPandas(
        zip_census_gen(blob_col, id_col),
        f"{id_col} bigint, n_entries int, n_deflated int, "
        "uncompressed_bytes bigint, stored_bytes bigint, n_crc_ok int",
    )
