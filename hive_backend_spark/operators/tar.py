"""USTAR (POSIX.1-1988 tar) walker + encoder companion — the other
canonical corpus-drop format beside ZIP (operators/zip). Pure stdlib (no
``tarfile``): 512-octet header blocks with octal-encoded fields, the
space-substitution header checksum, type flags, 512-padding of member
data, the two-zero-block terminator, and the usual gzip envelope
(tar.gz) via zlib. Unlike ZIP there is NO central directory — a tar can
only be walked sequentially, which is exactly the ingest-planning
contrast q334/q335 exist to demonstrate: ZIP fans out from one directory
read, tar forces a streaming scan (fine when you read everything anyway,
which a training pipeline does).

Truncation, bad magic and checksum mismatches raise ValueError naming the
problem. No reference parity (no archive surface in the reference) — §7
extension in the q332/q334 style.
"""

from __future__ import annotations

import zlib

from pyspark.sql import DataFrame

__all__ = ["encode_tar", "parse_tar", "tar_census"]

BLOCK = 512


def _octal(n: int, width: int) -> bytes:
    s = f"{n:0{width - 1}o}"
    if len(s) > width - 1:
        # f-string zero-pads to a MINIMUM width: a size >= 8**11 (~8.6 GB)
        # formats to 12+ digits, and assigning 13 bytes to a 12-byte
        # bytearray slice would silently GROW the header block, shifting
        # every later field — corrupt output, not an error. Refuse loudly
        # (the 'name too long' discipline).
        raise ValueError(
            f"value {n} does not fit a {width}-byte ustar octal field"
        )
    return s.encode("ascii") + b"\x00"


def _header(name: str, size: int, typeflag: bytes, mtime: int) -> bytes:
    h = bytearray(BLOCK)
    nb = name.encode("ascii")
    if len(nb) > 100:
        raise ValueError("name too long for ustar header")
    h[0 : len(nb)] = nb
    h[100:108] = _octal(0o644, 8)
    h[108:116] = _octal(0, 8)
    h[116:124] = _octal(0, 8)
    h[124:136] = _octal(size, 12)
    h[136:148] = _octal(mtime, 12)
    h[148:156] = b" " * 8  # checksum computed over spaces
    h[156:157] = typeflag
    h[257:263] = b"ustar\x00"
    h[263:265] = b"00"
    chksum = sum(h)
    h[148:156] = f"{chksum:06o}".encode("ascii") + b"\x00 "
    return bytes(h)


def encode_tar(entries: list, gzipped: bool = True, mtime: int = 1767225600) -> bytes:
    """Build a (by default gzipped) ustar archive from (name, data_or_None)
    tuples — ``None`` data marks a directory entry. Real octal fields,
    checksums, 512 padding and the two-block terminator."""
    out = bytearray()
    for name, data in entries:
        if data is None:
            out += _header(name, 0, b"5", mtime)
        else:
            out += _header(name, len(data), b"0", mtime)
            out += data
            pad = (-len(data)) % BLOCK
            out += b"\x00" * pad
    out += b"\x00" * (2 * BLOCK)
    raw = bytes(out)
    if not gzipped:
        return raw
    co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
    return co.compress(raw) + co.flush()


def parse_tar(blob: bytes, gzipped: bool = True) -> list:
    """Sequentially walk a (possibly gzipped) ustar archive: per entry
    name, type, size, mtime, and whether the header checksum verifies
    under the space-substitution rule."""
    if gzipped:
        do = zlib.decompressobj(16 + zlib.MAX_WBITS)
        raw = do.decompress(blob)
        if not do.eof:
            raise ValueError("truncated gzip envelope on tar archive")
    else:
        raw = blob
    out = []
    pos = 0
    while pos + BLOCK <= len(raw):
        h = raw[pos : pos + BLOCK]
        if h == b"\x00" * BLOCK:  # first terminator block
            if raw[pos + BLOCK : pos + 2 * BLOCK] != b"\x00" * BLOCK:
                raise ValueError("tar terminator missing second zero block")
            return out
        if h[257:262] != b"ustar":
            raise ValueError(f"bad ustar magic at offset {pos}")
        try:
            size = int(h[124:136].rstrip(b"\x00 ") or b"0", 8)
            mtime = int(h[136:148].rstrip(b"\x00 ") or b"0", 8)
            stored = int(h[148:156].rstrip(b"\x00 ") or b"0", 8)
        except ValueError:
            raise ValueError(f"non-octal header field at offset {pos}") from None
        actual = sum(h[:148]) + 8 * 0x20 + sum(h[156:])
        name = h[:100].rstrip(b"\x00").decode("ascii", "replace")
        typeflag = chr(h[156])
        data_blocks = (size + BLOCK - 1) // BLOCK
        if pos + BLOCK + data_blocks * BLOCK > len(raw):
            raise ValueError(f"truncated tar: member {name} overruns archive")
        out.append(
            {
                "name": name,
                "type": "dir" if typeflag == "5" else "file",
                "size": size,
                "mtime": mtime,
                "checksum_ok": stored == actual,
            }
        )
        pos += BLOCK + data_blocks * BLOCK
    raise ValueError("truncated tar: no terminator blocks")


TAR_CENSUS_SCHEMA = (
    "doc_id bigint, n_entries int, n_dirs int, total_bytes bigint, "
    "n_checksum_ok int, max_mtime bigint"
)


def tar_census_gen(blob_col: str = "blob", id_col: str = "doc_id"):
    """The ``tar_census`` parse pass as a pandas-iterator function, for
    fusing with an upstream generator inside ONE mapInPandas stage."""
    import pandas as pd

    def parse(batches):
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf[id_col], pdf[blob_col]):
                entries = parse_tar(bytes(blob))
                rows.append(
                    (
                        int(did),
                        len(entries),
                        sum(1 for e in entries if e["type"] == "dir"),
                        sum(e["size"] for e in entries),
                        sum(1 for e in entries if e["checksum_ok"]),
                        max((e["mtime"] for e in entries), default=0),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "n_entries", "n_dirs", "total_bytes",
                    "n_checksum_ok", "max_mtime",
                ],
            )

    return parse


def tar_census(df: DataFrame, blob_col: str = "blob", id_col: str = "doc_id") -> DataFrame:
    """(id, tar.gz blob) -> sequential-walk census in one Arrow map pass:
    entry/dir counts, octet totals, and the header-checksum audit."""
    return df.mapInPandas(
        tar_census_gen(blob_col, id_col),
        f"{id_col} bigint, n_entries int, n_dirs int, total_bytes bigint, "
        "n_checksum_ok int, max_mtime bigint",
    )
