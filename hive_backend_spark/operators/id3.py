"""ID3v2 tag walker + encoder companion — the metadata layer in front of
real-world MP3 streams (operators/mp3 walks the frames BEHIND it; a walker
that does not skip the tag mis-syncs on byte 0). Pure stdlib struct
walking, both on-disk size grammars:

  - v2.3: frame sizes are plain 32-bit big-endian;
  - v2.4: frame sizes are SYNCHSAFE (7 bits per byte, high bit clear) —
    the representation that keeps a tag from faking an MPEG frame sync;
  - the tag header size is synchsafe in BOTH versions;
  - text frames (Txxx) carry an encoding byte (0 = latin-1, 3 = utf-8)
    before the value; trailing zero padding is legal and skipped.

Truncation and grammar damage raise ValueError naming the problem. No
reference parity (no media in the reference) — §7 extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["encode_id3v2", "parse_id3v2", "id3_tag_size", "mp3_with_id3_stats"]


def _synchsafe(n: int) -> bytes:
    return bytes(((n >> s) & 0x7F) for s in (21, 14, 7, 0))


def _unsynchsafe(b: bytes) -> int:
    if any(x & 0x80 for x in b):
        raise ValueError("ID3 synchsafe byte with high bit set")
    return (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]


def encode_id3v2(frames: list, version: int = 3, padding: int = 0) -> bytes:
    """Build an ID3v2.3 or v2.4 tag from (frame_id, text) pairs. Text
    frames use latin-1 (encoding byte 0)."""
    body = bytearray()
    for fid, text in frames:
        payload = b"\x00" + text.encode("latin-1")
        if version == 4:
            size = _synchsafe(len(payload))
        else:
            size = len(payload).to_bytes(4, "big")
        body += fid.encode("ascii") + size + b"\x00\x00" + payload
    body += b"\x00" * padding
    return b"ID3" + bytes([version, 0, 0]) + _synchsafe(len(body)) + bytes(body)


def id3_tag_size(blob: bytes) -> int:
    """Total octets of a leading ID3v2 tag (0 if none) — what an MPEG
    frame walker must skip before looking for sync."""
    if blob[:3] != b"ID3":
        return 0
    if len(blob) < 10:
        raise ValueError("truncated ID3 tag: short header")
    return 10 + _unsynchsafe(blob[6:10])


def parse_id3v2(blob: bytes) -> dict:
    """Parse a leading ID3v2 tag: version, declared size, frame inventory
    and decoded text values. Returns {'version': 0, 'frames': {}} when no
    tag is present."""
    if blob[:3] != b"ID3":
        return {"version": 0, "tag_bytes": 0, "frames": {}}
    total = id3_tag_size(blob)
    if total > len(blob):
        raise ValueError("truncated ID3 tag: body shorter than declared size")
    version = blob[3]
    if version not in (3, 4):
        raise ValueError(f"unsupported ID3v2.{version} tag")
    pos, end = 10, total
    frames: dict = {}
    while pos + 10 <= end:
        if blob[pos] == 0:  # zero padding: tag body ends
            break
        fid = blob[pos : pos + 4].decode("ascii", "replace")
        if version == 4:
            size = _unsynchsafe(blob[pos + 4 : pos + 8])
        else:
            size = int.from_bytes(blob[pos + 4 : pos + 8], "big")
        pos += 10
        if pos + size > end:
            raise ValueError(f"ID3 frame {fid} overruns tag body")
        payload = blob[pos : pos + size]
        if fid.startswith("T") and payload:
            enc = payload[0]
            text = payload[1:].decode("utf-8" if enc == 3 else "latin-1", "replace")
            frames[fid] = text.rstrip("\x00")
        else:
            frames[fid] = payload.hex()
        pos += size
    return {"version": version, "tag_bytes": total, "frames": frames}


ID3_STATS_SCHEMA = (
    "doc_id bigint, id3_version int, tag_bytes int, n_tag_frames int, "
    "title string, album string, n_frames int, sample_rate int, "
    "is_cbr boolean, duration_s double"
)


def mp3_with_id3_stats_gen(blob_col: str = "blob", id_col: str = "doc_id"):
    """The ``mp3_with_id3_stats`` parse pass as a pandas-iterator
    function, for fusing with an upstream generator inside ONE
    mapInPandas stage."""
    import pandas as pd

    from .mp3 import mp3_structure

    def parse(batches):
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf[id_col], pdf[blob_col]):
                blob = bytes(blob)
                tag = parse_id3v2(blob)
                m = mp3_structure(blob[tag["tag_bytes"] :])
                rows.append(
                    (
                        int(did),
                        tag["version"],
                        tag["tag_bytes"],
                        len(tag["frames"]),
                        tag["frames"].get("TIT2"),
                        tag["frames"].get("TALB"),
                        m["n_frames"],
                        m["sample_rate"],
                        m["is_cbr"],
                        m["duration_s"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "id3_version", "tag_bytes", "n_tag_frames",
                    "title", "album", "n_frames", "sample_rate", "is_cbr",
                    "duration_s",
                ],
            )

    return parse


def mp3_with_id3_stats(df: DataFrame, blob_col: str = "blob", id_col: str = "doc_id") -> DataFrame:
    """(id, tagged mp3 blob) -> tag facts + frame-walk facts in one Arrow
    map pass: the real-world MP3 ingest shape — skip the ID3v2 tag (both
    size grammars), surface title/album text, then hand the remainder to
    the operators/mp3 frame walker."""
    return df.mapInPandas(
        mp3_with_id3_stats_gen(blob_col, id_col),
        f"{id_col} bigint, id3_version int, tag_bytes int, n_tag_frames int, "
        "title string, album string, n_frames int, sample_rate int, "
        "is_cbr boolean, duration_s double",
    )
