"""ISO-BMFF (MP4) STRUCTURAL parser + encoder companion — pure stdlib
struct walking, no media library and no sample decode (the reference has no
media handling at all — `slides-code.gs:312-375` reads only shape metadata —
so this is §7 extension surface for the 100 TB training-data pipeline:
container-level triage of crawled video BEFORE any expensive decode).

Scope: the box (atom) layer of ISO/IEC 14496-12 — size/type walking with
64-bit largesize support, ftyp major brand, mvhd movie timescale/duration
(version 0 and 1), per-trak tkhd track ids, mdia/mdhd per-track timescale,
hdlr handler fourcc, stsd sample-description codec fourcc, mdat payload
accounting. Codec PAYLOADS are opaque by design; anything beyond the box
walk raises loudly (the decode-step stub discipline,
operators/multimodal.py:14).

The encoder companion builds minimal but spec-shaped files (every box a
real [size][type][payload] atom, headers big-endian per spec) so the walker
is exercised by real bytes, and the q329 oracle can replay the analytic
parameters in pure SQL — the q325/q328 fixture discipline.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame

__all__ = ["encode_mp4_skeleton", "mp4_structure", "mp4_structure_stats"]


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _full(btype: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(btype, struct.pack(">B", version) + struct.pack(">I", flags)[1:] + payload)


def encode_mp4_skeleton(
    timescale: int,
    duration: int,
    tracks: list,
    mdat_len: int = 16,
    version: int = 0,
) -> bytes:
    """A minimal ISO-BMFF file: ftyp + moov(mvhd + trak*) + mdat.

    ``tracks`` is a list of (handler_fourcc, codec_fourcc, track_timescale,
    track_duration) tuples. ``version=1`` writes 64-bit mvhd/mdhd times
    (the largesize-era layout) so the walker's version branch is real.
    The mdat payload is a deterministic byte ramp — opaque by contract."""
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    traks = b""
    for tid, (handler, codec, tts, tdur) in enumerate(tracks, start=1):
        if version == 0:
            tkhd = _full(
                b"tkhd", 0, 7,
                struct.pack(">IIIII", 0, 0, tid, 0, tdur) + b"\x00" * 60,
            )
            mdhd = _full(
                b"mdhd", 0, 0,
                struct.pack(">IIII", 0, 0, tts, tdur) + struct.pack(">HH", 0x55C4, 0),
            )
        else:
            tkhd = _full(
                b"tkhd", 1, 7,
                struct.pack(">QQIIQ", 0, 0, tid, 0, tdur) + b"\x00" * 60,
            )
            mdhd = _full(
                b"mdhd", 1, 0,
                struct.pack(">QQIQ", 0, 0, tts, tdur) + struct.pack(">HH", 0x55C4, 0),
            )
        hdlr = _full(
            b"hdlr", 0, 0,
            struct.pack(">I", 0) + handler.encode("ascii") + b"\x00" * 12 + b"\x00",
        )
        # stsd with ONE sample entry whose type is the codec fourcc; the
        # entry body is the 6-byte reserved + 2-byte data_reference_index
        # prefix every SampleEntry starts with (14496-12 §8.5.2)
        entry = _box(codec.encode("ascii"), b"\x00" * 6 + struct.pack(">H", 1))
        stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
        stbl = _box(b"stbl", stsd)
        minf = _box(b"minf", stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        traks += _box(b"trak", tkhd + mdia)
    if version == 0:
        mvhd = _full(
            b"mvhd", 0, 0,
            struct.pack(">IIII", 0, 0, timescale, duration)
            + struct.pack(">IH", 0x00010000, 0x0100)
            + b"\x00" * 70
            + struct.pack(">I", len(tracks) + 1),
        )
    else:
        mvhd = _full(
            b"mvhd", 1, 0,
            struct.pack(">QQIQ", 0, 0, timescale, duration)
            + struct.pack(">IH", 0x00010000, 0x0100)
            + b"\x00" * 70
            + struct.pack(">I", len(tracks) + 1),
        )
    moov = _box(b"moov", mvhd + traks)
    mdat_payload = bytes((i * 31 + 7) % 256 for i in range(mdat_len))
    if mdat_len > 0xFFFF_FFF0:  # demonstrate the largesize path at scale
        mdat = struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 16 + mdat_len) + mdat_payload
    else:
        mdat = _box(b"mdat", mdat_payload)
    return ftyp + moov + mdat


def _walk(blob: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for each box in [start, end).
    Handles size==1 (64-bit largesize) and size==0 (to end of enclosure);
    every truncation raises ValueError naming the problem."""
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError("truncated MP4: EOF inside box header")
        size = struct.unpack(">I", blob[pos : pos + 4])[0]
        btype = blob[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated MP4: EOF inside largesize")
            size = struct.unpack(">Q", blob[pos + 8 : pos + 16])[0]
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < body - pos or pos + size > end:
            raise ValueError(f"truncated MP4: box {btype!r} overruns enclosure")
        yield btype, body, pos + size
        pos += size


def mp4_structure(blob: bytes) -> dict:
    """Walk the box tree and return the container-level facts a triage
    pipeline filters on: major brand, movie timescale/duration (+ seconds),
    track count, per-track (handler, codec, timescale, duration), and total
    mdat payload bytes. Raises ValueError on structural damage."""
    major = None
    timescale = duration = None
    tracks = []
    mdat_bytes = 0

    def walk_trak(s: int, e: int) -> dict:
        t: dict = {}
        for btype, bs, be in _walk(blob, s, e):
            if btype == b"mdia":
                for b2, s2, e2 in _walk(blob, bs, be):
                    if b2 == b"mdhd":
                        ver = blob[s2]
                        if ver == 1:
                            t["timescale"] = struct.unpack(">I", blob[s2 + 20 : s2 + 24])[0]
                            t["duration"] = struct.unpack(">Q", blob[s2 + 24 : s2 + 32])[0]
                        else:
                            t["timescale"] = struct.unpack(">I", blob[s2 + 12 : s2 + 16])[0]
                            t["duration"] = struct.unpack(">I", blob[s2 + 16 : s2 + 20])[0]
                    elif b2 == b"hdlr":
                        t["handler"] = blob[s2 + 8 : s2 + 12].decode("ascii", "replace")
                    elif b2 == b"minf":
                        for b3, s3, e3 in _walk(blob, s2, e2):
                            if b3 == b"stbl":
                                for b4, s4, e4 in _walk(blob, s3, e3):
                                    if b4 == b"stsd":
                                        # full box: 4 bytes ver/flags + 4 bytes entry_count
                                        for b5, s5, _ in _walk(blob, s4 + 8, e4):
                                            t.setdefault("codec", b5.decode("ascii", "replace"))
        return t

    for btype, bs, be in _walk(blob, 0, len(blob)):
        if btype == b"ftyp":
            major = blob[bs : bs + 4].decode("ascii", "replace")
        elif btype == b"moov":
            for b2, s2, e2 in _walk(blob, bs, be):
                if b2 == b"mvhd":
                    ver = blob[s2]
                    if ver == 1:
                        timescale = struct.unpack(">I", blob[s2 + 20 : s2 + 24])[0]
                        duration = struct.unpack(">Q", blob[s2 + 24 : s2 + 32])[0]
                    else:
                        timescale = struct.unpack(">I", blob[s2 + 12 : s2 + 16])[0]
                        duration = struct.unpack(">I", blob[s2 + 16 : s2 + 20])[0]
                elif b2 == b"trak":
                    tracks.append(walk_trak(s2, e2))
        elif btype == b"mdat":
            mdat_bytes += be - bs
    if major is None:
        raise ValueError("not an ISO-BMFF blob: no ftyp box")
    if timescale is None:
        raise ValueError("truncated MP4: no moov/mvhd box")
    return {
        "major_brand": major,
        "timescale": timescale,
        "duration": duration,
        "duration_s": duration / timescale if timescale else None,
        "n_tracks": len(tracks),
        "tracks": tracks,
        "mdat_bytes": mdat_bytes,
    }


def mp4_structure_stats(df: DataFrame, blob_col: str = "blob", id_col: str = "doc_id") -> DataFrame:
    """(id, blob) -> container facts, one Arrow map pass, nothing shuffled:
    the triage shape for 100 TB of crawled video — filter on
    brand/codec/duration BEFORE any byte of sample data is touched."""
    import pandas as pd

    def parse(batches):
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf[id_col], pdf[blob_col]):
                m = mp4_structure(bytes(blob))
                rows.append(
                    (
                        int(did),
                        m["major_brand"],
                        m["timescale"],
                        m["duration"],
                        # UNROUNDED: report rounding happens engine-side
                        # with F.round (HALF_UP, oracle-parity + the
                        # guarded-round sweep keeps it in scope)
                        m["duration_s"],
                        m["n_tracks"],
                        ",".join(sorted(t.get("codec", "?") for t in m["tracks"])),
                        m["mdat_bytes"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "major_brand", "timescale", "duration",
                    "duration_s", "n_tracks", "codecs", "mdat_bytes",
                ],
            )

    return df.mapInPandas(
        parse,
        f"{id_col} bigint, major_brand string, timescale bigint, "
        "duration bigint, duration_s double, n_tracks int, codecs string, "
        "mdat_bytes bigint",
    )
