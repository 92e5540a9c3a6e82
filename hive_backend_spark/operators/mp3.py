"""MPEG audio (MP3) FRAME-HEADER walker + encoder companion — pure stdlib
struct walking over the 4-byte frame header layer of ISO/IEC 11172-3, no
audio decode (same scope discipline as operators/mp4.py: the reference has
no media handling, this is §7 extension surface for container-level triage
of crawled audio at 100 TB — bitrate/duration/CBR-vs-VBR facts BEFORE any
expensive decode).

Scope: frame sync scanning (11 set bits), MPEG-1 Layer III header fields —
bitrate index against the spec bitrate table, sample-rate index, padding
bit — per-frame byte length ``144 * bitrate / sample_rate + padding``, and
the two duration estimates that matter for triage: the exact one (every
MPEG-1 Layer III frame is 1152 samples regardless of bitrate, so duration
= n_frames * 1152 / sample_rate — valid for CBR and VBR alike) and the
naive header-extrapolated one (file_bytes * 8 / first_frame_bitrate) whose
divergence from the exact one is the classic VBR tell. Frame PAYLOADS are
opaque filler by design; side-info/Huffman decode is out of scope and
raises nothing because it is never attempted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["BITRATES_KBPS", "SAMPLE_RATES", "encode_mp3_frames", "mp3_frame_stats", "mp3_structure"]

# MPEG-1 Layer III bitrate table, kbps, index 1..14 (0 = free, 15 = bad)
BITRATES_KBPS = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
# MPEG-1 sample-rate table, index 0..2 (3 = reserved)
SAMPLE_RATES = [44100, 48000, 32000]
SAMPLES_PER_FRAME = 1152  # MPEG-1 Layer III, all bitrates


def frame_length(bitrate_kbps: int, sample_rate: int, padding: int) -> int:
    """Spec frame size: floor(144 * bitrate / sample_rate) + padding."""
    return (144 * bitrate_kbps * 1000) // sample_rate + padding


def _header(bitrate_idx: int, sr_idx: int, padding: int) -> bytes:
    # sync(11)=all ones | version(2)=11 MPEG-1 | layer(2)=01 Layer III |
    # protection(1)=1 no CRC || bitrate(4) | samplerate(2) | padding(1) |
    # private(1) || mode(2)=11 mono | rest zeros
    b0 = 0xFF
    b1 = 0b11111011
    b2 = (bitrate_idx << 4) | (sr_idx << 2) | (padding << 1)
    b3 = 0b11000000
    return bytes((b0, b1, b2, b3))


def encode_mp3_frames(frames: list) -> bytes:
    """A raw MPEG-1 Layer III frame stream from (bitrate_idx, sr_idx,
    padding) triples — real sync words, real header bit-packing, payload
    filled with a deterministic non-sync byte ramp (values capped below
    0xFF so a mid-payload false sync can never occur)."""
    out = bytearray()
    for bidx, sridx, pad in frames:
        n = frame_length(BITRATES_KBPS[bidx], SAMPLE_RATES[sridx], pad)
        out += _header(bidx, sridx, pad)
        out += bytes((7 + 5 * i) % 0xFE for i in range(n - 4))
    return bytes(out)


def mp3_structure(blob: bytes) -> dict:
    """Walk every frame header: returns n_frames, sample_rate, CBR flag,
    first/avg bitrate, exact duration (frame-count based, VBR-proof),
    naive CBR-extrapolated duration, and total bytes walked. Raises
    ValueError on a broken sync or a frame overrunning the blob."""
    pos = 0
    n = len(blob)
    n_frames = 0
    bitrates = []
    sample_rate = None
    total = 0
    while pos < n:
        if pos + 4 > n:
            raise ValueError("truncated MP3: EOF inside frame header")
        b0, b1, b2, _ = blob[pos : pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            raise ValueError(f"broken MP3 sync at byte {pos}")
        if (b1 & 0x18) != 0x18 or (b1 & 0x06) != 0x02:
            raise ValueError("unsupported MPEG version/layer (MPEG-1 Layer III only)")
        bidx = b2 >> 4
        sridx = (b2 >> 2) & 0x3
        pad = (b2 >> 1) & 0x1
        if bidx in (0, 15):
            raise ValueError(f"bad bitrate index {bidx} at byte {pos}")
        if sridx == 3:
            raise ValueError(f"reserved sample-rate index at byte {pos}")
        sr = SAMPLE_RATES[sridx]
        if sample_rate is None:
            sample_rate = sr
        elif sr != sample_rate:
            raise ValueError("sample-rate change mid-stream")
        flen = frame_length(BITRATES_KBPS[bidx], sr, pad)
        if pos + flen > n:
            raise ValueError(f"truncated MP3: frame at byte {pos} overruns blob")
        bitrates.append(BITRATES_KBPS[bidx])
        n_frames += 1
        total += flen
        pos += flen
    if n_frames == 0:
        raise ValueError("not an MPEG audio stream: no frames")
    is_cbr = len(set(bitrates)) == 1
    duration_s = n_frames * SAMPLES_PER_FRAME / sample_rate
    naive_s = total * 8 / (bitrates[0] * 1000)
    return {
        "n_frames": n_frames,
        "sample_rate": sample_rate,
        "is_cbr": is_cbr,
        "bitrate_first_kbps": bitrates[0],
        "bitrate_avg_kbps": sum(bitrates) / len(bitrates),
        "duration_s": duration_s,
        "naive_cbr_duration_s": naive_s,
        "total_bytes": total,
    }


MP3_STATS_SCHEMA = (
    "doc_id bigint, n_frames int, sample_rate int, is_cbr boolean, "
    "bitrate_first_kbps int, bitrate_avg_kbps double, duration_s double, "
    "vbr_drift_s double, total_bytes bigint"
)


def mp3_frame_stats_gen(blob_col: str = "blob", id_col: str = "doc_id"):
    """The ``mp3_frame_stats`` parse pass as a pandas-iterator function,
    for fusing with an upstream generator inside ONE mapInPandas stage."""
    import pandas as pd

    def parse(batches):
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf[id_col], pdf[blob_col]):
                m = mp3_structure(bytes(blob))
                rows.append(
                    (
                        int(did),
                        m["n_frames"],
                        m["sample_rate"],
                        m["is_cbr"],
                        m["bitrate_first_kbps"],
                        # UNROUNDED: report rounding happens engine-side
                        # with F.round (HALF_UP, oracle-parity + the
                        # guarded-round sweep keeps it in scope)
                        m["bitrate_avg_kbps"],
                        m["duration_s"],
                        m["naive_cbr_duration_s"] - m["duration_s"],
                        m["total_bytes"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "n_frames", "sample_rate", "is_cbr",
                    "bitrate_first_kbps", "bitrate_avg_kbps", "duration_s",
                    "vbr_drift_s", "total_bytes",
                ],
            )

    return parse


def mp3_frame_stats(df: DataFrame, blob_col: str = "blob", id_col: str = "doc_id") -> DataFrame:
    """(id, blob) -> frame-walk facts in one Arrow map pass, nothing
    shuffled. ``vbr_drift_s`` (naive minus exact duration) is the triage
    column: ~0 for CBR, systematically wrong for VBR — the reason players
    need Xing headers and the reason a pipeline must NOT trust
    header-extrapolated durations."""
    return df.mapInPandas(
        mp3_frame_stats_gen(blob_col, id_col),
        f"{id_col} bigint, n_frames int, sample_rate int, is_cbr boolean, "
        "bitrate_first_kbps int, bitrate_avg_kbps double, duration_s double, "
        "vbr_drift_s double, total_bytes bigint",
    )
