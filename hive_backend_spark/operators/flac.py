"""FLAC (RFC 9639 / xiph spec) frame decoder + encoder companion — the
compressed-audio analog of the JPEG ladder (r10 verdict task #6), and the
one audio rung that is stdlib+numpy feasible END TO END: FLAC is lossless,
so decode is integer-exact sample reconstruction and the q337 oracle can
replay the decoded aggregates analytically with no rounding caveat.

Scope (everything bit-level, no audio library):
  - stream grammar: "fLaC" magic, metadata blocks (STREAMINFO parsed:
    block sizes, sample rate, channels, bit depth, total samples, MD5 of
    the unencoded audio), frames until EOF;
  - frame grammar: 14-bit sync, blocking strategy, coded block-size /
    sample-rate / channel-assignment / sample-size fields, UTF-8-style
    coded frame number, CRC-8 header check, CRC-16 whole-frame check;
  - subframes: CONSTANT, VERBATIM, FIXED predictors order 0-4, LPC with
    quantized coefficients and arithmetic shift;
  - residuals: Rice / Rice2 partitioned coding (zigzag, unary quotient =
    q zero bits then a one, escape code -> raw binary partitions);
  - stereo decorrelation: left/side, right/side, mid/side exact
    reconstruction (side channel carries one extra bit per the spec).

The encoder companion emits real FLAC streams (CONSTANT / VERBATIM /
FIXED frames with order-0 Rice partitions, independent or mid/side
channels, correct CRCs and MD5) that the decoder — and any spec-complete
FLAC reader — reconstructs bit-exactly; pytest round-trips random signals
and sweeps every truncation cut point for the ValueError contract.

No reference parity (the reference has no audio surface at all) — §7
extension in the q328/q329 walker discipline. Why it matters at 100 TB:
audio training corpora ship FLAC-compressed; frame-level triage (sample
counts, bit depth, CRC health) and exact decode are the map-side pass a
multimodal pipeline runs before feature extraction, and every byte of it
stays inside one Arrow task — nothing here shuffles.

Truncation or framing damage raises ValueError naming the problem.
"""

from __future__ import annotations

import hashlib
import struct

__all__ = ["encode_flac", "decode_flac", "flac_stats"]

_SYNC = 0b11111111111110
_BPS_CODES = {8: 0b001, 12: 0b010, 16: 0b100, 20: 0b101, 24: 0b110}
_BPS_FROM_CODE = {v: k for k, v in _BPS_CODES.items()}


def _crc8(data: bytes) -> int:
    """CRC-8, polynomial x^8 + x^2 + x + 1 (0x07), init 0 — frame header."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, polynomial x^16 + x^15 + x^2 + 1 (0x8005), init 0 — frame."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
            )
    return crc


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        if bits == 0:
            return
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        # q zero bits followed by a one bit (libFLAC write_unary_unsigned)
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def getvalue(self) -> bytes:
        if self.nbits:
            raise ValueError("bit writer not byte-aligned")
        return bytes(self.buf)


class _BitReader:
    __slots__ = ("b", "pos")

    def __init__(self, b: bytes, pos_bits: int = 0) -> None:
        self.b = b
        self.pos = pos_bits

    def read(self, bits: int) -> int:
        end = self.pos + bits
        if end > len(self.b) * 8:
            raise ValueError("truncated FLAC stream: bit read past end")
        out = 0
        pos = self.pos
        while bits:
            byte = self.b[pos >> 3]
            avail = 8 - (pos & 7)
            take = min(avail, bits)
            shift = avail - take
            out = (out << take) | ((byte >> shift) & ((1 << take) - 1))
            pos += take
            bits -= take
        self.pos = pos
        return out

    def read_signed(self, bits: int) -> int:
        if bits == 0:
            return 0
        v = self.read(bits)
        return v - (1 << bits) if v & (1 << (bits - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while True:
            if self.read(1):
                return q
            q += 1
            if q > 1 << 24:
                raise ValueError("malformed FLAC stream: runaway unary code")

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _utf8_code(value: int) -> bytes:
    """The UTF-8-style variable-length number FLAC uses for frame indices
    (extended to 36 bits — not actual UTF-8 text)."""
    if value < 0x80:
        return bytes([value])
    for nbytes, maxbits in ((2, 11), (3, 16), (4, 21), (5, 26), (6, 31), (7, 36)):
        if value < (1 << maxbits):
            lead = (0xFF << (8 - nbytes)) & 0xFF | (
                value >> (6 * (nbytes - 1))
            ) & ((1 << (7 - nbytes)) - 1)
            out = [lead]
            for i in range(nbytes - 2, -1, -1):
                out.append(0x80 | ((value >> (6 * i)) & 0x3F))
            return bytes(out)
    raise ValueError("frame number exceeds 36 bits")


def _utf8_decode(r: _BitReader) -> int:
    first = r.read(8)
    if first < 0x80:
        return first
    nbytes = 0
    mask = 0x80
    while first & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("malformed FLAC frame: bad coded frame number")
    value = first & (mask - 1)
    for _ in range(nbytes - 1):
        cont = r.read(8)
        if cont & 0xC0 != 0x80:
            raise ValueError("malformed FLAC frame: bad coded-number continuation")
        value = (value << 6) | (cont & 0x3F)
    return value


def _zigzag(r: int) -> int:
    return (r << 1) if r >= 0 else (-(r << 1)) - 1


def _unzigzag(u: int) -> int:
    return (u >> 1) if not u & 1 else -((u + 1) >> 1)


_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _best_rice_param(residuals: list) -> int:
    best_p, best_bits = 0, None
    for p in range(15):
        bits = sum((_zigzag(r) >> p) + 1 + p for r in residuals)
        if best_bits is None or bits < best_bits:
            best_p, best_bits = p, bits
        if best_bits is not None and (1 << p) > (
            max((abs(r) for r in residuals), default=0) * 2 + 1
        ):
            break
    return best_p


# ---------------------------------------------------------------- encoder

def _write_residuals(w: _BitWriter, residuals: list) -> None:
    # method 0 (4-bit Rice params), partition order 0: one partition
    w.write(0, 2)
    w.write(0, 4)
    p = _best_rice_param(residuals)
    w.write(p, 4)
    for res in residuals:
        u = _zigzag(res)
        w.write_unary(u >> p)
        w.write(u & ((1 << p) - 1), p)


def _write_subframe(w: _BitWriter, samples: list, bps: int, kind) -> None:
    w.write(0, 1)  # zero pad bit
    if kind == "constant":
        if any(s != samples[0] for s in samples):
            raise ValueError("constant subframe requires constant samples")
        w.write(0, 6)
        w.write(0, 1)  # no wasted bits
        w.write(samples[0] & ((1 << bps) - 1), bps)
        return
    if kind == "verbatim":
        w.write(1, 6)
        w.write(0, 1)
        for s in samples:
            w.write(s & ((1 << bps) - 1), bps)
        return
    k = int(kind[1])  # ("fixed", order)
    if not 0 <= k <= 4 or k >= len(samples):
        raise ValueError(f"fixed order {k} invalid for {len(samples)} samples")
    w.write(0b001000 | k, 6)
    w.write(0, 1)
    for s in samples[:k]:
        w.write(s & ((1 << bps) - 1), bps)
    coefs = _FIXED_COEFS[k]
    residuals = [
        samples[i] - sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))
        for i in range(k, len(samples))
    ]
    _write_residuals(w, residuals)


def encode_flac(
    channels: list,
    sample_rate: int,
    bps: int = 16,
    blocksize: int = 64,
    plan=None,
    mid_side: bool = False,
) -> bytes:
    """Build a real FLAC stream. ``channels`` is [ch0_samples, ...] (1 or 2
    channels, equal lengths, signed ints within ``bps`` bits). ``plan``
    maps a frame index to 'constant' | 'verbatim' | ('fixed', order)
    (default: fixed order 2, falling back to verbatim on short frames).
    ``mid_side=True`` encodes stereo frames with mid/side decorrelation.
    STREAMINFO carries the true MD5 of the unencoded audio, every frame
    carries correct CRC-8/CRC-16 — decoders that check, verify."""
    nch = len(channels)
    if nch not in (1, 2):
        raise ValueError("encode_flac supports 1 or 2 channels")
    n = len(channels[0])
    if any(len(c) != n for c in channels):
        raise ValueError("ragged channels: lengths differ")
    if bps not in _BPS_CODES:
        raise ValueError(f"unsupported bits-per-sample {bps}")
    if mid_side and nch != 2:
        raise ValueError("mid/side needs exactly 2 channels")
    lim = 1 << (bps - 1)
    for c in channels:
        for s in c:
            if not -lim <= s < lim:
                raise ValueError(f"sample {s} exceeds {bps}-bit range")

    md5 = hashlib.md5()
    width = (bps + 7) // 8  # spec: MD5 uses ceil(bps/8) bytes per sample
    for i in range(n):
        for c in channels:
            md5.update(int(c[i]).to_bytes(width, "little", signed=True))

    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)  # min frame size unknown
    si.write(0, 24)  # max frame size unknown
    si.write(sample_rate, 20)
    si.write(nch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    body = si.getvalue() + md5.digest()
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body  # last, type 0

    nframes = (n + blocksize - 1) // blocksize
    for f in range(nframes):
        lo, hi = f * blocksize, min((f + 1) * blocksize, n)
        bs = hi - lo
        kind = plan(f) if plan else ("fixed", 2)
        if kind not in ("constant", "verbatim") and int(kind[1]) >= bs:
            kind = "verbatim"
        w = _BitWriter()
        w.write(_SYNC, 14)
        w.write(0, 1)  # reserved
        w.write(0, 1)  # fixed blocking strategy
        w.write(0b0111, 4)  # block size: 16-bit field at header end
        w.write(0, 4)  # sample rate: from STREAMINFO
        w.write(0b1010 if mid_side else nch - 1, 4)  # channel assignment
        w.write(_BPS_CODES[bps], 3)
        w.write(0, 1)  # reserved
        for byte in _utf8_code(f):
            w.write(byte, 8)
        w.write(bs - 1, 16)
        head = w.getvalue()
        w.write(_crc8(head), 8)
        if mid_side:
            left = channels[0][lo:hi]
            right = channels[1][lo:hi]
            mid = [(l + r) >> 1 for l, r in zip(left, right)]
            side = [l - r for l, r in zip(left, right)]
            _write_subframe(w, mid, bps, kind)
            _write_subframe(w, side, bps + 1, kind)
        else:
            for c in channels:
                _write_subframe(w, c[lo:hi], bps, kind)
        w.align()
        frame = w.getvalue()
        out += frame + struct.pack(">H", _crc16(frame))
    return bytes(out)


# ---------------------------------------------------------------- decoder

def _read_residuals(r: _BitReader, blocksize: int, order: int) -> list:
    method = r.read(2)
    if method > 1:
        raise ValueError(f"malformed FLAC subframe: residual method {method}")
    pbits = 4 + method
    escape = (1 << pbits) - 1
    p = r.read(4)
    if blocksize >> p << p != blocksize:
        raise ValueError("malformed FLAC subframe: partition order mismatch")
    out = []
    for part in range(1 << p):
        cnt = (blocksize >> p) - (order if part == 0 else 0)
        if cnt < 0:
            raise ValueError("malformed FLAC subframe: order exceeds partition")
        param = r.read(pbits)
        if param == escape:
            raw = r.read(5)
            out += [r.read_signed(raw) for _ in range(cnt)]
        else:
            for _ in range(cnt):
                u = (r.read_unary() << param) | r.read(param)
                out.append(_unzigzag(u))
    return out


def _read_subframe(r: _BitReader, blocksize: int, bps: int) -> tuple:
    if r.read(1):
        raise ValueError("malformed FLAC subframe: nonzero padding bit")
    stype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = 1 + r.read_unary()
        bps -= wasted
    if stype == 0:  # CONSTANT
        v = r.read_signed(bps)
        samples, kind = [v] * blocksize, "constant"
    elif stype == 1:  # VERBATIM
        samples = [r.read_signed(bps) for _ in range(blocksize)]
        kind = "verbatim"
    elif 8 <= stype <= 12:  # FIXED
        k = stype - 8
        warm = [r.read_signed(bps) for _ in range(k)]
        res = _read_residuals(r, blocksize, k)
        coefs = _FIXED_COEFS[k]
        samples = list(warm)
        for i in range(k, blocksize):
            pred = sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))
            samples.append(res[i - k] + pred)
        kind = f"fixed{k}"
    elif stype & 0b100000:  # LPC
        k = (stype & 0b11111) + 1
        warm = [r.read_signed(bps) for _ in range(k)]
        prec = r.read(4)
        if prec == 15:
            raise ValueError("malformed FLAC subframe: invalid LPC precision")
        prec += 1
        shift = r.read_signed(5)
        if shift < 0:
            raise ValueError("malformed FLAC subframe: negative LPC shift")
        coefs = [r.read_signed(prec) for _ in range(k)]
        res = _read_residuals(r, blocksize, k)
        samples = list(warm)
        for i in range(k, blocksize):
            pred = sum(c * samples[i - 1 - j] for j, c in enumerate(coefs)) >> shift
            samples.append(res[i - k] + pred)
        kind = f"lpc{k}"
    else:
        raise ValueError(f"malformed FLAC subframe: reserved type {stype}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples, kind


_BLOCKSIZE_FIXED = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608}
_SR_FIXED = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}


def decode_flac(blob: bytes) -> dict:
    """Decode a FLAC stream: STREAMINFO facts, per-frame census (block
    size, channel assignment, subframe kinds, CRC results) and the exact
    reconstructed samples per channel. CRC-8/CRC-16 are VERIFIED (a
    mismatch raises), and md5_ok reports whether the decoded audio hashes
    to the STREAMINFO MD5 — the end-to-end losslessness receipt."""
    if len(blob) < 4 or blob[:4] != b"fLaC":
        raise ValueError("not a FLAC stream: missing fLaC magic")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(blob):
            raise ValueError("truncated FLAC stream: metadata block header")
        head = blob[pos]
        btype, last = head & 0x7F, bool(head & 0x80)
        blen = int.from_bytes(blob[pos + 1 : pos + 4], "big")
        if pos + 4 + blen > len(blob):
            raise ValueError("truncated FLAC stream: metadata block body")
        if btype == 0:
            if blen != 34:
                raise ValueError("malformed FLAC: STREAMINFO must be 34 bytes")
            r = _BitReader(blob[pos + 4 : pos + 4 + 34])
            streaminfo = {
                "min_blocksize": r.read(16),
                "max_blocksize": r.read(16),
                "min_framesize": r.read(24),
                "max_framesize": r.read(24),
                "sample_rate": r.read(20),
                "channels": r.read(3) + 1,
                "bits_per_sample": r.read(5) + 1,
                "total_samples": r.read(36),
                "md5": blob[pos + 4 + 18 : pos + 4 + 34],
            }
        pos += 4 + blen
        if last:
            break
    if streaminfo is None:
        raise ValueError("malformed FLAC: no STREAMINFO block")
    nch = streaminfo["channels"]
    bps = streaminfo["bits_per_sample"]
    channels: list = [[] for _ in range(nch)]
    frames = []
    while pos < len(blob):
        r = _BitReader(blob, pos * 8)
        if r.read(14) != _SYNC:
            raise ValueError("malformed FLAC frame: bad sync code")
        r.read(1)  # reserved
        r.read(1)  # blocking strategy
        bs_code = r.read(4)
        sr_code = r.read(4)
        chan_code = r.read(4)
        bps_code = r.read(3)
        r.read(1)  # reserved
        _frame_no = _utf8_decode(r)
        if bs_code == 0:
            raise ValueError("malformed FLAC frame: reserved block-size code 0")
        elif bs_code == 6:
            bs = r.read(8) + 1
        elif bs_code == 7:
            bs = r.read(16) + 1
        elif bs_code in _BLOCKSIZE_FIXED:
            bs = _BLOCKSIZE_FIXED[bs_code]
        else:
            bs = 256 << (bs_code - 8)
        if sr_code == 0:
            sr = streaminfo["sample_rate"]
        elif sr_code in _SR_FIXED:
            sr = _SR_FIXED[sr_code]
        elif sr_code == 12:
            sr = r.read(8) * 1000
        elif sr_code == 13:
            sr = r.read(16)
        elif sr_code == 14:
            sr = r.read(16) * 10
        else:
            raise ValueError("malformed FLAC frame: invalid sample-rate code")
        fbps = streaminfo["bits_per_sample"] if bps_code == 0 else _BPS_FROM_CODE.get(bps_code)
        if fbps is None:
            raise ValueError("malformed FLAC frame: reserved sample-size code")
        head_end = r.pos >> 3
        want_crc8 = _crc8(blob[pos:head_end])
        if r.read(8) != want_crc8:
            raise ValueError("corrupt FLAC frame: header CRC-8 mismatch")
        if chan_code <= 7:
            if chan_code + 1 != nch:
                raise ValueError("malformed FLAC frame: channel count mismatch")
            subs = [_read_subframe(r, bs, fbps) for _ in range(nch)]
            chans = [s for s, _ in subs]
            kinds = [k for _, k in subs]
        elif chan_code in (8, 9, 10):
            if nch != 2:
                raise ValueError("malformed FLAC frame: decorrelation needs stereo")
            # side channel carries one extra bit
            extra0 = 1 if chan_code == 9 else 0
            extra1 = 1 if chan_code in (8, 10) else 0
            s0, k0 = _read_subframe(r, bs, fbps + extra0)
            s1, k1 = _read_subframe(r, bs, fbps + extra1)
            if chan_code == 8:  # left/side
                left, side = s0, s1
                right = [l - s for l, s in zip(left, side)]
            elif chan_code == 9:  # right/side
                side, right = s0, s1
                left = [s + rr for s, rr in zip(side, right)]
            else:  # mid/side
                left, right = [], []
                for m, s in zip(s0, s1):
                    m = (m << 1) | (s & 1)
                    left.append((m + s) >> 1)
                    right.append((m - s) >> 1)
            chans, kinds = [left, right], [k0, k1]
        else:
            raise ValueError("malformed FLAC frame: reserved channel assignment")
        r.align()
        frame_end = r.pos >> 3
        if frame_end + 2 > len(blob):
            raise ValueError("truncated FLAC stream: missing frame CRC-16")
        (want_crc16,) = struct.unpack(">H", blob[frame_end : frame_end + 2])
        if _crc16(blob[pos:frame_end]) != want_crc16:
            raise ValueError("corrupt FLAC frame: CRC-16 mismatch")
        for ch, samples in zip(channels, chans):
            ch.extend(samples)
        frames.append(
            {
                "blocksize": bs,
                "sample_rate": sr,
                "channel_assignment": chan_code,
                "subframes": kinds,
            }
        )
        pos = frame_end + 2
    md5 = hashlib.md5()
    width = (bps + 7) // 8  # spec: MD5 uses ceil(bps/8) bytes per sample
    n = len(channels[0]) if channels else 0
    for i in range(n):
        for c in channels:
            md5.update(int(c[i]).to_bytes(width, "little", signed=True))
    return {
        **{k: v for k, v in streaminfo.items() if k != "md5"},
        "frames": frames,
        "channels_decoded": channels,
        "md5_ok": md5.digest() == streaminfo["md5"],
    }


# ------------------------------------------------------------- operator

def flac_stats_gen(blob_col: str = "blob", id_col: str = "doc_id"):
    """The ``flac_stats`` decode pass as a pandas-iterator function, for
    fusing with an upstream generator inside ONE mapInPandas stage."""
    import pandas as pd

    def walk(batches):
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf[id_col], pdf[blob_col]):
                meta = decode_flac(bytes(blob))
                flat = [s for c in meta["channels_decoded"] for s in c]
                rows.append(
                    {
                        id_col: int(did),
                        "n_frames": len(meta["frames"]),
                        "total_samples": meta["total_samples"],
                        "sample_rate": meta["sample_rate"],
                        "channels": meta["channels"],
                        "bits_per_sample": meta["bits_per_sample"],
                        "sum_samples": sum(flat),
                        "min_sample": min(flat),
                        "max_sample": max(flat),
                        # decode_flac RAISES on any CRC mismatch, so every
                        # frame that reached the census passed both CRCs
                        "crc_ok_frames": len(meta["frames"]),
                        "md5_ok": meta["md5_ok"],
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "n_frames", "total_samples", "sample_rate",
                    "channels", "bits_per_sample", "sum_samples",
                    "min_sample", "max_sample", "crc_ok_frames", "md5_ok",
                ],
            )

    return walk


FLAC_STATS_SCHEMA = (
    "doc_id bigint, n_frames int, total_samples bigint, "
    "sample_rate int, channels int, bits_per_sample int, "
    "sum_samples bigint, min_sample int, max_sample int, "
    "crc_ok_frames int, md5_ok boolean"
)


def flac_stats(df, blob_col: str = "blob", id_col: str = "doc_id"):
    """(id, FLAC blob) -> integer-exact decode facts in one Arrow map
    pass: frame census, STREAMINFO fields, decoded-sample aggregates and
    the MD5 losslessness receipt. Blobs never shuffle; only stat rows
    move — the q328 multimodal discipline."""
    schema = (
        f"{id_col} bigint, n_frames int, total_samples bigint, "
        "sample_rate int, channels int, bits_per_sample int, "
        "sum_samples bigint, min_sample int, max_sample int, "
        "crc_ok_frames int, md5_ok boolean"
    )
    return df.mapInPandas(flac_stats_gen(blob_col, id_col), schema)
