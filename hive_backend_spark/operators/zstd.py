"""Pure-stdlib Zstandard FRAME decoder (RFC 8878) — the parquet/avro page
codec modern lakehouse writers default to, and the last compression format
the ingestion ladder refused (r12 verdict "What's missing" #1: "zstd
realistically needs Python 3.14's compression.zstd or stays a refusal" —
this module removes the refusal on Python 3.11 by implementing the frame
grammar directly from the public RFC).

Implemented surface (everything a parquet/avro writer emits):
  - frame header: magic, descriptor (FCS size / single-segment / checksum
    / dict-id flags), window descriptor, frame content size; dictionaries
    REFUSE loudly (content-addressed dict state is a different feature);
  - blocks: raw, RLE, compressed (the 21-bit size / last-block framing);
  - literals: raw, RLE, Huffman-compressed (1-stream and 4-stream with
    the 6-byte jump table), and treeless (previous block's table reuse);
  - Huffman: direct 4-bit weights and FSE-compressed weights (two
    interleaved states over a backward bitstream), canonical table build
    with the implied last weight;
  - sequences: predefined / RLE / FSE-compressed / repeat table modes for
    literals-length, offset and match-length codes; the three predefined
    distributions and baseline+extra-bit tables from the RFC; interleaved
    backward bitstream (init LL->OF->ML, per-sequence extra-bit reads
    OF->ML->LL, state updates LL->ML->OF, no update after the last
    sequence);
  - sequence execution with the three-slot repeat-offset history and the
    literals_length==0 index shift;
  - XXH64 content checksum, verified when the frame carries one (pure
    Python xxh64, also from its public spec).

Every malformed-input path raises ValueError naming the problem (the
parquet_meta truncation discipline); unsupported features (dictionaries,
reserved block type) raise NotImplementedError. Correctness is pinned in
pytest against pyarrow's bundled libzstd across block types, stream
counts, sizes and random data — an independent reference implementation.
"""

from __future__ import annotations

import struct

__all__ = ["zstd_decompress", "zstd_compress_stored"]

_MAGIC = 0xFD2FB528

# --- backward bitstream ------------------------------------------------------


class _BackBits:
    """zstd's backward bitstream: bits are written little-endian and read
    from the END; the last non-zero byte's highest set bit is a sentinel
    marking the write position. Reads past the start zero-fill (callers
    check `exhausted` where the format defines end-of-stream behavior)."""

    __slots__ = ("acc", "pos")

    def __init__(self, data: bytes) -> None:
        if not data or data[-1] == 0:
            raise ValueError("malformed zstd bitstream: missing sentinel bit")
        self.acc = int.from_bytes(data, "little")
        self.pos = self.acc.bit_length() - 1  # bits below the sentinel

    def read(self, n: int) -> int:
        """Consume n bits (MSB-first from the sentinel downward)."""
        self.pos -= n
        if self.pos >= 0:
            return (self.acc >> self.pos) & ((1 << n) - 1)
        # zero-filled tail: shift what remains into the high bits
        avail = n + self.pos  # bits actually present
        if avail <= 0:
            return 0
        return (self.acc & ((1 << avail) - 1)) << (n - avail)

    @property
    def exhausted(self) -> bool:
        return self.pos < 0


# --- FSE ---------------------------------------------------------------------


def _fse_build(norm: list, accuracy_log: int) -> tuple:
    """Decoding table from normalized counts (RFC 8878 §4.1.1): returns
    (symbols, nb_bits, new_state_base) arrays of size 1<<accuracy_log."""
    size = 1 << accuracy_log
    syms = [0] * size
    high = size - 1
    for s, c in enumerate(norm):
        if c == -1:  # "less than 1" symbols own the table's tail,
            syms[high] = s  # first such symbol taking the LAST cell
            high -= 1
    pos = 0
    step = (size >> 1) + (size >> 3) + 3
    mask = size - 1
    for s, c in enumerate(norm):
        for _ in range(max(c, 0)):
            syms[pos] = s
            pos = (pos + step) & mask
            while pos > high:
                pos = (pos + step) & mask
    if pos != 0:
        raise ValueError("malformed zstd FSE distribution: spread mismatch")
    next_idx = [1 if c == -1 else c for c in norm]
    nb_bits = [0] * size
    base = [0] * size
    for i in range(size):
        s = syms[i]
        x = next_idx[s]
        next_idx[s] += 1
        nbits = accuracy_log - (x.bit_length() - 1)
        nb_bits[i] = nbits
        base[i] = (x << nbits) - size
    return syms, nb_bits, base


def _fse_read_distribution(data: bytes, off: int, max_symbols: int) -> tuple:
    """Parse an FSE normalized-count table description (forward little-
    endian bitstream, RFC §4.1.1 / the reference FSE_readNCount shape:
    variable field width shrinking with the remaining probability mass,
    small values on one fewer bit, count 0 followed by 2-bit repeat
    flags): returns (norm_counts, accuracy_log, next_byte_offset)."""
    bitpos = 0

    def read(n: int) -> int:
        nonlocal bitpos
        if n == 0:
            return 0
        byte0 = off + (bitpos >> 3)
        need = ((bitpos & 7) + n + 7) // 8
        if byte0 + need > len(data):
            raise ValueError("truncated zstd FSE table description")
        chunk = int.from_bytes(data[byte0 : byte0 + need], "little")
        v = (chunk >> (bitpos & 7)) & ((1 << n) - 1)
        bitpos += n
        return v

    def peek(n: int) -> int:
        nonlocal bitpos
        save = bitpos
        v = read(n)
        bitpos = save
        return v

    accuracy_log = read(4) + 5
    if accuracy_log > 9:
        raise ValueError("malformed zstd FSE table: accuracy log > 9")
    remaining = (1 << accuracy_log) + 1
    threshold = 1 << accuracy_log
    nb = accuracy_log + 1
    norm: list = []
    prev_zero = False
    while remaining > 1:
        if len(norm) > max_symbols:
            raise ValueError("malformed zstd FSE table: too many symbols")
        if prev_zero:
            while True:
                rep = read(2)
                norm.extend([0] * rep)
                if rep != 3:
                    break
            prev_zero = False
            if len(norm) > max_symbols:
                raise ValueError("malformed zstd FSE table: too many symbols")
        small_max = (2 * threshold - 1) - remaining
        low = peek(nb - 1)
        if low < small_max:
            read(nb - 1)
            value = low
        else:
            v = read(nb)
            if v >= threshold:
                v -= small_max
            value = v
        count = value - 1  # -1 = "less than 1", 0 = absent
        norm.append(count)
        remaining -= -count if count < 0 else count
        prev_zero = count == 0
        while remaining < threshold:
            nb -= 1
            threshold >>= 1
    if remaining != 1:
        raise ValueError("malformed zstd FSE table: counts do not sum")
    return norm, accuracy_log, off + (bitpos + 7) // 8


class _FseState:
    __slots__ = ("syms", "nb", "base", "state")

    def __init__(self, table: tuple, bits: _BackBits, accuracy_log: int):
        self.syms, self.nb, self.base = table
        self.state = bits.read(accuracy_log)

    @property
    def symbol(self) -> int:
        return self.syms[self.state]

    def update(self, bits: _BackBits) -> None:
        self.state = self.base[self.state] + bits.read(self.nb[self.state])


# --- Huffman -----------------------------------------------------------------


def _huffman_read_weights(data: bytes, off: int) -> tuple:
    """Huffman tree description (RFC §4.2.1): returns (weights, next_off)."""
    if off >= len(data):
        raise ValueError("truncated zstd literals: missing tree header")
    hdr = data[off]
    off += 1
    if hdr >= 128:  # direct 4-bit weights
        n = hdr - 127
        nbytes = (n + 1) // 2
        raw = data[off : off + nbytes]
        if len(raw) < nbytes:
            raise ValueError("truncated zstd Huffman weights")
        weights = []
        for i in range(n):
            b = raw[i // 2]
            weights.append((b >> 4) if i % 2 == 0 else (b & 0xF))
        return weights, off + nbytes
    # FSE-compressed weights: hdr = compressed size
    comp = data[off : off + hdr]
    if len(comp) < hdr:
        raise ValueError("truncated zstd Huffman weights (FSE)")
    norm, al, tbl_end = _fse_read_distribution(comp, 0, 255)
    table = _fse_build(norm, al)
    bits = _BackBits(comp[tbl_end:])
    s1 = _FseState(table, bits, al)
    s2 = _FseState(table, bits, al)
    weights = []
    while True:
        weights.append(s1.symbol)
        s1.update(bits)
        if bits.exhausted:
            weights.append(s2.symbol)
            break
        weights.append(s2.symbol)
        s2.update(bits)
        if bits.exhausted:
            weights.append(s1.symbol)
            break
        if len(weights) > 255:
            raise ValueError("malformed zstd Huffman weights: > 255 symbols")
    if len(weights) > 255:
        raise ValueError("malformed zstd Huffman weights: > 255 symbols")
    return weights, off + hdr


def _huffman_build(weights: list) -> tuple:
    """Canonical Huffman decode table with the implied last weight
    (RFC §4.2.1.1): returns (table, max_bits) where table[state] =
    (symbol, nbits) for a max_bits-wide peek."""
    total = sum((1 << (w - 1)) for w in weights if w > 0)
    if total == 0:
        raise ValueError("malformed zstd Huffman tree: no weights")
    # the implied last symbol always adds at least one slot, so the tree
    # completes to the power of two STRICTLY above total
    max_bits = total.bit_length()
    missing = (1 << max_bits) - total
    if missing & (missing - 1):
        raise ValueError("malformed zstd Huffman tree: non-pow2 remainder")
    weights = list(weights) + [missing.bit_length()]
    if max(weights) > max_bits:
        raise ValueError("malformed zstd Huffman tree: weight exceeds depth")
    # rank starts: lower weights (longer codes) first, from table base
    rank_size = [0] * (max_bits + 2)
    for w in weights:
        if w > 0:
            rank_size[w] += 1 << (w - 1)
    start = [0] * (max_bits + 2)
    acc = 0
    for w in range(1, max_bits + 2):
        start[w] = acc
        acc += rank_size[w]
    table = [(0, 0)] * (1 << max_bits)
    pos = list(start)
    for sym, w in enumerate(weights):
        if w == 0:
            continue
        n = 1 << (w - 1)
        nbits = max_bits + 1 - w
        entry = (sym, nbits)
        for i in range(pos[w], pos[w] + n):
            table[i] = entry
        pos[w] += n
    return table, max_bits


def _huffman_decode_stream(data: bytes, table: tuple, n_out: int) -> bytes:
    """One backward Huffman bitstream -> exactly n_out literal bytes."""
    if n_out == 0:
        return b""
    tbl, max_bits = table
    bits = _BackBits(data)
    out = bytearray()
    mask = (1 << max_bits) - 1
    acc, pos = bits.acc, bits.pos
    for _ in range(n_out):
        if pos >= max_bits:
            state = (acc >> (pos - max_bits)) & mask
        elif pos <= 0:
            raise ValueError("corrupt zstd Huffman stream: over-consumed")
        else:
            state = (acc & ((1 << pos) - 1)) << (max_bits - pos)
        sym, nbits = tbl[state]
        pos -= nbits
        out.append(sym)
    if pos != 0:
        raise ValueError("corrupt zstd Huffman stream: not fully consumed")
    return bytes(out)


# --- predefined sequence tables (RFC §3.1.1.3.2.2) ---------------------------

_LL_DEFAULT = [4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 2, 2, 2, 2,
               2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1]
_ML_DEFAULT = [1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
               1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
               1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1, -1, -1]
_OF_DEFAULT = [1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
               1, 1, 1, 1, -1, -1, -1, -1, -1]

_LL_BASE_BITS = [(0, 0)] * 16 + [
    (16, 1), (18, 1), (20, 1), (22, 1), (24, 2), (28, 2), (32, 3), (40, 3),
    (48, 4), (64, 6), (128, 7), (256, 8), (512, 9), (1024, 10), (2048, 11),
    (4096, 12), (8192, 13), (16384, 14), (32768, 15), (65536, 16),
]
for _i in range(16):
    _LL_BASE_BITS[_i] = (_i, 0)

_ML_BASE_BITS = [(i + 3, 0) for i in range(32)] + [
    (35, 1), (37, 1), (39, 1), (41, 1), (43, 2), (47, 2), (51, 3), (59, 3),
    (67, 4), (83, 4), (99, 5), (131, 7), (259, 8), (515, 9), (1027, 10),
    (2051, 11), (4099, 12), (8195, 13), (16387, 14), (32771, 15),
    (65539, 16),
]

_MAX_LL_SYMBOL = 35
_MAX_ML_SYMBOL = 52
_MAX_OF_SYMBOL = 31


# --- sequence section --------------------------------------------------------


def _read_table_mode(data: bytes, off: int, mode: int, max_symbol: int,
                     default_norm: list, default_log: int, prev: tuple | None):
    """One symbol table per its 2-bit compression mode: returns
    ((fse_table, accuracy_log), next_off). RLE is modeled as a 1-entry
    0-bit table."""
    if mode == 0:  # predefined
        return (_fse_build(default_norm, default_log), default_log), off
    if mode == 1:  # RLE: one byte symbol
        if off >= len(data):
            raise ValueError("truncated zstd sequences: missing RLE symbol")
        sym = data[off]
        if sym > max_symbol:
            raise ValueError("malformed zstd sequences: RLE symbol too large")
        return (([sym], [0], [0]), 0), off + 1
    if mode == 2:  # FSE-compressed description
        norm, al, off2 = _fse_read_distribution(data, off, max_symbol + 1)
        return (_fse_build(norm, al), al), off2
    if prev is None:  # repeat without a previous table
        raise ValueError("malformed zstd sequences: repeat mode without prior table")
    return prev, off


def _decode_sequences(data: bytes, off: int, literals: bytes,
                      window: bytearray, repeat_tables: dict,
                      repeat_offsets: list) -> None:
    """Sequences section + execution, appending to `window` in place."""
    if off >= len(data):
        raise ValueError("truncated zstd block: missing sequences header")
    b0 = data[off]
    off += 1
    if b0 < 128:
        n_seq = b0
    elif b0 < 255:
        if off >= len(data):
            raise ValueError("truncated zstd sequences header")
        n_seq = ((b0 - 128) << 8) + data[off]
        off += 1
    else:
        if off + 2 > len(data):
            raise ValueError("truncated zstd sequences header")
        n_seq = data[off] + (data[off + 1] << 8) + 0x7F00
        off += 2
    if n_seq == 0:
        window.extend(literals)
        if off != len(data):
            raise ValueError("malformed zstd block: bytes after empty sequences")
        return
    if off >= len(data):
        raise ValueError("truncated zstd sequences: missing modes byte")
    modes = data[off]
    off += 1
    if modes & 3:
        raise ValueError("malformed zstd sequences: reserved mode bits set")
    ll_mode, of_mode, ml_mode = (modes >> 6) & 3, (modes >> 4) & 3, (modes >> 2) & 3
    ll_t, off = _read_table_mode(data, off, ll_mode, _MAX_LL_SYMBOL,
                                 _LL_DEFAULT, 6, repeat_tables.get("ll"))
    of_t, off = _read_table_mode(data, off, of_mode, _MAX_OF_SYMBOL,
                                 _OF_DEFAULT, 5, repeat_tables.get("of"))
    ml_t, off = _read_table_mode(data, off, ml_mode, _MAX_ML_SYMBOL,
                                 _ML_DEFAULT, 6, repeat_tables.get("ml"))
    repeat_tables["ll"], repeat_tables["of"], repeat_tables["ml"] = ll_t, of_t, ml_t

    bits = _BackBits(data[off:])
    ll_s = _FseState(ll_t[0], bits, ll_t[1])
    of_s = _FseState(of_t[0], bits, of_t[1])
    ml_s = _FseState(ml_t[0], bits, ml_t[1])
    lit_pos = 0
    for i in range(n_seq):
        of_code = of_s.symbol
        ml_code = ml_s.symbol
        ll_code = ll_s.symbol
        if of_code > _MAX_OF_SYMBOL or ml_code > _MAX_ML_SYMBOL or ll_code > _MAX_LL_SYMBOL:
            raise ValueError("malformed zstd sequence: symbol out of range")
        offset_val = (1 << of_code) + bits.read(of_code)
        ml_base, ml_extra = _ML_BASE_BITS[ml_code]
        match_len = ml_base + bits.read(ml_extra)
        ll_base, ll_extra = _LL_BASE_BITS[ll_code]
        lit_len = ll_base + bits.read(ll_extra)
        if bits.exhausted:
            raise ValueError("corrupt zstd sequences: bitstream over-read")
        if i + 1 < n_seq:  # no state update after the last sequence
            ll_s.update(bits)
            ml_s.update(bits)
            of_s.update(bits)
        # repeat-offset resolution (RFC §3.1.1.5)
        if offset_val > 3:
            offset = offset_val - 3
            repeat_offsets[2] = repeat_offsets[1]
            repeat_offsets[1] = repeat_offsets[0]
            repeat_offsets[0] = offset
        else:
            idx = offset_val - 1
            if lit_len == 0:
                idx += 1
            if idx == 0:
                offset = repeat_offsets[0]
            elif idx < 3:
                offset = repeat_offsets[idx]
                if idx == 2:
                    repeat_offsets[2] = repeat_offsets[1]
                repeat_offsets[1] = repeat_offsets[0]
                repeat_offsets[0] = offset
            else:  # idx == 3: rep0 - 1
                offset = repeat_offsets[0] - 1
                if offset == 0:
                    raise ValueError("malformed zstd sequence: zero offset")
                repeat_offsets[2] = repeat_offsets[1]
                repeat_offsets[1] = repeat_offsets[0]
                repeat_offsets[0] = offset
        if lit_pos + lit_len > len(literals):
            raise ValueError("malformed zstd sequence: literals overrun")
        window.extend(literals[lit_pos : lit_pos + lit_len])
        lit_pos += lit_len
        if offset > len(window):
            raise ValueError("malformed zstd sequence: match offset out of range")
        start = len(window) - offset
        if offset >= match_len:
            window.extend(window[start : start + match_len])
        else:
            for k in range(match_len):
                window.append(window[start + k])
    if bits.pos != 0:
        raise ValueError("corrupt zstd sequences: bitstream not fully consumed")
    window.extend(literals[lit_pos:])


# --- literals section --------------------------------------------------------


def _decode_literals(data: bytes, huff_state: dict) -> tuple:
    """Literals section -> (literal_bytes, next_offset)."""
    if not data:
        raise ValueError("truncated zstd block: missing literals header")
    b0 = data[0]
    ltype = b0 & 3
    sf = (b0 >> 2) & 3
    if ltype in (0, 1):  # raw / RLE
        if sf in (0, 2):
            rs = b0 >> 3
            off = 1
        elif sf == 1:
            if len(data) < 2:
                raise ValueError("truncated zstd literals header")
            rs = (int.from_bytes(data[:2], "little")) >> 4
            off = 2
        else:
            if len(data) < 3:
                raise ValueError("truncated zstd literals header")
            rs = (int.from_bytes(data[:3], "little")) >> 4
            off = 3
        if ltype == 0:
            lits = data[off : off + rs]
            if len(lits) < rs:
                raise ValueError("truncated zstd raw literals")
            return bytes(lits), off + rs
        if off >= len(data):
            raise ValueError("truncated zstd RLE literals")
        return bytes([data[off]]) * rs, off + 1
    # compressed (2) / treeless (3)
    if sf == 0:
        n_streams, hlen, bitsz = 1, 3, 10
    elif sf == 1:
        n_streams, hlen, bitsz = 4, 3, 10
    elif sf == 2:
        n_streams, hlen, bitsz = 4, 4, 14
    else:
        n_streams, hlen, bitsz = 4, 5, 18
    if len(data) < hlen:
        raise ValueError("truncated zstd literals header")
    h = int.from_bytes(data[:hlen], "little")
    rs = (h >> 4) & ((1 << bitsz) - 1)
    cs = (h >> (4 + bitsz)) & ((1 << bitsz) - 1)
    off = hlen
    section = data[off : off + cs]
    if len(section) < cs:
        raise ValueError("truncated zstd compressed literals")
    if ltype == 2:
        weights, woff = _huffman_read_weights(section, 0)
        huff_state["table"] = _huffman_build(weights)
        body = section[woff:]
    else:
        if "table" not in huff_state:
            raise ValueError("malformed zstd literals: treeless without prior tree")
        body = section
    table = huff_state["table"]
    if n_streams == 1:
        return _huffman_decode_stream(body, table, rs), off + cs
    if len(body) < 6:
        raise ValueError("truncated zstd literals: missing jump table")
    s1, s2, s3 = struct.unpack("<HHH", body[:6])
    seg = body[6:]
    if s1 + s2 + s3 > len(seg):
        raise ValueError("malformed zstd literals: jump table exceeds section")
    part = (rs + 3) // 4
    sizes_out = [part, part, part, rs - 3 * part]
    if sizes_out[3] < 0:
        raise ValueError("malformed zstd literals: regenerated size too small")
    streams = [seg[:s1], seg[s1 : s1 + s2], seg[s1 + s2 : s1 + s2 + s3],
               seg[s1 + s2 + s3 :]]
    out = bytearray()
    for st, n in zip(streams, sizes_out):
        out += _huffman_decode_stream(st, table, n)
    return bytes(out), off + cs


# --- xxh64 (public spec) for the frame checksum ------------------------------

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _xxh64(data: bytes, seed: int = 0) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            for j, v in enumerate((v1, v2, v3, v4)):
                lane = int.from_bytes(data[i + 8 * j : i + 8 * j + 8], "little")
                v = (v + lane * _P2) & _M
                v = (_rotl(v, 31) * _P1) & _M
                if j == 0:
                    v1 = v
                elif j == 1:
                    v2 = v
                elif j == 2:
                    v3 = v
                else:
                    v4 = v
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):  # mergeRound: fold round(0, v) into h
            v = (_rotl((v * _P2) & _M, 31) * _P1) & _M
            h = ((h ^ v) * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        k = int.from_bytes(data[i : i + 8], "little")
        k = (_rotl((k * _P2) & _M, 31) * _P1) & _M
        h = ((_rotl(h ^ k, 27) * _P1) + _P4) & _M
        i += 8
    if i + 4 <= n:
        k = int.from_bytes(data[i : i + 4], "little")
        h = ((_rotl(h ^ ((k * _P1) & _M), 23) * _P2) + _P3) & _M
        i += 4
    while i < n:
        h = ((_rotl(h ^ ((data[i] * _P5) & _M), 11)) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


# --- frame -------------------------------------------------------------------


def zstd_compress_stored(data: bytes) -> bytes:
    """Minimal spec-legal zstd EMITTER: a single-segment frame of RAW
    blocks (the stored form, no entropy coding) with the frame content
    size declared and an XXH64 content checksum — the _snappy_literal
    discipline: any conformant decoder (libzstd included, pytest-pinned)
    accepts it, so the encoder companion exercises the decoder end to
    end without shipping a compressor."""
    out = bytearray()
    out += _MAGIC.to_bytes(4, "little")
    n = len(data)
    if n < 256:
        flag, fcs = 0, n.to_bytes(1, "little")
    elif n <= 0xFFFF + 256:
        flag, fcs = 1, (n - 256).to_bytes(2, "little")
    elif n < (1 << 32):
        flag, fcs = 2, n.to_bytes(4, "little")
    else:
        flag, fcs = 3, n.to_bytes(8, "little")
    out.append((flag << 6) | 0x20 | 0x04)  # single-segment + checksum
    out += fcs
    max_block = 128 * 1024
    if n == 0:
        out += (1).to_bytes(3, "little")  # last empty raw block
    else:
        for i in range(0, n, max_block):
            chunk = data[i : i + max_block]
            last = 1 if i + max_block >= n else 0
            out += ((len(chunk) << 3) | last).to_bytes(3, "little")
            out += chunk
    out += (_xxh64(data) & 0xFFFFFFFF).to_bytes(4, "little")
    return bytes(out)


def zstd_decompress(data: bytes, expected: int = 0) -> bytes:
    """Decode one zstd frame (RFC 8878). `expected`, when non-zero, is
    length-checked against the output (the parquet page-header contract).
    Skippable frames, dictionaries and reserved block types refuse."""
    if len(data) < 4:
        raise ValueError("truncated zstd frame: missing magic")
    magic = int.from_bytes(data[:4], "little")
    if (magic & 0xFFFFFFF0) == 0x184D2A50:
        raise NotImplementedError("zstd skippable frames not supported")
    if magic != _MAGIC:
        raise ValueError("not a zstd frame: bad magic")
    if len(data) < 5:
        raise ValueError("truncated zstd frame: missing header descriptor")
    fhd = data[4]
    off = 5
    fcs_flag = fhd >> 6
    single_segment = (fhd >> 5) & 1
    if (fhd >> 3) & 1:
        raise ValueError("malformed zstd frame: reserved descriptor bit set")
    checksum_flag = (fhd >> 2) & 1
    did_size = (0, 1, 2, 4)[fhd & 3]
    if not single_segment:
        off += 1  # window descriptor (bounds don't matter for full decode)
    if did_size:
        if int.from_bytes(data[off : off + did_size], "little") != 0:
            raise NotImplementedError("zstd dictionaries not supported")
        off += did_size
    fcs_size = (0, 2, 4, 8)[fcs_flag] if not (fcs_flag == 0 and single_segment) else 1
    content_size = None
    if fcs_size:
        if off + fcs_size > len(data):
            raise ValueError("truncated zstd frame: frame content size")
        content_size = int.from_bytes(data[off : off + fcs_size], "little")
        if fcs_size == 2:
            content_size += 256
        off += fcs_size

    window = bytearray()
    huff_state: dict = {}
    repeat_tables: dict = {}
    repeat_offsets = [1, 4, 8]
    last = False
    while not last:
        if off + 3 > len(data):
            raise ValueError("truncated zstd frame: missing block header")
        bh = int.from_bytes(data[off : off + 3], "little")
        off += 3
        last = bool(bh & 1)
        btype = (bh >> 1) & 3
        bsize = bh >> 3
        if btype == 0:  # raw
            if off + bsize > len(data):
                raise ValueError("truncated zstd raw block")
            window.extend(data[off : off + bsize])
            off += bsize
        elif btype == 1:  # RLE: one byte repeated bsize times
            if off >= len(data):
                raise ValueError("truncated zstd RLE block")
            window.extend(bytes([data[off]]) * bsize)
            off += 1
        elif btype == 2:  # compressed
            if off + bsize > len(data):
                raise ValueError("truncated zstd compressed block")
            block = data[off : off + bsize]
            off += bsize
            literals, lit_end = _decode_literals(block, huff_state)
            _decode_sequences(block, lit_end, literals, window,
                              repeat_tables, repeat_offsets)
        else:
            raise NotImplementedError("zstd reserved block type")
    if checksum_flag:
        if off + 4 > len(data):
            raise ValueError("truncated zstd frame: missing checksum")
        want = int.from_bytes(data[off : off + 4], "little")
        got = _xxh64(bytes(window)) & 0xFFFFFFFF
        if want != got:
            raise ValueError("corrupt zstd frame: XXH64 checksum mismatch")
        off += 4
    if content_size is not None and len(window) != content_size:
        raise ValueError(
            f"malformed zstd frame: declared {content_size} bytes, "
            f"got {len(window)}"
        )
    if expected and len(window) != expected:
        raise ValueError(
            f"malformed zstd page: declared {expected} bytes, got {len(window)}"
        )
    return bytes(window)
