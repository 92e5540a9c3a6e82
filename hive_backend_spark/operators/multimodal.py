"""Multimodal binary-column operators (SURVEY §7 Phase 3 north-star
extension): image/audio/video as opaque `binary` columns with typed
metadata, processed through Arrow-batched mapInPandas.

The container has no media libraries, so the DECODE step has two paths
(both clearly marked):
  - ``decode_media(..., stub=False)`` REALLY decodes the formats the
    stdlib+numpy can handle alone — BMP (24bpp uncompressed), WAV
    (16-bit PCM), PNG (8-bit non-interlaced, zlib inflate + all five
    scanline filters), GIF (87a/89a single-frame non-interlaced,
    hand-written variable-width LZW) and JPEG (baseline sequential,
    hand-written Huffman + IDCT, 4:4:4/4:2:2/4:2:0 and restart markers
    — operators/jpeg), dispatched per blob by magic bytes — and raises
    NotImplementedError naming the missing dependency (av/soundfile/
    pillow) for the remaining formats (MP3/MP4, progressive JPEG);
  - ``decode_media(..., stub=True)`` (default) derives a DETERMINISTIC fake
    decode from the blob's md5 digest, so the Spark-side plumbing — schema,
    batch shape, partitioning, downstream joins — is testable on arbitrary
    bytes.

At 100 TB the blobs dominate storage: operators never shuffle blob bytes
unless the output needs them (feature extraction shuffles features, frame
sampling keeps blobs within the map task)."""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 16


def with_blob(df: DataFrame, text_col: str = "text", mime: str = "application/octet-stream") -> DataFrame:
    """Attach the multimodal column pattern to a table: an opaque binary
    payload plus typed metadata (mime, byte length). On real data the blob
    column arrives from ingestion; here it is the utf-8 payload of text."""
    blob = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("blob", blob).withColumn("mime", F.lit(mime)).withColumn(
        "n_bytes", F.octet_length(blob)
    )


def _fake_decode(blob: bytes) -> dict:
    """Deterministic stand-in for a real media decode: md5-derived 'pixel'
    stats + a FEATURE_DIM-float embedding in [0,1]. Same bytes -> same
    output, any engine."""
    digest = hashlib.md5(blob).digest()
    return {
        "width": 16 + digest[0],
        "height": 16 + digest[1],
        "channels": 1 + (digest[2] % 4),
        "features": [b / 255.0 for b in digest],
    }




# --- real decoders for container-supported formats ---------------------------
#
# Five formats decode with the stdlib + numpy alone — no pillow/av/
# soundfile needed — so `stub=False` is REAL for them:
#   - BMP (Windows bitmap, BITMAPINFOHEADER, 24bpp uncompressed)
#   - WAV (RIFF PCM, 16-bit)
#   - PNG (8-bit non-interlaced gray/RGB/GA/RGBA: zlib inflate + the five
#     scanline filters; palette/16-bit/Adam7 still raise)
#   - GIF (87a/89a single-frame non-interlaced, hand-written LZW — below)
#   - JPEG (baseline sequential: hand-written Huffman + IDCT, any 1-2
#     sampling factors, restart markers — operators/jpeg)
# Remaining formats (MP3/MP4, progressive JPEG) raise loudly, naming the
# missing dependency. Dispatch is by magic bytes, per blob.


def _bmp_pixels(blob: bytes):
    """Pure-numpy BMP decode to the (h, w, 3) uint8 RGB pixel array:
    24bpp uncompressed BITMAPINFOHEADER only. Handles 4-byte row padding
    and bottom-up row order (positive height)."""
    import struct

    import numpy as np

    if blob[:2] != b"BM":
        raise ValueError("not a BMP blob")
    (pixel_off,) = struct.unpack_from("<I", blob, 10)
    width, height = struct.unpack_from("<ii", blob, 18)
    (bpp,) = struct.unpack_from("<H", blob, 28)
    (compression,) = struct.unpack_from("<I", blob, 30)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"BMP decode supports 24bpp uncompressed only (got bpp={bpp}, "
            f"compression={compression}) — compressed bitmaps need pillow"
        )
    flip = height > 0
    h = abs(height)
    row_size = ((24 * width + 31) // 32) * 4
    px = np.frombuffer(blob, dtype=np.uint8, count=h * row_size, offset=pixel_off)
    px = px.reshape(h, row_size)[:, : width * 3].reshape(h, width, 3)
    if flip:
        px = px[::-1]
    return px[..., ::-1].copy()  # BGR storage order -> RGB


def _decode_bmp(blob: bytes) -> dict:
    """BMP stats decode: _bmp_pixels + the shared feature convention."""
    import numpy as np

    rgb_px = _bmp_pixels(blob)
    h, width = rgb_px.shape[:2]
    bgr = rgb_px[..., ::-1].astype(np.float64)
    # features: per-channel means (RGB order) + luminance mean, /255
    means = bgr.mean(axis=(0, 1))  # B, G, R
    lum = (0.299 * bgr[..., 2] + 0.587 * bgr[..., 1] + 0.114 * bgr[..., 0]).mean()
    return {
        "width": int(width),
        "height": int(h),
        "channels": 3,
        "features": [means[2] / 255.0, means[1] / 255.0, means[0] / 255.0, lum / 255.0],
    }


def _wav_samples(blob: bytes):
    """Pure-numpy RIFF/WAVE decode to raw int16 samples: PCM (format 1),
    16-bit. Walks chunks (even-padded), tolerating extras like LIST before
    data. Returns (samples int16 ndarray, sample_rate, channels)."""
    import struct

    import numpy as np

    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a WAV blob")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(blob):
        cid, size = struct.unpack_from("<4sI", blob, pos)
        body = blob[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # chunks are even-padded
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(
            f"WAV decode supports 16-bit PCM only (got format={audio_format}, "
            f"bits={bits}) — compressed audio needs soundfile/av"
        )
    return np.frombuffer(data, dtype="<i2"), int(sample_rate), int(channels)


def _decode_wav(blob: bytes) -> dict:
    """RIFF/WAVE decode + normalized float stats (see _wav_samples)."""
    import numpy as np

    samples, sample_rate, channels = _wav_samples(blob)
    n_frames = len(samples) // channels
    x = samples.astype(np.float64) / 32768.0
    rms = float(np.sqrt(np.mean(x * x))) if len(x) else 0.0
    peak = float(np.max(np.abs(x))) if len(x) else 0.0
    return {
        "width": n_frames,  # frames along the time axis
        "height": 1,
        "channels": int(channels),
        "features": [float(sample_rate), n_frames / float(sample_rate), rms, peak],
    }


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# channels per PNG color type: 0=gray, 2=RGB, 4=gray+alpha, 6=RGBA
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_pixels(blob: bytes):
    """Stdlib PNG decode to the raw (h, w, channels) uint8 pixel array:
    zlib inflate + all five scanline filters (None, Sub, Up, Average,
    Paeth) for 8-bit non-interlaced gray / RGB / gray-alpha / RGBA.
    Palette, 16-bit, and Adam7-interlaced images raise — pillow
    territory. Sub defilters as a per-lane prefix sum mod 256
    (vectorized); Average/Paeth walk pixels within the row (h x w
    bounded per blob, inside the Arrow map task)."""
    import struct
    import zlib

    import numpy as np

    if blob[: len(_PNG_MAGIC)] != _PNG_MAGIC:
        raise ValueError("not a PNG blob")
    pos, ihdr, idat = len(_PNG_MAGIC), None, []
    while pos + 8 <= len(blob):
        length, ctype = struct.unpack_from(">I4s", blob, pos)
        body = blob[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + crc
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT chunk")
    w, h, depth, colortype, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0 or colortype not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"PNG decode supports 8-bit non-interlaced gray/RGB/GA/RGBA only "
            f"(got depth={depth}, colortype={colortype}, interlace={interlace})"
            " — palette/16-bit/Adam7 need pillow"
        )
    if w == 0 or h == 0:
        # invalid per the PNG spec; without this guard a crafted blob
        # sails through (stride 0 satisfies the IDAT length check) and
        # mean() over the empty array poisons downstream stats with NaN
        raise ValueError(f"PNG has zero dimension ({w}x{h})")
    nch = _PNG_CHANNELS[colortype]
    stride = w * nch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG IDAT length does not match dimensions")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        off = y * (stride + 1)
        ftype = raw[off]
        row = np.frombuffer(raw, np.uint8, stride, off + 1).astype(np.int32)
        if ftype == 0:  # None
            cur = row
        elif ftype == 1:  # Sub: prefix sum per byte lane, mod 256
            cur = row.reshape(w, nch).cumsum(axis=0).reshape(stride) % 256
        elif ftype == 2:  # Up
            cur = (row + prev) % 256
        elif ftype == 3:  # Average
            cur = np.empty(stride, dtype=np.int32)
            for i in range(stride):
                left = cur[i - nch] if i >= nch else 0
                cur[i] = (row[i] + (left + prev[i]) // 2) % 256
        elif ftype == 4:  # Paeth
            cur = np.empty(stride, dtype=np.int32)
            for i in range(stride):
                a = cur[i - nch] if i >= nch else 0
                b = prev[i]
                c = prev[i - nch] if i >= nch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (row[i] + pred) % 256
        else:
            raise ValueError(f"PNG filter type {ftype} is invalid")
        out[y] = cur
        prev = cur
    return out.reshape(h, w, nch)


def _decode_png(blob: bytes) -> dict:
    """PNG stats decode: _png_pixels + the shared feature convention
    (per-channel means over an RGB view + luminance, /255)."""
    import numpy as np

    arr = _png_pixels(blob)
    h, w, nch = arr.shape
    px = arr.astype(np.float64)
    # normalize to an RGB view for the shared feature convention
    if nch in (1, 2):  # gray / gray+alpha: r = g = b = gray
        rgb = np.repeat(px[..., :1], 3, axis=2)
    else:
        rgb = px[..., :3]
    means = rgb.mean(axis=(0, 1))  # R, G, B
    lum = (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]).mean()
    return {
        "width": int(w),
        "height": int(h),
        "channels": int(nch),
        "features": [means[0] / 255.0, means[1] / 255.0, means[2] / 255.0, lum / 255.0],
    }


def encode_png(arr, filters=None) -> bytes:
    """Stdlib PNG encoder (the test/fixture companion of _decode_png):
    uint8 array (h, w) gray, (h, w, 2) gray+alpha, (h, w, 3) RGB or
    (h, w, 4) RGBA -> 8-bit non-interlaced PNG bytes. `filters` optionally
    pins the per-row filter type (int or list, default all-None rows);
    encoding with types 1-4 exercises every defilter branch round-trip."""
    import struct
    import zlib

    import numpy as np

    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nch = arr.shape
    colortype = {1: 0, 2: 4, 3: 2, 4: 6}[nch]
    if filters is None:
        filters = [0] * h
    elif isinstance(filters, int):
        filters = [filters] * h
    stride = w * nch
    flat = arr.reshape(h, stride).astype(np.int32)
    lines = []
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        cur, ftype = flat[y], filters[y]
        if ftype == 0:
            enc = cur
        elif ftype == 1:
            shifted = np.concatenate([np.zeros(nch, np.int32), cur[:-nch]])
            enc = (cur - shifted) % 256
        elif ftype == 2:
            enc = (cur - prev) % 256
        elif ftype == 3:
            left = np.concatenate([np.zeros(nch, np.int32), cur[:-nch]])
            enc = (cur - (left + prev) // 2) % 256
        elif ftype == 4:
            enc = np.empty(stride, dtype=np.int32)
            for i in range(stride):
                a = cur[i - nch] if i >= nch else 0
                b = prev[i]
                c = prev[i - nch] if i >= nch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[i] = (cur[i] - pred) % 256
        else:
            raise ValueError(f"PNG filter type {ftype} is invalid")
        lines.append(bytes([ftype]) + bytes(enc.astype(np.uint8)))
        prev = cur

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, colortype, 0, 0, 0)
    idat = zlib.compress(b"".join(lines))
    return _PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")


def encode_wav(samples, sample_rate: int = 8000, channels: int = 1) -> bytes:
    """Stdlib WAV encoder (the test/fixture companion of _decode_wav):
    int16 sample array (interleaved if multi-channel) -> RIFF/WAVE PCM16
    bytes, even-padded data chunk."""
    import struct

    import numpy as np

    samples = np.asarray(samples, dtype="<i2")
    data = samples.tobytes()  # 16-bit samples: always an even-length chunk
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


# --- GIF (87a/89a): hand-written variable-width LZW --------------------------
#
# GIF is the one COMPRESSED image format whose codec is small enough to
# implement honestly without a media library: variable-width (3..12 bit)
# LSB-first LZW with CLEAR/EOI codes and the deferred-clear rule. The
# decoder handles any conforming single-frame non-interlaced stream; the
# encoder is its test companion and builds REAL dictionary-compressed
# streams (not the degenerate all-literals trick), so decode(encode(x))
# exercises the dictionary path end-to-end.


def _lzw_compress(indices, min_code_size: int) -> bytes:
    """GIF-variant LZW: emits CLEAR, dictionary-compresses the index
    stream with code width growing from min+1 to 12 bits, re-CLEARs when
    the table fills, ends with EOI. LSB-first bit packing."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    out = bytearray()
    acc = n_bits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, n_bits
        acc |= code << n_bits
        n_bits += width
        while n_bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n_bits -= 8

    def fresh():
        return {(i,): i for i in range(1 << min_code_size)}

    table = fresh()
    next_code, width = eoi + 1, min_code_size + 1
    emit(clear, width)
    s: tuple = ()
    for ix in indices:
        ix = int(ix)
        cand = s + (ix,)
        if cand in table:
            s = cand
            continue
        emit(table[s], width)
        if next_code < 4096:
            table[cand] = next_code
            # the DECODER widens when its next slot reaches 2^width; the
            # encoder must widen at the same moment or the streams skew
            if next_code == (1 << width) - 1 and width < 12:
                width += 1
            next_code += 1
        else:
            emit(clear, width)
            table, next_code, width = fresh(), eoi + 1, min_code_size + 1
        s = (ix,)
    if s:
        emit(table[s], width)
    emit(eoi, width)
    if n_bits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decompress(data: bytes, min_code_size: int) -> list:
    """GIF-variant LZW decode: variable width, CLEAR resets, the KwKwK
    special case, deferred clear (full table stops growing until CLEAR)."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    pos = acc = n_bits = 0
    width = min_code_size + 1
    table: list = [(i,) for i in range(1 << min_code_size)] + [(), ()]
    out: list = []
    prev: tuple | None = None

    def read_code() -> int | None:
        nonlocal pos, acc, n_bits
        while n_bits < width:
            if pos >= len(data):
                return None
            acc |= data[pos] << n_bits
            pos += 1
            n_bits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        n_bits -= width
        return code

    while True:
        code = read_code()
        if code is None or code == eoi:
            return out
        if code == clear:
            table = [(i,) for i in range(1 << min_code_size)] + [(), ()]
            width, prev = min_code_size + 1, None
            continue
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + (prev[0],)  # KwKwK
        else:
            raise ValueError(f"corrupt LZW stream: code {code} of {len(table)}")
        out.extend(entry)
        if prev is not None and len(table) < 4096:
            table.append(prev + (entry[0],))
        # the decoder's table lags the encoder's by ONE entry (its add for
        # code k happens while reading code k+1), so it must widen one
        # entry EARLY relative to the encoder's table-size test — the
        # classic GIF off-by-one: widen at 2^width - 1, not 2^width
        if len(table) == (1 << width) - 1 and width < 12:
            width += 1
        prev = entry


def _gif_pixels(blob: bytes):
    """Stdlib GIF decode to the (h, w, 3) uint8 RGB array: header +
    logical screen descriptor, global/local color table, extension-block
    skip, image descriptor, sub-block reassembly, LZW decode, palette
    map. Single-frame non-interlaced streams (the overwhelming majority
    of real GIFs; animation frames would loop the same image step)."""
    import struct

    import numpy as np

    if blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF blob")
    _sw, _sh, packed, _bg, _ar = struct.unpack("<HHBBB", blob[6:13])
    pos = 13
    palette = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        palette = np.frombuffer(blob[pos : pos + 3 * n], dtype=np.uint8).reshape(
            n, 3
        )
        pos += 3 * n
    while pos < len(blob):
        b0 = blob[pos]
        pos += 1
        if b0 == 0x21:  # extension: label + sub-blocks
            pos += 1
            while blob[pos]:
                pos += 1 + blob[pos]
            pos += 1
        elif b0 == 0x2C:  # image descriptor
            _lf, _tp, w, h, ip = struct.unpack("<HHHHB", blob[pos : pos + 9])
            pos += 9
            if ip & 0x40:
                raise NotImplementedError("interlaced GIF not supported")
            if ip & 0x80:
                n = 2 << (ip & 0x07)
                palette = np.frombuffer(
                    blob[pos : pos + 3 * n], dtype=np.uint8
                ).reshape(n, 3)
                pos += 3 * n
            if palette is None:
                raise ValueError("GIF image has no color table")
            mcs = blob[pos]
            pos += 1
            data = bytearray()
            while blob[pos]:
                ln = blob[pos]
                data += blob[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = _lzw_decompress(bytes(data), mcs)[: w * h]
            if len(idx) < w * h:
                raise ValueError("GIF LZW stream shorter than w*h")
            arr = np.asarray(idx, dtype=np.int64).reshape(h, w)
            return palette[arr]  # (h, w, 3) uint8
        elif b0 == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{b0:02x}")
    raise ValueError("GIF contains no image data")


def _decode_gif(blob: bytes) -> dict:
    """GIF stats decode: _gif_pixels + the shared feature convention
    (per-channel means + luminance, /255) — same contract as _decode_png."""
    import numpy as np

    rgb = _gif_pixels(blob).astype(np.float64)
    h, w, _ = rgb.shape
    means = rgb.mean(axis=(0, 1))
    lum = (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]).mean()
    return {
        "width": int(w),
        "height": int(h),
        "channels": 3,
        "features": [means[0] / 255.0, means[1] / 255.0, means[2] / 255.0, lum / 255.0],
    }


def encode_gif(indices, palette) -> bytes:
    """Stdlib GIF87a encoder (the test/fixture companion of _decode_gif):
    (h, w) palette-index array + (n, 3) uint8 palette -> single-frame
    non-interlaced GIF with a REAL LZW-compressed stream. Palette size is
    padded to the next power of two (>= 4, GIF's minimum code size 2)."""
    import struct

    import numpy as np

    idx = np.asarray(indices)
    h, w = idx.shape
    pal = np.asarray(palette, dtype=np.uint8)
    bits = max(2, int(len(pal) - 1).bit_length())
    n = 1 << bits
    padded = np.zeros((n, 3), dtype=np.uint8)
    padded[: len(pal)] = pal
    out = bytearray(b"GIF87a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) & 0x07), 0, 0)
    out += padded.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out.append(bits)  # LZW minimum code size
    lzw = _lzw_compress(idx.reshape(-1).tolist(), bits)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def _decode_jpeg(blob: bytes) -> dict:
    """JPEG stats decode: operators/jpeg baseline decoder + the shared
    feature convention (per-channel means + luminance, /255)."""
    import numpy as np

    from .jpeg import _jpeg_pixels

    arr = _jpeg_pixels(blob).astype(np.float64)
    if arr.ndim == 2:
        h, w = arr.shape
        rgb = np.repeat(arr[..., None], 3, axis=2)
        nch = 1
    else:
        h, w, nch = arr.shape
        rgb = arr
    means = rgb.mean(axis=(0, 1))
    lum = (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]).mean()
    return {
        "width": int(w),
        "height": int(h),
        "channels": int(nch),
        "features": [means[0] / 255.0, means[1] / 255.0, means[2] / 255.0, lum / 255.0],
    }


def _real_decode(blob: bytes) -> dict:
    """Magic-byte dispatch to a real decoder; loud failure for formats
    that genuinely need a media library."""
    if blob[:2] == b"BM":
        return _decode_bmp(blob)
    if blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
        return _decode_wav(blob)
    if blob[: len(_PNG_MAGIC)] == _PNG_MAGIC:
        return _decode_png(blob)
    if blob[:6] in (b"GIF87a", b"GIF89a"):
        return _decode_gif(blob)
    if blob[:2] == b"\xff\xd8":
        return _decode_jpeg(blob)
    head = bytes(blob[:4])
    raise NotImplementedError(
        f"no container-supported decoder for magic {head!r}: BMP(24bpp), "
        "WAV(PCM16), PNG(8-bit non-interlaced), GIF(single-frame LZW) and "
        "JPEG(baseline sequential, incl. 4:2:0 and restart markers) decode "
        "with stdlib+numpy; MP3/MP4 (and progressive JPEG) require "
        "av/soundfile/pillow, not present in this container"
    )


def generate_and_audio_features(
    base: DataFrame, make_blob, id_col: str = "doc_id", arg_col: str = "L"
) -> DataFrame:
    """Fused fixture pipeline for the audio path: per (id, L) row build a
    WAV blob with ``make_blob(id, L)`` (which may itself run extra codec
    passes, e.g. decimate + re-encode) and compute the ``audio_features``
    row INSIDE the same Arrow map task — one python stage instead of one
    per codec pass, blobs never crossing the JVM<->Python boundary. The
    stat arithmetic below is the ``audio_features`` code verbatim (int64,
    per-channel zcr), so values are bit-identical to the unfused form."""
    schema = (
        f"{id_col} bigint, n_frames int, sample_rate int, "
        "zcr bigint, dc_sum bigint, energy bigint"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {id_col: [], "n_frames": [], "sample_rate": [],
                   "zcr": [], "dc_sum": [], "energy": []}
            for did, arg in zip(pdf[id_col], pdf[arg_col]):
                samples, rate, channels = _wav_samples(
                    make_blob(int(did), int(arg))
                )
                s = samples.astype(np.int64)
                ch = s.reshape(-1, channels)
                out[id_col].append(did)
                out["n_frames"].append(len(samples) // channels)
                out["sample_rate"].append(rate)
                out["zcr"].append(int(np.sum(ch[:-1, :] * ch[1:, :] < 0)))
                out["dc_sum"].append(int(s.sum()))
                out["energy"].append(int((s * s).sum()))
            yield pd.DataFrame(out)

    return base.select(id_col, arg_col).mapInPandas(gen, schema)


def generate_and_decode(
    base: DataFrame, make_blob, id_col: str = "doc_id", arg_col: str = "L"
) -> DataFrame:
    """Fused fixture pipeline: per (id, L) row build a blob with
    ``make_blob(id, L)`` and decode it via ``_real_decode`` inside the SAME
    Arrow map task — the generate and decode halves of the codec-path
    queries in ONE python stage, so the blob bytes never cross the
    JVM<->Python boundary at all (the two-stage form shipped every blob
    out of the generator pass and back into the decoder pass; guide §4.1's
    boundary-crossing cost applied twice for no reason). Emits the exact
    ``decode_media(stub=False)`` row shape, so downstream projections are
    unchanged and the decode arithmetic is the same ``_real_decode``."""
    schema = (
        f"{id_col} bigint, width int, height int, channels int, "
        "features array<double>"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, cs, fs = [], [], [], [], []
            for did, arg in zip(pdf[id_col], pdf[arg_col]):
                r = _real_decode(make_blob(int(did), int(arg)))
                ids.append(did)
                ws.append(r["width"])
                hs.append(r["height"])
                cs.append(r["channels"])
                fs.append(r["features"])
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "width": ws,
                    "height": hs,
                    "channels": cs,
                    "features": fs,
                }
            )

    return base.select(id_col, arg_col).mapInPandas(gen, schema)


def decode_media(
    df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob", stub: bool = True
) -> DataFrame:
    """Decode + feature-extract: (id, width, height, channels,
    features array<double>). mapInPandas — one python pass per partition,
    Arrow both ways, blobs never shuffled (only the small decoded rows).

    ``stub=False`` performs a REAL decode for the formats the container
    can support with the stdlib + numpy alone — BMP (24bpp uncompressed),
    WAV (16-bit PCM), PNG (8-bit non-interlaced) — dispatched per blob by
    magic bytes; any other format raises NotImplementedError naming the
    missing media library.
    ``stub=True`` (default) keeps the md5-derived deterministic fake for
    engine-portable plumbing tests on arbitrary bytes."""
    decode = _fake_decode if stub else _real_decode

    schema = f"{id_col} bigint, width int, height int, channels int, features array<double>"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [decode(bytes(b)) for b in pdf[blob_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "width": [r["width"] for r in rows],
                    "height": [r["height"] for r in rows],
                    "channels": [r["channels"] for r in rows],
                    "features": [r["features"] for r in rows],
                }
            )

    return df.select(id_col, blob_col).mapInPandas(gen, schema)


def audio_features(
    df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob"
) -> DataFrame:
    """Integer-exact audio activity features from real WAV blobs:
    (id, n_frames, sample_rate, zcr, dc_sum, energy) where

      zcr    = #{i : x[i] * x[i+1] < 0}  (strict sign changes — the
               classic voiced/unvoiced + pitch-proxy feature),
      dc_sum = sum(x[i])                  (DC offset numerator),
      energy = sum(x[i]^2)                (signal energy),

    all computed on RAW int16 samples in int64 — no float anywhere, so
    results are exactly reproducible across engines and summation orders
    (bounded: 896 frames x 2^30 < 2^40 per blob, far inside int64).

    Same execution shape as decode_media: one Arrow map pass per
    partition, blobs never shuffled, only the 6-column stat rows move."""
    schema = (
        f"{id_col} bigint, n_frames int, sample_rate int, "
        "zcr bigint, dc_sum bigint, energy bigint"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {id_col: pdf[id_col].values, "n_frames": [], "sample_rate": [],
                   "zcr": [], "dc_sum": [], "energy": []}
            for b in pdf[blob_col]:
                samples, rate, channels = _wav_samples(bytes(b))
                s = samples.astype(np.int64)
                # zcr must compare CONSECUTIVE samples of the SAME channel:
                # WAV interleaves frames (L R L R ...), so de-interleave to
                # (n_frames, channels) and count sign changes down each
                # column, summed across channels. For mono this reduces to
                # the adjacent-sample comparison exactly; without the
                # reshape a stereo blob would compare L against R.
                ch = s.reshape(-1, channels)
                out["n_frames"].append(len(samples) // channels)
                out["sample_rate"].append(rate)
                out["zcr"].append(int(np.sum(ch[:-1, :] * ch[1:, :] < 0)))
                out["dc_sum"].append(int(s.sum()))
                out["energy"].append(int((s * s).sum()))
            yield pd.DataFrame(out)

    return df.select(id_col, blob_col).mapInPandas(gen, schema)


def resize_meta(
    df: DataFrame, max_side: int, id_col: str = "doc_id", blob_col: str = "blob"
) -> DataFrame:
    """Resize planning (the metadata half of a real resize): computes target
    dimensions preserving aspect ratio, capped at max_side. The pixel
    transform itself is ``resize_media`` below for the decodable formats
    (PNG/BMP)."""
    decoded = decode_media(df, id_col=id_col, blob_col=blob_col)
    scale = F.least(
        F.lit(1.0), max_side / F.greatest(F.col("width"), F.col("height")).cast("double")
    )
    return decoded.select(
        id_col,
        "width",
        "height",
        F.round(F.col("width") * scale).cast("int").alias("target_width"),
        F.round(F.col("height") * scale).cast("int").alias("target_height"),
    )


def sample_frames(
    df: DataFrame, n_frames: int = 4, id_col: str = "doc_id", blob_col: str = "blob"
) -> DataFrame:
    """Frame sampling for video-like blobs: emits (id, frame_idx,
    frame_blob) with n_frames evenly-spaced slices per blob. The explode
    happens INSIDE the map task (one python pass, no Generate re-eval, no
    blob shuffle before slicing)."""
    schema = f"{id_col} bigint, frame_idx int, frame_blob binary"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for i, blob in zip(pdf[id_col], pdf[blob_col]):
                blob = bytes(blob)
                step = max(1, len(blob) // n_frames)
                for k in range(n_frames):
                    ids.append(i)
                    idxs.append(k)
                    frames.append(blob[k * step : (k + 1) * step])
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame_blob": frames})

    return df.select(id_col, blob_col).mapInPandas(gen, schema)


def _nn_resize(arr, tw: int, th: int):
    """Nearest-neighbor resample of an (h, w, c) array to (th, tw, c):
    index-gather only, the deterministic baseline every image pipeline
    starts from (no interpolation kernel to disagree about)."""
    import numpy as np

    h, w = arr.shape[:2]
    ys = (np.arange(th) * h) // th
    xs = (np.arange(tw) * w) // tw
    return arr[ys][:, xs]


def resize_media(
    df: DataFrame, max_side: int, id_col: str = "doc_id", blob_col: str = "blob"
) -> DataFrame:
    """REAL pixel resize for the decodable formats: each PNG/BMP blob is
    decoded to its pixel array inside the Arrow map task, nearest-neighbor
    downscaled preserving aspect ratio (capped at max_side, never
    upscaled), and re-encoded as PNG — the normalized output format of the
    resize stage. Emits (id, width, height, target_width, target_height,
    resized_blob). Formats without a container decoder raise loudly, the
    decode_media(stub=False) contract.

    At 100 TB this is the canonical image-normalization pass: pixels stay
    inside the map task (only the re-encoded, smaller blobs move), and the
    stage composes with decode_media/sample_frames over the same binary
    column."""
    schema = (
        f"{id_col} bigint, width int, height int, target_width int, "
        "target_height int, resized_blob binary"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, tws, ths, blobs = [], [], [], [], [], []
            for i, blob in zip(pdf[id_col], pdf[blob_col]):
                blob = bytes(blob)
                if blob[: len(_PNG_MAGIC)] == _PNG_MAGIC:
                    arr = _png_pixels(blob)
                elif blob[:2] == b"BM":
                    arr = _bmp_pixels(blob)
                elif blob[:6] in (b"GIF87a", b"GIF89a"):
                    arr = _gif_pixels(blob)
                elif blob[:2] == b"\xff\xd8":
                    from .jpeg import _jpeg_pixels

                    arr = _jpeg_pixels(blob)
                else:
                    raise NotImplementedError(
                        f"no container-supported pixel decoder for magic "
                        f"{blob[:4]!r}: PNG, BMP, GIF and baseline JPEG "
                        "resize with stdlib+numpy; other formats need "
                        "pillow, not present in this container"
                    )
                h, w = arr.shape[:2]
                scale = min(1.0, max_side / max(w, h))
                tw, th = max(1, round(w * scale)), max(1, round(h * scale))
                out = _nn_resize(arr, tw, th)
                ids.append(i)
                ws.append(w)
                hs.append(h)
                tws.append(tw)
                ths.append(th)
                blobs.append(encode_png(out))
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "width": ws,
                    "height": hs,
                    "target_width": tws,
                    "target_height": ths,
                    "resized_blob": blobs,
                }
            )

    return df.select(id_col, blob_col).mapInPandas(gen, schema)


def decimate_audio(
    df: DataFrame, factor: int = 2, id_col: str = "doc_id", blob_col: str = "blob"
) -> DataFrame:
    """Integer decimation of mono PCM16 WAV blobs: keep every `factor`-th
    sample and re-encode at sample_rate/factor — the plumbing of an audio
    downsample stage (a production pipeline low-passes before decimating
    to avoid aliasing; with no DSP library in the container the filter
    step is identity, which is exact and documented rather than fake).
    Output blobs are REAL re-encoded WAV, so a downstream decode
    value-checks the decimate->encode chain.

    Same execution shape as decode_media: one Arrow map pass per
    partition, blobs stay local."""
    schema = f"{id_col} bigint, blob binary"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for b in pdf[blob_col]:
                samples, rate, channels = _wav_samples(bytes(b))
                if channels != 1:
                    raise NotImplementedError(
                        "decimate_audio supports mono PCM16 only"
                    )
                out.append(
                    encode_wav(samples[::factor], rate // factor, 1)
                )
            yield pd.DataFrame({id_col: pdf[id_col].values, "blob": out})

    return df.select(id_col, blob_col).mapInPandas(gen, schema)
