"""Zero-dependency media codecs for the multimodal decode slots.

The container ships no image/audio libraries (PIL/cv2/soundfile —
absence evidenced in PERF.md), but PNG and WAV are fully decodable with
the standard library: PNG is zlib-compressed filtered scanlines
(RFC 2083 / the W3C PNG spec), WAV is RIFF-framed PCM (stdlib ``wave``).
These codecs make the Arrow `mapInPandas` decode stages REAL for the
two formats — payloads with other magics still fall through to the
documented plug-in line (JPEG et al. genuinely need external codecs).

Scope: 8-bit greyscale / RGB / RGBA, non-interlaced PNG — the shapes a
training pipeline's thumbnail/feature path consumes. All five scanline
filter types (None/Sub/Up/Average/Paeth) are implemented on the decode
side per spec; the encoder emits filter 0. Pure numpy per image — these
run INSIDE Arrow-batched UDFs, so per-image Python cost is the decode
itself, not row overhead.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
WAV_MAGIC = b"RIFF"

#: PNG color type → channel count (8-bit, non-palette scope).
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def is_png(b: bytes) -> bool:
    return b[:8] == PNG_MAGIC


def is_wav(b: bytes) -> bool:
    return b[:4] == WAV_MAGIC and b[8:12] == b"WAVE"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def png_encode(img: np.ndarray) -> bytes:
    """Encode HxW (grey), HxWx1, HxWx3 (RGB) or HxWx4 (RGBA) uint8 to a
    non-interlaced 8-bit PNG with filter 0 scanlines."""
    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def png_decode(b: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced grey/grey+A/RGB/RGBA PNG into an
    HxWxC uint8 array, un-applying all five filter types per spec."""
    if not is_png(b):
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(b):
        (length,) = struct.unpack(">I", b[pos : pos + 4])
        tag = b[pos + 4 : pos + 8]
        body = b[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("truncated PNG (missing IHDR/IDAT)")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or color_type not in _CHANNELS:
        raise ValueError(f"unsupported PNG (depth={depth}, color={color_type})")
    if interlace != 0:
        raise ValueError("interlaced PNG unsupported")
    c = _CHANNELS[color_type]
    raw = zlib.decompress(b"".join(idat))
    stride = w * c
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline payload size mismatch")
    return png_unfilter(raw, stride, c).reshape(h, w, c)


def png_unfilter(raw: bytes, rowlen: int, bpp: int) -> np.ndarray:
    """Un-apply the five PNG row filters (None/Sub/Up/Average/Paeth,
    spec §9) to a stream of ``(1 filter-tag byte + rowlen data bytes)``
    rows; returns the unfiltered rows as a ``(h, rowlen)`` uint8 array.

    Shared by :func:`png_decode` and the PDF fallback's
    ``/Predictor >= 10`` stream decoder (PDF 32000-1 §7.4.4.4 defines
    stream predictors AS PNG filters; reusing the image decoder's
    filter math keeps one implementation of Paeth in the repo —
    r5-verdict task 2)."""
    if rowlen <= 0 or len(raw) % (rowlen + 1):
        raise ValueError("filtered payload is not whole (1+rowlen) rows")
    h = len(raw) // (rowlen + 1)
    out = np.empty((h, rowlen), dtype=np.uint8)
    prev = np.zeros(rowlen, dtype=np.uint8)
    for y in range(h):
        ftype = raw[y * (rowlen + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=rowlen, offset=y * (rowlen + 1) + 1
        ).copy()
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev).astype(np.uint8)
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth: sequential in x
            cur = np.zeros(rowlen, dtype=np.uint8)
            for x in range(rowlen):
                left = int(cur[x - bpp]) if x >= bpp else 0
                up = int(prev[x])
                ul = int(prev[x - bpp]) if x >= bpp else 0
                if ftype == 1:
                    rec = line[x] + left
                elif ftype == 3:
                    rec = line[x] + ((left + up) >> 1)
                else:
                    pa, pb, pc = (
                        abs(up - ul),
                        abs(left - ul),
                        abs(left + up - 2 * ul),
                    )
                    pred = (
                        left
                        if pa <= pb and pa <= pc
                        else (up if pb <= pc else ul)
                    )
                    rec = line[x] + pred
                cur[x] = rec & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {ftype}")
        out[y] = cur
        prev = cur
    return out


def resize_nearest(img: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Nearest-neighbor resample to (th, tw) — the deterministic
    resampler (no kernel/rounding ambiguity across implementations)."""
    h, w = img.shape[:2]
    ys = (np.arange(th) * h) // th
    xs = (np.arange(tw) * w) // tw
    return img[ys][:, xs]


def wav_encode(
    samples: np.ndarray, rate: int = 16000, channels: int = 1
) -> bytes:
    """Encode int16 PCM samples to a WAV container (stdlib wave)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(channels)
        wv.setsampwidth(2)
        wv.setframerate(rate)
        wv.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def wav_decode(b: bytes) -> tuple[np.ndarray, int, int]:
    """Decode a PCM WAV payload → (int16 samples [n, channels], rate,
    channels). 8-bit input is widened to int16; other widths raise at
    the documented plug-in line."""
    with wave.open(io.BytesIO(b), "rb") as wv:
        rate, channels = wv.getframerate(), wv.getnchannels()
        width, n = wv.getsampwidth(), wv.getnframes()
        frames = wv.readframes(n)
    if width == 2:
        arr = np.frombuffer(frames, dtype="<i2")
    elif width == 1:  # unsigned 8-bit per spec
        arr = (
            np.frombuffer(frames, dtype=np.uint8).astype(np.int16) - 128
        ) * 256
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    return arr.reshape(-1, channels), rate, channels
