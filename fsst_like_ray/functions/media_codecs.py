"""Real (library-free) media codecs for the multimodal stages: PNG, BMP,
PGM/PPM and WAV decode with the Python stdlib (zlib / wave / struct) plus
NumPy — no external image/audio packages. JPEG and video stay behind the
explicit NotImplementedError stub in :mod:`multimodal` (they genuinely need
codec libraries this environment does not ship).

Formats are public specs: PNG (RFC 2083: zlib-inflated scanlines, per-row
filter byte, filters 0-4), BMP (BITMAPINFOHEADER, uncompressed 24/32-bit,
bottom-up BGR), PNM P5/P6 (ASCII header + raw bytes), WAV (RIFF PCM16 via
the stdlib ``wave`` module).

A tiny PNG/BMP/WAV ENCODER lives here too so tests can round-trip pixels
through real bytes deterministically.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"


# --------------------------------------------------------------------- PNG
def _png_chunks(data: bytes):
    pos = 8
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        yield typ, data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IEND":
            break


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """PNG scanline unfiltering (spec §6): per-row filter byte then data.
    The row loop is bounded by image HEIGHT; within a row, filters 0 (None),
    1 (Sub: a per-color-lane uint8 prefix sum — wraparound is exactly the
    mod-256 the spec wants) and 2 (Up) are vectorized; 3-4 (Average/Paeth)
    fall back to a per-byte loop only on rows that actually use them."""
    rows = raw.reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        ftype = int(rows[y, 0])
        cur = rows[y, 1:].astype(np.int64)
        if ftype == 0:
            line = cur
        elif ftype == 2:  # Up
            line = (cur + prev) & 0xFF
        elif ftype == 1:  # Sub
            lanes = rows[y, 1:].reshape(-1, bpp)
            line = (
                np.cumsum(lanes, axis=0, dtype=np.uint8)
                .reshape(-1)
                .astype(np.int64)
            )
        elif ftype == 3:  # Average
            line = cur.copy()
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            line = cur.copy()
            for x in range(stride):
                a = int(line[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)
                line[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"png: unknown filter type {ftype}")
        out[y] = line.astype(np.uint8)
        prev = line
    return out


_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(data: bytes) -> np.ndarray:
    """(H, W, C) uint8. Supports bit depth 8, color types 0/2/4/6, no
    interlace, no palette — the subset our encoder and common tools emit."""
    if not data.startswith(PNG_SIG):
        raise ValueError("png: bad signature")
    w = h = None
    channels = None
    idat = []
    for typ, body in _png_chunks(data):
        if typ == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise NotImplementedError(f"png: bit depth {depth}")
            if ctype not in _PNG_CHANNELS:
                raise NotImplementedError(f"png: color type {ctype}")
            if interlace:
                raise NotImplementedError("png: interlaced")
            channels = _PNG_CHANNELS[ctype]
        elif typ == b"IDAT":
            idat.append(body)
    if w is None or not idat:
        raise ValueError("png: missing IHDR/IDAT")
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    stride = w * channels
    if raw.size != h * (stride + 1):
        raise ValueError("png: scanline size mismatch")
    return _unfilter(raw, h, stride, channels).reshape(h, w, channels)


def encode_png(img: np.ndarray) -> bytes:
    """uint8 (H, W) or (H, W, C) → PNG bytes (filter 0 scanlines)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    scan = np.zeros((h, w * c + 1), dtype=np.uint8)
    scan[:, 1:] = img.reshape(h, w * c)
    idat = zlib.compress(scan.tobytes(), 6)

    def chunk(typ: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + typ
            + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
    )


# --------------------------------------------------------------------- BMP
def decode_bmp(data: bytes) -> np.ndarray:
    """(H, W, 3) uint8 RGB from uncompressed 24/32-bit BMP (bottom-up rows,
    BGR byte order, rows padded to 4 bytes)."""
    if data[:2] != b"BM":
        raise ValueError("bmp: bad signature")
    (off,) = struct.unpack("<I", data[10:14])
    hsize, w, h, planes, bpp, comp = struct.unpack("<IiihhI", data[14:34])
    if comp != 0 or bpp not in (24, 32):
        raise NotImplementedError(f"bmp: compression={comp} bpp={bpp}")
    bytespp = bpp // 8
    stride = (w * bytespp + 3) & ~3
    flip = h > 0
    h = abs(h)
    rows = np.frombuffer(data, dtype=np.uint8, count=h * stride, offset=off)
    rows = rows.reshape(h, stride)[:, : w * bytespp].reshape(h, w, bytespp)
    if flip:
        rows = rows[::-1]
    return np.ascontiguousarray(rows[:, :, 2::-1])  # BGR(A) → RGB


def encode_bmp(img: np.ndarray) -> bytes:
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    h, w, c = img.shape
    assert c == 3
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    body = rows.tobytes()
    header = b"BM" + struct.pack("<IHHI", 14 + 40 + len(body), 0, 0, 54)
    info = struct.pack("<IiihhIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + info + body


# --------------------------------------------------------------------- PNM
def decode_pnm(data: bytes) -> np.ndarray:
    """P5 (gray) / P6 (RGB) binary PNM → (H, W, C) uint8."""
    if data[:2] not in (b"P5", b"P6"):
        raise ValueError("pnm: not P5/P6")
    channels = 1 if data[:2] == b"P5" else 3
    # header: magic, width, height, maxval — whitespace/comment separated
    fields, pos = [], 2
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise NotImplementedError("pnm: maxval != 255")
    arr = np.frombuffer(data, dtype=np.uint8, count=w * h * channels, offset=pos)
    return arr.reshape(h, w, channels).copy()


# --------------------------------------------------------------------- WAV
def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """(samples[n, channels] int16, sample_rate) via the stdlib wave module."""
    with wave.open(io.BytesIO(data), "rb") as f:
        if f.getsampwidth() != 2:
            raise NotImplementedError("wav: only PCM16")
        n = f.getnframes()
        raw = f.readframes(n)
        arr = np.frombuffer(raw, dtype="<i2").reshape(n, f.getnchannels())
        return arr.copy(), f.getframerate()


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    samples = np.ascontiguousarray(samples, dtype="<i2")
    if samples.ndim == 1:
        samples = samples[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(samples.shape[1])
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(samples.tobytes())
    return buf.getvalue()


# ------------------------------------------------------------------ sniffer
def _pil():
    """Optional Pillow probe, resolved once per process: the actor-pool
    decode stages call this in ``__init__`` so worker batches never pay
    the import retry. None when the library is absent (this container)."""
    global _PIL_MOD
    if _PIL_MOD is _UNSET:
        try:
            from PIL import Image  # noqa: PLC0415

            _PIL_MOD = Image
        except Exception:
            _PIL_MOD = None
    return _PIL_MOD


_UNSET = object()
_PIL_MOD = _UNSET


def decode_image(data: bytes) -> np.ndarray:
    """Dispatch on magic bytes. Library-free decoders handle PNG/BMP/PNM;
    formats that need an external codec (JPEG, WebP, ...) use Pillow when
    it is installed and raise NotImplementedError otherwise — the Ray-side
    plumbing (schema, actor signature, batching) is identical either way."""
    if data.startswith(PNG_SIG):
        return decode_png(data)
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:2] in (b"P5", b"P6"):
        return decode_pnm(data)
    if data[:3] == b"\xff\xd8\xff":
        Image = _pil()
        if Image is None:
            raise NotImplementedError(
                "jpeg decode requires an external library"
            )
        import io

        arr = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        return np.ascontiguousarray(arr)
    raise NotImplementedError("unrecognized image format")
