"""Dependency-free media codecs for the multimodal lane.

PIL/ffmpeg are not installed in this container, so the round-2 media
decode was a marked stub.  PNG and WAV, however, need nothing beyond
the standard library: PNG is zlib + per-scanline unfiltering (ISO/IEC
15948 §9: None/Sub/Up/Average/Paeth), WAV is a RIFF header + PCM frames
(stdlib ``wave``).  These decoders make the media lane REAL for the two
formats a training-data pipeline actually stores at rest most often;
anything else (JPEG, MP4, …) still routes to the deterministic fake in
stages/multimodal.py — clearly separated by magic-byte sniffing, never
by trusting metadata.

Reference semantics: the decode step of the ``VlmBackend`` GPU stage
(docling_graph/core/extractors/backends/vlm_backend.py:21-120) — bytes
in, pixel array out, heavy state per actor.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
WAV_MAGIC = b"RIFF"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # PNG color type → samples/pixel


JPEG_MAGIC = b"\xff\xd8\xff"
GIF_MAGICS = (b"GIF87a", b"GIF89a")


def sniff_format(payload: bytes) -> str:
    """Magic-byte format sniff:
    'png' | 'wav' | 'jpeg' | 'gif' | 'webp' | 'mp4' | 'unknown'.
    Never trusts metadata columns — bytes only."""
    if payload.startswith(PNG_MAGIC):
        return "png"
    if payload[:4] == WAV_MAGIC and payload[8:12] == b"WAVE":
        return "wav"
    if payload.startswith(JPEG_MAGIC):
        return "jpeg"
    if payload[:6] in GIF_MAGICS:
        return "gif"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        return "webp"
    if payload[4:8] == b"ftyp":
        return "mp4"
    return "unknown"


# SOF markers that carry frame dimensions (ITU-T T.81 §B.2.2) — all of
# C0-CF except DHT (C4), JPG (C8) and DAC (CC)
_JPEG_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
             0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def probe_jpeg(data: bytes) -> tuple[int, int, int] | None:
    """JPEG header walk → (width, height, components) WITHOUT entropy
    decode: skip marker segments until a start-of-frame carries the
    dimensions.  Returns None when no SOF is found (truncated)."""
    pos = 2
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            pos += 1  # tolerate stray fill bytes
            continue
        marker = data[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        if 0xD0 <= marker <= 0xD9:  # standalone RST/SOI/EOI: no length
            pos += 2
            continue
        seg_len = struct.unpack(">H", data[pos + 2:pos + 4])[0]
        if marker in _JPEG_SOF and pos + 9 <= n:
            h, w = struct.unpack(">HH", data[pos + 5:pos + 9])
            comps = data[pos + 9] if pos + 9 < n else 0
            return (int(w), int(h), int(comps))
        pos += 2 + seg_len
    return None


def probe_gif(data: bytes) -> tuple[int, int] | None:
    """GIF logical-screen descriptor → (width, height)."""
    if len(data) < 10:
        return None
    w, h = struct.unpack("<HH", data[6:10])
    return (int(w), int(h))


def probe_webp(data: bytes) -> tuple[int, int] | None:
    """WebP dimensions from the first chunk: VP8X (canvas), VP8L
    (lossless) or VP8 (lossy key frame)."""
    if len(data) < 30:
        return None
    tag = data[12:16]
    if tag == b"VP8X":
        w = int.from_bytes(data[24:27], "little") + 1
        h = int.from_bytes(data[27:30], "little") + 1
        return (w, h)
    if tag == b"VP8L" and data[20] == 0x2F:
        bits = int.from_bytes(data[21:25], "little")
        return ((bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1)
    if tag == b"VP8 ":
        w, h = struct.unpack("<HH", data[26:30])
        return (w & 0x3FFF, h & 0x3FFF)
    return None


def probe_media(payload: bytes) -> dict:
    """Typed intrinsic metadata from an opaque binary column WITHOUT a
    full decode — the cheap first pass a 100 TB multimodal table runs
    before any decode stage is scheduled (header peeks only; entropy
    data never touched).  Returns
    ``{format, width, height, channels, sample_rate, n_samples}`` with
    None for the fields the format does not carry or a truncated header
    cannot prove."""
    data = payload or b""
    fmt = sniff_format(data)
    out = {"format": fmt, "width": None, "height": None, "channels": None,
           "sample_rate": None, "n_samples": None}
    try:
        if fmt == "png" and len(data) >= 26:
            w, h, _depth, ctype = struct.unpack(">IIBB", data[16:26])
            out.update(width=int(w), height=int(h),
                       channels=_CHANNELS.get(ctype))
        elif fmt == "jpeg":
            dims = probe_jpeg(data)
            if dims:
                out.update(width=dims[0], height=dims[1], channels=dims[2])
        elif fmt == "gif":
            dims = probe_gif(data)
            if dims:
                out.update(width=dims[0], height=dims[1])
        elif fmt == "webp":
            dims = probe_webp(data)
            if dims:
                out.update(width=dims[0], height=dims[1])
        elif fmt == "wav":
            with wave.open(io.BytesIO(data)) as wf:
                out.update(channels=wf.getnchannels(),
                           sample_rate=wf.getframerate(),
                           n_samples=wf.getnframes())
    except Exception:
        pass  # truncated/corrupt header: format stays, metrics stay None
    return out


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (H, W, C) uint8 array.

    Supports bit depth 8, color types 0/2/4/6 (gray, RGB, gray+alpha,
    RGBA), non-interlaced — the subset every screenshot/figure pipeline
    emits.  Raises ``ValueError`` on anything else (caller decides the
    fallback)."""
    if not data.startswith(PNG_MAGIC):
        raise ValueError("not a PNG")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos:pos + 4]), \
            data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    width, height, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(f"unsupported PNG (depth={depth}, "
                         f"interlace={interlace})")
    ch = _CHANNELS.get(color)
    if ch is None:
        raise ValueError(f"unsupported color type {color}")
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) < height * (stride + 1):
        raise ValueError("truncated PNG data")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride,
                             offset=off + 1).copy()
        if ftype == 0:      # None
            cur = line
        elif ftype == 2:    # Up
            cur = line + prev
        elif ftype in (1, 3, 4):
            # Sub/Average/Paeth need the left neighbour — sequential in
            # x by definition; loop over pixels (bytes grouped by ch)
            cur = line
            for x in range(stride):
                left = int(cur[x - ch]) if x >= ch else 0
                up = int(prev[x])
                if ftype == 1:
                    cur[x] = (int(line[x]) + left) & 0xFF
                elif ftype == 3:
                    cur[x] = (int(line[x]) + ((left + up) >> 1)) & 0xFF
                else:  # Paeth
                    ul = int(prev[x - ch]) if x >= ch else 0
                    p = left + up - ul
                    pa_, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = (left if pa_ <= pb and pa_ <= pc
                            else up if pb <= pc else ul)
                    cur[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad filter {ftype}")
        out[y] = cur
        prev = out[y]
    return out.reshape(height, width, ch)


def encode_png(img: np.ndarray) -> bytes:
    """(H, W, C) or (H, W) uint8 → PNG bytes (filter 0, zlib-6).
    Deterministic; round-trips exactly through :func:`decode_png`."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + \
            struct.pack(">I", crc)

    return (PNG_MAGIC
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw, 6))
            + chunk(b"IEND", b""))


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → ((frames, channels) int16 array, sample_rate).
    8-bit PCM widens to int16; other widths raise ValueError."""
    with wave.open(io.BytesIO(data), "rb") as w:
        n, ch, width, rate = (w.getnframes(), w.getnchannels(),
                              w.getsampwidth(), w.getframerate())
        frames = w.readframes(n)
    if width == 2:
        arr = np.frombuffer(frames, dtype="<i2")
    elif width == 1:
        arr = (np.frombuffer(frames, dtype=np.uint8).astype(np.int16)
               - 128) * 256
    else:
        raise ValueError(f"unsupported sample width {width}")
    return arr.reshape(-1, ch), rate


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """(frames, channels) int16 → WAV bytes; deterministic."""
    if samples.ndim == 1:
        samples = samples[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(samples.shape[1])
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbour resize, fully vectorized (index gather)."""
    h, w = img.shape[:2]
    ys = np.minimum((np.arange(height) * h) // height, h - 1)
    xs = np.minimum((np.arange(width) * w) // width, w - 1)
    return img[ys][:, xs]
