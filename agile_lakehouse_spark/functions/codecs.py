"""Dependency-free media codecs: BMP / PPM images, WAV(PCM) audio.

These are the REAL decode bodies for the multimodal operators
(``operators/multimodal.py``): one trivial, fully-public container per
modality so the decode step is no longer a stub — 24-bit uncompressed BMP
(BITMAPINFOHEADER, the Windows-BMP baseline every image tool emits),
binary PPM ``P6`` (the Netpbm interchange format), and RIFF/WAVE with
16-bit little-endian PCM.  Formats implemented from their public layout
specifications; all pixel/sample work is vectorized numpy — no per-pixel
Python anywhere.

Compressed formats (PNG/JPEG/MP3/H.264) stay behind
``multimodal.decode_stub`` — their codecs are C libraries absent from
this environment.

Exactness contract: every decoder returns the integer pixel/sample
values bit-for-bit (no float resampling, no color conversion), so
encode -> decode round-trips are identities and decoded aggregates can
sit under the DuckDB oracle gate (dq25/dq138: the oracle replays the
payload-generation arithmetic and must hash-match sums computed from the
DECODED bytes).
"""

from __future__ import annotations

import struct

import numpy as np

# --- BMP (24-bit uncompressed, BITMAPINFOHEADER) ---------------------------

_BMP_FILE_HDR = struct.Struct("<2sIHHI")  # magic, file size, res, res, data offset
_BMP_INFO_HDR = struct.Struct("<IiiHHIIiiII")  # size, w, h, planes, bpp, comp, ...


def encode_bmp(arr: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB array -> 24-bit BI_RGB BMP bytes.

    BMP stores rows bottom-up in BGR order, each row padded to a 4-byte
    boundary — the layout quirks a real decoder must undo, which is what
    makes the round-trip a meaningful codec test.
    """
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError(f"expected HxWx3 uint8 array, got {arr.shape} {arr.dtype}")
    h, w, _ = arr.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    stride = row_bytes + pad
    # bottom-up rows, RGB -> BGR
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, :row_bytes] = arr[::-1, :, ::-1].reshape(h, row_bytes)
    data_offset = _BMP_FILE_HDR.size + _BMP_INFO_HDR.size
    file_size = data_offset + h * stride
    return (
        _BMP_FILE_HDR.pack(b"BM", file_size, 0, 0, data_offset)
        + _BMP_INFO_HDR.pack(_BMP_INFO_HDR.size, w, h, 1, 24, 0, h * stride, 2835, 2835, 0, 0)
        + body.tobytes()
    )


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes -> HxWx3 uint8 RGB array.

    Handles bottom-up (positive height) and top-down (negative height)
    layouts and arbitrary row padding; rejects compressed or non-24-bit
    files loudly rather than misdecoding.
    """
    if len(data) < _BMP_FILE_HDR.size + _BMP_INFO_HDR.size or data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    _, _, _, _, data_offset = _BMP_FILE_HDR.unpack_from(data, 0)
    hdr_size, w, h, _planes, bpp, comp = struct.unpack_from("<IiiHHI", data, _BMP_FILE_HDR.size)
    if comp != 0 or bpp != 24:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={comp} (only 24-bit BI_RGB)")
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h <= 0:
        raise ValueError(f"bad BMP dimensions {w}x{h}")
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    end = data_offset + h * stride
    if len(data) < end:
        raise ValueError("truncated BMP payload")
    rows = np.frombuffer(data, dtype=np.uint8, count=h * stride, offset=data_offset)
    rows = rows.reshape(h, stride)[:, :row_bytes].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


# --- PPM (binary P6, maxval <= 255) ----------------------------------------


def encode_ppm(arr: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB array -> binary PPM (P6) bytes."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError(f"expected HxWx3 uint8 array, got {arr.shape} {arr.dtype}")
    h, w, _ = arr.shape
    return f"P6\n{w} {h}\n255\n".encode("ascii") + arr.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    """Binary PPM (P6) bytes -> HxWx3 uint8 RGB array.

    Tolerates comments and arbitrary whitespace in the header (the spec
    allows both); maxval must be <= 255 (single-byte samples).
    """
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header = magic + 3 whitespace-separated ints, '#' comments to EOL
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if i < len(data) and data[i : i + 1] == b"#":
            while i < len(data) and data[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PPM header")
        fields.append(int(data[i:j]))
        i = j
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError(f"PPM maxval {maxval} > 255 unsupported")
    i += 1  # exactly one whitespace byte after maxval per spec
    n = w * h * 3
    if len(data) < i + n:
        raise ValueError("truncated PPM payload")
    return np.frombuffer(data, dtype=np.uint8, count=n, offset=i).reshape(h, w, 3).copy()


def sniff_image(data: bytes) -> str:
    """'bmp' | 'ppm' from magic bytes; raises on anything else."""
    if data[:2] == b"BM":
        return "bmp"
    if data[:2] == b"P6":
        return "ppm"
    raise ValueError(f"unrecognized image magic {data[:2]!r}")


def decode_image(data: bytes) -> np.ndarray:
    """Magic-sniffed decode: BMP or PPM -> HxWx3 uint8 RGB."""
    return decode_bmp(data) if sniff_image(data) == "bmp" else decode_ppm(data)


# --- WAV (RIFF/WAVE, PCM 16-bit LE) ----------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """1-D int16 array -> mono 16-bit PCM WAV bytes."""
    if samples.ndim != 1 or samples.dtype != np.int16:
        raise ValueError(f"expected 1-D int16 array, got {samples.shape} {samples.dtype}")
    payload = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    chunks = b"".join(
        struct.pack("<4sI", tag, len(body)) + body + (b"\x00" if len(body) % 2 else b"")
        for tag, body in ((b"fmt ", fmt), (b"data", payload))
    )
    return struct.pack("<4sI4s", b"RIFF", 4 + len(chunks), b"WAVE") + chunks


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (1-D int16 sample array, sample_rate).

    Walks the RIFF chunk list (skipping LIST/INFO and other metadata
    chunks real encoders insert); only PCM (format 1) 16-bit is accepted
    — anything else raises rather than silently mis-scaling.
    """
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, payload = 12, None, None
    while pos + 8 <= len(data):
        tag, size = struct.unpack_from("<4sI", data, pos)
        body = data[pos + 8 : pos + 8 + size]
        if tag == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif tag == b"data":
            payload = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if fmt is None or payload is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"unsupported WAV: format={audio_format} bits={bits} (only PCM16)")
    samples = np.frombuffer(payload, dtype="<i2").astype(np.int16, copy=False)
    if n_channels > 1:  # interleaved -> take channel 0 (mono analysis path)
        samples = samples[::n_channels]
    return samples.copy(), sample_rate
