"""Dependency-free media codecs: BMP / PPM images, WAV(PCM) audio.

These are the REAL decode bodies for the multimodal operators
(``operators/multimodal.py``): one trivial, fully-public container per
modality so the decode step is no longer a stub — 24-bit uncompressed BMP
(BITMAPINFOHEADER, the Windows-BMP baseline every image tool emits),
binary PPM ``P6`` (the Netpbm interchange format), and RIFF/WAVE with
16-bit little-endian PCM.  Formats implemented from their public layout
specifications; all pixel/sample work is vectorized numpy — no per-pixel
Python anywhere.

PNG decodes/encodes for real too (round 5): zlib is Python stdlib, so
the chunk walk + inflate + all five scanline filters are implementable
from the public spec with no external library.  The remaining
compressed formats (JPEG/MP3/H.264) stay behind
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
    """'bmp' | 'ppm' | 'png' from magic bytes; raises on anything else."""
    if data[:2] == b"BM":
        return "bmp"
    if data[:2] == b"P6":
        return "ppm"
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    raise ValueError(f"unrecognized image magic {data[:2]!r}")


def decode_image(data: bytes) -> np.ndarray:
    """Magic-sniffed decode: BMP, PPM, or PNG -> HxWx3 uint8 RGB."""
    kind = sniff_image(data)
    if kind == "bmp":
        return decode_bmp(data)
    if kind == "ppm":
        return decode_ppm(data)
    return decode_png(data)


def decode_image_rgba(data: bytes) -> np.ndarray:
    """Magic-sniffed decode -> HxWx4 uint8 RGBA.  BMP/PPM carry no
    alpha, so theirs is a constant 255 plane; PNG alpha is retained
    (see :func:`decode_png_rgba`)."""
    kind = sniff_image(data)
    if kind == "png":
        return decode_png_rgba(data)
    rgb = decode_bmp(data) if kind == "bmp" else decode_ppm(data)
    out = np.empty((*rgb.shape[:2], 4), dtype=np.uint8)
    out[:, :, :3] = rgb
    out[:, :, 3] = 255
    return out


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


# --- PNG (RFC 2083 / W3C PNG spec; zlib is Python stdlib) -------------------
#
# The first COMPRESSED container in the codec set: chunk walk with CRC-32
# verification, concatenated-IDAT inflate, and all five scanline filters
# (None/Sub/Up/Average/Paeth) on decode — the parts a real PNG reader
# cannot skip, implemented from the public specification.  The encoders
# write filter-0 scanlines (every conforming reader must accept them);
# the decoder accepts whatever filters a foreign encoder chose.
# Decoder coverage: color types 0 (grey -> RGB, depths 1/2/4/8/16 —
# sub-byte samples scale by the spec's exact 255/(2^d-1) factor),
# 2 (RGB) and 6 (RGBA -> alpha dropped) at depths 8 and 16 (16-bit
# keeps the high byte, the standard 8-bit reduction), and color type 3
# (palette) at depths 1/2/4/8 — packed sub-byte indices unpacked
# bit-exactly, PLTE lookup, out-of-range indices raise.  Adam7
# interlace decodes for every supported layout (seven passes through
# the same unfilter kernel, per-pass prev reset, empty passes omitted).

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(arr: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB array -> truecolor 8-bit PNG bytes."""
    import zlib

    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError(f"expected HxWx3 uint8 array, got {arr.shape} {arr.dtype}")
    h, w, _ = arr.shape
    raw = b"".join(b"\x00" + arr[r].tobytes() for r in range(h))

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def encode_png_rgba(arr: np.ndarray) -> bytes:
    """HxWx4 uint8 RGBA -> color-type-6 PNG (filter 0 scanlines, one
    zlib stream) — the alpha-bearing twin of :func:`encode_png`."""
    import zlib

    if arr.ndim != 3 or arr.shape[2] != 4 or arr.dtype != np.uint8:
        raise ValueError(f"expected HxWx4 uint8 array, got {arr.shape} {arr.dtype}")
    h, w, _ = arr.shape
    raw = b"".join(b"\x00" + arr[r].tobytes() for r in range(h))

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def _png_pixels(data: bytes) -> np.ndarray:
    """PNG bytes -> HxWx4 uint8 RGBA (grey expanded, palette looked up,
    16-bit reduced to its high byte, alpha RETAINED — a constant 255
    plane when the image carries none).  Alpha sources: color type 6
    (RGBA), color type 4 (grey+alpha), and the tRNS chunk (per-entry
    palette alpha; single fully-transparent sample value for grey/
    truecolor — matched on the high byte at depth 16, consistent with
    the 8-bit sample reduction).  CAUTION, depth-16 tRNS is LOSSY by
    this reduction: the spec (11.3.2.1) requires an EXACT 16-bit key
    match, so any pixel sharing the key's high byte (up to 256 distinct
    16-bit values) is marked transparent here; cross-validating a
    foreign-encoded 16-bit+tRNS PNG against an external decoder will
    show extra alpha=0 pixels on exactly that set (test-pinned,
    tests/test_multimodal.py).

    Filters 3/4 (Average/Paeth) carry an intra-row serial dependency, so
    those rows decode byte-at-a-time; filters 0/1/2 are vectorized (Sub
    is a per-byte-phase cumsum mod 256).  Un-filtering operates on BYTES
    with the spec's ``bpp = ceil(bits_per_pixel / 8)`` offset — 1 for
    every palette depth, channels*2 for 16-bit — so the same five-filter
    kernel serves all supported layouts.  Adam7 interlace decodes as
    seven sub-images through the same unfilter machinery (filter ``prev``
    resets per pass; empty passes contribute zero bytes) scattered into
    one canvas.  CRC failures, out-of-palette indices, and truncated or
    oversized pixel payloads raise — never a silently wrong pixel.
    """
    import zlib

    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat, plte, trns = 8, None, [], None, None
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        if pos + 12 + length > len(data):
            raise ValueError("truncated PNG chunk")  # ValueError, not struct.error
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"PLTE":
            if plte is not None:
                raise ValueError("duplicate PLTE chunk")
            if idat:
                raise ValueError("PLTE chunk after IDAT")
            if len(body) == 0 or len(body) % 3 != 0 or len(body) > 256 * 3:
                raise ValueError(f"bad PLTE length {len(body)}")
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            if trns is not None:
                raise ValueError("duplicate tRNS chunk")
            if idat:
                raise ValueError("tRNS chunk after IDAT")
            trns = body
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if color_type == 3:
        if depth not in (1, 2, 4, 8):
            raise ValueError(f"bad palette PNG bit depth {depth}")
        if plte is None:
            raise ValueError("palette PNG missing PLTE chunk")
        if trns is not None and len(trns) > len(plte):
            raise ValueError(
                f"tRNS has {len(trns)} entries but PLTE only {len(plte)}"
            )
    elif color_type == 0:
        if depth not in (1, 2, 4, 8, 16):
            raise ValueError(f"bad greyscale PNG bit depth {depth}")
        if trns is not None and len(trns) != 2:
            raise ValueError(f"bad tRNS length {len(trns)} for grey (want 2)")
    elif color_type in (2, 4, 6):
        if depth not in (8, 16):
            raise ValueError(f"unsupported PNG bit depth {depth} (8/16)")
        if color_type == 2 and trns is not None and len(trns) != 6:
            raise ValueError(f"bad tRNS length {len(trns)} for RGB (want 6)")
        if color_type in (4, 6) and trns is not None:
            # spec 11.3.2.1: tRNS is forbidden when a full alpha channel exists
            raise ValueError(f"tRNS chunk forbidden for color type {color_type}")
    else:
        raise ValueError(f"unsupported PNG color type {color_type}")
    if comp != 0 or filt != 0:
        raise ValueError("nonstandard PNG compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"bad PNG interlace method {interlace}")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    bits_pp = depth * channels
    bpp = (bits_pp + 7) // 8  # filter byte-offset per the spec
    raw = zlib.decompress(b"".join(idat))

    def _unfilter(pos: int, hh: int, stride: int) -> tuple[np.ndarray, int]:
        """Un-filter ``hh`` scanlines of ``stride`` bytes starting at
        ``pos`` in the inflated stream -> (rows, next pos)."""
        rows = np.zeros((hh, stride), dtype=np.uint8)
        prev = np.zeros(stride, dtype=np.int64)
        for r in range(hh):
            ft = raw[pos]
            line = np.frombuffer(
                raw, dtype=np.uint8, count=stride, offset=pos + 1
            ).astype(np.int64)
            pos += stride + 1
            if ft == 0:
                recon = line
            elif ft == 1:  # Sub: cumsum per byte phase, mod 256
                recon = line.copy()
                for ph in range(bpp):
                    recon[ph::bpp] = np.cumsum(recon[ph::bpp]) & 0xFF
            elif ft == 2:  # Up
                recon = (line + prev) & 0xFF
            elif ft in (3, 4):  # Average / Paeth: serial in x
                recon = np.empty(stride, dtype=np.int64)
                for x in range(stride):
                    a = int(recon[x - bpp]) if x >= bpp else 0
                    b = int(prev[x])
                    if ft == 3:
                        recon[x] = (int(line[x]) + ((a + b) >> 1)) & 0xFF
                    else:
                        c = int(prev[x - bpp]) if x >= bpp else 0
                        p = a + b - c
                        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                        pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                        recon[x] = (int(line[x]) + pr) & 0xFF
            else:
                raise ValueError(f"bad PNG filter type {ft}")
            rows[r] = recon.astype(np.uint8)
            prev = recon
        return rows, pos

    def _unpack_subbyte(rows: np.ndarray, ww: int) -> np.ndarray:
        # PNG packs sub-byte samples MSB-first — exactly numpy's
        # unpackbits bit order; trailing pad bits fall off at [:ww*depth]
        hh = rows.shape[0]
        bits = np.unpackbits(rows, axis=1)[:, : ww * depth].reshape(hh, ww, depth)
        weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
        return (bits * weights).sum(axis=2).astype(np.uint8)

    def _pass_pixels(rows: np.ndarray, ww: int) -> np.ndarray:
        """Unfiltered scanline bytes -> the pre-final per-pixel
        representation: palette index (hh, ww), grey value (hh, ww), or
        channel bytes (hh, ww, channels) — so interlace passes of any
        geometry scatter into one canvas before the single final
        conversion."""
        hh = rows.shape[0]
        if color_type == 3:
            return rows[:, :ww] if depth == 8 else _unpack_subbyte(rows, ww)
        if color_type == 0 and depth < 8:
            # spec sample scaling to 8-bit: * 255/(2^depth - 1), an exact
            # integer factor (255, 85, 17) for every legal grey depth
            return _unpack_subbyte(rows, ww) * np.uint8(255 // ((1 << depth) - 1))
        if depth == 16:
            # network byte order: MSB first — keep it (8-bit reduction)
            px = rows.reshape(hh, ww, channels, 2)[:, :, :, 0]
        else:
            px = rows.reshape(hh, ww, channels)
        return px[:, :, 0] if channels == 1 else px

    # Adam7 pass geometry (x0, y0, dx, dy); non-interlaced = one
    # full-frame pass through the same machinery
    passes = (
        [(0, 0, 1, 1)]
        if interlace == 0
        else [
            (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
            (0, 2, 2, 4), (0, 1, 1, 2),
        ]
    )
    if interlace == 1:
        passes.insert(5, (1, 0, 2, 2))  # keep the spec's pass order 1..7
    flat = color_type == 3 or channels == 1
    canvas = np.zeros((h, w) if flat else (h, w, channels), dtype=np.uint8)
    pos = 0
    for x0, y0, dx, dy in passes:
        pw = (w - x0 + dx - 1) // dx
        ph_ = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph_ <= 0:
            continue  # empty pass contributes no bytes, not even filters
        stride = (pw * bits_pp + 7) // 8
        if pos + ph_ * (stride + 1) > len(raw):
            raise ValueError(
                f"PNG pixel payload truncated: need {ph_ * (stride + 1)} more "
                f"bytes at {pos}, have {len(raw) - pos}"
            )
        rows, pos = _unfilter(pos, ph_, stride)
        canvas[y0::dy, x0::dx] = _pass_pixels(rows, pw)
    if pos != len(raw):
        raise ValueError(f"PNG pixel payload {len(raw)} != {pos} consumed")

    out = np.empty((h, w, 4), dtype=np.uint8)
    out[:, :, 3] = 255
    if color_type == 3:
        if int(canvas.max(initial=0)) >= len(plte):
            raise ValueError(
                f"palette index {int(canvas.max())} out of range (PLTE has {len(plte)})"
            )
        out[:, :, :3] = plte[canvas]
        if trns is not None:
            atab = np.full(len(plte), 255, dtype=np.uint8)
            atab[: len(trns)] = np.frombuffer(trns, dtype=np.uint8)
            out[:, :, 3] = atab[canvas]
    elif color_type == 0:
        out[:, :, :3] = canvas[:, :, None]
        if trns is not None:
            v = int.from_bytes(trns, "big")  # sample value in depth range
            if depth < 8:
                v *= 255 // ((1 << depth) - 1)  # match the 8-bit scaling
            elif depth == 16:
                v >>= 8  # high-byte reduction semantics (documented)
            out[:, :, 3] = np.where(canvas == v, 0, 255)
    elif color_type == 2:
        out[:, :, :3] = canvas
        if trns is not None:
            key = np.frombuffer(trns, dtype=">u2").astype(np.int64)
            if depth == 16:
                key >>= 8
            out[:, :, 3] = np.where(
                (canvas == key.astype(np.uint8)).all(axis=2), 0, 255
            )
    elif color_type == 4:  # grey + alpha
        out[:, :, :3] = canvas[:, :, :1]
        out[:, :, 3] = canvas[:, :, 1]
    else:  # color type 6: RGBA
        out[:, :, :] = canvas
    return out


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> HxWx3 uint8 RGB — the flat-image contract every
    3-channel stats/resize path consumes (alpha, when present, is
    decoded but not returned; use :func:`decode_png_rgba` to keep it)."""
    return np.ascontiguousarray(_png_pixels(data)[:, :, :3])


def decode_png_rgba(data: bytes) -> np.ndarray:
    """PNG bytes -> HxWx4 uint8 RGBA.  The alpha plane is a constant
    255 when the image carries no alpha; otherwise it comes from the
    RGBA/grey+alpha channel or the tRNS chunk (see :func:`_png_pixels`)."""
    return _png_pixels(data)


_ADAM7_PASSES = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def encode_png_interlaced(arr: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB -> Adam7-INTERLACED truecolor PNG (interlace
    method 1): each of the spec's seven passes is the sub-image
    ``arr[y0::dy, x0::dx]`` serialized as its own filter-0 scanlines;
    empty passes contribute no bytes.  Exercises the progressive-decode
    layout real encoders emit for web delivery."""
    import zlib

    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError(f"expected HxWx3 uint8 array, got {arr.shape} {arr.dtype}")
    h, w, _ = arr.shape
    parts = []
    for x0, y0, dx, dy in _ADAM7_PASSES:
        sub = arr[y0::dy, x0::dx]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        parts.extend(b"\x00" + sub[r].tobytes() for r in range(sub.shape[0]))

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"".join(parts), 6))
        + chunk(b"IEND", b"")
    )


def encode_png_palette(idx: np.ndarray, palette: np.ndarray, depth: int | None = None) -> bytes:
    """HxW uint8 index array + Nx3 uint8 palette -> color-type-3 PNG.

    ``depth`` None picks the smallest of 1/2/4/8 bits that covers the
    palette; sub-byte depths pack indices MSB-first per scanline with
    zero pad bits (the spec's layout).  Filter-0 scanlines, like
    :func:`encode_png`.
    """
    import zlib

    if idx.ndim != 2 or idx.dtype != np.uint8:
        raise ValueError(f"expected HxW uint8 index array, got {idx.shape} {idx.dtype}")
    if palette.ndim != 2 or palette.shape[1] != 3 or palette.dtype != np.uint8:
        raise ValueError(f"expected Nx3 uint8 palette, got {palette.shape} {palette.dtype}")
    if not 1 <= len(palette) <= 256:
        raise ValueError(f"palette must have 1..256 entries, got {len(palette)}")
    if int(idx.max(initial=0)) >= len(palette):
        raise ValueError("palette index out of range")
    if depth is None:
        depth = next(d for d in (1, 2, 4, 8) if len(palette) <= (1 << d))
    if depth not in (1, 2, 4, 8) or len(palette) > (1 << depth):
        raise ValueError(f"bad palette depth {depth} for {len(palette)} colors")
    h, w = idx.shape
    if depth == 8:
        rows = idx
    else:
        bits = ((idx[:, :, None] >> np.arange(depth - 1, -1, -1)) & 1).astype(np.uint8)
        rows = np.packbits(bits.reshape(h, w * depth), axis=1)  # zero-pads to bytes
    raw = b"".join(b"\x00" + rows[r].tobytes() for r in range(h))

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, depth, 3, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", palette.tobytes())
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def encode_png_indexed(arr: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB -> palette PNG via EXACT palettization (unique
    colors must fit 256 — always true for the <=256-pixel fixture
    images).  Decoding reproduces the input bit-for-bit, so the same
    oracle arithmetic verifies both the truecolor and palette paths."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError(f"expected HxWx3 uint8 array, got {arr.shape} {arr.dtype}")
    h, w, _ = arr.shape
    flat = arr.reshape(-1, 3)
    # pack (r,g,b) into one int and unique THAT (round 13): sorted packed
    # keys == lexicographic row order, so palette and indices are
    # bit-identical to np.unique(flat, axis=0) at ~2x the speed (axis=0
    # unique lexsorts a 2-D view per call — the palette encoder's hot spot
    # at fixture scale, equivalence-pinned in tests/test_codecs.py)
    keys = (
        (flat[:, 0].astype(np.uint32) << 16)
        | (flat[:, 1].astype(np.uint32) << 8)
        | flat[:, 2]
    )
    pkeys, inverse = np.unique(keys, return_inverse=True)
    if len(pkeys) > 256:
        raise ValueError(f"image has {len(pkeys)} unique colors (palette max 256)")
    palette = np.stack(
        [(pkeys >> 16) & 255, (pkeys >> 8) & 255, pkeys & 255], axis=1
    ).astype(np.uint8)
    return encode_png_palette(inverse.reshape(h, w).astype(np.uint8), palette)
