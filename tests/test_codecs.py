"""Dependency-free media codecs (functions/codecs.py) + the multimodal
stages running on REAL payloads — closes the engine's last decode stub
(round-4 verdict item 1).  Reference parity: the reference has no media
codecs at all; this is north-star LLM-pipeline surface."""

import struct

import numpy as np
import pytest

from agile_lakehouse_spark.functions import codecs
from agile_lakehouse_spark.operators import multimodal


def _img(h, w, seed=0):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


def test_bmp_round_trip_exact():
    for h, w in [(1, 1), (3, 5), (8, 8), (17, 13)]:  # 13*3=39 -> row padding engaged
        arr = _img(h, w, seed=h * 100 + w)
        out = codecs.decode_bmp(codecs.encode_bmp(arr))
        assert np.array_equal(out, arr), (h, w)


def test_bmp_top_down_layout():
    arr = _img(4, 4, seed=1)
    data = bytearray(codecs.encode_bmp(arr))
    # flip height sign -> top-down; rows must be reinterpreted, not mirrored
    h = struct.unpack_from("<i", data, 14 + 8)[0]
    struct.pack_into("<i", data, 14 + 8, -h)
    out = codecs.decode_bmp(bytes(data))
    assert np.array_equal(out, codecs.decode_bmp(codecs.encode_bmp(arr))[::-1])


def test_bmp_rejects_unsupported():
    with pytest.raises(ValueError, match="not a BMP"):
        codecs.decode_bmp(b"\x89PNG\r\n" + b"\x00" * 60)
    data = bytearray(codecs.encode_bmp(_img(2, 2)))
    struct.pack_into("<H", data, 14 + 14, 8)  # bpp 24 -> 8
    with pytest.raises(ValueError, match="unsupported BMP"):
        codecs.decode_bmp(bytes(data))
    with pytest.raises(ValueError, match="truncated"):
        codecs.decode_bmp(bytes(codecs.encode_bmp(_img(4, 4)))[:-5])


def test_ppm_round_trip_and_comments():
    arr = _img(2, 3, seed=2)
    assert np.array_equal(codecs.decode_ppm(codecs.encode_ppm(arr)), arr)
    with_comments = b"P6\n# made by hand\n 3 2\n# again\n255\n" + arr.tobytes()
    assert np.array_equal(codecs.decode_ppm(with_comments), arr)
    assert codecs.sniff_image(codecs.encode_ppm(arr)) == "ppm"
    assert codecs.sniff_image(codecs.encode_bmp(arr)) == "bmp"


def test_wav_round_trip_and_chunk_walk():
    rng = np.random.default_rng(3)
    for n in [1, 7, 256, 1001]:  # odd lengths exercise word-alignment padding
        s = rng.integers(-32768, 32768, n).astype(np.int16)
        out, rate = codecs.decode_wav(codecs.encode_wav(s, 8000))
        assert rate == 8000 and np.array_equal(out, s), n
    # a LIST metadata chunk between fmt and data must be skipped
    wav = codecs.encode_wav(np.array([1, -2, 3], dtype=np.int16))
    fmt_chunk, data_chunk = wav[12 : 12 + 24], wav[12 + 24 :]
    lst = struct.pack("<4sI", b"LIST", 4) + b"INFO"
    body = fmt_chunk + lst + data_chunk
    wav2 = struct.pack("<4sI4s", b"RIFF", 4 + len(body), b"WAVE") + body
    out, _ = codecs.decode_wav(wav2)
    assert list(out) == [1, -2, 3]


def test_wav_stereo_takes_channel_zero():
    inter = np.array([10, -10, 20, -20, 30, -30], dtype=np.int16)
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    body = struct.pack("<4sI", b"fmt ", 16) + fmt + struct.pack("<4sI", b"data", 12) + inter.tobytes()
    wav = struct.pack("<4sI4s", b"RIFF", 4 + len(body), b"WAVE") + body
    out, _ = codecs.decode_wav(wav)
    assert list(out) == [10, 20, 30]
    with pytest.raises(ValueError, match="unsupported WAV"):
        bad = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)  # float32 format
        b2 = struct.pack("<4sI", b"fmt ", 16) + bad + struct.pack("<4sI", b"data", 0)
        codecs.decode_wav(struct.pack("<4sI4s", b"RIFF", 4 + len(b2), b"WAVE") + b2)


# --- Spark stages on real payloads -----------------------------------------


def test_image_stats_decodes_real_bmp(spark):
    df = spark.range(5).selectExpr("id AS doc_id")
    media = multimodal.synthesize_bmp_media(df, "doc_id", width=8, height=8)
    out = {r.media_id: r for r in multimodal.image_stats(media).collect()}
    assert len(out) == 5
    for i in range(5):
        j = np.arange(192, dtype=np.int64)
        vals = (i * 31 + j * 7) % 256
        assert out[i].width == 8 and out[i].height == 8 and out[i].n_pixels == 64
        assert out[i].sum_r == int(vals[0::3].sum())
        assert out[i].sum_g == int(vals[1::3].sum())
        assert out[i].sum_b == int(vals[2::3].sum())


def test_resize_real_bmp_picks_exact_source_pixels(spark):
    df = spark.range(3).selectExpr("id AS doc_id")
    media = multimodal.synthesize_bmp_media(df, "doc_id", width=8, height=8)
    resized = multimodal.resize_images(media, width=4, height=4, codec="bmp")
    rows = {r.media_id: r for r in resized.collect()}
    for i in range(3):
        arr = codecs.decode_bmp(bytes(rows[i].payload))
        assert arr.shape == (4, 4, 3)
        j = np.arange(192, dtype=np.int64)
        full = ((i * 31 + j * 7) % 256).astype(np.uint8).reshape(8, 8, 3)
        # nearest-neighbor: src index = dst * 8 // 4 = dst*2
        assert np.array_equal(arr, full[::2, ::2])


def test_audio_frame_energy_real_wav(spark):
    df = spark.range(4).selectExpr("id AS doc_id")
    media = multimodal.synthesize_wav_media(df, "doc_id", n_samples=256)
    frames = multimodal.audio_frame_energy(media, frame_bytes=64, hop_bytes=32, codec="wav")
    got = {(r.media_id, r.frame_idx): r for r in frames.collect()}
    i = np.arange(256, dtype=np.int64)
    for m in range(4):
        s = ((m * 1103515245 + i * 12345) % 65536) - 32768
        for k in range(8):
            chunk = s[k * 32 : k * 32 + 64]
            r = got[(m, k)]
            assert r.n_samples == len(chunk)
            assert r.energy == int((chunk * chunk).sum())
    assert len(got) == 4 * 8


def test_audio_stats_matches_generation(spark):
    df = spark.range(3).selectExpr("id AS doc_id")
    media = multimodal.synthesize_wav_media(df, "doc_id", n_samples=100, sample_rate=8000)
    out = {r.media_id: r for r in multimodal.audio_stats(media).collect()}
    i = np.arange(100, dtype=np.int64)
    for m in range(3):
        s = ((m * 1103515245 + i * 12345) % 65536) - 32768
        assert out[m].n_samples == 100 and out[m].sample_rate == 8000
        assert out[m].energy == int((s * s).sum())
        assert out[m].max_abs == int(np.abs(s).max())


# --- PNG (round 5: first COMPRESSED container) ------------------------------


def _png_chunk(tag, body):
    import struct
    import zlib

    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _build_png(w, h, color_type, rows_filtered, split_idat=False):
    """Assemble a PNG from pre-filtered scanlines — INDEPENDENT of the
    encoder under test (spec arithmetic lives in the test)."""
    import struct
    import zlib

    raw = b"".join(rows_filtered)
    comp = zlib.compress(raw)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    if split_idat:
        mid = len(comp) // 2
        idat = _png_chunk(b"IDAT", comp[:mid]) + _png_chunk(b"IDAT", comp[mid:])
    else:
        idat = _png_chunk(b"IDAT", comp)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + idat
        + _png_chunk(b"IEND", b"")
    )


def test_png_round_trip_exact():
    rng = np.random.default_rng(5)
    arr = rng.integers(0, 256, (13, 9, 3), dtype=np.uint8)
    assert (codecs.decode_png(codecs.encode_png(arr)) == arr).all()
    # magic sniff routes through decode_image too
    assert codecs.sniff_image(codecs.encode_png(arr)) == "png"
    assert (codecs.decode_image(codecs.encode_png(arr)) == arr).all()


def test_png_all_five_filters_decode():
    """Foreign-encoder filters: rows filtered per the spec's own
    definitions (computed here, not by the codec) must reconstruct the
    original pixels exactly — Sub, Up, Average, Paeth and None."""
    rng = np.random.default_rng(11)
    arr = rng.integers(0, 256, (5, 4, 3), dtype=np.uint8)
    bpp = 3
    rows = []
    prev = np.zeros(4 * 3, dtype=np.int64)
    for r, ft in enumerate([0, 1, 2, 3, 4]):
        cur = arr[r].reshape(-1).astype(np.int64)
        filt = np.empty_like(cur)
        for x in range(cur.size):
            a = int(cur[x - bpp]) if x >= bpp else 0  # recon left (cur IS recon)
            b = int(prev[x])
            c = int(prev[x - bpp]) if x >= bpp else 0
            if ft == 0:
                filt[x] = cur[x]
            elif ft == 1:
                filt[x] = (cur[x] - a) % 256
            elif ft == 2:
                filt[x] = (cur[x] - b) % 256
            elif ft == 3:
                filt[x] = (cur[x] - ((a + b) >> 1)) % 256
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                filt[x] = (cur[x] - pr) % 256
        rows.append(bytes([ft]) + bytes(filt.astype(np.uint8)))
        prev = cur
    png = _build_png(4, 5, 2, rows, split_idat=True)  # + multi-IDAT reassembly
    assert (codecs.decode_png(png) == arr).all()


def test_png_gray_and_rgba_color_types():
    g = np.arange(12, dtype=np.uint8).reshape(3, 4)
    rows = [b"\x00" + bytes(g[r]) for r in range(3)]
    out = codecs.decode_png(_build_png(4, 3, 0, rows))
    assert out.shape == (3, 4, 3) and (out[:, :, 0] == g).all() and (out[:, :, 2] == g).all()
    rgba = np.arange(48, dtype=np.uint8).reshape(3, 4, 4)
    rows = [b"\x00" + bytes(rgba[r].reshape(-1)) for r in range(3)]
    out = codecs.decode_png(_build_png(4, 3, 6, rows))
    assert out.shape == (3, 4, 3) and (out == rgba[:, :, :3]).all()


def test_png_adversarial_payloads():
    import struct
    import zlib

    arr = np.zeros((2, 2, 3), dtype=np.uint8)
    good = codecs.encode_png(arr)
    # corrupt one IDAT payload byte -> CRC check must catch it
    bad = bytearray(good)
    idat_at = good.index(b"IDAT")
    bad[idat_at + 5] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        codecs.decode_png(bytes(bad))
    with pytest.raises(ValueError, match="not a PNG"):
        codecs.decode_png(b"\x89PNX" + good[4:])
    # interlaced 2x2 RGB: passes 1 (1x1), 6 (1x1), 7 (2x1) = 4+4+7 bytes;
    # a 14-byte stream (the pre-round-7 fixture) is one byte short and
    # must raise, and the correctly sized all-zero stream must decode
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 14))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="payload"):
        codecs.decode_png(png)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 15))
        + _png_chunk(b"IEND", b"")
    )
    assert np.array_equal(codecs.decode_png(png), np.zeros((2, 2, 3), np.uint8))
    # unknown interlace method still raises
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 2)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 15))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="interlace"):
        codecs.decode_png(png)
    # palette PNG without its PLTE table must raise (palette itself is
    # supported since round 7 - see test_png_palette_* below)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 6))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="PLTE"):
        codecs.decode_png(png)
    # a genuinely unknown color type still raises
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 5, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 6))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="color type"):
        codecs.decode_png(png)
    # truncated pixel payload must raise, not wrap
    rows = [b"\x00" + b"\x01" * 6]
    png = _build_png(2, 2, 2, rows)  # h=2 declared, 1 row supplied
    with pytest.raises(ValueError, match="payload"):
        codecs.decode_png(png)


def _build_png2(w, h, depth, color_type, rows_filtered, plte=None):
    """Like _build_png but with explicit bit depth and optional PLTE —
    spec arithmetic stays in the test, independent of the encoder."""
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _png_chunk(b"PLTE", plte)
    out += _png_chunk(b"IDAT", zlib.compress(b"".join(rows_filtered)))
    return out + _png_chunk(b"IEND", b"")


def test_png_palette_roundtrip_all_depths():
    """Palette round-trip at every legal depth, including widths that
    leave pad bits in the packed scanline (w=5 at depth 4 -> half a
    trailing byte; w=5 at depth 2 -> 6 pad bits)."""
    rng = np.random.default_rng(7)
    for depth in (1, 2, 4, 8):
        n_colors = 1 << depth
        palette = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
        for w in (5, 8):
            idx = rng.integers(0, n_colors, (4, w), dtype=np.uint8)
            png = codecs.encode_png_palette(idx, palette, depth=depth)
            got = codecs.decode_png(png)
            assert got.shape == (4, w, 3)
            assert np.array_equal(got, palette[idx])


def test_png_indexed_equals_truecolor():
    """encode_png_indexed (exact palettization) must decode to the SAME
    RGB as the truecolor encoder — the dq172b invariant."""
    j = np.arange(8 * 8 * 3, dtype=np.int64)
    for doc_id in (0, 7, 123):
        arr = ((doc_id * 31 + j * 7) % 256).astype(np.uint8).reshape(8, 8, 3)
        assert np.array_equal(
            codecs.decode_png(codecs.encode_png_indexed(arr)),
            codecs.decode_png(codecs.encode_png(arr)),
        )


def test_png_palette_foreign_filters():
    """A foreign encoder may filter palette scanlines (bpp=1): hand-build
    Sub and Up rows and check the reconstruction against spec arithmetic
    computed HERE, not by the codec."""
    palette = np.arange(256 * 3, dtype=np.int64).astype(np.uint8).reshape(256, 3)
    r0 = np.array([10, 250, 7, 99], dtype=np.uint8)  # filter 0: raw
    r1_recon = (np.cumsum(np.array([5, 251, 3, 130], dtype=np.int64)) & 0xFF).astype(np.uint8)
    r2_recon = ((r1_recon.astype(np.int64) + np.array([1, 2, 253, 4])) & 0xFF).astype(np.uint8)
    rows = [
        b"\x00" + r0.tobytes(),
        b"\x01" + bytes([5, 251, 3, 130]),  # Sub on row of 4 single-byte pixels
        b"\x02" + bytes([1, 2, 253, 4]),  # Up against r1's reconstruction
    ]
    png = _build_png2(4, 3, 8, 3, rows, plte=palette.tobytes())
    got = codecs.decode_png(png)
    assert np.array_equal(got[0], palette[r0])
    assert np.array_equal(got[1], palette[r1_recon])
    assert np.array_equal(got[2], palette[r2_recon])


def test_png_palette_index_out_of_range():
    plte = bytes(range(48))  # 16 palette entries
    rows = [b"\x00" + bytes([3, 16])]  # index 16 >= 16 entries
    png = _build_png2(2, 1, 8, 3, rows, plte=plte)
    with pytest.raises(ValueError, match="out of range"):
        codecs.decode_png(png)


def test_png_16bit_high_byte_reduction():
    """16-bit grey and RGB decode to the sample's high byte (MSB-first
    network order) — values chosen so low/high bytes differ."""
    # grey 2x2: samples 0x1234 0xFF01 / 0x00FF 0x8080
    rows = [
        b"\x00" + bytes([0x12, 0x34, 0xFF, 0x01]),
        b"\x00" + bytes([0x00, 0xFF, 0x80, 0x80]),
    ]
    got = codecs.decode_png(_build_png2(2, 2, 16, 0, rows))
    expect = np.array([[0x12, 0xFF], [0x00, 0x80]], dtype=np.uint8)
    assert np.array_equal(got, np.repeat(expect[:, :, None], 3, axis=2))
    # RGB 1x2 with an Up-filtered second row (bpp=6)
    r0 = bytes([0x01, 0xAA, 0x02, 0xBB, 0x03, 0xCC])
    rows = [b"\x00" + r0, b"\x02" + bytes([0x10, 0x00, 0x20, 0x00, 0x30, 0x00])]
    got = codecs.decode_png(_build_png2(1, 2, 16, 2, rows))
    assert got.shape == (2, 1, 3)
    assert np.array_equal(got[0, 0], [0x01, 0x02, 0x03])
    assert np.array_equal(got[1, 0], [0x11, 0x22, 0x33])


def test_png_grey_subbyte_depths():
    """Grey depths 1/2/4 decode with the spec's exact 255/(2^d-1)
    scaling; widths chosen to leave pad bits; one Up-filtered row checks
    the bpp=1 filter path under packed samples.  All expectations are
    spec arithmetic computed here, not by the codec."""
    # depth 4, w=3 (half-byte pad): row0 raw [15, 0, 9], row1 = Up over it
    rows = [b"\x00" + bytes([0xF0, 0x90]), b"\x02" + bytes([0x11, 0x20])]
    got = codecs.decode_png(_build_png2(3, 2, 4, 0, rows))
    # row1 recon bytes: (0x11+0xF0)&0xFF=0x01, (0x20+0x90)&0xFF=0xB0 -> [0,1,11]
    expect = np.array([[255, 0, 153], [0, 17, 187]], dtype=np.uint8)
    assert np.array_equal(got, np.repeat(expect[:, :, None], 3, axis=2))
    # depth 1, w=10 (6 pad bits): [1,0,1,1,0,0,1,0,1,1] -> 0xB2 0xC0
    got = codecs.decode_png(_build_png2(10, 1, 1, 0, [b"\x00" + bytes([0xB2, 0xC0])]))
    expect = (np.array([[1, 0, 1, 1, 0, 0, 1, 0, 1, 1]], dtype=np.uint8) * 255)
    assert np.array_equal(got, np.repeat(expect[:, :, None], 3, axis=2))
    # depth 2, w=5: [3,0,1,2,3] -> 0xC6 0xC0, scale x85
    got = codecs.decode_png(_build_png2(5, 1, 2, 0, [b"\x00" + bytes([0xC6, 0xC0])]))
    expect = np.array([[255, 0, 85, 170, 255]], dtype=np.uint8)
    assert np.array_equal(got, np.repeat(expect[:, :, None], 3, axis=2))
    # an illegal grey depth still raises
    with pytest.raises(ValueError, match="bad greyscale"):
        codecs.decode_png(_build_png2(2, 1, 3, 0, [b"\x00\x00"]))


_ADAM7 = [  # the spec's pass table, written here independently
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _interlace_png(img, depth, color_type, plte=None):
    """Assemble an Adam7 PNG from a full image using the SPEC's pass
    table (spelled here, independent of the decoder): slice each pass,
    pack its scanlines per pass (sub-byte pads are per-scanline), Up-
    filter every row after a pass's first (checking both the per-pass
    prev reset and filtering across pass-local rows), filter-0 first
    rows."""
    import zlib

    h, w = img.shape[:2]
    parts = []
    for x0, y0, dx, dy in _ADAM7:
        sub = img[y0::dy, x0::dx]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        prev_raw = None
        for r in range(sub.shape[0]):
            if depth == 8:
                rowbytes = sub[r].tobytes()
            else:  # pack sub-byte samples MSB-first
                bits = ((sub[r][:, None] >> np.arange(depth - 1, -1, -1)) & 1).astype(np.uint8)
                rowbytes = np.packbits(bits.reshape(-1)).tobytes()
            if prev_raw is None:
                parts.append(b"\x00" + rowbytes)
            else:
                diff = (
                    np.frombuffer(rowbytes, np.uint8).astype(np.int64)
                    - np.frombuffer(prev_raw, np.uint8).astype(np.int64)
                ) & 0xFF
                parts.append(b"\x02" + diff.astype(np.uint8).tobytes())
            prev_raw = rowbytes
    stream = b"".join(parts)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, 1)
    out = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _png_chunk(b"PLTE", plte)
    out += _png_chunk(b"IDAT", zlib.compress(stream))
    return out + _png_chunk(b"IEND", b"")


def test_png_adam7_rgb_roundtrip():
    """Interlaced RGB decode == the original image for sizes that hit
    empty passes (2x2), partial passes (5x7), and all seven (9x10)."""
    rng = np.random.default_rng(11)
    for h, w in ((2, 2), (5, 7), (9, 10), (1, 1), (1, 9), (8, 1)):
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        got = codecs.decode_png(_interlace_png(img, 8, 2))
        assert np.array_equal(got, img), (h, w)


def test_png_adam7_palette4_roundtrip():
    """Interlaced palette-4: sub-byte packing happens PER PASS (each
    pass's scanlines pad independently), then PLTE lookup once."""
    rng = np.random.default_rng(13)
    palette = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (7, 5), dtype=np.uint8)
    got = codecs.decode_png(_interlace_png(idx, 4, 3, plte=palette.tobytes()))
    assert np.array_equal(got, palette[idx])


def test_png_interlaced_encoder_roundtrip():
    """The shipped interlaced encoder (filter-0 passes) must decode to
    the original image and match the spec-table test builder's layout."""
    rng = np.random.default_rng(17)
    for h, w in ((8, 8), (5, 7), (1, 3)):
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert np.array_equal(codecs.decode_png(codecs.encode_png_interlaced(img)), img)


def test_png_plte_ordering_strictness():
    """Spec ordering rules (W3C PNG 5.6): at most one PLTE, and it must
    precede the first IDAT.  The decoder's contract is to raise loudly
    on malformed input, not let the last/late palette silently win."""
    import struct
    import zlib

    plte = bytes(range(12))  # 4 colors
    rows = [b"\x00" + b"\x01\x02"] * 2  # 2x2 depth-8 palette rows
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    idat = _png_chunk(b"IDAT", zlib.compress(b"".join(rows)))
    sig = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
    # duplicate PLTE
    png = sig + _png_chunk(b"PLTE", plte) + _png_chunk(b"PLTE", plte) + idat + _png_chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="duplicate PLTE"):
        codecs.decode_png(png)
    # PLTE after the first IDAT
    png = sig + idat + _png_chunk(b"PLTE", plte) + _png_chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="PLTE chunk after IDAT"):
        codecs.decode_png(png)
    # well-ordered control decodes
    png = sig + _png_chunk(b"PLTE", plte) + idat + _png_chunk(b"IEND", b"")
    assert codecs.decode_png(png).shape == (2, 2, 3)


def test_png_rgba_roundtrip_and_alpha_retention():
    """Round 8: alpha is decoded, not dropped.  RGBA (type 6) round-trips
    through decode_png_rgba; decode_png keeps its HxWx3 contract on the
    same payload; alpha-free containers yield a constant-255 plane."""
    rng = np.random.default_rng(88)
    a = rng.integers(0, 256, (9, 6, 4), dtype=np.uint8)
    png = codecs.encode_png_rgba(a)
    assert (codecs.decode_png_rgba(png) == a).all()
    assert (codecs.decode_png(png) == a[:, :, :3]).all()
    assert (codecs.decode_image_rgba(png) == a).all()
    rgb = rng.integers(0, 256, (4, 5, 3), dtype=np.uint8)
    for payload in (codecs.encode_png(rgb), codecs.encode_bmp(rgb), codecs.encode_ppm(rgb)):
        out = codecs.decode_image_rgba(payload)
        assert (out[:, :, :3] == rgb).all() and (out[:, :, 3] == 255).all()


def test_png_grey_alpha_decode():
    """Color type 4 (grey+alpha), built spec-side in the test: grey
    expands to RGB, the second channel becomes the alpha plane."""
    import struct
    import zlib

    rng = np.random.default_rng(4)
    ga = rng.integers(0, 256, (3, 4, 2), dtype=np.uint8)
    rows = [b"\x00" + ga[r].tobytes() for r in range(3)]
    ihdr = struct.pack(">IIBBBBB", 4, 3, 8, 4, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + _png_chunk(b"IEND", b"")
    )
    out = codecs.decode_png_rgba(png)
    assert out.shape == (3, 4, 4)
    for c in range(3):
        assert (out[:, :, c] == ga[:, :, 0]).all()
    assert (out[:, :, 3] == ga[:, :, 1]).all()
    # the RGB contract still holds on the same payload
    assert (codecs.decode_png(png) == np.repeat(ga[:, :, :1], 3, axis=2)).all()


def test_png_trns_palette_grey_truecolor():
    """tRNS semantics per layout: per-entry palette alpha (missing
    entries opaque), single transparent sample value for grey and
    truecolor, and the spec's forbidden/ordering rules raise."""
    import struct
    import zlib

    # palette: 3 colors, tRNS covers only the first 2
    plte = bytes([10, 20, 30, 40, 50, 60, 70, 80, 90])
    trns = bytes([0, 128])
    idx = np.array([[0, 1, 2, 1]], dtype=np.uint8)
    rows = [b"\x00" + idx[0].tobytes()]
    ihdr = struct.pack(">IIBBBBB", 4, 1, 8, 3, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", plte)
        + _png_chunk(b"tRNS", trns)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + _png_chunk(b"IEND", b"")
    )
    out = codecs.decode_png_rgba(png)
    assert out[0, :, 3].tolist() == [0, 128, 255, 128]
    assert out[0, 0, :3].tolist() == [10, 20, 30]
    # grey depth 8: sample value 7 transparent, everything else opaque
    g = np.array([[7, 8, 7]], dtype=np.uint8)
    ihdr = struct.pack(">IIBBBBB", 3, 1, 8, 0, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"tRNS", struct.pack(">H", 7))
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" + g[0].tobytes()))
        + _png_chunk(b"IEND", b"")
    )
    out = codecs.decode_png_rgba(png)
    assert out[0, :, 3].tolist() == [0, 255, 0]
    assert (out[0, :, 0] == g[0]).all()
    # grey depth 2: tRNS value is in DEPTH range; scaling factor 85 applies
    g2 = np.array([[0b01_10_01_11]], dtype=np.uint8)  # samples 1,2,1,3
    ihdr = struct.pack(">IIBBBBB", 4, 1, 2, 0, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"tRNS", struct.pack(">H", 2))
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" + g2[0].tobytes()))
        + _png_chunk(b"IEND", b"")
    )
    out = codecs.decode_png_rgba(png)
    assert out[0, :, 0].tolist() == [85, 170, 85, 255]
    assert out[0, :, 3].tolist() == [255, 0, 255, 255]
    # truecolor: one transparent RGB key
    px = np.array([[[1, 2, 3], [9, 9, 9], [1, 2, 3]]], dtype=np.uint8)
    ihdr = struct.pack(">IIBBBBB", 3, 1, 8, 2, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"tRNS", struct.pack(">HHH", 1, 2, 3))
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" + px[0].tobytes()))
        + _png_chunk(b"IEND", b"")
    )
    out = codecs.decode_png_rgba(png)
    assert out[0, :, 3].tolist() == [0, 255, 0]
    # forbidden: tRNS with a full alpha channel (types 4 and 6)
    rgba = np.zeros((1, 1, 4), dtype=np.uint8)
    body = codecs.encode_png_rgba(rgba)
    sig, rest = body[:8], body[8:]
    ihdr_chunk = rest[: 12 + 13]
    bad = sig + ihdr_chunk + _png_chunk(b"tRNS", b"\x00") + rest[12 + 13 :]
    with pytest.raises(ValueError, match="forbidden"):
        codecs.decode_png_rgba(bad)
    # ordering: tRNS after IDAT raises; duplicate tRNS raises
    g = np.array([[5]], dtype=np.uint8)
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0)
    idat = _png_chunk(b"IDAT", zlib.compress(b"\x00" + g[0].tobytes()))
    sig = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
    with pytest.raises(ValueError, match="tRNS chunk after IDAT"):
        codecs.decode_png_rgba(sig + idat + _png_chunk(b"tRNS", struct.pack(">H", 5)) + _png_chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="duplicate tRNS"):
        codecs.decode_png_rgba(
            sig
            + _png_chunk(b"tRNS", struct.pack(">H", 5))
            + _png_chunk(b"tRNS", struct.pack(">H", 5))
            + idat
            + _png_chunk(b"IEND", b"")
        )


def test_png_trns_16bit_high_byte_semantics():
    """At depth 16 samples reduce to their high byte, so the tRNS match
    key does too (documented semantics, pinned here): a 16-bit grey
    whose high byte equals the key's high byte is transparent."""
    import struct
    import zlib

    # two 16-bit grey samples: 0x0102 and 0x0203; tRNS key 0x0101
    raw = b"\x00" + struct.pack(">HH", 0x0102, 0x0203)
    ihdr = struct.pack(">IIBBBBB", 2, 1, 16, 0, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"tRNS", struct.pack(">H", 0x0101))
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    out = codecs.decode_png_rgba(png)
    assert out[0, :, 0].tolist() == [0x01, 0x02]
    assert out[0, :, 3].tolist() == [0, 255]


def test_image_stats_rgba_spark_paths(spark):
    """The Spark surface of the alpha retention: png_rgba containers
    reproduce the 4-channel generation rule exactly; alpha-free BMP
    payloads through the SAME operator yield sum_a == 255 * n_pixels."""
    df = spark.range(4).selectExpr("id AS doc_id")
    media = multimodal.synthesize_image_media(df, "doc_id", container="png_rgba")
    out = {r.media_id: r for r in multimodal.image_stats_rgba(media).collect()}
    for i in range(4):
        sums = [0, 0, 0, 0]
        for j in range(8 * 8 * 4):
            sums[j % 4] += (i * 31 + j * 7) % 256
        r = out[i]
        assert (r.sum_r, r.sum_g, r.sum_b, r.sum_a) == tuple(sums)
        assert r.n_pixels == 64
    bmp = multimodal.synthesize_image_media(df, "doc_id", container="bmp")
    for r in multimodal.image_stats_rgba(bmp).collect():
        assert r.sum_a == 255 * r.n_pixels


def test_png_adam7_rgba_roundtrip():
    """Interlace x alpha interaction: a color-type-6 Adam7 PNG built
    spec-side (seven passes, filter-0 rows of the 4-channel sub-images)
    must reconstruct pixels AND alpha exactly through the shared
    pass/unfilter/scatter machinery."""
    import struct
    import zlib

    rng = np.random.default_rng(67)
    for h, w in ((8, 8), (5, 7), (3, 2)):
        img = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
        parts = []
        for x0, y0, dx, dy in codecs._ADAM7_PASSES:
            sub = img[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            parts.extend(b"\x00" + sub[r].tobytes() for r in range(sub.shape[0]))
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 1)
        png = (
            b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(b"".join(parts)))
            + _png_chunk(b"IEND", b"")
        )
        assert (codecs.decode_png_rgba(png) == img).all(), (h, w)
        assert (codecs.decode_png(png) == img[:, :, :3]).all()
