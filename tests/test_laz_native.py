"""Vendored LASzip codec (sources/laz_ac.py + sources/laz_native.py).

Round-trip exactness (encode -> decode identity) over adversarial
clouds, chunk-table/VLR layout conformance, and the Spark ingest +
DataSource paths on real compressed files.  Cross-decoder conformance
needs a second LAZ implementation — absent here; the laspy-gated branch
in ``test_laz_gated.py`` covers it wherever laspy exists.
Reference: ``pc-io/src/las/source.rs:49-208`` (LAZ chunk table decode).
"""

import struct

import numpy as np
import pytest

from agile_lakehouse_spark.sources import las_native, laz_native
from agile_lakehouse_spark.sources.laz_ac import (
    ArithmeticDecoder,
    ArithmeticEncoder,
    ArithmeticModel,
    IntegerCompressor,
)


def _cloud(n, seed=3, smooth=False):
    rng = np.random.default_rng(seed)
    if smooth:  # scan-line-like: small deltas, the predictor's design case
        x = np.cumsum(rng.integers(-40, 60, n)) / 100.0 + 500
        y = np.cumsum(rng.integers(-10, 12, n)) / 100.0
        z = 50 + np.cumsum(rng.integers(-5, 6, n)) / 100.0
    else:
        x = rng.uniform(0, 1000, n)
        y = rng.uniform(-500, 500, n)
        z = rng.uniform(0, 100, n)
    return {
        "x": x, "y": y, "z": z,
        "intensity": rng.integers(0, 65536, n),
        "classification": rng.integers(0, 32, n),
        "return_byte": np.where(rng.random(n) < 0.7, 0x09, 0x0A | (rng.integers(1, 3, n) << 3)),
        "scan_angle_rank": rng.integers(-90, 91, n),
        "user_data": rng.integers(0, 256, n),
        "point_source_id": rng.integers(0, 2000, n),
    }


def _grid(vals, scale, off):
    return np.round((np.asarray(vals) - off) / scale).astype(np.int64)


def test_arithmetic_model_stays_in_15bit_budget():
    # regression: an undercounted first update overflowed the distribution
    m = ArithmeticModel(33)
    assert all(d < (1 << 15) for d in m.distribution)


def test_integer_compressor_all_k_paths():
    import random

    rng = random.Random(9)
    enc = ArithmeticEncoder()
    ic = IntegerCompressor(32, 1)
    # force every k bucket: values at each power-of-two magnitude, both signs
    seq = [0, 1]
    for k in range(1, 32):
        seq += [1 << (k - 1), (1 << k) - 1, -(1 << (k - 1)), -((1 << k) - 1)]
    seq = [max(min(v, 2**31 - 1), -(2**31)) for v in seq]
    seq += [rng.randrange(-2**31, 2**31) for _ in range(2000)]
    pred = 0
    for v in seq:
        ic.compress(enc, pred, v)
        pred = v
    dec = ArithmeticDecoder(enc.done())
    ic2 = IntegerCompressor(32, 1)
    pred = 0
    for v in seq:
        pred = ic2.decompress(dec, pred)
        assert pred == v


@pytest.mark.parametrize("smooth", [False, True])
def test_laz_round_trip(tmp_path, smooth):
    n = 7000
    cols = _cloud(n, smooth=smooth)
    path = str(tmp_path / "t.laz")
    laz_native.write_laz(path, cols, chunk_size=3000)  # 3 chunks, ragged tail
    info = laz_native.read_laz_info(path)
    assert info.n_points == n and info.chunk_points == [3000, 3000, 1000]
    out = laz_native.decode_laz_points(path, raw=True)
    assert np.array_equal(out["x"], _grid(cols["x"], info.scales[0], info.offsets[0]))
    assert np.array_equal(out["y"], _grid(cols["y"], info.scales[1], info.offsets[1]))
    assert np.array_equal(out["z"], _grid(cols["z"], info.scales[2], info.offsets[2]))
    for c in ("intensity", "classification"):
        assert np.array_equal(out[c], cols[c])
    # smooth clouds must compress materially better than raw
    if smooth:
        import os

        assert os.path.getsize(path) < 0.65 * (n * 20)


def test_laz_chunk_decode_matches_full(tmp_path):
    cols = _cloud(5000, seed=5)
    path = str(tmp_path / "c.laz")
    laz_native.write_laz(path, cols, chunk_size=2000)
    info = laz_native.read_laz_info(path)
    full = laz_native.decode_laz_points(path, raw=True)
    off = 0
    for i, cnt in enumerate(info.chunk_points):
        part = laz_native.decode_laz_chunk(path, info, i, raw=True)
        assert np.array_equal(part["x"], full["x"][off : off + cnt])
        assert np.array_equal(part["intensity"], full["intensity"][off : off + cnt])
        off += cnt


def test_laz_adversarial_payloads(tmp_path):
    # constant cloud, single point, extreme grid values, empty
    p = str(tmp_path / "a.laz")
    one = {k: np.array([v]) for k, v in
           {"x": 1.5, "y": -2.5, "z": 3.5, "intensity": 65535, "classification": 31,
            "return_byte": 0x0A, "scan_angle_rank": -90, "user_data": 255,
            "point_source_id": 65535}.items()}
    laz_native.write_laz(p, one)
    out = laz_native.decode_laz_points(p)
    assert out["intensity"][0] == 65535 and len(out["x"]) == 1

    const = {k: np.repeat(v, 500) for k, v in
             {"x": 10.0, "y": 10.0, "z": 10.0, "intensity": 7, "classification": 2,
              "return_byte": 0x09, "scan_angle_rank": 5, "user_data": 1,
              "point_source_id": 3}.items()}
    laz_native.write_laz(p, const, chunk_size=200)
    out = laz_native.decode_laz_points(p, raw=True)
    assert len(set(out["x"])) == 1 and len(out["x"]) == 500

    rng = np.random.default_rng(11)
    ext = _cloud(300, seed=12)
    ext["x"][:5] = [0.0, 2147.4, -2147.4, 1000.0, -1000.0]  # near i32 grid edges at mm scale
    laz_native.write_laz(p, ext, scales=(0.001, 0.001, 0.001))
    out = laz_native.decode_laz_points(p, raw=True)
    assert np.array_equal(out["x"], _grid(ext["x"], 0.001, 0.0))

    with pytest.raises(ValueError, match="overflows"):
        bad = dict(ext)
        bad["x"] = np.array([1e7] * 300)  # 1e10 grid units at mm scale
        laz_native.write_laz(p, bad)


def test_laz_header_and_vlr_layout(tmp_path):
    cols = _cloud(1000, seed=6)
    path = str(tmp_path / "h.laz")
    laz_native.write_laz(path, cols)
    hdr = las_native.read_header(path)
    assert hdr.compressed is True and hdr.point_format == 0
    assert hdr.n_points == 1000 and hdr.record_len == 20
    # exact quantized bounds stamped
    gx = _grid(cols["x"], hdr.scales[0], hdr.offsets[0]) * hdr.scales[0] + hdr.offsets[0]
    assert hdr.mins[0] == gx.min() and hdr.maxs[0] == gx.max()
    # VLR record: laszip encoded / 22204 / compressor 2 / POINT10 v2
    raw = open(path, "rb").read()
    hdr_size = struct.unpack_from("<H", raw, 94)[0]
    _res, user, rec, length, _d = struct.unpack_from("<H16sHH32s", raw, hdr_size)
    assert user.rstrip(b"\x00") == b"laszip encoded" and rec == 22204
    vlr = laz_native.parse_laszip_vlr(raw[hdr_size + 54 : hdr_size + 54 + length])
    assert vlr["compressor"] == 2 and vlr["coder"] == 0
    assert vlr["items"] == [{"type": 6, "size": 20, "version": 2}]
    # chunk table offset points into the file
    table_off = struct.unpack_from("<q", raw, hdr.offset_to_points)[0]
    assert hdr.offset_to_points + 8 < table_off <= len(raw)
    sizes = laz_native.read_chunk_table(raw, table_off)
    assert sum(sizes) == table_off - hdr.offset_to_points - 8


def test_laz_spark_ingest_and_datasource(spark, tmp_path):
    from agile_lakehouse_spark.sources.las import ingest_las, plan_chunks_for_file
    from agile_lakehouse_spark.sources.las_datasource import LasDataSource

    cols = _cloud(4000, seed=8)
    path = str(tmp_path / "s.laz")
    laz_native.write_laz(path, cols, chunk_size=1500)
    plans = plan_chunks_for_file(path)
    assert [(p.offset, p.count) for p in plans] == [(0, 1500), (1500, 1500), (3000, 1000)]
    df = ingest_las(spark, plans)  # auto-selects the native LAZ decoder
    assert df.count() == 4000
    got = sorted(round(r.x, 3) for r in df.collect())
    info = laz_native.read_laz_info(path)
    want = sorted(np.round(_grid(cols["x"], info.scales[0], info.offsets[0]) * info.scales[0], 3))
    assert got == [float(w) for w in want]

    spark.dataSource.register(LasDataSource)
    back = spark.read.format("las").load(path)
    assert back.rdd.getNumPartitions() == 3  # REAL chunk table fan-out
    assert back.count() == 4000


# --- point formats 1-3: GPSTIME11 v2 + RGB12 v2 ------------------------------


def _gps_scanlines(n, seed=21):
    """Adversarial gps stream: regular ticks, exact repeats, negative
    rollbacks, occasional huge jumps, and two interleaved scanner
    sequences — every branch of the multi-sequence coder."""
    rng = np.random.default_rng(seed)
    a = np.cumsum(rng.choice([0.0, 1e-4, 1e-4, 5e-4, -2e-4], n)) + 1e5
    b = np.cumsum(np.full(n, 3e-4)) + 9e5  # second scanner, far away in time
    take_b = rng.random(n) < 0.3
    out = np.where(take_b, b, a)
    out[rng.random(n) < 0.01] *= 1e3  # full 64-bit jumps
    return out


def test_laz_format1_gpstime_roundtrip(tmp_path):
    n = 6000
    cols = _cloud(n, seed=20, smooth=True)
    cols["gps_time"] = _gps_scanlines(n)
    p = str(tmp_path / "f1.laz")
    laz_native.write_laz(p, cols, chunk_size=2500, point_format=1)
    hdr = las_native.read_header(p)
    assert hdr.point_format == 1 and hdr.record_len == 28
    out = laz_native.decode_laz_points(p)
    assert np.array_equal(out["gps_time"], cols["gps_time"])  # bit-exact
    # regular ticks should compress far below the 8 raw bytes/point
    import os

    assert os.path.getsize(p) < 0.75 * n * 28


def test_laz_format2_rgb_roundtrip(tmp_path):
    n = 4000
    rng = np.random.default_rng(22)
    cols = _cloud(n, seed=22)
    # mix grayscale (r==g==b, the sym&64-clear path), slow ramps, and noise
    gray = rng.integers(0, 65536, n)
    ramp = (np.arange(n) * 7) % 65536
    noise = rng.integers(0, 65536, n)
    pick = rng.integers(0, 3, n)
    cols["red"] = np.select([pick == 0, pick == 1], [gray, ramp], noise)
    cols["green"] = np.select([pick == 0, pick == 1], [gray, ramp + 3], rng.integers(0, 65536, n))
    cols["blue"] = np.select([pick == 0, pick == 1], [gray, ramp + 250], rng.integers(0, 65536, n))
    p = str(tmp_path / "f2.laz")
    laz_native.write_laz(p, cols, chunk_size=1700, point_format=2)
    hdr = las_native.read_header(p)
    assert hdr.point_format == 2 and hdr.record_len == 26
    out = laz_native.decode_laz_points(p)
    for c in ("red", "green", "blue"):
        assert np.array_equal(out[c], cols[c]), c


def test_laz_format3_full_roundtrip_and_vlr(tmp_path):
    n = 5000
    cols = _cloud(n, seed=23)
    cols["gps_time"] = _gps_scanlines(n, seed=24)
    rng = np.random.default_rng(25)
    for c in ("red", "green", "blue"):
        cols[c] = rng.integers(0, 65536, n)
    p = str(tmp_path / "f3.laz")
    laz_native.write_laz(p, cols, chunk_size=2100, point_format=3)
    hdr = las_native.read_header(p)
    assert hdr.point_format == 3 and hdr.record_len == 34
    raw = open(p, "rb").read()
    hdr_size = struct.unpack_from("<H", raw, 94)[0]
    _res, _user, _rec, length, _d = struct.unpack_from("<H16sHH32s", raw, hdr_size)
    vlr = laz_native.parse_laszip_vlr(raw[hdr_size + 54 : hdr_size + 54 + length])
    assert vlr["items"] == [
        {"type": 6, "size": 20, "version": 2},
        {"type": 7, "size": 8, "version": 2},
        {"type": 8, "size": 6, "version": 2},
    ]
    out = laz_native.decode_laz_points(p)
    assert np.array_equal(out["gps_time"], cols["gps_time"])
    for c in ("red", "green", "blue"):
        assert np.array_equal(out[c], cols[c])
    # chunked == full decode on the extended items too
    info = laz_native.read_laz_info(p)
    off = 0
    for i, cnt in enumerate(info.chunk_points):
        part = laz_native.decode_laz_chunk(p, info, i)
        assert np.array_equal(part["gps_time"], out["gps_time"][off : off + cnt])
        assert np.array_equal(part["blue"], out["blue"][off : off + cnt])
        off += cnt


def test_laz_gpstime_edge_streams(tmp_path):
    """Branch-targeted gps streams: all-constant (0diff unchanged), pure
    arithmetic sequence (multi==1), alternating sign (negative multis),
    and every-point-a-jump (CODE_FULL churn through all 4 sequences)."""
    n = 800
    base = _cloud(n, seed=26, smooth=True)
    p = str(tmp_path / "edge.laz")
    for gps in (
        np.full(n, 123456.789),
        np.arange(n) * 1e-4 + 5e4,
        5e4 + np.cumsum(np.where(np.arange(n) % 2 == 0, 3e-4, -1e-4)),
        np.arange(n, dtype=np.float64) * 1e9 + 1e15,
    ):
        cols = dict(base)
        cols["gps_time"] = gps
        laz_native.write_laz(p, cols, chunk_size=300, point_format=1)
        out = laz_native.decode_laz_points(p)
        assert np.array_equal(out["gps_time"], gps)


def test_laz_format3_spark_datasource(spark, tmp_path):
    from agile_lakehouse_spark.sources.las_datasource import LasDataSource

    n = 3000
    cols = _cloud(n, seed=27)
    cols["gps_time"] = _gps_scanlines(n, seed=28)
    rng = np.random.default_rng(29)
    for c in ("red", "green", "blue"):
        cols[c] = rng.integers(0, 65536, n)
    path = str(tmp_path / "ds3.laz")
    laz_native.write_laz(path, cols, chunk_size=1000, point_format=3)
    spark.dataSource.register(LasDataSource)
    df = spark.read.format("las").load(path)
    assert df.rdd.getNumPartitions() == 3  # real chunk table, format 3
    assert df.count() == n


# --- FastAC spec vectors (round 5) ------------------------------------------
#
# Golden byte-level pins derived BY HAND from the published algorithm
# (Amir Said, "Introduction to Arithmetic Coding - Theory and Practice",
# HPL-2004-76 — the integer interval arithmetic LASzip adopted verbatim).
# Every value below was computed on paper from the spec's operations
# (interval scaling, renormalization at length < 2^24, carry
# propagation, the 13/15-bit model layouts and update schedules), NOT by
# running this codec — so a self-consistent but spec-divergent
# implementation round-trips fine yet FAILS these pins.


def test_fastac_raw_bits_spec_vector():
    # write_bits(8, 0xA5): length = 0xFFFFFFFF >> 8 = 0x00FFFFFF,
    # x = 0xA5 * 0x00FFFFFF = 0xA4FFFF5B -> base, renorm emits 0xA4.
    # done(): length 0xFFFFFF00 > 2*2^24 -> base += 2^24 wraps the high
    # byte (0xFFFF5B00 + 0x01000000 = 0x00FF5B00 with carry), carry
    # propagates into the emitted 0xA4 -> 0xA5, renorm emits 0x00.
    from agile_lakehouse_spark.sources.laz_ac import ArithmeticEncoder

    enc = ArithmeticEncoder()
    enc.write_bits(8, 0xA5)
    assert enc.done() == bytes([0xA5, 0x00])


def test_fastac_raw_bits_carry_spec_vector():
    # two 0xFF bytes force mid-stream carry propagation:
    # after the first write: out=[0xFE], base=0xFFFF0100
    # second write: base wraps (0xFFFF0100 + 0xFEFFFF01 -> 0xFEFF0001),
    # carry turns 0xFE into 0xFF; renorm emits 0xFE.
    # done(): base 0xFF000100 + 2^24 wraps again -> trailing 0xFE -> 0xFF,
    # then renorm emits 0x00.
    from agile_lakehouse_spark.sources.laz_ac import (
        ArithmeticDecoder,
        ArithmeticEncoder,
    )

    enc = ArithmeticEncoder()
    enc.write_bits(8, 0xFF)
    enc.write_bits(8, 0xFF)
    out = enc.done()
    assert out == bytes([0xFF, 0xFF, 0x00])
    dec = ArithmeticDecoder(out)
    assert dec.read_bits(8) == 0xFF
    assert dec.read_bits(8) == 0xFF


def test_fastac_bit_model_spec_vector():
    # fresh Adaptive_Bit_Model: p0 = 2^12, update after 4 bits gives
    # bit_count = 6, p0 = (4 << 13) // 6 = 5461, cycle 5.  Encoding
    # 0,1,0,0,1 narrows to base=0x4AAA7000, length=0x05558000; done()
    # adds 2^24 and emits the single byte 0x4B.
    from agile_lakehouse_spark.sources.laz_ac import (
        ArithmeticBitModel,
        ArithmeticDecoder,
        ArithmeticEncoder,
    )

    bits = [0, 1, 0, 0, 1]
    enc = ArithmeticEncoder()
    m = ArithmeticBitModel()
    for b in bits:
        enc.encode_bit(m, b)
    # model state after the scheduled update (spec: counts then halving)
    assert (m.bit_0_prob, m.bit_count, m.update_cycle) == (5461, 6, 5)
    out = enc.done()
    assert out == bytes([0x4B])
    dec = ArithmeticDecoder(out)
    md = ArithmeticBitModel()
    assert [dec.decode_bit(md) for _ in range(5)] == bits


def test_fastac_symbol_model_spec_vector():
    # fresh Adaptive_Data_Model(4): uniform init distribution
    # [0, 0x2000, 0x4000, 0x6000] (scale = 2^31 // 4, shift 16).
    # Encoding [2, 0, 3]: interval walks to base=0x8BFF6000,
    # length=0x04004000; done() emits 0x8C.
    from agile_lakehouse_spark.sources.laz_ac import (
        ArithmeticDecoder,
        ArithmeticEncoder,
        ArithmeticModel,
    )

    m = ArithmeticModel(4)
    assert m.distribution == [0, 0x2000, 0x4000, 0x6000]
    syms = [2, 0, 3]
    enc = ArithmeticEncoder()
    for s in syms:
        enc.encode_symbol(m, s)
    out = enc.done()
    assert out == bytes([0x8C])
    dec = ArithmeticDecoder(out)
    md = ArithmeticModel(4)
    assert [dec.decode_symbol(md) for _ in range(3)] == syms
