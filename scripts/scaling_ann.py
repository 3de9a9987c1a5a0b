"""Scaling evidence for the vector-similarity family: brute-force cosine
top-k, IVF probe, and PQ encode+ADC over a SYNTHETIC embedding table far
beyond fixture scale (sf0.1 = 2k vectors; default here 100k / 1M).

Vectors are generated distributed (xxhash64-seeded coordinates, unit-free
— cosine normalizes), so the experiment reproduces anywhere with no
driver data and no RNG:

    python scripts/scaling_ann.py [n_vectors ...]

Prints one JSON line per scale (SCALE.md records representative runs).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from agile_lakehouse_spark import get_session
from agile_lakehouse_spark.operators import similarity

DIM = 64


def synth_vectors(spark, n: int):
    """Deterministic synthetic embeddings: coordinate j of vector i =
    (xxhash64(i, j) % 2001 - 1000) / 1000 — float in [-1, 1]."""
    coords = (
        f"transform(sequence(1, {DIM}), "
        "j -> CAST(pmod(xxhash64(id, j), 2001) - 1000 AS FLOAT) / 1000.0)"
    )
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(coords).cast("array<float>").alias("embedding"),
    )


def run_scale(spark, n: int) -> dict:
    out: dict[str, object] = {"n_vectors": n}
    vecs = synth_vectors(spark, n).persist()
    vecs.count()
    qv = [float(v) for v in vecs.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]

    t0 = time.time()
    similarity.cosine_topk(vecs, qv, k=10).collect()
    out["brute_topk_s"] = round(time.time() - t0, 2)

    t0 = time.time()
    similarity.ivf_topk(vecs, qv, k=10, m=8, nprobe=2).collect()
    out["ivf_inline_s"] = round(time.time() - t0, 2)

    # the scale path: assign+write ONCE (layout job), then probe reads
    # only nprobe partition directories
    import shutil
    import tempfile

    cents = similarity.default_centroids(vecs, 8)
    tmp = tempfile.mkdtemp(prefix=f"ivf_{n}_")
    try:
        t0 = time.time()
        similarity.ivf_write_layout(vecs, f"{tmp}/ivf", cents)
        out["ivf_layout_write_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        similarity.ivf_topk_on_layout(spark, f"{tmp}/ivf", qv, cents, k=10, nprobe=2).collect()
        out["ivf_probe_s"] = round(time.time() - t0, 2)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    t0 = time.time()
    cb = similarity.pq_codebook(vecs, m=4, ksub=16)
    out["pq_train_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    similarity.pq_adc_topk(vecs, cb, qv, k=10).collect()
    out["pq_adc_topk_s"] = round(time.time() - t0, 2)

    # PQ production shape: encode ONCE at write time, ADC over stored codes
    tmp = tempfile.mkdtemp(prefix=f"pq_{n}_")
    try:
        t0 = time.time()
        similarity.pq_encode(vecs, cb).write.parquet(f"{tmp}/codes")
        out["pq_layout_write_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        codes = spark.read.parquet(f"{tmp}/codes")
        similarity.pq_adc_on_codes(codes, cb, qv, k=10).collect()
        out["pq_adc_on_codes_s"] = round(time.time() - t0, 2)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    # composed IVF-PQ: partition pruning x code compression in one layout
    tmp = tempfile.mkdtemp(prefix=f"ivfpq_{n}_")
    try:
        t0 = time.time()
        similarity.ivfpq_write_layout(vecs, f"{tmp}/ivfpq", cents, cb)
        out["ivfpq_layout_write_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        similarity.ivfpq_topk_on_layout(
            spark, f"{tmp}/ivfpq", qv, cents, cb, k=10, nprobe=2
        ).collect()
        out["ivfpq_probe_s"] = round(time.time() - t0, 2)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    # SQ8 tier: bounds agg (train), fused encode+ADC over raw floats
    # (inline shape), and ADC over a WRITTEN uint8-codes layout — the
    # production shape, scanning 1/4 the bytes of float32
    t0 = time.time()
    lo, hi = similarity.sq8_train(vecs)
    out["sq8_train_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    similarity.sq8_adc_topk(similarity.sq8_encode(vecs, lo, hi), lo, hi, qv, k=10).collect()
    out["sq8_adc_inline_s"] = round(time.time() - t0, 2)
    tmp = tempfile.mkdtemp(prefix=f"sq8_{n}_")
    try:
        t0 = time.time()
        similarity.sq8_encode(vecs, lo, hi).write.parquet(f"{tmp}/codes")
        out["sq8_layout_write_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        codes = spark.read.parquet(f"{tmp}/codes")
        similarity.sq8_adc_topk(codes, lo, hi, qv, k=10).collect()
        out["sq8_adc_on_codes_s"] = round(time.time() - t0, 2)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    vecs.unpersist()
    for op in ("brute_topk", "ivf_probe", "pq_adc_on_codes", "sq8_adc_on_codes"):
        out[f"{op}_vecs_per_s"] = round(n / out[f"{op}_s"], 0)
    return out


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [100_000, 1_000_000]
    spark = get_session("scaling-ann")
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        print(json.dumps(run_scale(spark, n)))
    spark.stop()


if __name__ == "__main__":
    main()
