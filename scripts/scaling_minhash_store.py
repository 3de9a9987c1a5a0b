"""Store-backed MinHash near-dup at scale: does the commit-log BLOOM
prune actually skip the non-colliding signature corpus?

`dedup.minhash_store_backed_update` persists the LSH bucket-membership
index in a TransactionalTable with blooms on the band key; a batch
probes only files admitting one of its own band keys.  Unlike the
SemDeDup store (range stats on a clustered cell column), LSH keys are
hash-scattered — the prune comes from per-file blooms, so its
selectivity tracks the BATCH's band-key count against the store's
per-file key population.  Each rung folds a corpus as batch 1, then a
small batch of exact/near duplicates as batch 2, and records the files
and bytes the batch-2 probe reads vs the store total, plus pair-set
equality (count + xor of pair hashes) against the in-memory incremental
operator on the same split:

    python scripts/scaling_minhash_store.py [n_docs ...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from agile_lakehouse_spark import get_session
from agile_lakehouse_spark.operators import dedup
from agile_lakehouse_spark.plans.snapshots import TransactionalTable

K, THR = 5, 0.5
BATCH_DOCS = 64  # today's ingest: 64 copies of SRC_DOCS corpus docs
SRC_DOCS = 5  # distinct duplicated sources -> ~SRC_DOCS x bands probe keys
# Two geometry lessons the first runs of this ladder measured (both
# recorded in SCALE.md): (1) at ~100k distinct band keys per file the
# default 2^16-bit blooms SATURATE and admit everything (prune 0.0) —
# size to >= ~15 bits/key-per-file, Delta's bloom-index fpp knob;
# (2) a probe of P keys touches <= P files by construction (hash
# clustering puts each key in one file per commit), so pruning needs
# store_files >> probe keys — 8 files vs 256 true-positive keys also
# pruned 0.0 even with exact blooms.  128 files at 200 k docs keeps
# ~6k keys/file; 2^17-bit blooms give ~2e-4 fp/key there.
BLOOM_BITS = 1 << 17


def synth_docs(spark, n: int):
    """Deterministic corpus: ids < n are distinct documents (word soup
    seeded by id); ids >= n are BATCH docs — exact copies of corpus doc
    (id % SRC_DOCS), so their signatures collide with a bounded key
    set living in at most SRC_DOCS x bands store files."""
    total = n + BATCH_DOCS
    return spark.range(total).select(
        F.col("id").alias("doc_id"),
        F.expr(
            f"""concat_ws(' ',
                transform(sequence(1, 24),
                  t -> substring(md5(concat(CAST(if(id < {n}, id, pmod(id, 5)) AS STRING), ':', CAST(t AS STRING))), 1, 8)))"""
        ).alias("text"),
    )


def _pairsum(pairs):
    return pairs.select(
        F.xxhash64("id_a", "id_b", "est_jaccard").alias("h")
    ).select(F.expr("bit_xor(h)").alias("s"), F.count(F.lit(1)).alias("n")).first()


def run_scale(spark, n: int) -> dict:
    out: dict[str, object] = {"n_docs": n, "batch_docs": BATCH_DOCS, "k": K, "bloom_bits": BLOOM_BITS}
    docs = synth_docs(spark, n).persist()
    docs.count()
    old = docs.filter(F.col("doc_id") < n)
    new = docs.filter(F.col("doc_id") >= n)
    store = tempfile.mkdtemp(prefix=f"mhstore_{n}_")
    caches: list = []
    try:
        t0 = time.time()
        dedup.minhash_store_backed_update(
            spark, old, store, k=K, threshold=THR,
            target_files=max(8, n // 1562), bloom_bits=BLOOM_BITS,
            caches=caches,
        )
        out["store_build_s"] = round(time.time() - t0, 2)

        # the prune, measured from the manifest before batch 2 runs
        tbl = TransactionalTable(f"{store}/sigs", bloom_columns=("bkey",))
        v = tbl.latest_version()
        files = tbl._read_manifest(v)["files"]
        sigs2 = dedup.minhash_signatures(new, k=K)
        probe = [
            r[0]
            for r in dedup._lsh_buckets(
                sigs2, dedup.DEFAULT_BANDS, dedup.DEFAULT_ROWS_PER_BAND, "doc_id"
            )
            .withColumn(
                "bkey",
                F.concat_ws(":", F.col("band").cast("string"), F.col("key")),
            )
            .select("bkey").distinct().collect()
        ]
        kept = tbl.prune_files_by_keys("bkey", probe, v)
        tot_b = sum(os.path.getsize(f) for f in files)
        kept_b = sum(os.path.getsize(f) for f in kept)
        out["probe_keys"] = len(probe)
        out["store_files"] = len(files)
        out["files_read"] = len(kept)
        out["bytes_total_mb"] = round(tot_b / 1e6, 1)
        out["bytes_read_mb"] = round(kept_b / 1e6, 1)
        out["prune_frac"] = round(1 - kept_b / tot_b, 3)

        t0 = time.time()
        got = dedup.minhash_store_backed_update(
            spark, new, store, k=K, threshold=THR, bloom_bits=BLOOM_BITS,
            caches=caches,
        )
        cs = _pairsum(got)
        out["store_incremental_s"] = round(time.time() - t0, 2)
        out["pairs"] = cs.n

        t0 = time.time()
        cm = _pairsum(
            dedup.minhash_incremental_pairs(
                new, dedup.minhash_signatures(old, k=K), threshold=THR, k=K,
                persist_sigs=True, caches=caches,
            )
        )
        out["mem_incremental_s"] = round(time.time() - t0, 2)
        assert (cs.s, cs.n) == (cm.s, cm.n), (cs, cm)
        out["agree"] = True
        for c in caches:
            c.unpersist()
    finally:
        shutil.rmtree(store, ignore_errors=True)
        docs.unpersist()
    return out


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [200_000]
    spark = get_session("scaling-minhash-store")
    spark.sparkContext.setLogLevel("ERROR")
    for nn in sizes:
        print(json.dumps(run_scale(spark, nn)), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
