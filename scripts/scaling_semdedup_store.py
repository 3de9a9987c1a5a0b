"""Store-backed incremental SemDeDup at scale: does the commit-log
file prune actually skip the clean-cell corpus?

`similarity.semantic_dedup_store_update` persists state in
TransactionalTable stores, vectors range-clustered by cell; a batch's
dirty-cell list prunes the vector-store read from manifest min/max
stats alone.  This ladder makes the prune measurable: the corpus spans
`cells` cells but the ingest batch touches only the first
`cells // DIRTY_DIV` of them (near-dup twins are constrained to the
same dirty subset so merge edges stay in-play), so a correct prune
skips ~(1 - 1/DIRTY_DIV) of the vector-store files AND bytes.  Each
rung records the prune fraction, times the store path against both the
in-memory incremental operator and the honest batch re-run, and
asserts assignment equality (order-free xor checksum) across all
three:

    SPARK_DRIVER_MEMORY=64g python scripts/scaling_semdedup_store.py [n ...]
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
from agile_lakehouse_spark.operators import similarity as S
from agile_lakehouse_spark.plans.snapshots import TransactionalTable

DIM = 64
THR = 0.9
BATCH_FRAC = 0.05
DIRTY_DIV = 10  # batch touches 1/10th of the cells


def synth_vectors(spark, n: int, cells: int, cut: int):
    """scaling_semdedup_incr.py's deterministic corpus, with two twists
    that localize the ingest batch: (1) batch rows (id >= cut) are
    assigned cells in [0, cells/DIRTY_DIV) only; (2) the i%50==1
    near-dup twin rule applies only when the twin's cell already lies
    in that dirty subset, so cross-batch merge edges exist without the
    twins dragging every cell into the dirty set.  The rule is a pure
    function of id, identical for the store fold and the batch re-run."""
    dirty_cells = max(cells // DIRTY_DIV, 1)
    base = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"(id % 50 = 1) AND (pmod(xxhash64(id - 1), {cells}) < {dirty_cells})"
        ).alias("is_twin"),
    )
    base = base.select(
        "vec_id",
        F.when(F.col("is_twin"), F.col("vec_id") - 1).otherwise(F.col("vec_id")).alias("seed"),
        F.when(F.col("is_twin"), F.lit(2.0)).otherwise(F.lit(1.0)).alias("scale"),
    )
    cell_store = F.expr(f"CAST(pmod(xxhash64(seed), {cells}) AS BIGINT)")
    cell_batch = F.expr(f"CAST(pmod(xxhash64(seed), {dirty_cells}) AS BIGINT)")
    coords = (
        f"transform(sequence(1, {DIM}), "
        "t -> scale * (CAST(pmod(xxhash64(seed, t), 2000) AS DOUBLE) / 1000.0 - 1.0))"
    )
    return base.select(
        "vec_id",
        # twins keep the store twin's cell (it is in the dirty subset by
        # construction); fresh batch rows land in the dirty subset
        F.when(F.col("vec_id") < cut, cell_store)
        .when(F.col("seed") != F.col("vec_id"), cell_store)
        .otherwise(cell_batch)
        .alias("cell"),
        F.expr(coords).alias("embedding"),
    )


def _checksum(assign):
    return assign.select(
        F.xxhash64("vec_id", "cell", "grp", "kept").alias("h")
    ).select(F.expr("bit_xor(h)").alias("s"), F.count(F.lit(1)).alias("n")).first()


def run_scale(spark, n: int) -> dict:
    cells = max(n // 8192, DIRTY_DIV)
    cut = int(n * (1.0 - BATCH_FRAC))
    out: dict[str, object] = {
        "n_vectors": n, "dim": DIM, "cells": cells,
        "batch_frac": BATCH_FRAC, "dirty_div": DIRTY_DIV,
    }
    vecs = synth_vectors(spark, n, cells, cut).persist()
    vecs.count()
    old = vecs.filter(F.col("vec_id") < cut)
    new = vecs.filter(F.col("vec_id") >= cut)
    store = tempfile.mkdtemp(prefix=f"semstore_{n}_")
    caches: list = []
    try:
        t0 = time.time()
        S.semantic_dedup_store_update(spark, old, None, store, THR, caches=caches)
        out["store_build_s"] = round(time.time() - t0, 2)

        # the prune, measured from the manifest before batch 2 runs
        vt = TransactionalTable(f"{store}/vectors")
        v = vt.latest_version()
        files = vt._read_manifest(v)["files"]
        dirty = [r[0] for r in new.select("cell").distinct().collect()]
        kept = vt.prune_files_by_values("cell", dirty, v)
        tot_b = sum(os.path.getsize(f) for f in files)
        kept_b = sum(os.path.getsize(f) for f in kept)
        out["store_files"] = len(files)
        out["files_read"] = len(kept)
        out["bytes_total_mb"] = round(tot_b / 1e6, 1)
        out["bytes_read_mb"] = round(kept_b / 1e6, 1)
        out["prune_frac"] = round(1 - kept_b / tot_b, 3)

        t0 = time.time()
        assign_store = S.semantic_dedup_store_update(
            spark, new, None, store, THR, caches=caches
        )
        cs = _checksum(assign_store)
        out["store_incremental_s"] = round(time.time() - t0, 2)
        out["rows"] = cs.n

        # in-memory incremental (state frames persisted in-session)
        mem: list = []
        _, state = S.semantic_dedup_update(old, None, threshold=THR, caches=mem)
        state["assign"].count()
        state["vectors"].count()
        t0 = time.time()
        assign_mem, _ = S.semantic_dedup_update(new, None, state, THR, caches=mem)
        cm = _checksum(assign_mem)
        out["mem_incremental_s"] = round(time.time() - t0, 2)

        t0 = time.time()
        cb = _checksum(S.semantic_dedup(vecs, None, threshold=THR))
        out["batch_rerun_s"] = round(time.time() - t0, 2)
        assert (cs.s, cs.n) == (cb.s, cb.n) == (cm.s, cm.n), (cs, cb, cm)
        out["agree"] = True
        out["speedup_vs_rerun"] = round(
            out["batch_rerun_s"] / max(out["store_incremental_s"], 0.01), 2
        )
        for c in caches + mem:
            c.unpersist()
    finally:
        shutil.rmtree(store, ignore_errors=True)
        vecs.unpersist()
    return out


def run_compaction(spark, n: int, n_batches: int = 6) -> dict:
    """VERDICT r11 item 2: the store-MAINTENANCE rung.  Fold ``n_batches``
    ingest batches whose rows scatter over ALL cells (the worst case for
    store growth: every cell accumulates one file-set per batch, so a
    1-cell probe reads ~n_batches files), OPTIMIZE both stores with
    single-column range clustering, and measure the probe's file/byte
    cost before vs after — then fold ONE MORE dirty-subset batch on the
    compacted store and xor-checksum it against the batch operator over
    the union (compaction must not change answers, reference lifecycle
    analogue pc-cli/src/merge.rs:46-84)."""
    cells = max(n // 8192, DIRTY_DIV)
    out: dict[str, object] = {
        "mode": "compaction", "n_vectors": n, "cells": cells, "n_batches": n_batches,
    }
    step = n // n_batches
    # cut=n: every row takes the all-cells assignment; the extra batch
    # below (ids >= n) lands in the dirty 1/10 subset per the generator
    allvecs = synth_vectors(spark, n + step, cells, cut=n).persist()
    allvecs.count()
    vecs = allvecs.filter(F.col("vec_id") < n)
    extra = allvecs.filter(F.col("vec_id") >= n)
    store = tempfile.mkdtemp(prefix=f"semcompact_{n}_")
    caches: list = []
    try:
        t0 = time.time()
        for b in range(n_batches):
            lo = b * step
            hi = (b + 1) * step if b < n_batches - 1 else n
            batch = vecs.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
            S.semantic_dedup_store_update(spark, batch, None, store, THR, caches=caches)
        out["fold_s"] = round(time.time() - t0, 2)

        vt = TransactionalTable(f"{store}/vectors")
        at = TransactionalTable(f"{store}/assign")

        def probe_stats(t, probe):
            v = t.latest_version()
            files = t._read_manifest(v)["files"]
            kept = t.prune_files_by_values("cell", probe, v)
            mb = round(sum(os.path.getsize(f) for f in kept) / 1e6, 2)
            return len(files), len(kept), mb

        probe = [0]
        (out["vec_files_before"], out["probe_files_before"],
         out["probe_mb_before"]) = probe_stats(vt, probe)
        t0 = time.time()
        # granularity must track cell count (~2 cells/file): the first run
        # used cells//64 -> 4 files spanning ~6 cells each, and the probe's
        # BYTES rose 4x even as files read fell 6x (SCALE.md round-12
        # caveat) — same lesson as the per-batch repartitionByRange(n_dirty)
        tgt = max(4, min(cells // 2, 256))
        vt.optimize(spark, cluster_by="cell", target_files=tgt)
        at.optimize(spark, cluster_by="cell", target_files=tgt)
        out["optimize_s"] = round(time.time() - t0, 2)
        (out["vec_files_after"], out["probe_files_after"],
         out["probe_mb_after"]) = probe_stats(vt, probe)

        cs = _checksum(at.read(spark))
        cb = _checksum(S.semantic_dedup(vecs, None, threshold=THR))
        assert (cs.s, cs.n) == (cb.s, cb.n), (cs, cb)

        # post-compaction: a dirty-subset batch folds correctly AND its
        # pruned read benefits from the re-clustered layout
        dirty = [r[0] for r in extra.select("cell").distinct().collect()]
        files = vt._read_manifest(vt.latest_version())["files"]
        kept = vt.prune_files_by_values("cell", dirty)
        out["extra_dirty_cells"] = len(dirty)
        out["extra_files_read"] = len(kept)
        out["extra_prune_frac"] = round(1 - len(kept) / max(len(files), 1), 3)
        t0 = time.time()
        a2 = S.semantic_dedup_store_update(spark, extra, None, store, THR, caches=caches)
        c2 = _checksum(a2)
        out["extra_fold_s"] = round(time.time() - t0, 2)
        cb2 = _checksum(S.semantic_dedup(allvecs, None, threshold=THR))
        assert (c2.s, c2.n) == (cb2.s, cb2.n), (c2, cb2)
        out["agree"] = True
        for c in caches:
            c.unpersist()
    finally:
        shutil.rmtree(store, ignore_errors=True)
        allvecs.unpersist()
    return out


def main() -> None:
    flags = [a for a in sys.argv[1:] if a.startswith("--")]
    args = [int(a) for a in sys.argv[1:] if not a.startswith("--")]
    spark = get_session("scaling-semdedup-store")
    spark.sparkContext.setLogLevel("ERROR")
    if "--compact" in flags:
        for nn in args or [200_000]:
            print(json.dumps(run_compaction(spark, nn)), flush=True)
    else:
        for nn in args or [200_000, 1_000_000]:
            print(json.dumps(run_scale(spark, nn)), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
