"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": <sf>}

Query set mirrors the reference's benchmark workload
(``pc-cli/src/benchmark.rs:95-265``: rect/circle/sampling/kNN/count/bounds)
plus the engine's headline relational and LLM-pipeline operators.  Each
query executes fully (noop sink / driver-side count for aggregates) so
timings measure scan+compute, not result transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from agile_lakehouse_spark import declared, get_session  # noqa: E402

# ---------------------------------------------------------------------------
# Round 9: the suite is split into a FROZEN core (cross-round-comparable —
# this list must never grow or reorder; its total is the headline trend
# number) and a rotating TAIL for entries added in later rounds, so new
# workload stops moving the headline total.  The r1-r8 totals correspond to
# core+tail as of round 8.
# ---------------------------------------------------------------------------
CORE_QUERIES = [
    "dq01_pc_scan_count",
    "dq03_pc_bounds",
    "dq05_pc_rect_count",
    "dq06_pc_circle",
    "dq07_pc_sample",
    "dq08_pc_knn",
    "dq24_pc_grid_cells",
    "dq24b_pc_quadtree_cells",
    "dq09_groupby_agg",
    "dq11_multiway_join",
    "dq15_window_rank",
    "dq20_time_bucket",
    "dq21_dedup_exact",
    "dq21b_dedup_minhash",
    "dq21h_dedup_incremental",  # new batch vs stored signatures (round 8)
    "dq21c_dedup_simhash",
    "dq22_ann_topk",
    "dq23_text_stats",
    "dq23c_quality_score",
    "dq28_pivot",
    "dq30_json_extract",
    "dq32_correlated_subquery",
    "dq33_asof_join",
    "dq34_spatial_join",
    "dq35_percentile",
    "dq58_tpch_q3",
    "dq37_tfidf",
    "dq39_interval_join",
    "dq41_range_frame",
    "dq42_histogram",
    "dq62_knn_join",
    "dq65_tpch_q2",
    "dq69_group_topk_sample",
    "dq71_weighted_sample",
    "dq77_tpch_q10",
    "dq79_tpch_q13",
    "dq83_tpch_q21",
    "dq84_funnel",
    "dq86_triangles",
    "dq88_rare_bigrams",
    "dq93_tpch_q8",
    "dq94_tpch_q9",
    "dq98_latest_state",
    "dq117_gopher_quality",
    "dq118_dup_ngram_coverage",
    "dq122_pq_adc_topk",
    "dq124_curate_corpus",
    "dq25_multimodal_features",  # real BMP decode via mapInPandas (round 4)
    "dq139_wav_frames",  # real WAV decode, 1->N frame expansion (round 4)
    "dq143_dedup_paragraphs",  # span-level dedup, two bounded shuffles (round 4)
    "dq144_sq8_topk",  # SQ8 train+encode+ADC, pure projections (round 4)
    "dq148_semantic_dedup",  # SemDeDup: cells + pairs + CC grouping (round 4)
    "dq22e_embedding_match_incr",  # bipartite gram-sieve matcher (round 8)
    "dq149_resample_interpolate",  # spine union + two window passes (round 4)
    "dq153_fill_token_budget",  # two-phase budget cut, windowless bulk (round 4)
    "dq54_stream_time_bucket",  # REAL streaming engine, availableNow (round 4)
    "dq157_salted_join",  # skew-resistant salted equi-join (round 4)
    "dq163_ann_join",  # batched ANN join, two-phase per-query top-k (round 4)
    "dq169_lod_sweep",  # viz.rs progressive-LOD sweep, one-plan workload (round 5)
    "dq170_duplicate_spans",  # Lee et al. exact-substring spans (round 5)
    "dq173_lm_fluency",  # corpus-bigram CCNet-shape quality scoring (round 5)
    "dq172b_png_palette",  # color-type-3 PNG: packed indices + PLTE path (round 7)
    "dq172d_png_rgba",  # color-type-6 PNG: alpha plane retained (round 8)
]

# New entries land HERE (round >= 9); their time is reported in tail_total,
# never in core_total.
TAIL_QUERIES: list[str] = [
    "dq21j_exact_store_roundtrip",  # store-apply half of incremental dedup (round 9)
    "dq124b_curate_incremental",  # 2-batch incremental curation pipeline (round 9)
    "dq148b_semantic_dedup_incr",  # 2-batch incremental SemDeDup (round 10)
    "dq148c_semantic_dedup_preassigned",  # write-time-layout SemDeDup mode (round 10)
    "dq148d_semantic_dedup_store",  # store-backed SemDeDup, pruned reads (round 11)
    "dq21k_minhash_store_backed",  # LSH signature store, bloom-pruned probes (round 12)
    "dq21l_exact_store_backed",  # exact-dedup state store, bloom-pruned probes (round 12)
    "dq22f_embedding_store_backed",  # vector store, range-pruned dirty cells (round 12)
    "dq21m_exact_store_fp",  # fingerprint-keyed exact store, scan_in DataFrame probes (round 13)
]

BENCH_QUERIES = CORE_QUERIES + TAIL_QUERIES

# Re-measured once after the suite: the spread between an entry's recorded
# mean and a fresh single run bounds the session's residual noise (the
# cross-round drift diagnostic — VERDICT r8 "what's wrong" #1).  One probe
# per workload family: point-cloud kNN, LSH dedup, TPC-H join, gram-sieve
# semantic dedup, window/histogram, text aggregation.
PROBE_QUERIES = [
    "dq08_pc_knn",
    "dq21b_dedup_minhash",
    "dq58_tpch_q3",
    "dq148_semantic_dedup",
    "dq42_histogram",
    "dq88_rare_bigrams",
]


def _compact_key(name: str) -> str:
    """Stdout-line key for a bench entry: registry names carry a unique
    ``dqNNN[a-z]`` prefix, so the compact JSON line (which must fit the
    driver's 2000-byte stdout tail window WHOLE — see the budget note in
    main) keeps only that prefix; workload/layout names (w_*, layout_*)
    are already short and ambiguous under truncation, so they pass
    through.  Full names + full-precision timings always live in the
    sidecar, and scripts/bench_compare.py normalizes both schemes, so
    cross-round per-entry comparison is unaffected.  At 82 entries the
    full-name line had outgrown 1980 B even at 1 decimal (the round-10
    0-decimal rung would have erased sub-second resolution from the
    driver's recorded artifact); prefixes buy ~1.1 kB of headroom and
    keep 2-decimal resolution past ~120 entries."""
    return name.split("_", 1)[0] if name.startswith("dq") else name


# Fail at import, not after the ~2-minute suite: a new BENCH_QUERIES entry
# whose dq-prefix collides with an existing one would silently merge two
# timings in the compact line (the pytest pin covers the committed list;
# this covers ad-hoc runtime additions too).
_prefixes = [_compact_key(n) for n in BENCH_QUERIES]
if len(set(_prefixes)) != len(_prefixes):
    _dupes = sorted(p for p in set(_prefixes) if _prefixes.count(p) > 1)
    raise RuntimeError(f"BENCH_QUERIES compact-prefix collision: {_dupes}")
del _prefixes


def _meminfo() -> dict:
    """Box-state snapshot (/proc/meminfo keys that move with page cache +
    memory pressure, in MB) — recorded so cross-round comparisons can tell
    engine regressions from box drift (the scaling_layout_big.py protocol)."""
    out = {}
    try:
        with open("/proc/meminfo") as fh:
            for line in fh:
                k, v = line.split(":", 1)
                if k in ("MemTotal", "MemFree", "MemAvailable", "Cached", "Dirty", "Buffers"):
                    out[k] = int(v.strip().split()[0]) // 1024
    except OSError:
        pass
    try:
        out["loadavg_1m"] = round(os.getloadavg()[0], 2)
    except OSError:
        pass
    return out


def execute_fully(df) -> int:
    """Run the whole plan without shipping rows to the driver."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def _run_stats(per_run) -> dict:
    """One schema for every stats row: mean/std/sem/n (sem = std/sqrt(n),
    the noise floor of the recorded mean — the adaptive-rerun criterion).

    std is the SAMPLE standard deviation (÷(n-1)): the population form was
    biased low at the n=2..6 counts this harness runs, which made the
    sem gate looser than documented — and at n=1 it was exactly 0, so a
    single run trivially "passed".  With n=1 std/sem are null and every
    adaptive loop requires n >= 2 before accepting the sem criterion."""
    n = len(per_run)
    mean = sum(per_run) / n
    if n >= 2:
        std = (sum((t - mean) ** 2 for t in per_run) / (n - 1)) ** 0.5
        sem = round(std / n**0.5, 4)
        std = round(std, 4)
    else:
        std = sem = None
    return {"mean": round(mean, 4), "std": std, "sem": sem, "n": n}


def _record(name, per_run, timings, stats) -> None:
    timings[name] = round(sum(per_run), 3)
    if stats is not None:
        stats[name] = _run_stats(per_run)


def seeded_workload(spark, sf_dir: str, timings: dict[str, float], stats=None) -> None:
    """Reference-style seeded query workload (benchmark.rs:95-265).

    N runs per query type with origins drawn uniformly from the data
    bounds inset (reference: 10 runs, ChaCha20 seed 76, inset +1000/-400 —
    scaled to our fixture's coordinate ranges).  Reported as total seconds
    per type across all runs, plus per-run mean/stddev (the reference's
    ``show()``, benchmark.rs:267-282).  One untimed warmup run per type
    compiles the plan shape, so the timed runs measure steady-state
    execution, not Janino/JIT — round-2 regressions on these entries were
    first-run compilation noise riding on suite composition.
    """
    import random

    from pyspark.sql import functions as F

    from agile_lakehouse_spark.operators import pointcloud as pc
    from agile_lakehouse_spark.sources.catalog import points_view

    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "10"))
    rng = random.Random(76)
    pts = points_view(spark, sf_dir)
    x_lo, x_hi, y_lo, y_hi = pts.agg(
        F.min("x"), F.max("x"), F.min("y"), F.max("y")
    ).collect()[0]
    inset = 0.1 * min(x_hi - x_lo, y_hi - y_lo)
    origins = [
        (rng.uniform(x_lo + inset, x_hi - inset), rng.uniform(y_lo + inset, y_hi - inset))
        for _ in range(runs)
    ]

    def run_all(name, make_df):
        execute_fully(make_df(*origins[0]))  # warmup: plan-shape compile
        per = []
        for cx, cy in origins:
            t0 = time.time()
            execute_fully(make_df(cx, cy))
            per.append(time.time() - t0)
        _record(name, per, timings, stats)

    side_s, side_m = 70.0, 220.0
    run_all("w_s_rect", lambda cx, cy: pc.range_query(
        pts, {"x": (cx, cx + side_s), "y": (cy, cy + side_s)}, importance_col="i"))
    run_all("w_m_rect", lambda cx, cy: pc.range_query(
        pts, {"x": (cx, cx + side_m), "y": (cy, cy + side_m)}, importance_col="i"))
    run_all("w_s_circle", lambda cx, cy: pc.circle_query(pts, cx, cy, 25.0))
    run_all("w_m_circle", lambda cx, cy: pc.circle_query(pts, cx, cy, 100.0))
    run_all("w_knn_1000", lambda cx, cy: pc.knn(pts, cx, cy, 1000))
    run_all("w_knn_5000", lambda cx, cy: pc.knn(pts, cx, cy, 5000))
    execute_fully(pc.sample(pts, p=0.05))  # warmup
    per = []
    for p in (0.05, 0.25, 0.35):
        t0 = time.time()
        execute_fully(pc.sample(pts, p=p))
        per.append(time.time() - t0)
    _record("w_sampling", per, timings, stats)


def layout_jobs(spark, sf_dir: str, timings: dict[str, float], stats=None) -> None:
    """Layout-pipeline timings comparable to BASELINE.md's partition rows
    (convert/grid/quadtree — pc-cli/examples/partition.rs)."""
    import shutil
    import tempfile

    from agile_lakehouse_spark.plans import layout
    from agile_lakehouse_spark.sources.catalog import points_view

    tmp = tempfile.mkdtemp(prefix="bench_layout_")
    try:
        pts = points_view(spark, sf_dir)
        reps = int(os.environ.get("SPARK_GRAFT_LAYOUT_REPS", "3"))

        def run_layout(name, job):
            # timing = MEAN of reps (comparable to prior rounds' single
            # run), stddev/sem recorded alongside — write jobs rewrite the
            # same dir, last rep's output survives for the on-layout reads.
            # Adaptive: up to reps+3 runs until sem <= 7.5% of mean (write
            # jobs are the suite's noisiest — disk cache + GC pressure).
            per = []
            while True:
                t0 = time.time()
                job()
                per.append(time.time() - t0)
                s = _run_stats(per)
                if len(per) >= reps + 3 or (
                    len(per) >= max(reps, 2) and s["sem"] <= 0.075 * s["mean"]
                ):
                    break
            timings[name] = round(s["mean"], 3)
            if stats is not None:
                stats[name] = s

        run_layout("layout_convert", lambda: pts.write.mode("overwrite").parquet(f"{tmp}/convert"))
        run_layout("layout_grid1", lambda: layout.write_grid_layout(pts, f"{tmp}/grid1", 100.0, 100.0))
        run_layout(
            "layout_grid8",
            lambda: layout.write_grid_layout(pts, f"{tmp}/grid8", 100.0, 100.0, importance_splits=8),
        )
        run_layout(
            "layout_quadtree",
            lambda: layout.write_quadtree_layout(pts, f"{tmp}/qt", depth=2, side=1024.0),
        )
        run_layout(
            "layout_grid_hilbert",
            lambda: layout.write_grid_layout(pts, f"{tmp}/gridh", 100.0, 100.0, curve="hilbert"),
        )

        # the reference benches its workload AGAINST the partitioned layout
        # (examples/partition.rs) — time the same queries over the grid
        # files, where min/max pruning actually engages (vs the w_* entries,
        # which scan the lineitem projection)
        from pyspark.sql import functions as F

        from agile_lakehouse_spark.operators import pointcloud as pc

        # per-iteration times feed _record so these entries carry the same
        # mean/std/sem/n stats row as every other entry (the timing stays
        # the run TOTAL — the w_* on-layout convention of prior rounds)
        g = spark.read.parquet(f"{tmp}/grid1")
        per = []
        for k in range(5):
            cx, cy = 120.0 + 150 * k, 100.0 + 140 * k
            t0 = time.time()
            execute_fully(
                pc.range_query(g, {"x": (cx, cx + 70.0), "y": (cy, cy + 70.0)}, importance_col="i")
            )
            per.append(time.time() - t0)
        _record("w_s_rect_on_layout", per, timings, stats)
        per = []
        for k in range(5):
            cx, cy = 150.0 + 150 * k, 120.0 + 140 * k
            t0 = time.time()
            execute_fully(pc.knn(g, cx, cy, 1000))
            per.append(time.time() - t0)
        _record("w_knn_1000_on_layout", per, timings, stats)

        # the viz.rs per-level render over the quadtree layout
        # (viz.rs:160-200): one viewport cell per level, level= hits the
        # partition dir (pruned before listing), the cell's x/y RANGE hits
        # footer stats.  Round 10: the layout no longer materializes
        # qx/qy (dropped pre-shuffle — recomputable floor arithmetic), so
        # the viewport filter is the equivalent half-open geometry
        # predicate (selects the identical rows: floor(x/cell) == qx
        # <=> qx*cell <= x < (qx+1)*cell) — which is also the predicate
        # form parquet can actually prune with.
        qt = spark.read.parquet(f"{tmp}/qt")
        per = []
        for lv in range(3):
            cell = 1024.0 / 2**lv
            qx, qy = int(300.0 // cell), int(200.0 // cell)
            t0 = time.time()
            execute_fully(
                qt.filter(
                    (F.col("level") == lv)
                    & (F.col("x") >= qx * cell) & (F.col("x") < (qx + 1) * cell)
                    & (F.col("y") >= qy * cell) & (F.col("y") < (qy + 1) * cell)
                )
            )
            per.append(time.time() - t0)
        _record("w_lod_render_on_layout", per, timings, stats)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    # --- pinned protocol (round 9, VERDICT r8 item 1) ---------------------
    # The suite total swung 69->83->69->86 s across rounds 5-8 with no
    # engine cause; pin the knobs that scaling_layout_big.py pins and
    # RECORD the box state so drift is attributable.  Heap is pinned to a
    # fixed default (not the session's 8g fallback-by-accident); the page
    # cache is DELIBERATELY WARMED (every entry reads the same sf0.1
    # parquet set — cold-read timings would measure the disk, not the
    # plans; the 2 B layout harness is where cold I/O is the subject).
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "8g")
    protocol = {
        "driver_memory": os.environ["SPARK_DRIVER_MEMORY"],
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        "page_cache_policy": "warmed (tables pre-read; cold I/O is out of scope here)",
        "meminfo_start": _meminfo(),
    }
    spark = get_session("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + file metadata once (reference benches also run against
    # a warmed session; JIT/codegen noise would otherwise dominate query 1)
    for t in ("lineitem", "orders", "documents", "embeddings", "events"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
    from agile_lakehouse_spark.sources.catalog import points_view

    points_view(spark, sf_dir).count()
    # warm the Python workers: the first applyInPandas of a session pays
    # ~1-2 s of worker startup that would otherwise land on whichever
    # Arrow-stage entry runs first (dq148 / dq22e / dq25)
    spark.createDataFrame([(0, 1.0)], "k int, v double").groupBy("k").applyInPandas(
        lambda p: p, schema="k int, v double"
    ).count()
    # --- box-speed canary (round 11, VERDICT r10 item 2) ------------------
    # One fixed micro-probe — the dq01 scan-count, warmed once then timed
    # 3x, median — recorded IN THE COMPACT LINE so any reader can normalize
    # a driver artifact that landed in a degraded disk/steal window without
    # digging up the committed sidecar (r10's artifact ran uniformly 1.23x
    # its same-code sidecar; the 2 B ladder has seen 7-15x windows).  The
    # canary moves with the box, not the code: identical plan + data every
    # round.
    canary_fn = declared.SPARK_QUERIES["dq01_pc_scan_count"]
    execute_fully(canary_fn(spark, sf_dir))  # plan/codegen warm
    canary_runs = []
    for _ in range(3):
        t0 = time.time()
        execute_fully(canary_fn(spark, sf_dir))
        canary_runs.append(time.time() - t0)
    canary_s = round(sorted(canary_runs)[1], 3)
    protocol["canary_s"] = canary_s
    protocol["canary_runs"] = [round(t, 4) for t in canary_runs]

    timings: dict[str, float] = {}
    stats: dict[str, dict] = {}
    # sieve-path marker (round 13, VERDICT r12 item 1): record which
    # physical path (gram sieve vs pair-join fallback) every sieve-capable
    # entry took during its TIMED reps, so a timing outlier like r12's
    # dq148 (2.28x the sidecar on untouched code) is attributable from the
    # artifact itself — a stable marker exonerates the plan choice.
    from agile_lakehouse_spark.operators import similarity

    similarity.SIEVE_PATH_LOG = []
    for name in BENCH_QUERIES:
        fn = declared.SPARK_QUERIES[name]
        # Every entry gets ONE unrecorded warm run AT THE MEASURED SF first
        # (round 11, VERDICT r10 item 3): the former sf0.001 warm pass
        # compiled the literal plan shape but AQE/broadcast decisions and
        # Python-worker spin-up differ at sf0.1, so first-execution cost
        # kept landing on a different entry each round and bench_compare
        # flagged phantom regressions.  The warm run pays that cost off
        # the books; the timed reps below measure steady state.
        execute_fully(fn(spark, sf_dir))
        similarity.SIEVE_PATH_LOG.clear()  # keep only the timed reps' paths
        # ADAPTIVE runs: start at 2 (single-run numbers drift ±40% under
        # a 70-entry suite's JVM pressure) and keep rerunning until the
        # STANDARD ERROR of the recorded mean is <= 7.5% of the mean
        # (cap 6).  Per-run stddev is intrinsic GC/codegen noise that
        # extra runs don't shrink; what regression detection needs is a
        # stable MEAN, and sem = std/sqrt(n) is its noise floor —
        # round 4's noisiest entries (dq21c ±25% per-run) made
        # round-over-round comparison unreliable at fixed mean-of-2.
        per = []
        while True:
            t0 = time.time()
            execute_fully(fn(spark, sf_dir))
            per.append(time.time() - t0)
            s = _run_stats(per)
            if len(per) >= 6 or (
                len(per) >= 2 and (s["sem"] <= 0.075 * s["mean"] or s["mean"] < 0.05)
            ):
                break
        # MEAN, not sum, so entries stay comparable with earlier rounds'
        # single-run values (the w_*/layout entries keep their run-total
        # convention — their stats row carries the per-run mean)
        timings[name] = round(s["mean"], 3)
        if similarity.SIEVE_PATH_LOG:
            uniq: dict[str, int] = {}
            for rec in similarity.SIEVE_PATH_LOG:
                key = json.dumps(rec, sort_keys=True)
                uniq[key] = uniq.get(key, 0) + 1
            s["sieve_paths"] = [
                {**json.loads(k), "runs": v} for k, v in uniq.items()
            ]
        stats[name] = s
    similarity.SIEVE_PATH_LOG = None  # probes/workload: back to zero-cost

    seeded_workload(spark, sf_dir, timings, stats)
    layout_jobs(spark, sf_dir, timings, stats)

    # --- residual-noise probe (protocol item: rerun-in-session spread) ----
    # One fresh run of each probe entry, compared against its recorded
    # mean from the suite pass minutes earlier.  If the same session can't
    # reproduce its own means within ~10%, cross-round deltas below that
    # band are noise by construction.
    # Probes run mean-of-2 AFTER the layout jobs — deliberately the
    # worst-case box state (write pressure + GC debt), so the spread is
    # an UPPER bound on in-session noise.  Relative spread on sub-second
    # entries is dominated by a fixed ~0.1-0.2 s jitter floor, so the
    # absolute delta is recorded alongside: cross-round per-entry deltas
    # under max(probe_delta_max, 10% of mean) should be read as noise.
    probe_spread, probe_delta = {}, {}
    for name in PROBE_QUERIES:
        fn = declared.SPARK_QUERIES[name]
        per = []
        for _ in range(2):
            t0 = time.time()
            execute_fully(fn(spark, sf_dir))
            per.append(time.time() - t0)
        t = sum(per) / len(per)
        m = stats[name]["mean"]
        probe_spread[name] = round(abs(t - m) / m, 4) if m > 0 else 0.0
        probe_delta[name] = round(abs(t - m), 4)
    spreads = sorted(probe_spread.values())
    protocol["probe_spread"] = probe_spread
    protocol["probe_delta_s"] = probe_delta
    protocol["probe_spread_median"] = spreads[len(spreads) // 2]
    protocol["probe_spread_max"] = spreads[-1]
    protocol["probe_delta_max_s"] = max(probe_delta.values())
    protocol["meminfo_end"] = _meminfo()

    # core = everything stable since round 8 (CORE_QUERIES + the w_*/layout
    # workload entries, which are part of the frozen set); tail = additions
    tail_total = round(sum(timings[n] for n in TAIL_QUERIES), 3)
    total = round(sum(timings.values()), 3)
    core_total = round(total - tail_total, 3)
    # stdout gets the COMPACT line and it MUST fit the driver's 2000-byte
    # stdout TAIL window WHOLE: rounds 3-6 recorded "parsed": null because
    # the line outgrew the window and its head was cut mid-JSON (the r06
    # artifact's tail literally starts inside the queries dict).  So:
    # tight separators, 2-decimal per-query values (4-decimal precision
    # lives in the sidecar), and a deterministic 1-decimal fallback if the
    # suite ever grows past the budget.  Nothing prints after this line.
    # stdout keys are kept SHORT (core/tail, 1-decimal totals) and the
    # noise stats live in the sidecar only: at 80 entries the line is
    # within ~50B of the 1900 budget, and every byte spent on metadata
    # costs one decimal-ladder rung of per-query resolution in the
    # driver's recorded artifact (the full-precision payload is the
    # sidecar, committed per round as BENCH_SIDECAR_r*.json)
    compact = {
        "metric": "bench_suite_total",
        "value": total,
        "unit": "sec",
        "core": round(core_total, 1),
        "tail": round(tail_total, 1),
        "canary": canary_s,
        "queries": {_compact_key(k): round(v, 2) for k, v in timings.items()},
        "sf": sf,
    }
    if len(compact["queries"]) != len(timings):
        # explicit raise, not assert: asserts vanish under python -O and
        # this must fail loudly even for ad-hoc runtime entry additions
        dupes = sorted(
            k for k in {_compact_key(n) for n in timings}
            if sum(1 for n in timings if _compact_key(n) == k) > 1
        )
        raise RuntimeError(f"compact-key collision on prefixes {dupes}")
    # Budget math: the driver keeps the LAST 2000 bytes of stdout and this
    # line is the final output (progress bars land earlier in the window),
    # so line + "\n" must be <= 2000; 1980 leaves a 19-byte margin.  At 80
    # entries the 1-decimal rung is ~1980 B — rounds 3-8 used a 1900
    # budget, which forced the 0-decimal rung and erased sub-second
    # resolution from the recorded artifact.
    line = json.dumps(compact, separators=(",", ":"))
    for decimals in (1, 0):  # ladder down until the line fits the window
        if len(line) <= 1980:
            break
        compact["queries"] = {
            _compact_key(k): (round(v, decimals) if decimals else int(round(v)))
            for k, v in timings.items()
        }
        line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1980:  # ~95 entries fit at 0 decimals — restructure before then
        print(
            f"WARNING: bench stdout line {len(line)}B exceeds the driver's "
            "2000B tail window even at 0 decimals; expect parsed:null",
            file=sys.stderr,
        )
    # full-precision payload + stats go to the sidecar (schema_version 2 =
    # sample stddev, nullable std/sem at n=1 — changed in round 6; rounds
    # 1-5 used the population formula, ~1.41x smaller at n=2)
    full = {
        "metric": "bench_suite_total",
        "value": total,
        "unit": "sec",
        "core_total": core_total,
        "tail_total": tail_total,
        "queries": timings,
        "sf": sf,
        "stats": stats,
        "protocol": protocol,
        "schema_version": 3,  # round 9: + core/tail split + pinned protocol
    }
    out_path = os.environ.get("SPARK_GRAFT_BENCH_OUT", "BENCH_LATEST.json")
    try:
        with open(out_path, "w") as fh:
            fh.write(json.dumps(full) + "\n")
    except OSError:
        pass  # stdout line below is still the contract
    print(line, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
