"""Layout-engine parity at the reference's second dataset decade.

The reference publishes two scales (``pc-cli/examples/partition.rs:7-19``,
BASELINE.md): 200M points (AHN4 C_69AZ1 — matched in round 3: grid(1)
44-61 s vs 46.0 s) and 2B points (AHN3 Delft: grid(1) 375.6 s, quadtree
398.2 s).  2B does not fit this sandbox's disk (3 copies x ~40 B/pt =
~240 GB vs ~80 GB free), so this script brackets the missing decade at
500M-1B with SEQUENTIAL lifecycle management — each layout is measured,
validated, then deleted before the next starts, so peak usage is
convert + one layout (~2 copies):

    python scripts/scaling_layout_big.py [n_points ...]

Prints one JSON line per scale.  Workload runs against the grid layout
BEFORE it is deleted (the convert-then-query discipline the engine
advocates).  Count conservation asserts each layout lost/duplicated
nothing — the reference's own cross-layout invariant
(``pc-cli/examples/partition.rs:21-136``).
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from agile_lakehouse_spark import get_session
from agile_lakehouse_spark.operators import pointcloud as pc
from agile_lakehouse_spark.plans import layout


def synth_points(spark, n: int):
    """Deterministic synthetic cloud, FIXTURES.md §B shape (same as
    scaling_run.py): x/y/z in [0, 1000), importance in [0, 1)."""
    return spark.range(n).select(
        F.col("id").alias("pid"),
        (((F.col("id") * 2654435761) % 1000000) / 1000.0).alias("x"),
        (((F.col("id") * 40503 + 7) % 1000000) / 1000.0).alias("y"),
        (((F.col("id") * 69069 + 13) % 1000000) / 1000.0).alias("z"),
        ((((F.col("id") + 1) * 2654435761) % 1048576) / 1048576.0).alias("i"),
    )


def run_scale(spark, n: int) -> dict:
    out: dict[str, object] = {"n_points": n}
    tmp = tempfile.mkdtemp(prefix=f"big_layout_{n}_")
    try:
        t0 = time.time()
        synth_points(spark, n).write.mode("overwrite").parquet(f"{tmp}/convert")
        out["convert_s"] = round(time.time() - t0, 2)
        stored = spark.read.parquet(f"{tmp}/convert")

        t0 = time.time()
        layout.write_grid_layout(stored, f"{tmp}/grid", 100.0, 100.0)
        out["grid_s"] = round(time.time() - t0, 2)
        g = spark.read.parquet(f"{tmp}/grid")
        assert g.count() == n, "grid layout lost rows"

        # reference workload over the layout while it exists
        t0 = time.time()
        for k in range(5):
            cx, cy = 100.0 + 160 * k, 80.0 + 150 * k
            pc.range_query(
                g, {"x": (cx, cx + 70.0), "y": (cy, cy + 70.0)}, importance_col="i"
            ).write.format("noop").mode("overwrite").save()
        out["rect_x5_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        for k in range(5):
            cx, cy = 150.0 + 150 * k, 120.0 + 140 * k
            pc.knn(g, cx, cy, 1000).write.format("noop").mode("overwrite").save()
        out["knn_x5_s"] = round(time.time() - t0, 2)
        shutil.rmtree(f"{tmp}/grid", ignore_errors=True)

        t0 = time.time()
        layout.write_quadtree_layout(stored, f"{tmp}/qt", depth=3, side=1024.0)
        out["quadtree_s"] = round(time.time() - t0, 2)
        assert spark.read.parquet(f"{tmp}/qt").count() == n, "quadtree layout lost rows"
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    out["grid_pts_per_s"] = round(n / out["grid_s"])
    out["quadtree_pts_per_s"] = round(n / out["quadtree_s"])
    return out


def _meminfo() -> dict:
    """Page-cache / free-memory snapshot (MB) — the round-7 lesson: 2 B
    wall-clocks on this box swing ±25-85% with cache state, so every
    protocol run RECORDS it instead of hoping."""
    out = {}
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                k, v = line.split(":", 1)
                if k in ("MemAvailable", "Cached", "Dirty"):
                    out[k.lower() + "_mb"] = int(v.strip().split()[0]) // 1024
    except OSError:
        pass
    return out


def _drop_caches() -> bool:
    """Best-effort page-cache drop for a pinned cold-start state.
    Returns whether it worked (needs root + a writable procfs; recorded
    either way so runs are comparable only within the same state)."""
    import subprocess

    try:
        subprocess.run(["sync"], check=True, timeout=120)
        with open("/proc/sys/vm/drop_caches", "w") as f:
            f.write("3\n")
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def protocol_header(spark) -> dict:
    """The pinned 2 B measurement protocol (round-8 verdict item 3):
    record heap + cache state so cross-round numbers are comparable.
    Protocol: SPARK_DRIVER_MEMORY=64g, attempt a cache drop before each
    layout, grid then quadtree in ONE session, meminfo before/after."""
    return {
        "driver_memory": spark.conf.get("spark.driver.memory", "unset"),
        "parallelism": spark.sparkContext.defaultParallelism,
        "meminfo_start": _meminfo(),
    }


def _footer_stats(root: str, acc: dict) -> int:
    """The reference's evaluation job (``scripts/evaluation.py:36-103``)
    over one layout band: FOOTER-ONLY row-group stats via pyarrow
    metadata (no data pages read), accumulated per quadtree level so the
    band-split union can be audited for row-group tightness exactly the
    way the reference audits its single-job outputs.  Returns the band's
    row count (footer ``num_rows`` — replaces the validation count scan
    when stats are on)."""
    import glob as g

    import pyarrow.parquet as pq

    total = 0
    for path in g.glob(f"{root}/**/*.parquet", recursive=True):
        lvl = "?"
        for part in path.split("/"):
            if part.startswith("level="):
                lvl = part.split("=", 1)[1]
        md = pq.read_metadata(path)
        s = acc.setdefault(
            lvl, {"files": 0, "rows": 0, "rg": 0, "rg_rows": [], "dx": [], "dy": []}
        )
        s["files"] += 1
        s["rows"] += md.num_rows
        s["rg"] += md.num_row_groups
        total += md.num_rows
        for r in range(md.num_row_groups):
            rg = md.row_group(r)
            s["rg_rows"].append(rg.num_rows)
            for ci in range(rg.num_columns):
                col = rg.column(ci)
                st = col.statistics
                if st is None or st.max is None or st.min is None:
                    continue
                if col.path_in_schema == "x":
                    s["dx"].append(st.max - st.min)
                elif col.path_in_schema == "y":
                    s["dy"].append(st.max - st.min)
    return total


def _summarize_level_stats(acc: dict) -> dict:
    import numpy as np

    out = {}
    for lvl, s in sorted(acc.items()):
        rg_rows = np.array(s["rg_rows"]) if s["rg_rows"] else np.array([0])
        dx = np.array(s["dx"]) if s["dx"] else np.array([0.0])
        dy = np.array(s["dy"]) if s["dy"] else np.array([0.0])
        out[lvl] = {
            "files": s["files"],
            "rows": s["rows"],
            "row_groups": s["rg"],
            "rg_rows_mean": round(float(rg_rows.mean()), 1),
            "rg_rows_std": round(float(rg_rows.std()), 1),
            "rg_dx_mean": round(float(dx.mean()), 2),
            "rg_dy_mean": round(float(dy.mean()), 2),
        }
    return out


def run_scale_banded(
    spark,
    n: int,
    layouts: str = "grid,qt",
    stats: bool = False,
    qtbands: int = 7,
    keep_cells: bool = False,
    gate: float | None = None,
    layout_gate: float | None = None,
) -> dict:
    """The 1 B-point decade via the reference's own windowed discipline
    (``pc-cli/src/partition.rs:249-374``): generate -> layout -> validate
    -> delete one BAND at a time, so peak disk is one band's convert +
    one band's layout (~2 x n/bands x 40 B) instead of 2 x n x 40 B.

    Bands are chosen so cells NEVER straddle a band, which makes the
    union of the band outputs exactly the layout a single job would
    write (no post-merge compact needed):

    - grid(100): five x-bands aligned to the 100 m cell edge
      ([0,200), [200,400), ... — every cell lies wholly in one band);
    - quadtree(depth 3, side 1024): levels 0-2 as one band (their
      importance slabs are disjoint from level 3's), then level 3 split
      into four x-bands aligned to its 128-unit cells.

    Per-band times are summed — the honest cost of laying out n points
    on this disk; a 1000-executor cluster runs the bands concurrently.
    """
    out: dict[str, object] = {"n_points": n, "mode": "banded", "layouts": layouts}
    out.update(protocol_header(spark))
    tmp = tempfile.mkdtemp(prefix=f"big_layout_banded_{n}_")
    pts = synth_points(spark, n)
    want = set(layouts.split(","))
    try:
        # --- grid(100) in five x-aligned bands: "grid" = 1 importance
        # slice, "grid8" = 8 importance slices per xy cell (the
        # reference's xyi-windowed grid(8), partition.rs:61,119).  The
        # banding stays exact for both: importance slices subdivide a
        # CELL, and no cell straddles an x-band.
        for gname, gsplits in (("grid", None), ("grid8", 8)):
            if gname not in want:
                continue
            out[f"{gname}_cache_dropped"] = _drop_caches()
            out[f"{gname}_meminfo_before"] = _meminfo()
            grid_s = convert_s = 0.0
            total_rows = 0
            band_times = []
            for lo in (0.0, 200.0, 400.0, 600.0, 800.0):
                band = pts.filter((F.col("x") >= lo) & (F.col("x") < lo + 200.0))
                t0 = time.time()
                band.write.mode("overwrite").parquet(f"{tmp}/bconv")
                convert_s += time.time() - t0
                # mid-run canary gate (round-12, verdict item 1): the convert
                # step is the per-run box-speed canary (identical code + data
                # every run; healthy band 42-91 s total at 2 B).  Once the
                # CUMULATIVE convert alone exceeds the gate the sample can no
                # longer qualify as healthy-window — abort instead of spending
                # 30+ min measuring a degraded host.
                if gate is not None and convert_s > gate:
                    out["aborted"] = f"convert_gate:{gname}"
                    out[f"{gname}_convert_s_partial"] = round(convert_s, 2)
                    out[f"{gname}_band_s_partial"] = band_times
                    return out
                stored = spark.read.parquet(f"{tmp}/bconv")
                t0 = time.time()
                if gsplits is None:
                    layout.write_grid_layout(stored, f"{tmp}/bgrid", 100.0, 100.0)
                else:
                    layout.write_grid_layout(
                        stored, f"{tmp}/bgrid", 100.0, 100.0,
                        importance_splits=gsplits,
                    )
                dt = time.time() - t0
                grid_s += dt
                band_times.append(round(dt, 2))
                # layout-phase gate (round-12): host stalls land on layout
                # phases the convert canary cannot see — attempt 23 ran FOUR
                # bands at 2-5x healthy layout times while its cumulative
                # convert stayed under the gate.  Healthy per-band grid
                # layouts are 30-123 s (r10's 400.2 s sample); a single band
                # past the layout gate means the sample cannot be healthy.
                if layout_gate is not None and dt > layout_gate:
                    out["aborted"] = f"layout_gate:{gname}"
                    out[f"{gname}_convert_s_partial"] = round(convert_s, 2)
                    out[f"{gname}_band_s_partial"] = band_times
                    return out
                total_rows += spark.read.parquet(f"{tmp}/bgrid").count()
                shutil.rmtree(f"{tmp}/bgrid", ignore_errors=True)
                shutil.rmtree(f"{tmp}/bconv", ignore_errors=True)
            assert total_rows == n, f"{gname} bands lost rows: {total_rows} != {n}"
            out[f"{gname}_convert_s"] = round(convert_s, 2)
            if gname == "grid":
                out["convert_s"] = out["grid_convert_s"]  # legacy key
            out[f"{gname}_s"] = round(grid_s, 2)
            out[f"{gname}_band_s"] = band_times
            out[f"{gname}_pts_per_s"] = round(n / grid_s)
            total_rows = 0

        # --- quadtree(depth 3) in seven cell-aligned bands ---------------
        # importance cuts (framework.rs:169-219): cumulative cell counts
        # 1/5/21/85 make the level slabs i ∈ [0,1/85) / [1/85,5/85) /
        # [5/85,21/85) / [21/85,1).  Round 9 ran levels 0-2 as ONE band
        # (494 M rows at 2 B) and it cost 2-2.5x the per-row rate of the
        # 376 M level-3 bands — 39-53% of every run (r9 verdict item 4).
        # Round 10 splits it by LEVEL: levels 0-1 (5/85 ≈ 118 M) as one
        # band, level 2 (16/85 ≈ 376 M) as two x-bands at 512 (level-2
        # cell edge is 1024/4 = 256, so 512 is cell-aligned); level 3
        # stays x-banded at 256 (cell edge 128).  Every band is now
        # ≤ 376 M rows, the steady-state shuffle size.
        cut_l2, cut_l3 = 5.0 / 85.0, 21.0 / 85.0
        out["qt_cache_dropped"] = _drop_caches() if "qt" in want else None
        out["qt_meminfo_before"] = _meminfo()
        qt_s = qt_convert_s = 0.0
        total_rows = 0
        band_times = []
        l2 = (F.col("i") >= cut_l2) & (F.col("i") < cut_l3)
        if qtbands == 7:
            head_bands = [
                pts.filter(F.col("i") < cut_l2),
                pts.filter(l2 & (F.col("x") < 512.0)),
                pts.filter(l2 & (F.col("x") >= 512.0)),
            ]
        else:  # the round-9 5-band protocol: levels 0-2 as ONE band
            head_bands = [pts.filter(F.col("i") < cut_l3)]
        out["qt_bands"] = qtbands
        out["qt_keep_cells"] = keep_cells
        bands = head_bands + [
            pts.filter(
                (F.col("i") >= cut_l3) & (F.col("x") >= lo) & (F.col("x") < lo + 256.0)
            )
            for lo in (0.0, 256.0, 512.0, 768.0)
        ]
        level_acc: dict = {}
        for band in bands if "qt" in want else ():
            t0 = time.time()
            band.write.mode("overwrite").parquet(f"{tmp}/bconv")
            qt_convert_s += time.time() - t0
            if gate is not None and qt_convert_s > gate:
                out["aborted"] = "convert_gate"
                out["qt_convert_s_partial"] = round(qt_convert_s, 2)
                out["qt_band_s_partial"] = band_times
                return out
            stored = spark.read.parquet(f"{tmp}/bconv")
            t0 = time.time()
            layout.write_quadtree_layout(
                stored, f"{tmp}/bqt", depth=3, side=1024.0, keep_cell_cols=keep_cells
            )
            dt = time.time() - t0
            qt_s += dt
            # layout-only, same convention as grid_band_s — converts are
            # reported in their own scalar so band lists stay comparable
            band_times.append(round(dt, 2))
            if stats:
                # footer-only per-level audit doubles as the validation
                # count (num_rows comes from the same footers)
                total_rows += _footer_stats(f"{tmp}/bqt", level_acc)
            else:
                total_rows += spark.read.parquet(f"{tmp}/bqt").count()
            shutil.rmtree(f"{tmp}/bqt", ignore_errors=True)
            shutil.rmtree(f"{tmp}/bconv", ignore_errors=True)
        if "qt" in want and stats:
            out["qt_level_stats"] = _summarize_level_stats(level_acc)
        if "qt" in want:
            assert total_rows == n, f"quadtree bands lost rows: {total_rows} != {n}"
            out["quadtree_s"] = round(qt_s, 2)
            out["quadtree_convert_s"] = round(qt_convert_s, 2)
            out["quadtree_band_s"] = band_times
            out["quadtree_pts_per_s"] = round(n / qt_s)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    out["meminfo_end"] = _meminfo()
    return out


def probe_gate(spark, n: int, gate: float) -> dict:
    """Up-front window gate (round-12, verdict item 1): convert n/10
    points — 1/10th of the run's own canary workload — and compare
    against gate/10.  A 10x-degraded window (the round-11 mode: canaries
    289-1028 s vs healthy 42-91 s) fails this in seconds instead of
    being discovered 30 minutes into a doomed measurement.  A stall can
    still begin mid-run; the cumulative mid-run gate catches that."""
    tmp = tempfile.mkdtemp(prefix="gate_probe_")
    try:
        t0 = time.time()
        synth_points(spark, n // 10).write.mode("overwrite").parquet(f"{tmp}/p")
        dt = time.time() - t0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return {"probe_convert_s": round(dt, 2), "ok": dt <= gate / 10.0}


def main() -> None:
    flags = [a for a in sys.argv[1:] if a.startswith("--")]
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    banded = "--banded" in flags
    stats = "--stats" in flags
    layouts = "grid,qt"
    qtbands_seq = [7]
    qtcells_seq = ["drop"]
    gate = None
    layout_gate = None
    samples = 1
    max_attempts = 12
    retry_sleep = 120.0
    for f in flags:
        if f.startswith("--layouts="):
            layouts = f.split("=", 1)[1]
        if f.startswith("--qtbands="):
            # comma list enables in-session alternating A/B (e.g. 7,5,7,5)
            # — the drift-controlled way to compare band protocols on a
            # box whose disk throughput swings 30-50% between windows
            qtbands_seq = [int(v) for v in f.split("=", 1)[1].split(",")]
        if f.startswith("--qtcells="):
            # same alternating discipline for the keep/drop-cell-columns
            # axis (e.g. --qtcells=keep,drop,keep,drop)
            qtcells_seq = f.split("=", 1)[1].split(",")
        if f.startswith("--gate="):
            # healthy-window convert budget in seconds (2 B grid: ~130 =
            # 1.5x the 42-91 s healthy band).  Enables the probe gate +
            # mid-run abort + retry-until-healthy sampling loop.
            gate = float(f.split("=", 1)[1])
        if f.startswith("--layout-gate="):
            # per-band layout ceiling (2 B grid: ~300 = 2.5x the largest
            # healthy band) — aborts runs whose stalls land on layout
            # phases instead of converts
            layout_gate = float(f.split("=", 1)[1])
        if f.startswith("--samples="):
            samples = int(f.split("=", 1)[1])
        if f.startswith("--max-attempts="):
            max_attempts = int(f.split("=", 1)[1])
        if f.startswith("--retry-sleep="):
            retry_sleep = float(f.split("=", 1)[1])
    sizes = [int(a) for a in args] or [500_000_000]
    # The sandbox's virtual host stalls the whole guest for minutes at a
    # time (dmesg hrtimer-interrupt warnings; observed 8-minute windows
    # where the in-process driver answered no RPC): with default
    # 10s-heartbeat/120s-network timeouts the executor declares the
    # driver dead mid-band and aborts an otherwise-healthy 2 B write.
    # Tolerate stalls the way a production cluster does — long heartbeat
    # interval + network/RPC timeouts sized to the longest band write —
    # rather than treating host steal as engine failure.
    spark = get_session(
        "scaling-big-layout",
        extra_conf={
            "spark.executor.heartbeatInterval": "60s",
            "spark.network.timeout": "1200s",
            "spark.rpc.askTimeout": "600s",
            "spark.rpc.lookupTimeout": "600s",
            # parquet-mr 1.16 vectored IO enforces a HARDCODED 300 s
            # per-range fetch deadline (ParquetFileReader.
            # HADOOP_VECTORED_READ_TIMEOUT_SECONDS) — a round-11 grid run
            # died on it when a host stall held a 134 MB range past 300 s.
            # Blocking IO has no deadline; on healthy storage vectored IO
            # is a win, so this stays runner-local, not in get_session.
            "spark.hadoop.parquet.hadoop.vectored.io.enabled": "false",
        },
    )
    # get_session uses getOrCreate: a pre-existing session in this process
    # would silently drop the stall-tolerance conf and reintroduce the
    # heartbeat aborts this script exists to survive — fail loudly instead.
    hb = spark.conf.get("spark.executor.heartbeatInterval", "unset")
    if hb != "60s":
        raise RuntimeError(
            f"stall-tolerance conf not applied (heartbeatInterval={hb}); "
            "a SparkSession already existed in this process — run this "
            "script in a fresh interpreter"
        )
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        if banded and gate is not None:
            # retry-until-healthy sampling: only runs whose TOTAL convert
            # canary lands under the gate count as samples; probe-gated
            # and mid-run-aborted attempts are printed (for the protocol
            # record) but not counted.
            collected, attempts = 0, 0
            # one unrecorded warm write so the first probe measures the
            # box, not JVM/codegen warmup (the bench.py per-entry-warmup
            # discipline, round 10)
            wtmp = tempfile.mkdtemp(prefix="gate_warm_")
            try:
                synth_points(spark, 1_000_000).write.mode("overwrite").parquet(f"{wtmp}/w")
            finally:
                shutil.rmtree(wtmp, ignore_errors=True)
            while collected < samples and attempts < max_attempts:
                attempts += 1
                pr = probe_gate(spark, n, gate)
                pr.update({"attempt": attempts, "n_points": n, "gate": gate})
                print(json.dumps(pr), flush=True)
                if not pr["ok"]:
                    time.sleep(retry_sleep)
                    continue
                rec = run_scale_banded(spark, n, layouts, stats,
                                       qtbands_seq[0], qtcells_seq[0] == "keep",
                                       gate=gate, layout_gate=layout_gate)
                rec["attempt"] = attempts
                print(json.dumps(rec), flush=True)
                conv = rec.get(
                    "convert_s",
                    rec.get("grid8_convert_s", rec.get("quadtree_convert_s", 1e18)),
                )
                if "aborted" not in rec and conv <= gate:
                    rec["healthy_sample"] = True
                    collected += 1
                else:
                    time.sleep(retry_sleep)
            print(json.dumps({"gated_samples_collected": collected,
                              "attempts": attempts, "gate": gate}), flush=True)
        elif banded:
            n_runs = max(len(qtbands_seq), len(qtcells_seq))
            for k in range(n_runs):
                qb = qtbands_seq[k % len(qtbands_seq)]
                kc = qtcells_seq[k % len(qtcells_seq)] == "keep"
                print(
                    json.dumps(run_scale_banded(spark, n, layouts, stats, qb, kc)),
                    flush=True,
                )
        else:
            print(json.dumps(run_scale(spark, n)), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
