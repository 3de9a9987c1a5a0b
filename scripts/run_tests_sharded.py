"""Poor-man's pytest-xdist: run the suite as N concurrent pytest
processes over disjoint test-file shards (VERDICT r10 item 8 — the
single-process suite had grown past 20 minutes; xdist itself is not
installed in this container and installs are off-limits).

    python scripts/run_tests_sharded.py [n_shards]   # default 3

Each shard is its own interpreter with its own local[SPARK_GRAFT_CPUS]
SparkSession (cpus split evenly), its own --basetemp (no tmp-dir races),
and -p no:cacheprovider (no .pytest_cache write races).  Shards are
balanced by a static weight map measured on this box (file size is a
poor proxy — codec tests are big but fast); unknown files weigh 1.
Exit code is non-zero if ANY shard fails; the per-shard tails and the
aggregate pass/fail/skip counts are printed so the gate tally stays
comparable to the single-process run.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys
import tempfile
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]

# relative weights, recalibrated from the round-11 3-shard run (912 s:
# the llm_ops shard bounded the wall clock at 2.6x the lightest shard)
WEIGHTS = {
    "test_llm_ops.py": 9.0,
    "test_oracle_parity.py": 3.0,
    "test_streaming.py": 3.0,
    "test_layout.py": 2.5,
    "test_snapshots.py": 2.5,
    "test_laz_native.py": 2.0,
    "test_properties.py": 2.0,
    "test_semantic_store.py": 1.5,
    "test_relational_plans.py": 1.5,
    "test_sources.py": 1.5,
    "test_pointcloud.py": 1.0,
    "test_codecs.py": 1.0,
    "test_ply_binary.py": 1.0,
    "test_graph.py": 0.5,
    "test_las_native.py": 0.5,
    "test_udtf.py": 0.5,
}


def shard_files(n: int) -> list[list[str]]:
    files = sorted(p.name for p in (ROOT / "tests").glob("test_*.py"))
    # greedy longest-processing-time: heaviest file to the lightest shard
    shards: list[list[str]] = [[] for _ in range(n)]
    loads = [0.0] * n
    for f in sorted(files, key=lambda f: -WEIGHTS.get(f, 1.0)):
        i = loads.index(min(loads))
        shards[i].append(f)
        loads[i] += WEIGHTS.get(f, 1.0)
    return [s for s in shards if s]


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    per = max(2, cpus // n)
    shards = shard_files(n)
    procs = []
    t0 = time.time()
    for i, files in enumerate(shards):
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(per))
        base = tempfile.mkdtemp(prefix=f"pytest_shard{i}_")
        log = open(f"/tmp/pytest_shard{i}.log", "w")
        cmd = [
            sys.executable, "-m", "pytest", "-q",
            "-p", "no:cacheprovider", f"--basetemp={base}",
            *[f"tests/{f}" for f in files],
        ]
        proc = subprocess.Popen(cmd, cwd=ROOT, env=env, stdout=log, stderr=log)
        log.close()  # the child owns its own fd; don't leak the parent copy
        procs.append((i, files, log.name, proc))
    failed = False
    totals = {"passed": 0, "failed": 0, "skipped": 0, "error": 0}
    for i, files, logname, p in procs:
        rc = p.wait()
        full = Path(logname).read_text()
        tail = full[-2000:]
        # parse the FINAL pytest summary line from the whole log, searched
        # backwards — a long traceback or warnings block after the counts
        # line must not silently zero the aggregate tally (r11 advice)
        counts: dict[str, int] = {}
        for line in reversed(full.splitlines()):
            m = re.findall(r"(\d+) (passed|failed|skipped|error)", line)
            if m and (" in " in line or "no tests ran" in line):
                counts = {k: int(v) for v, k in m}
                break
        for k in totals:
            totals[k] += counts.get(k, 0)
        status = "ok" if rc == 0 else f"RC={rc}"
        print(f"shard {i} [{status}] {counts or tail.splitlines()[-3:]}: {' '.join(files)}")
        if rc != 0:
            failed = True
            print(tail)
    print(
        f"TOTAL {totals['passed']} passed, {totals['failed']} failed, "
        f"{totals['skipped']} skipped, {totals['error']} errors "
        f"in {time.time() - t0:.0f}s across {len(shards)} shards"
    )
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
