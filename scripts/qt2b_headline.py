"""Summarize pinned-protocol 2 B quadtree samples into the SCALE.md headline.

Usage:
    python scripts/qt2b_headline.py /tmp/qt2b_r9.jsonl [more.jsonl ...]

Reads every JSON line holding a banded quadtree result
(``scripts/scaling_layout_big.py --banded --layouts=qt``) and prints:
- per-sample totals with the band-1 share (the cold-I/O position);
- the MEDIAN total and its ratio to the reference's 398.2 s;
- the bands-2+ steady-state rate pooled across samples, and the warm-2B
  extrapolation it implies (the number a multi-writer cluster tracks).

The round-8 verdict's ask: with n >= 4 samples, pin ONE honest headline
— the median total — and attribute the spread to band position instead
of asserting it.
"""

from __future__ import annotations

import json
import statistics
import sys

REF_QT_2B_S = 398.2  # BASELINE.md: AHN3 Delft quadtree, reference single-node


def main() -> None:
    samples = []
    for path in sys.argv[1:]:
        with open(path) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                try:
                    d = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if d.get("mode") == "banded" and "quadtree_s" in d:
                    samples.append(d)
    if not samples:
        raise SystemExit("no banded quadtree samples found")
    totals, steady_rates = [], []
    for i, d in enumerate(samples, 1):
        bands = d["quadtree_band_s"]
        total = d["quadtree_s"]
        totals.append(total)
        n_pts = d["n_points"]
        # bands 2+ hold (1 - 1/len) of the points only approximately for the
        # qt split (band 1 = levels 0-2 importance slab ~ cut of the mass);
        # rate uses the actual per-band share: band 1 = 21/85 of points.
        tail_pts = n_pts * (1 - 21.0 / 85.0)
        tail_s = sum(bands[1:])
        steady_rates.append(tail_pts / tail_s)
        print(
            f"sample {i}: total {total:.1f}s ({total / REF_QT_2B_S:.2f}x ref), "
            f"band1 {bands[0]:.1f}s ({bands[0] / total:.0%} of total), "
            f"bands2+ {tail_s:.1f}s, cache_dropped={d.get('qt_cache_dropped')}"
        )
    med = statistics.median(totals)
    rate = statistics.median(steady_rates)
    warm = 2_000_000_000 / rate
    print(
        f"\nHEADLINE (n={len(totals)}): median total {med:.1f}s = "
        f"{med / REF_QT_2B_S:.2f}x the reference's 398.2s; "
        f"spread {min(totals):.1f}-{max(totals):.1f}s"
    )
    print(
        f"steady-state (bands 2+ pooled median): {rate / 1e6:.1f}M pts/s "
        f"=> warm 2B ~ {warm:.0f}s ({warm / REF_QT_2B_S:.2f}x ref)"
    )


if __name__ == "__main__":
    main()
