"""Noise-normalized cross-round bench comparison.

Usage:
    python scripts/bench_compare.py BENCH_r08.json BENCH_LATEST.json

Rounds 5-8 kept flagging phantom per-entry regressions because the box's
in-session noise floor (measured by bench.py's post-suite probe rerun:
r09 sidecar — relative spread median 0.107, max 0.29 on a 1.1 s probe;
absolute delta up to ~0.69 s) exceeds most entry-to-entry deltas.  This
tool reads two bench artifacts (either the driver's BENCH_r*.json
wrapper with a "parsed" field, or bench.py's sidecar schema) and
classifies each common entry PER ENTRY (bench.py's own stated rule —
deltas under ``max(probe_delta_max, ~10% of mean)`` are noise):

- REGRESSED / IMPROVED: |delta| > max(abs jitter floor,
  rel_band * old mean) — worth a plan diff.  The relative band is the
  probe-spread MEDIAN, not the max: the max is driven by the sub-second
  jitter floor, and applying it globally AND-ed with the absolute floor
  masked genuine ~25% regressions on multi-second entries (round-9
  advice).  The absolute floor alone absorbs the sub-second jitter.
- noise: inside the band — reported only in aggregate.

Thresholds come from the NEWER artifact's recorded protocol
(probe_spread_median / probe_delta_max_s) when present (bench.py schema
3, round 9+), else the round-9 sidecar's measured values.
"""

from __future__ import annotations

import json
import sys

DEFAULT_REL_BAND = 0.11  # r09 sidecar probe_spread_median 0.107
DEFAULT_ABS_FLOOR = 0.69  # seconds; r09 sidecar probe_delta_max_s 0.687


def _compact_key(name: str) -> str:
    """bench.py's stdout-line key rule (round 10): dq-registry names are
    reduced to their unique dqNNN[a-z] prefix so the compact line fits the
    driver's 2000-byte window; sidecars keep full names.  Normalizing both
    artifacts through the same rule lets a full-name sidecar compare
    against a prefix-keyed driver artifact (and vice versa)."""
    return name.split("_", 1)[0] if name.startswith("dq") else name


def load(path: str) -> dict:
    with open(path) as fh:
        d = json.load(fh)
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    if "queries" not in d:
        raise SystemExit(f"{path}: no queries payload")
    q = {_compact_key(k): v for k, v in d["queries"].items()}
    if len(q) == len(d["queries"]):  # no collision — safe to normalize
        d = dict(d, queries=q)
    else:
        print(
            f"WARNING: {path}: compact-key normalization skipped (prefix "
            "collision) — comparing against a prefix-keyed artifact will "
            "silently shrink the common-entry set",
            file=sys.stderr,
        )
    return d


def _canary(d: dict) -> float | None:
    """Box-speed canary seconds, wherever the artifact schema put it:
    compact line (round 11+) -> "canary"; sidecar -> protocol.canary_s.
    ``is not None`` (not truthiness): a canary recorded as 0.0 is a
    degenerate MEASUREMENT (sub-ms probe rounded away), not a missing
    one — treat it as unusable rather than silently disabling
    normalization as if the schema lacked the field (r11 advice)."""
    v = d.get("canary", d.get("protocol", {}).get("canary_s"))
    if v is None:
        return None
    v = float(v)
    return v if v > 0.0 else None


def main() -> None:
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    old, new = load(sys.argv[1]), load(sys.argv[2])
    proto = new.get("protocol", {})
    rel_band = max(proto.get("probe_spread_median", 0.0), DEFAULT_REL_BAND)
    abs_floor = max(proto.get("probe_delta_max_s", 0.0), DEFAULT_ABS_FLOOR)
    # Box-drift normalization (round 11): when both artifacts carry the
    # fixed micro-probe canary, a uniform timing shift equal to the canary
    # ratio is the BOX (disk window / host steal), not the engine — scale
    # the new numbers back by it before classifying.  r10's driver
    # artifact ran uniformly 1.23x its same-code sidecar; without the
    # canary every such window costs a flagged-then-cleared round trip.
    c_old, c_new = _canary(old), _canary(new)
    box = c_new / c_old if c_old and c_new else 1.0
    common = sorted(set(old["queries"]) & set(new["queries"]))
    # Trust clamp (r11 advice): the canary is a single ~0.4 s micro-probe
    # that runs the engine under test, so an extreme ratio is ambiguous —
    # a 10x-degraded host OR a genuine engine-wide regression would both
    # inflate it.  Outside [0.7, 1.5] we only normalize when the raw
    # per-entry median corroborates the shift (a real engine regression
    # concentrated in some subsystem would NOT move the median of every
    # entry by the same factor the canary moved).
    raw_ratios = sorted(
        new["queries"][n] / old["queries"][n] for n in common if old["queries"][n] > 0
    )
    med_raw = raw_ratios[len(raw_ratios) // 2] if raw_ratios else 1.0
    if box != 1.0 and not (0.7 <= box <= 1.5):
        corroborated = med_raw > 0 and max(box, med_raw) / min(box, med_raw) <= 1.3
        if corroborated:
            print(
                f"canary ratio {box:.2f}x outside the trust clamp [0.7, 1.5] "
                f"but corroborated by the raw per-entry median ({med_raw:.2f}x) "
                "— applying"
            )
        else:
            print(
                f"canary ratio {box:.2f}x outside the trust clamp [0.7, 1.5] "
                f"and NOT corroborated by the raw per-entry median "
                f"({med_raw:.2f}x) — normalization DISABLED; classify raw and "
                "investigate the canary path (dq01/scan) directly"
            )
            box = 1.0
    if box != 1.0:
        print(
            f"canary: {c_old:.3f}s -> {c_new:.3f}s (box ratio {box:.2f}x, raw "
            f"per-entry median {med_raw:.2f}x) — new timings divided by the "
            "box ratio before classification; movers print raw AND normalized"
        )
    moved, noise_deltas = [], []
    for name in common:
        a, b_raw = old["queries"][name], new["queries"][name]
        if a <= 0:
            continue
        b = b_raw / box
        delta, ratio = b - a, b / a
        if abs(delta) > max(abs_floor, rel_band * a):
            moved.append((name, a, b, ratio, b_raw))
        else:
            noise_deltas.append(ratio)
    print(
        f"{len(common)} common entries; per-entry noise band: "
        f"max(±{abs_floor:.2f}s, ±{rel_band:.0%} of old mean) "
        f"(from {'recorded protocol' if proto else 'defaults'})"
    )
    if noise_deltas:
        noise_deltas.sort()
        med = noise_deltas[len(noise_deltas) // 2]
        print(
            f"{len(noise_deltas)} entries inside the band (median ratio "
            f"{med:.2f}x — a uniform shift here is box drift, not the engine)"
        )
    for name, a, b, ratio, b_raw in sorted(moved, key=lambda m: -abs(m[3] - 1)):
        tag = "REGRESSED" if ratio > 1 else "IMPROVED "
        raw_note = f" [raw {b_raw:.2f}s]" if box != 1.0 else ""
        print(f"{tag} {name}: {a:.2f}s -> {b:.2f}s ({ratio:.2f}x){raw_note}")
    if not moved:
        print("no entry moved beyond the noise band")
    for key in ("value", "core_total", "tail_total"):
        if key in old or key in new:
            print(f"{key}: {old.get(key, '—')} -> {new.get(key, '—')}")


if __name__ == "__main__":
    main()
