"""Import-surface smoke test (round 13, VERDICT r12 item 6).

Round 12 shipped a regression the pytest suite could not see: an edit
inserting one function swallowed the NEIGHBOURING ``def`` line, absorbing
``minhash_store_update``'s body as dead code inside the new function — the
module still imported, every remaining test still passed, and only the
bench run (via ``curate_corpus_incremental``) caught the missing name
(git 5d00c2d).  This test turns that failure class into a test failure:
every public callable (and public method of locally-defined classes) in
the package is pinned with its parameter names in
``import_surface_snapshot.json``.

- A DELETED or RENAMED public callable -> missing-name failure.
- A CHANGED signature (params renamed/removed/reordered) -> param failure.
- ADDITIONS never fail — the snapshot is asserted as a subset, so the pin
  only bites on deliberate surface changes, which regenerate via
  ``python scripts/gen_import_surface.py > tests/import_surface_snapshot.json``.

Mutation check (recorded, not automated): deleting the
``def minhash_store_update`` line exactly as 5d00c2d did makes this test
fail with "missing from agile_lakehouse_spark.operators.dedup:
['minhash_store_update']" — verified by hand before committing the pin.

No SparkSession needed: signatures are inspected at import time, so this
is the cheapest test in the suite and runs first alphabetically-ish.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from scripts.gen_import_surface import surface  # noqa: E402

SNAPSHOT = os.path.join(os.path.dirname(__file__), "import_surface_snapshot.json")


def test_public_surface_matches_snapshot():
    with open(SNAPSHOT) as fh:
        pinned = json.load(fh)
    live = surface()
    problems: list[str] = []
    for mod, funcs in pinned.items():
        if mod not in live:
            problems.append(f"module vanished: {mod}")
            continue
        missing = sorted(set(funcs) - set(live[mod]))
        if missing:
            problems.append(f"missing from {mod}: {missing}")
        for name, params in funcs.items():
            got = live[mod].get(name)
            if got is not None and got != params:
                problems.append(
                    f"{mod}.{name} signature changed: pinned {params} -> live {got}"
                )
    assert not problems, (
        "public import surface drifted (deliberate? regenerate via "
        "scripts/gen_import_surface.py):\n" + "\n".join(problems)
    )


def test_snapshot_is_not_trivially_empty():
    """Guard the guard: an empty/corrupt snapshot would make the subset
    assertion vacuous."""
    with open(SNAPSHOT) as fh:
        pinned = json.load(fh)
    n = sum(len(v) for v in pinned.values())
    assert len(pinned) >= 25 and n >= 300, (len(pinned), n)
    # spot-pin the exact name whose loss motivated this test
    assert "minhash_store_update" in pinned["agile_lakehouse_spark.operators.dedup"]
