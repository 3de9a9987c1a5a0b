"""Regenerate the pinned public-callable inventory for
tests/test_import_surface.py (round 13, VERDICT r12 item 6).

Run after DELIBERATELY adding/renaming/removing a public function:

    python scripts/gen_import_surface.py > tests/import_surface_snapshot.json

The snapshot records, per module, every public top-level callable and its
parameter names.  The pytest asserts the snapshot is a SUBSET of the live
surface (additions never fail; deletions and signature changes do), which
turns the round-12 5d00c2d failure class — an edit that swallowed a
neighbouring ``def`` line, leaving its body as dead code inside another
function — into a test failure instead of a bench failure.
"""

from __future__ import annotations

import importlib
import inspect
import json
import pkgutil
import sys

sys.path.insert(0, ".")

PACKAGES = [
    "agile_lakehouse_spark.operators",
    "agile_lakehouse_spark.plans",
    "agile_lakehouse_spark.functions",
    "agile_lakehouse_spark.sources",
    "agile_lakehouse_spark.streaming",
]
MODULES = ["agile_lakehouse_spark.schema", "agile_lakehouse_spark.session"]


def iter_modules():
    for pkg_name in PACKAGES:
        pkg = importlib.import_module(pkg_name)
        for m in pkgutil.iter_modules(pkg.__path__):
            yield f"{pkg_name}.{m.name}"
    yield from MODULES


def surface() -> dict[str, dict[str, list[str]]]:
    out: dict[str, dict[str, list[str]]] = {}
    for mod_name in sorted(set(iter_modules())):
        mod = importlib.import_module(mod_name)
        funcs: dict[str, list[str]] = {}
        for name, obj in sorted(vars(mod).items()):
            if name.startswith("_") or not callable(obj):
                continue
            if getattr(obj, "__module__", None) != mod_name:
                continue  # re-exports are pinned where they're defined
            try:
                params = list(inspect.signature(obj).parameters)
            except (TypeError, ValueError):
                continue
            funcs[name] = params
            if inspect.isclass(obj):
                # public methods of locally-defined classes (the store API)
                for mname, meth in sorted(vars(obj).items()):
                    if mname.startswith("_") or not callable(meth):
                        continue
                    try:
                        funcs[f"{name}.{mname}"] = list(
                            inspect.signature(meth).parameters
                        )
                    except (TypeError, ValueError):
                        continue
        if funcs:
            out[mod_name] = funcs
    return out


if __name__ == "__main__":
    json.dump(surface(), sys.stdout, indent=1, sort_keys=True)
    sys.stdout.write("\n")
