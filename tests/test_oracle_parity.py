"""Cross-engine parity smoke inside pytest (fast subset at sf0.001).

The driver's t2 gate runs the FULL registry at sf0.01; this guards the
portable-determinism machinery (hash, rounding, fold order) on every test
run so a regression fails CI before the driver sees it.
"""

import math

import duckdb
import pytest

from agile_lakehouse_spark import declared
from agile_lakehouse_spark.sources.catalog import TABLES

SUBSET = [
    "dq02_pc_range",       # half-open range semantics
    "dq08_pc_knn",         # top-k + distance arithmetic
    "dq09_groupby_agg",    # float aggregate rounding
    "dq16_window_running", # window frame + timestamp handling
    "dq21b_dedup_minhash", # portable hash + LSH
    "dq22_ann_topk",       # fold-order-sensitive dot products
    "dq23c_quality_score", # rational-arithmetic rounding ties
    "dq65_tpch_q2",        # correlated-min equality on stored doubles
    "dq70_pc_zorder_cells",# Morton bit-interleave portability
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda j: cols[j])
    out = []
    for r in rows:
        vals = []
        for j in order:
            v = r[j]
            if isinstance(v, float):
                v = "NaN" if math.isnan(v) else round(v, 9)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


@pytest.mark.parametrize("name", SUBSET)
def test_parity(name, spark, sf_dir, duck):
    sdf = declared.SPARK_QUERIES[name](spark, sf_dir)
    scols, srows = sdf.columns, [tuple(r) for r in sdf.collect()]
    res = duck.execute(declared.ORACLES[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols)
    assert len(srows) == len(drows)
    assert _norm(srows, scols) == _norm(drows, dcols)


def test_driver_contract_registry_consistency():
    """Every oracle key must have a query; every query except the declared
    rows-only ones must have an oracle; names follow the dqNN convention."""
    import re

    import __spark_entry__ as entry

    qs, os_ = entry.queries(), entry.oracle_sql()
    # every declared query now carries an oracle (dq25 was rows-only until
    # the round-4 native media codecs made its decoded values SQL-checkable)
    rows_only = set()
    assert set(os_) == set(qs) - rows_only
    for name in qs:
        assert re.fullmatch(r"dq\d{2,3}[a-z]?_[a-z0-9_]+", name), name
    assert len(qs) >= 80
