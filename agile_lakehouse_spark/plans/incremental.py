"""Incrementally-maintained aggregates (materialized views) over
:class:`~agile_lakehouse_spark.plans.snapshots.TransactionalTable`.

At 100 TB, re-running a rollup over the full table per refresh is the
dominant cost of any reporting pipeline.  Because the snapshot log records
exactly which immutable files each version references, an append-only
history gives change-data capture for free: the file-set difference IS the
delta.  A refresh then costs O(new data), not O(table):

    partial  = delta.groupBy(keys).agg(...)        # scan only new files
    state'   = merge(state, partial)               # re-agg by key

Only commutative-monoid aggregates compose this way — count/sum merge by
SUM, min by MIN, max by MAX.  (avg must be maintained as sum+count and
derived at read time; distinct counts need a sketch, e.g. HLL.)  Non-append
commits (overwrite/delete/merge) invalidate the delta equivalence, so the
refresh detects them via the commit log and falls back to a full recompute
— correctness never depends on the fast path applying.

The reference has no incremental machinery (batch-only, single process);
this is lakehouse table infrastructure the Spark engine adds on top of the
same commit-log design as plans/snapshots.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from agile_lakehouse_spark.plans.snapshots import TransactionalTable

# out_col -> (op, in_col); op ∈ MERGE_OPS
MERGE_OPS = {
    "count": (F.count, F.sum),  # partial: count(in); merge: sum of partials
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}

_TXN_APP = "incremental-view"


class IncrementalAggregate:
    """A keyed aggregate over a source table, refreshed incrementally.

    ``aggs``: ``{out_col: (op, in_col)}`` with op in count/sum/min/max.
    The view's own storage is a :class:`TransactionalTable`, so refreshes
    are themselves ACID and the refresh high-water mark rides the commit
    log's ``txn`` marker (app=incremental-view, batch=source version) —
    crash between compute and commit re-runs the same delta idempotently.
    """

    def __init__(self, source: TransactionalTable, view_path: str, keys: list[str], aggs: dict[str, tuple[str, str]]):
        for out, (op, _col) in aggs.items():
            if op not in MERGE_OPS:
                raise ValueError(f"{out}: op {op!r} is not incrementally mergeable {tuple(MERGE_OPS)}")
        self.source = source
        self.view = TransactionalTable(view_path)
        self.keys = keys
        self.aggs = aggs

    # -- aggregate builders --------------------------------------------------

    def _partial(self, df: DataFrame) -> DataFrame:
        exprs = [
            MERGE_OPS[op][0](in_col).alias(out) for out, (op, in_col) in self.aggs.items()
        ]
        return df.groupBy(*self.keys).agg(*exprs)

    def _merge(self, state: DataFrame, partial: DataFrame) -> DataFrame:
        exprs = [
            MERGE_OPS[op][1](out).alias(out) for out, (op, _in) in self.aggs.items()
        ]
        return state.unionByName(partial).groupBy(*self.keys).agg(*exprs)

    # -- refresh -------------------------------------------------------------

    def last_refreshed_version(self) -> int:
        return self.view.last_txn_batch(_TXN_APP)

    def refresh(self, spark: SparkSession) -> dict:
        """Bring the view up to the source's latest version.

        Returns ``{"mode": "incremental"|"full"|"noop", "files_read": n,
        "source_version": v}``.
        """
        src_v = self.source.latest_version()
        if src_v is None:
            return {"mode": "noop", "files_read": 0, "source_version": None}
        last = self.last_refreshed_version()
        if last == src_v:
            return {"mode": "noop", "files_read": 0, "source_version": src_v}

        incremental = (
            last >= 0
            and self.source.appends_only_between(last, src_v)
        )
        if incremental:
            delta_files = self.source.added_files(last, src_v)
            if not delta_files:
                # version advanced with no new files (e.g. empty append)
                self.view.overwrite(self.view.read(spark), txn=(_TXN_APP, src_v))
                return {"mode": "incremental", "files_read": 0, "source_version": src_v}
            partial = self._partial(spark.read.parquet(*delta_files))
            state = self._merge(self.view.read(spark), partial)
            n_read = len(delta_files)
        else:
            state = self._partial(self.source.read(spark, src_v))
            n_read = len(self.source._read_manifest(src_v)["files"])
        self.view.overwrite(state, txn=(_TXN_APP, src_v))
        return {
            "mode": "incremental" if incremental else "full",
            "files_read": n_read,
            "source_version": src_v,
        }

    def read(self, spark: SparkSession) -> DataFrame:
        return self.view.read(spark)
