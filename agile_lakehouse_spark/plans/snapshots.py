"""Minimal ACID table layer: versioned snapshots over plain Parquet.

The lakehouse story (BASELINE.json: "Spark + Delta/Iceberg") needs ACID
appends/overwrites and time travel; neither Delta nor Iceberg is available
in this environment, so this module implements the essential mechanism the
same way those formats do — an append-only **commit log** of versioned
manifests listing immutable data files, made atomic by ``os.rename``
(atomic on POSIX within a filesystem):

    table/
      _log/v00000000.json   {"version":0,"files":[...],"op":"append"}
      _log/v00000001.json
      part-....parquet      (immutable data files)

- Readers pick the highest committed version (or an explicit one — time
  travel) and read exactly its file list: consistent snapshots, no torn
  reads of half-written data.
- Writers stage data files first, then commit the manifest; a failed write
  leaves orphan files but never a corrupt table.
- Concurrency: optimistic — the commit point is an atomic put-if-absent
  (``os.link``, which raises ``FileExistsError`` if the target exists);
  a writer that loses the race gets :class:`CommitConflict` and retries
  on the new latest version.  Plain ``rename`` would NOT work here:
  POSIX rename silently replaces an existing target, so two racing
  writers could both "succeed" and the later one would clobber the
  earlier committed manifest (a lost append).

In production swap this for Delta/Iceberg; the engine's call sites
(append/overwrite/read/history/compact) are format-agnostic.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class CommitConflict(RuntimeError):
    """Another writer committed this version first — retry on latest."""


class TransactionalTable:
    def __init__(self, path: str):
        self.path = path
        self.log_dir = os.path.join(path, "_log")
        os.makedirs(self.log_dir, exist_ok=True)

    # -- log helpers --------------------------------------------------------

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.log_dir, f"v{version:08d}.json")

    def versions(self) -> list[int]:
        return sorted(
            int(f[1:9]) for f in os.listdir(self.log_dir) if f.startswith("v") and f.endswith(".json")
        )

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def _read_manifest(self, version: int) -> dict:
        with open(self._manifest_path(version)) as f:
            return json.load(f)

    def _commit(self, files: list[str], op: str) -> int:
        latest = self.latest_version()
        version = 0 if latest is None else latest + 1
        manifest = {
            "version": version,
            "op": op,
            "files": files,
            "committed_at": time.time(),
        }
        tmp = os.path.join(self.log_dir, f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        target = self._manifest_path(version)
        try:
            # Atomic put-if-absent: hard-link raises FileExistsError if the
            # target already exists (checked and created in one syscall — no
            # TOCTOU window, unlike exists()+rename which silently replaces).
            os.link(tmp, target)
        except FileExistsError:
            raise CommitConflict(f"version {version} already committed")
        finally:
            os.unlink(tmp)
        return version

    # -- write paths --------------------------------------------------------

    def _stage(self, df: DataFrame) -> list[str]:
        """Write immutable data files into a staging subdir, return paths."""
        stage_dir = os.path.join(self.path, f"stage-{uuid.uuid4().hex}")
        df.write.mode("overwrite").parquet(stage_dir)
        return [
            os.path.join(stage_dir, f)
            for f in os.listdir(stage_dir)
            if f.endswith(".parquet")
        ]

    def append(self, df: DataFrame) -> int:
        """ACID append: new snapshot = previous files + newly staged files."""
        new_files = self._stage(df)
        latest = self.latest_version()
        prev = self._read_manifest(latest)["files"] if latest is not None else []
        return self._commit(prev + new_files, "append")

    def overwrite(self, df: DataFrame) -> int:
        """ACID overwrite: new snapshot references only the new files.

        Old files stay on disk for time travel until :func:`vacuum`.
        """
        return self._commit(self._stage(df), "overwrite")

    # -- read paths ----------------------------------------------------------

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Consistent snapshot read; ``version`` enables time travel."""
        v = self.latest_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"no committed version in {self.path}")
        files = self._read_manifest(v)["files"]
        if not files:
            raise FileNotFoundError("empty snapshot")
        return spark.read.parquet(*files)

    def history(self) -> list[dict]:
        return [self._read_manifest(v) for v in self.versions()]

    # -- maintenance ---------------------------------------------------------

    def compact(self, spark: SparkSession, target_files: int = 1) -> int:
        """Rewrite the current snapshot into fewer files (new version)."""
        df = self.read(spark).repartition(target_files)
        return self.overwrite(df)

    def vacuum(self, keep_versions: int = 1) -> list[str]:
        """Drop data files unreachable from the newest ``keep_versions``.

        Returns the deleted paths.  Destroys time travel beyond the kept
        window (same contract as Delta VACUUM).
        """
        vs = self.versions()
        keep = set()
        for v in vs[-keep_versions:]:
            keep.update(self._read_manifest(v)["files"])
        removed = []
        for v in vs[:-keep_versions] if keep_versions else vs:
            for f in self._read_manifest(v)["files"]:
                if f not in keep and os.path.exists(f):
                    os.unlink(f)
                    removed.append(f)
        return removed
