"""Versioned lakehouse table: time travel without delta-spark.

SURVEY.md §1.1 maps the reference's "MinIO + Delta Lake versioning"
(README.md:102) to Delta time travel. This container has no delta-spark,
so this is the minimal honest equivalent of the transaction-log idea:

- every write lands in an immutable ``v_<n>/`` directory,
- a single pointer file ``_latest`` is atomically replaced
  (``os.replace``) to commit — readers resolve the pointer and only ever
  see fully-written versions,
- old versions stay readable (``read_version`` = time travel,
  ``history()`` = DESCRIBE HISTORY), pruned beyond ``keep_versions``.

In production, use Delta/Iceberg — this class exists so the engine's
capability surface (versioned reads, atomic commit, rollback) is real
and tested here, with the same call shapes.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


class VersionedTable:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        fmt: str = "parquet",
        keep_versions: int = 5,
    ):
        self.spark = spark
        self.path = path
        self.fmt = fmt
        self.keep_versions = keep_versions
        os.makedirs(path, exist_ok=True)

    # -- commit log -------------------------------------------------------

    def _pointer(self) -> str:
        return os.path.join(self.path, "_latest")

    def latest_version(self) -> int | None:
        try:
            with open(self._pointer()) as f:
                return json.loads(f.read())["version"]
        except FileNotFoundError:
            return None

    def history(self) -> list[dict]:
        """All committed versions, oldest first (DESCRIBE HISTORY analog)."""
        out = []
        for name in sorted(os.listdir(self.path)):
            if name.startswith("v_") and os.path.isfile(
                os.path.join(self.path, name, "_commit.json")
            ):
                with open(os.path.join(self.path, name, "_commit.json")) as f:
                    out.append(json.loads(f.read()))
        return out

    # -- writes -----------------------------------------------------------

    def _max_existing_version(self) -> int:
        versions = [
            int(name[2:])
            for name in os.listdir(self.path)
            if name.startswith("v_") and name[2:].isdigit()
        ]
        return max(versions, default=0)

    def commit(self, df: DataFrame, partition_by: Sequence[str] = ()) -> int:
        """Write a new immutable version and atomically move the pointer.
        Returns the committed version number.

        The next version is max(existing v_* dirs)+1, NOT pointer+1: after
        rollback(v) the pointer sits below retained higher versions, and a
        pointer-derived number would silently overwrite v+1 in place while
        its _commit.json survives — a forked history. Delta/Iceberg RESTORE
        likewise always appends a new monotonically increasing version."""
        version = max(self.latest_version() or 0, self._max_existing_version()) + 1
        vdir = os.path.join(self.path, f"v_{version}")
        w = df.write.format(self.fmt).mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.save(vdir)
        with open(os.path.join(vdir, "_commit.json"), "w") as f:
            f.write(json.dumps({"version": version, "committed_at": time.time()}))
        tmp = self._pointer() + ".tmp"
        with open(tmp, "w") as f:
            f.write(json.dumps({"version": version}))
        os.replace(tmp, self._pointer())  # the atomic commit
        self._prune(version)
        return version

    def rollback(self, version: int) -> None:
        """Point the table back at an older version (instant, no rewrite)."""
        if not os.path.isdir(os.path.join(self.path, f"v_{version}")):
            raise FileNotFoundError(f"version {version} not retained")
        tmp = self._pointer() + ".tmp"
        with open(tmp, "w") as f:
            f.write(json.dumps({"version": version}))
        os.replace(tmp, self._pointer())

    def _prune(self, current: int) -> None:
        floor = current - self.keep_versions
        for name in os.listdir(self.path):
            if name.startswith("v_") and int(name[2:]) <= floor:
                shutil.rmtree(os.path.join(self.path, name), ignore_errors=True)

    # -- reads ------------------------------------------------------------

    def read(self) -> DataFrame:
        v = self.latest_version()
        if v is None:
            raise FileNotFoundError(f"no committed version at {self.path}")
        return self.read_version(v)

    def read_version(self, version: int) -> DataFrame:
        """Time travel: read an exact retained version."""
        vdir = os.path.join(self.path, f"v_{version}")
        if not os.path.isdir(vdir):
            raise FileNotFoundError(f"version {version} not retained at {self.path}")
        return (
            self.spark.read.format(self.fmt)
            # exclude the commit manifest from the scan
            .option("pathGlobFilter", "*.parquet")
            .load(vdir)
        )
