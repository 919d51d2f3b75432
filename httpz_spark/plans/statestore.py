"""Versioned, atomically-committed parquet state tables.

The production design checkpoints frontier/seen/results/lineage to Iceberg
(snapshot-per-wave, MERGE on url_hash — SURVEY.md §1.5/§3.4).  This sandbox
has no Iceberg runtime jars, so this module provides the same contract on
plain parquet:

* every write lands in a fresh ``v=<k>`` directory (parquet job commit makes
  the directory complete-or-absent);
* a tiny ``_latest`` pointer file is swapped with ``os.replace`` (atomic on
  POSIX) only after the data commit — a kill at ANY point leaves the
  previous version readable, which is exactly Iceberg's snapshot semantics;
* ``merge_upsert`` = new-rows-win MERGE keyed on a column (the idempotent
  re-run primitive for mid-wave kills).

Swap-in note: every call site goes through this class, so pointing the
engine at Iceberg is replacing ~4 methods with ``writeTo(...).append()`` /
``MERGE INTO`` — no plan changes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


class StateStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- pointer management -------------------------------------------------
    def _ptr_path(self, name: str) -> str:
        return os.path.join(self.root, name, "_latest")

    def latest_version(self, name: str) -> int | None:
        try:
            with open(self._ptr_path(name)) as f:
                return int(f.read().strip())
        except (FileNotFoundError, ValueError):
            return None

    def _set_latest(self, name: str, version: int) -> None:
        ptr = self._ptr_path(name)
        tmp = ptr + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(version))
        os.replace(tmp, ptr)  # atomic pointer swap = snapshot commit

    def _data_path(self, name: str, version: int) -> str:
        return os.path.join(self.root, name, f"v={version}")

    # -- table ops -----------------------------------------------------------
    def exists(self, name: str) -> bool:
        return self.latest_version(name) is not None

    def read(self, name: str) -> DataFrame | None:
        v = self.latest_version(name)
        if v is None:
            return None
        return self.spark.read.parquet(self._data_path(name, v))

    def write(self, name: str, df: DataFrame) -> int:
        """Full snapshot write (new version + pointer swap)."""
        v = (self.latest_version(name) or 0) + 1
        os.makedirs(os.path.join(self.root, name), exist_ok=True)
        df.write.mode("overwrite").parquet(self._data_path(name, v))
        self._set_latest(name, v)
        return v

    def merge_upsert(self, name: str, df: DataFrame, key: str) -> int:
        """MERGE: rows in df replace same-key rows in the current snapshot.
        Idempotent — re-running the same wave produces the same snapshot."""
        cur = self.read(name)
        if cur is not None:
            keep = cur.join(df.select(key).distinct(), key, "left_anti")
            df = keep.unionByName(df, allowMissingColumns=True)
        return self.write(name, df)

    def append(self, name: str, df: DataFrame) -> int:
        cur = self.read(name)
        if cur is not None:
            df = cur.unionByName(df, allowMissingColumns=True)
        return self.write(name, df)
