"""Versioned, atomically-committed state tables — merge-on-read deltas.

The production design checkpoints frontier/seen/results/lineage to Iceberg
(snapshot-per-wave, MERGE on url_hash — SURVEY.md §1.5/§3.4).  This sandbox
has no Iceberg runtime jars, so this module provides the same contract on
plain parquet, including Iceberg's *merge-on-read* write-amplification
story:

* every ``merge_upsert``/``append`` lands ONLY the new rows as a fresh
  **delta** parquet directory — per-wave write cost is O(wave), never
  O(total corpus) (the round-1 design rewrote the whole table per wave, an
  O(waves × corpus) scale-killer at 10^10 frontiers);
* a **manifest** file per version lists the delta dirs that make up the
  snapshot (Iceberg's manifest-list analogue); the tiny ``_latest`` pointer
  is swapped with ``os.replace`` (atomic on POSIX) only after data +
  manifest are durable — a kill at ANY point leaves the previous version
  readable, exactly Iceberg's snapshot semantics;
* reads resolve key duplicates **newest-delta-wins** (each row carries the
  ``_seq`` it was committed under; ``max_by(row, (_seq, row))`` is
  deterministic even across a killed-and-rerun wave, whose re-appended rows
  are byte-identical by fabric determinism);
* once a table accumulates ``compact_every`` deltas, the next merge
  **compacts**: resolves and rewrites one base delta, so read fan-in stays
  bounded and write amplification is amortized O(total / compact_every);
* superseded delta dirs and manifests are garbage-collected after the
  pointer swap, keeping the PREVIOUS version intact for crash safety and
  for lazy DataFrames still referencing it.

Swap-in note: every call site goes through this class, so pointing the
engine at Iceberg replaces ``merge_upsert`` with ``MERGE INTO`` (or a
MoR-position-delete write) and ``read`` with a snapshot read — no plan
changes.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class StateStore:
    def __init__(self, spark: SparkSession, root: str, compact_every: int = 8):
        self.spark = spark
        self.root = root
        self.compact_every = compact_every
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

    # -- manifests / deltas ---------------------------------------------------
    def _manifest_path(self, name: str, version: int) -> str:
        return os.path.join(self.root, name, f"v={version}.json")

    def _delta_dir(self, name: str, version: int, tag: str) -> str:
        return os.path.join(self.root, name, f"delta-{version:06d}-{tag}")

    def _read_manifest(self, name: str, version: int) -> dict:
        with open(self._manifest_path(name, version)) as f:
            return json.load(f)

    def _write_manifest(self, name: str, version: int, manifest: dict) -> None:
        path = self._manifest_path(name, version)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, path)

    def _commit(self, name: str, version: int, manifest: dict) -> None:
        """manifest + pointer swap, then GC of everything older than the
        PREVIOUS version (kept for crash safety / lazy readers)."""
        self._write_manifest(name, version, manifest)
        self._set_latest(name, version)
        self._gc(name, keep_from=version - 1)

    def _gc(self, name: str, keep_from: int) -> None:
        tdir = os.path.join(self.root, name)
        live: set = set()
        for v in (keep_from, keep_from + 1):
            try:
                live.update(self._read_manifest(name, v)["deltas"])
            except FileNotFoundError:
                pass
        for entry in os.listdir(tdir):
            p = os.path.join(tdir, entry)
            if entry.startswith("delta-") and entry not in live:
                shutil.rmtree(p, ignore_errors=True)
            elif entry.startswith("v=") and entry.endswith(".json"):
                try:
                    v = int(entry[2:-5])
                except ValueError:
                    continue
                if v < keep_from:
                    try:
                        os.remove(p)
                    except OSError:
                        pass

    # -- table ops -----------------------------------------------------------
    def exists(self, name: str) -> bool:
        return self.latest_version(name) is not None

    def read(self, name: str) -> DataFrame | None:
        """Current snapshot: union of live deltas, newest-key-wins when the
        table has a merge key (merge-on-read resolution)."""
        v = self.latest_version(name)
        if v is None:
            return None
        manifest = self._read_manifest(name, v)
        paths = [os.path.join(self.root, name, d) for d in manifest["deltas"]]
        # mergeSchema: deltas written under different configs (e.g. a resume
        # with include_payload toggled) must union their columns, not silently
        # adopt one footer's schema
        df = self.spark.read.option("mergeSchema", "true").parquet(*paths)
        key = manifest.get("key")
        if key and len(paths) > 1:
            # newest delta wins; _seq alone is a total order because a key
            # appears at most once per delta (waves are in-wave deduped) and
            # every delta carries a distinct _seq — map/array columns keep
            # the ordering struct scalar-only (maps are not orderable)
            others = [c for c in df.columns if c not in (key, "_seq")]
            df = (
                df.groupBy(key)
                .agg(F.max_by(F.struct(*others), F.col("_seq")).alias("_r"))
                .select(key, *[F.col(f"_r.{c}").alias(c) for c in others])
            )
        return self._drop_tombstones(df).drop("_seq")

    @staticmethod
    def _drop_tombstones(df: DataFrame) -> DataFrame:
        """merge_delete writes ``_tomb=true`` rows; after newest-wins
        resolution a key whose latest delta is a tombstone is dropped here
        (merge-on-read delete, the Iceberg MERGE-DELETE analogue).  Deltas
        written before any delete have no ``_tomb`` column — mergeSchema
        surfaces it as NULL, coalesced to live."""
        if "_tomb" in df.columns:
            df = df.filter(~F.coalesce(F.col("_tomb"), F.lit(False))).drop("_tomb")
        return df

    def _write_delta(self, name: str, df: DataFrame, version: int, tag: str) -> str:
        d = self._delta_dir(name, version, tag)
        os.makedirs(os.path.join(self.root, name), exist_ok=True)
        df.withColumn("_seq", F.lit(version).cast("int")).write.mode(
            "overwrite"
        ).parquet(d)
        return os.path.basename(d)

    def write(self, name: str, df: DataFrame) -> int:
        """Full snapshot write (single-delta manifest + pointer swap)."""
        v = (self.latest_version(name) or 0) + 1
        delta = self._write_delta(name, df, v, "base")
        self._commit(name, v, {"deltas": [delta], "key": None})
        return v

    def merge_upsert(self, name: str, df: DataFrame, key: str) -> int:
        """MERGE keyed on ``key``: new rows shadow same-key rows of the
        current snapshot (resolved at read time — merge-on-read).  Writes
        ONLY ``df`` as a delta; compacts when the delta chain exceeds
        ``compact_every``.  Idempotent: re-running the same wave re-appends
        byte-identical rows, which resolve to the same snapshot."""
        v = (self.latest_version(name) or 0) + 1
        cur = self.latest_version(name)
        deltas = [] if cur is None else list(self._read_manifest(name, cur)["deltas"])
        if len(deltas) + 1 > self.compact_every:
            merged = self._resolved_with(name, df, key, v)
            delta = self._write_delta(name, merged, v, "compact")
            self._commit(name, v, {"deltas": [delta], "key": key})
            return v
        delta = self._write_delta(name, df, v, "merge")
        self._commit(name, v, {"deltas": deltas + [delta], "key": key})
        return v

    def _resolved_with(self, name: str, df: DataFrame, key: str, seq: int) -> DataFrame:
        cur = self.read(name)
        if cur is None:
            return df
        df = df.withColumn("_s2", F.lit(1)).unionByName(
            cur.withColumn("_s2", F.lit(0)), allowMissingColumns=True
        )
        others = [c for c in df.columns if c not in (key, "_s2")]
        return self._drop_tombstones(
            df.groupBy(key)
            .agg(F.max_by(F.struct(*others), F.col("_s2")).alias("_r"))
            .select(key, *[F.col(f"_r.{c}").alias(c) for c in others])
        )

    def merge_delete(self, name: str, keys: DataFrame, key: str) -> int:
        """MERGE ... WHEN MATCHED THEN DELETE analogue: writes ONLY the
        (distinct) keys as a tombstone delta — merge-on-read, so a 10^10-row
        seen table is never rewritten to drop 10^5 stale URLs; newest-wins
        resolution hides tombstoned keys at read time and the next
        compaction folds them away.  Re-upserting a key after deletion
        resurrects it (its delta is newer than the tombstone's)."""
        tomb = keys.select(key).distinct().withColumn("_tomb", F.lit(True))
        return self.merge_upsert(name, tomb, key)

    def append(self, name: str, df: DataFrame) -> int:
        """Pure append (no merge key — lineage-style tables)."""
        v = (self.latest_version(name) or 0) + 1
        cur = self.latest_version(name)
        deltas = [] if cur is None else list(self._read_manifest(name, cur)["deltas"])
        if len(deltas) + 1 > self.compact_every:
            merged = self.read(name).unionByName(df, allowMissingColumns=True)
            delta = self._write_delta(name, merged, v, "compact")
            self._commit(name, v, {"deltas": [delta], "key": None})
            return v
        delta = self._write_delta(name, df, v, "append")
        self._commit(name, v, {"deltas": deltas + [delta], "key": None})
        return v

    def drop(self, name: str) -> None:
        """Remove a table entirely (used to GC per-wave staging tables once
        their wave's lineage row is committed)."""
        shutil.rmtree(os.path.join(self.root, name), ignore_errors=True)
