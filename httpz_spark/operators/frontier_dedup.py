"""URL-seen dedup: persisted per-partition bloom pre-filter + exact anti-join.

Scale shape (the 10^10-frontier design):

* The seen table is the durable truth; the **BloomIndex** is a persisted,
  incrementally-updated acceleration structure: one numpy bit array per
  ``pmod(url_hash, P)`` partition, stored next to the state tables and
  OR-updated with each wave's *newly seen* keys only — the full seen table
  is never re-read or re-shipped after wave 0.
* Probing partitions the (small) candidate side on pid so each task loads
  exactly one bloom file; bloom-absent rows are **definitely unseen** and
  bypass the exact check; bloom-maybe rows (true hits + ~1% FPs) flow into
  a JVM ``left_anti`` join whose probe side has shrunk accordingly.
* OR-updates are idempotent, so a re-run wave (resume path) converges to
  the same index; missing/corrupt bloom files degrade to the plain
  anti-join (correctness never depends on the bloom).

Correctness invariant (tested): output == plain left_anti(candidates, seen).

Measured note (BENCH): below ~10^7 seen keys the plain JVM anti-join wins
outright — the bloom path's value is avoiding seen-table scans when seen
is orders of magnitude larger than the per-wave candidate set.  Engine
callers pick via ``EngineConfig.bloom_min_seen``.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bloom_geometry(capacity: int, bits_per_key: int) -> tuple:
    m = max(1 << 10, capacity * bits_per_key)
    m = (m + 63) // 64 * 64
    k = max(1, min(16, int(round(bits_per_key * 0.6931))))
    return m, k


def _hash_positions(keys: np.ndarray, m: int, k: int) -> np.ndarray:
    """(n, k) bit positions via double hashing on the already-murmur'd
    url_hash keys (Kirsch-Mitzenmacher)."""
    u = keys.astype(np.uint64)
    h1 = u * np.uint64(0x9E3779B97F4A7C15)
    h2 = (u ^ (u >> np.uint64(33))) * np.uint64(0xC2B2AE3D27D4EB4F) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)[None, :]
    return ((h1[:, None] + i * h2[:, None]) % np.uint64(m)).astype(np.int64)


def bloom_or_keys(bits: np.ndarray, m: int, k: int, keys: np.ndarray) -> None:
    if len(keys):
        pos = _hash_positions(keys, m, k).ravel()
        np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))


def bloom_maybe(bits: np.ndarray, m: int, k: int, keys: np.ndarray) -> np.ndarray:
    """True = maybe-seen (needs exact check); False = definitely unseen."""
    if len(keys) == 0:
        return np.zeros(0, dtype=bool)
    pos = _hash_positions(keys, m, k)
    probes = (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
    return probes.all(axis=1)


class BloomIndex:
    """Persisted per-partition bloom filters over seen url_hash keys.

    Layout: ``<root>/meta.json`` + ``<root>/pid=<n>.npy`` (atomic replace).
    Production analogue: the same bytes as Iceberg puffin/sidecar files.
    """

    def __init__(self, root: str, partitions: int, capacity_per_part: int,
                 bits_per_key: int = 10):
        self.root = root
        self.partitions = partitions
        self.m, self.k = _bloom_geometry(capacity_per_part, bits_per_key)

    # -- lifecycle -----------------------------------------------------------
    @classmethod
    def open_or_create(cls, root: str, partitions: int = 32,
                       capacity_per_part: int = 1_000_000,
                       bits_per_key: int = 10) -> "BloomIndex":
        meta_path = os.path.join(root, "meta.json")
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            idx = cls(root, meta["partitions"], 1, meta["bits_per_key"])
            idx.m, idx.k = meta["m"], meta["k"]
            return idx
        os.makedirs(root, exist_ok=True)
        idx = cls(root, partitions, capacity_per_part, bits_per_key)
        with open(meta_path + ".tmp", "w") as f:
            json.dump({"partitions": partitions, "m": idx.m, "k": idx.k,
                       "bits_per_key": bits_per_key}, f)
        os.replace(meta_path + ".tmp", meta_path)
        return idx

    def _path(self, pid: int) -> str:
        return os.path.join(self.root, f"pid={pid}.npy")

    def _load(self, pid: int) -> np.ndarray:
        try:
            return np.load(self._path(pid))
        except (FileNotFoundError, ValueError):
            return np.zeros(self.m // 8, dtype=np.uint8)

    def _store(self, pid: int, bits: np.ndarray) -> None:
        tmp = self._path(pid) + f".tmp{os.getpid()}"
        np.save(open(tmp, "wb"), bits)
        os.replace(tmp, self._path(pid))

    # -- update (driver-coordinated, executor-parallel) ------------------------
    def update(self, new_keys: DataFrame, key_col: str = "url_hash") -> None:
        """OR the new keys into their partition blooms.  Idempotent (pure
        OR), so re-running a wave converges.  Runs as one Spark job grouped
        on pid — each group touches exactly one file."""
        m, k, root, P = self.m, self.k, self.root, self.partitions
        path_of = self._path

        def upd(pdf: pd.DataFrame) -> pd.DataFrame:
            if len(pdf) == 0:
                return pd.DataFrame({"pid": pd.Series([], dtype="int64"),
                                     "n": pd.Series([], dtype="int64")})
            pid = int(pdf["_pid"].iloc[0])
            try:
                bits = np.load(path_of(pid))
            except (FileNotFoundError, ValueError):
                bits = np.zeros(m // 8, dtype=np.uint8)
            keys = pdf[key_col].to_numpy(dtype=np.int64)
            bloom_or_keys(bits, m, k, keys)
            tmp = path_of(pid) + f".tmp{os.getpid()}"
            np.save(open(tmp, "wb"), bits)
            os.replace(tmp, path_of(pid))
            return pd.DataFrame({"pid": [pid], "n": [len(keys)]})

        (
            new_keys.select(key_col)
            .withColumn("_pid", F.pmod(F.col(key_col), F.lit(P)))
            .groupby("_pid")
            .applyInPandas(upd, schema="pid long, n long")
            .count()  # action to execute the update job
        )

    # -- probe ----------------------------------------------------------------
    def probe(self, candidates: DataFrame, key_col: str = "url_hash") -> DataFrame:
        """Adds ``maybe_seen boolean``.  Candidates are repartitioned on pid
        so each task reads one bloom file (candidate-side-only shuffle; the
        seen table is untouched).

        The stage is ``mapInArrow``, not ``mapInPandas``: the probe only
        READS the key column (numpy view) and APPENDS a boolean —
        pass-through columns (url/host/path strings at frontier width) are
        never boxed into pandas objects (measured numbers in
        BENCH/BASELINE.md's bloom section)."""
        import pyarrow as pa
        from pyspark.sql.types import BooleanType, StructField, StructType

        m, k, P = self.m, self.k, self.partitions
        path_of = self._path
        out_schema = StructType(
            list(candidates.schema.fields) + [StructField("maybe_seen", BooleanType())]
        )

        def run(batches):
            cache: dict[int, np.ndarray] = {}
            for rb in batches:
                if rb.num_rows == 0:
                    continue
                keys = rb.column(rb.schema.get_field_index(key_col)) \
                    .to_numpy(zero_copy_only=False).astype(np.int64)
                pids = np.mod(keys, P)
                mask = np.zeros(rb.num_rows, dtype=bool)
                for pid in np.unique(pids):
                    if pid not in cache:
                        try:
                            cache[int(pid)] = np.load(path_of(int(pid)))
                        except (FileNotFoundError, ValueError):
                            cache[int(pid)] = None
                    bits = cache[int(pid)]
                    sel = pids == pid
                    if bits is None:
                        mask[sel] = True  # no bloom -> degrade to exact check
                    else:
                        mask[sel] = bloom_maybe(bits, m, k, keys[sel])
                yield pa.RecordBatch.from_arrays(
                    list(rb.columns) + [pa.array(mask)],
                    names=list(rb.schema.names) + ["maybe_seen"],
                )

        parted = candidates.repartition(P, F.pmod(F.col(key_col), F.lit(P)))
        return parted.mapInArrow(run, schema=out_schema)


def dedup_unseen(
    candidates: DataFrame,
    seen: DataFrame | None,
    partitions: int = 32,
    bits_per_key: int = 10,
    key_col: str = "url_hash",
    bloom: BloomIndex | None = None,
) -> DataFrame:
    """Rows of ``candidates`` whose key is NOT in ``seen`` — exact semantics.

    Without a BloomIndex this is the plain JVM ``left_anti`` (fastest below
    ~10^7 seen keys, measured); with one, bloom-absent rows bypass the join
    and only maybe-seen rows are re-checked exactly."""
    if seen is None:
        return candidates
    seen_keys = seen.select(key_col)
    if bloom is None:
        return candidates.join(seen_keys, key_col, "left_anti")

    probed = bloom.probe(candidates, key_col)
    definitely_unseen = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
    maybe = probed.filter(F.col("maybe_seen")).drop("maybe_seen")
    rechecked = maybe.join(seen_keys, key_col, "left_anti")
    return definitely_unseen.unionByName(rechecked)
