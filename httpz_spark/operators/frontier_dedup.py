"""URL-seen dedup: per-partition bloom pre-filter + exact anti-join.

The scalable shape of the north_rule's "bloom/cuckoo URL-seen set":

1. candidates and the seen table are co-grouped on ``pmod(url_hash, P)``;
2. inside each group a numpy bloom filter is built from the seen keys and
   candidates are probed — **bloom-absent rows are definitely unseen** and
   bypass the expensive exact check entirely;
3. only bloom-maybe rows (true hits + ~1% false positives) flow into the
   exact ``left_anti`` join, shrinking its build side dramatically at
   10^10-frontier scale.

Correctness invariant (tested): output == plain left_anti(candidates, seen).
Blooms are rebuilt from the seen table per wave — the seen table is the
durable truth (so resume needs no bloom persistence); at production scale
the same bytes would be persisted per partition alongside the Iceberg
snapshot and rebuilt only on compaction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bloom_params(n_keys: int, bits_per_key: int) -> tuple:
    m = max(64, n_keys * bits_per_key)
    m = (m + 63) // 64 * 64
    return m, max(1, min(16, int(round(bits_per_key * 0.6931))))


def _hash_positions(keys: np.ndarray, m: int, k: int) -> np.ndarray:
    """(n, k) bit positions via double hashing on the already-murmur'd
    url_hash keys (Kirsch-Mitzenmacher)."""
    u = keys.astype(np.uint64)
    h1 = u * np.uint64(0x9E3779B97F4A7C15)
    h2 = (u ^ (u >> np.uint64(33))) * np.uint64(0xC2B2AE3D27D4EB4F) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)[None, :]
    return ((h1[:, None] + i * h2[:, None]) % np.uint64(m)).astype(np.int64)


def bloom_build(keys: np.ndarray, bits_per_key: int) -> tuple:
    m, k = _bloom_params(len(keys), bits_per_key)
    bits = np.zeros(m // 8, dtype=np.uint8)
    if len(keys):
        pos = _hash_positions(keys, m, k).ravel()
        np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
    return bits, m, k


def bloom_maybe(bits: np.ndarray, m: int, k: int, keys: np.ndarray) -> np.ndarray:
    """Boolean mask: True = maybe-seen (needs exact check), False =
    definitely unseen."""
    if len(keys) == 0:
        return np.zeros(0, dtype=bool)
    pos = _hash_positions(keys, m, k)
    probes = (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
    return probes.all(axis=1)


def dedup_unseen(
    candidates: DataFrame,
    seen: DataFrame | None,
    partitions: int,
    bits_per_key: int = 10,
    key_col: str = "url_hash",
) -> DataFrame:
    """Rows of ``candidates`` whose key is NOT in ``seen`` (exact semantics,
    bloom-accelerated).  ``seen`` needs only the key column."""
    if seen is None:
        return candidates

    pid = F.pmod(F.col(key_col), F.lit(partitions)).alias("_pid")
    cand_g = candidates.withColumn("_pid", pid).groupby("_pid")
    seen_g = seen.select(key_col).withColumn("_pid", pid).groupby("_pid")

    out_schema = candidates.schema.add("maybe_seen", "boolean")

    def probe(cand_pdf: pd.DataFrame, seen_pdf: pd.DataFrame) -> pd.DataFrame:
        cand_pdf = cand_pdf.drop(columns=["_pid"])
        if len(cand_pdf) == 0:
            out = cand_pdf.copy()
            out["maybe_seen"] = pd.Series([], dtype=bool)
            return out
        seen_keys = seen_pdf[key_col].to_numpy(dtype=np.int64) if len(seen_pdf) else np.empty(0, np.int64)
        bits, m, k = bloom_build(seen_keys, bits_per_key)
        mask = bloom_maybe(bits, m, k, cand_pdf[key_col].to_numpy(dtype=np.int64))
        out = cand_pdf.copy()
        out["maybe_seen"] = mask
        return out

    probed = cand_g.cogroup(seen_g).applyInPandas(probe, schema=out_schema)

    definitely_unseen = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
    # exact re-check only for bloom hits (true positives + ~1% FPs)
    maybe = probed.filter(F.col("maybe_seen")).drop("maybe_seen")
    rechecked = maybe.join(seen.select(key_col), key_col, "left_anti")
    return definitely_unseen.unionByName(rechecked)
