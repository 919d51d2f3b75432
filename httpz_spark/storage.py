"""Storage-lifecycle helpers shared by the iterative operators.

Two distinct release mechanisms exist in Spark, and using the wrong one is
a SILENT leak (measured; round-4 ADVICE class):

* ``df.persist()`` registers the plan with the CacheManager —
  ``df.unpersist()`` releases it.
* ``df.localCheckpoint()`` persists the materialized RDD directly at the
  RDD level, bypassing the CacheManager — ``df.unpersist()`` is a no-op
  on it, and the ContextCleaner does not reliably reclaim it either
  (driver references keep the JVM-side RDD alive for the session).
  :func:`release_local_checkpoint` frees it deterministically via the
  underlying RDD handle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def release_local_checkpoint(df: DataFrame, blocking: bool = False) -> bool:
    """Unpersist the checkpoint RDD behind a ``localCheckpoint()``-ed
    DataFrame.  Only call on frames that will never be acted on again —
    a local checkpoint's lineage is truncated, so its blocks cannot be
    recomputed.  Returns False (and does nothing) if ``df`` is not backed
    by a persisted LogicalRDD — callers in fixpoint loops don't need to
    track which frames were checkpointed."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        rdd_id = plan.rdd().id()
    except Exception:  # not a LogicalRDD-rooted frame
        return False
    sc = df.sparkSession.sparkContext
    opt = sc._jsc.sc().getPersistentRDDs().get(rdd_id)
    if not opt.isDefined():
        return False
    opt.get().unpersist(blocking)
    return True
