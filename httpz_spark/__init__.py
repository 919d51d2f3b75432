"""httpz_spark — a PySpark-native distributed URL-frontier + fetch scheduler.

A brand-new engine (not a port) with the query/data-processing capabilities
of ``acidvegas/httpz`` (reference snapshot at ``/root/reference``, cited by
file:line throughout), re-expressed Spark-first:

* scalar kernels -> native Catalyst column expressions
  (:mod:`httpz_spark.functions`)
* the asyncio producer/consumer pump -> iterative batch *waves* over a
  checkpointed frontier (:mod:`httpz_spark.plans.frontier`)
* dedup / politeness / skew -> anti-joins, window budgets, salted
  repartitioning (:mod:`httpz_spark.operators`)
* library-dependent parsing (HTML, TLS, mmh3) -> Arrow-batched pandas UDFs;
  never per-row Python UDFs.
"""

__version__ = "0.1.0"
