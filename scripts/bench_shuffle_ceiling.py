"""Raw-Spark shuffle comparator: the dedup workload as STOCK left_anti
(no engine code) plus a pure repartition+agg — local-mode shuffle ceiling."""
import json, sys, time
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from httpz_spark.session import get_spark
from pyspark.sql import functions as F

cpus = int(sys.argv[1]); ROWS = 64_000_000
spark = get_spark(app_name="shuffle-ceiling", master=f"local[{cpus}]",
                  shuffle_partitions=max(cpus, 16),
                  extra_conf={"spark.ui.enabled": "false",
                              "spark.driver.memory": "8g"})
spark.sparkContext.setLogLevel("ERROR")
P = max(cpus, 16)
cand = spark.range(0, ROWS, 1, P).select(
    F.xxhash64(F.col("id")).alias("url_hash"), F.col("id").alias("payload"))
seen = spark.range(ROWS // 2, ROWS + ROWS // 2, 1, P).select(
    F.xxhash64(F.col("id")).alias("url_hash")).persist()
seen.count()
out = {"cpus": cpus}
best = None
for i in range(4):
    t0 = time.time()
    cand.join(seen, "url_hash", "left_anti").count()   # stock Spark, no engine
    dt = time.time() - t0
    if i and (best is None or dt < best):
        best = dt
out["raw_anti_sec"] = best
best = None
for i in range(3):
    t0 = time.time()
    cand.repartition(P, "url_hash").groupBy(F.pmod("url_hash", F.lit(997))).count().count()
    dt = time.time() - t0
    if i and (best is None or dt < best):
        best = dt
out["repart_agg_sec"] = best
print("CEIL_JSON:" + json.dumps(out))
