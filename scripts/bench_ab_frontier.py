#!/usr/bin/env python3
"""A/B re-measure of the frontier_dedup bench number (round-3 verdict #1).

BENCH_r02 -> BENCH_r03 showed frontier_dedup 3.86s -> 5.05s (+31%) with no
engine change that explains it (the dedup-path diffs that round were in the
DOCUMENT dedup family; the frontier plan is unchanged).  This script settles
engine-vs-tenancy with the same-minute methodology the fetch bench uses:

* the EXACT bench micro-workload (bloom-probe + exact anti-join over 4M
  hash-range frontier rows vs a half-overlapping seen set, plus the plain
  JVM anti-join) is run in fresh subprocesses, ALTERNATING between two
  checkouts of the engine (A = the round-2 tree, B = the current tree),
  N rounds each;
* each subprocess does one warm-up run then reports 3 measured runs;
* the host's 1-minute load average is recorded immediately before and
  after every probe, bracketing the tenancy conditions each number was
  taken under.

Usage::

    python scripts/bench_ab_frontier.py /tmp/httpz_r02 /root/repo [rounds]

Prints a JSON report and a markdown table ready for BENCH/BASELINE.md.

Subprocess probe mode (internal)::

    python scripts/bench_ab_frontier.py --probe <repo_path>
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

DEDUP_ROWS = int(os.environ.get("BENCH_DEDUP_ROWS", "4000000"))


def probe(repo: str) -> None:
    """Fresh-JVM probe: replicate bench.py's frontier-dedup micro-bench
    byte-for-byte against the engine at ``repo``."""
    import shutil
    import tempfile

    sys.path.insert(0, repo)
    from pyspark.sql import functions as F

    from httpz_spark.operators.frontier_dedup import BloomIndex, dedup_unseen
    from httpz_spark.session import get_spark

    cpus = 32
    spark = get_spark(
        app_name="httpz_ab_dedup", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.enabled": "false",
                    "spark.driver.memory": "8g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    P = cpus
    cand = spark.range(0, DEDUP_ROWS, 1, P).select(
        F.xxhash64(F.col("id")).alias("url_hash"), F.col("id").alias("payload")
    )
    seen = spark.range(DEDUP_ROWS // 2, DEDUP_ROWS + DEDUP_ROWS // 2, 1, P).select(
        F.xxhash64(F.col("id")).alias("url_hash")
    ).persist()
    seen.count()
    bloom_root = tempfile.mkdtemp(prefix="httpz_ab_bloom_")
    out = {"bloom_sec": [], "plain_sec": []}
    try:
        idx = BloomIndex.open_or_create(
            bloom_root, partitions=P, capacity_per_part=DEDUP_ROWS // P + 1
        )
        idx.update(seen)
        for rep in range(4):  # rep 0 = warm-up, dropped
            t0 = time.time()
            dedup_unseen(cand, seen, partitions=P, bloom=idx).count()
            tb = time.time() - t0
            t0 = time.time()
            dedup_unseen(cand, seen, partitions=P).count()
            tp = time.time() - t0
            if rep:
                out["bloom_sec"].append(round(tb, 3))
                out["plain_sec"].append(round(tp, 3))
    finally:
        shutil.rmtree(bloom_root, ignore_errors=True)
    spark.stop()
    print("PROBE_JSON:" + json.dumps(out))


def main(repo_a: str, repo_b: str, rounds: int) -> None:
    samples = {"A": [], "B": []}
    loads = []
    order = ["A", "B"] * rounds
    for i, side in enumerate(order):
        repo = repo_a if side == "A" else repo_b
        load_before = os.getloadavg()[0]
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--probe", repo],
            capture_output=True, text=True,
        )
        load_after = os.getloadavg()[0]
        line = [ln for ln in p.stdout.splitlines()
                if ln.startswith("PROBE_JSON:")]
        if not line:
            print(p.stdout[-2000:], p.stderr[-2000:], file=sys.stderr)
            raise SystemExit(f"probe {side} round {i} failed")
        rec = json.loads(line[-1][len("PROBE_JSON:"):])
        rec["load_before"], rec["load_after"] = load_before, load_after
        samples[side].append(rec)
        print(f"[{i + 1}/{len(order)}] {side} bloom={rec['bloom_sec']} "
              f"plain={rec['plain_sec']} load={load_before:.1f}->{load_after:.1f}",
              flush=True)

    def flat(side, key):
        return [v for r in samples[side] for v in r[key]]

    report = {"rows": DEDUP_ROWS, "samples": samples}
    md = ["| engine | bloom-path secs (all runs) | median | plain-anti-join secs | median | load range |",
          "|---|---|---|---|---|---|"]
    for side, name in (("A", "round-2 tree"), ("B", "current tree")):
        b, pl = flat(side, "bloom_sec"), flat(side, "plain_sec")
        lo = min(r["load_before"] for r in samples[side])
        hi = max(r["load_after"] for r in samples[side])
        report[side] = {"bloom_median": statistics.median(b),
                        "plain_median": statistics.median(pl)}
        md.append(
            f"| {name} | {', '.join(f'{x:.2f}' for x in b)} | "
            f"{statistics.median(b):.2f} | "
            f"{', '.join(f'{x:.2f}' for x in pl)} | "
            f"{statistics.median(pl):.2f} | {lo:.1f}-{hi:.1f} |"
        )
    print(json.dumps(report))
    print("\n".join(md))


if __name__ == "__main__":
    if sys.argv[1] == "--probe":
        probe(sys.argv[2])
    else:
        main(sys.argv[1], sys.argv[2],
             int(sys.argv[3]) if len(sys.argv) > 3 else 3)
