#!/usr/bin/env python3
"""Dump .explain("formatted") for contract queries to plans/<tag>/<name>_<suffix>.txt.

Usage: python scripts/dump_plans.py <suffix> [query ...]
Writes plans/r07/<query>_<suffix>.txt for each named query (default: all).
Plan capture is driver-side only — no job runs, so ambient load is irrelevant.
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("GOLDEN_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(REPO, "plans", "r07")


def main():
    import __spark_entry__ as E
    from httpz_spark.session import get_spark

    suffix = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark(master="local[4]", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    os.makedirs(OUT, exist_ok=True)
    for name in names or sorted(qs):
        try:
            df = qs[name](spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(OUT, f"{name}_{suffix}.txt"), "w") as f:
                f.write(buf.getvalue())
            print("wrote", name)
        except Exception as e:
            print("ERR", name, f"{type(e).__name__}: {e}"[:200])
    spark.stop()


if __name__ == "__main__":
    main()
