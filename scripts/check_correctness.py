#!/usr/bin/env python3
"""Local replica of the round driver's correctness gate: run every
``queries()`` entry on Spark AND its ``oracle_sql()`` in DuckDB at sf0.01,
compare row count, column-name set, and an order-insensitive value hash
(columns sorted by name, rows sorted, values stringified)."""

from __future__ import annotations

import hashlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("GOLDEN_SF_DIR", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def value_hash(df) -> str:
    # Dtype-strict: floats are formatted with repr() so 113.0 != 113, and the
    # pandas dtype string of every column is folded into the hash.  This makes
    # the local gate at least as strict as the driver's hasher (which
    # distinguishes int64 from float64 — see VERDICT r6 finding #1).
    cols = sorted(df.columns)
    df = df[cols]
    rows = sorted(
        tuple("NULL" if v is None or (isinstance(v, float) and v != v)
              else (repr(v) if isinstance(v, float) else str(v))
              for v in rec)
        for rec in df.itertuples(index=False, name=None)
    )
    h = hashlib.sha256()
    h.update("|".join(str(df[c].dtype) for c in cols).encode())
    h.update(b"\x1e")
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main():
    import duckdb

    import __spark_entry__ as E
    from httpz_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark(master="local[8]", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    qs, osql = E.queries(), E.oracle_sql()
    report = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        entry = {"rows_match": None, "schema_match": None, "hash_match": None,
                 "spark_rows": None, "oracle_rows": None, "err": None}
        try:
            sdf = fn(spark, SF_DIR).toPandas()
            entry["spark_rows"] = len(sdf)
            if name not in osql:
                entry["err"] = "no_oracle"
            else:
                odf = con.execute(osql[name]).df()
                entry["oracle_rows"] = len(odf)
                entry["rows_match"] = len(sdf) == len(odf)
                entry["schema_match"] = sorted(sdf.columns) == sorted(odf.columns)
                entry["hash_match"] = value_hash(sdf) == value_hash(odf)
        except Exception as e:
            entry["err"] = f"{type(e).__name__}: {e}"[:300]
        report[name] = entry
        flag = "OK " if entry["hash_match"] else "!! "
        print(flag, name, json.dumps(entry))
    spark.stop()
    bad = [n for n, e in report.items()
           if e["err"] or not (e["rows_match"] and e["schema_match"] and e["hash_match"])]
    print("FAILING:", bad if bad else "none")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
