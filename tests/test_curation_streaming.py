"""Stateless curation stages compose with Structured Streaming unchanged:
the same column expressions run per micro-batch (map-only operators need
no state store; the report's groupBy runs in complete mode)."""

import json

from pyspark.sql import functions as F

from httpz_spark.operators.c4rules import c4_line_filters
from httpz_spark.operators.curation import pii_scrub


def _write_batch(src, name, rows):
    p = src / name
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")


def test_pii_scrub_and_c4_filters_stream(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    _write_batch(src, "b0.json", [
        {"doc_id": 0, "text": "mail a@b.io now.\nshort."},
        {"doc_id": 1, "text": "This line is long enough to keep."},
    ])
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .json(str(src))
    )
    out = c4_line_filters(pii_scrub(stream))
    q = (out.writeStream.format("memory").queryName("cur_stream")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        rows = {r["doc_id"]: r
                for r in spark.sql("SELECT * FROM cur_stream").collect()}
        assert rows[0]["scrubbed"].startswith("mail <EMAIL> now.")
        assert rows[0]["n_email"] == 1
        # line filter ran on the streaming frame too
        assert rows[0]["n_lines"] == 2 and rows[0]["n_lines_kept"] == 1
        assert rows[1]["n_lines_kept"] == 1

        # late-arriving micro-batch flows through the same plan
        _write_batch(src, "b1.json", [
            {"doc_id": 2, "text": "Call 555-123-4567 today."}])
        q.processAllAvailable()
        rows = {r["doc_id"]: r
                for r in spark.sql("SELECT * FROM cur_stream").collect()}
        assert rows[2]["n_phone"] == 1
        assert "<PHONE>" in rows[2]["scrubbed"]
    finally:
        q.stop()
