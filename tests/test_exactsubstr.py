"""ExactSubstr span dedup (operators/exactsubstr.py): Lee et al.'s
duplicated >=L-token span removal via the dup-L-window identity."""

import pytest
from pyspark.sql import functions as F

from httpz_spark.operators import exactsubstr as ES


PASSAGE = "alpha beta gamma delta epsilon zeta"  # 6 tokens


def _corpus(spark):
    return spark.createDataFrame(
        [
            (1, PASSAGE + " unique one tail words here"),
            (2, PASSAGE + " other two tail tokens go"),
            (3, "totally different text with no duplicate spans at all"),
            # the same 5-token phrase twice within one doc
            (4, "self dup here now okay self dup here now okay fin"),
            (5, "short"),
            (6, ""),
        ],
        "doc_id long, text string",
    )


def test_clean_removes_all_occurrences(spark):
    out = {
        r["doc_id"]: r
        for r in ES.exactsubstr_clean(_corpus(spark), window_tokens=5).collect()
    }
    assert len(out) == 6
    # shared passage cut from BOTH docs (mark-all default)
    assert out[1]["clean_text"] == "unique one tail words here"
    assert out[2]["clean_text"] == "other two tail tokens go"
    assert out[1]["n_spans"] == 1 and out[1]["n_dup_tokens"] == 6
    # untouched doc passes through as its normalized text, zero counts
    assert out[3]["n_spans"] == 0 and out[3]["n_dup_tokens"] == 0
    assert out[3]["clean_text"].startswith("totally different")
    # within-doc repeat: both copies removed, adjacent marks merge to one span
    assert out[4]["clean_text"] == "fin"
    assert out[4]["n_spans"] == 1 and out[4]["n_dup_tokens"] == 10
    # short and empty docs produce no windows
    assert out[5]["n_spans"] == 0 and out[5]["n_dup_tokens"] == 0
    assert out[5]["clean_text"] == "short"
    assert out[6]["clean_text"] == "" and out[6]["n_spans"] == 0


def test_keep_first_exempts_first_occurrence(spark):
    out = {
        r["doc_id"]: r
        for r in ES.exactsubstr_clean(
            _corpus(spark), window_tokens=5, keep_first=True
        ).collect()
    }
    # cross-doc: doc 1 (min struct(id,pos) per window) keeps the passage
    assert out[1]["clean_text"].startswith(PASSAGE)
    assert out[1]["n_dup_tokens"] == 0
    assert out[2]["clean_text"] == "other two tail tokens go"
    # within-doc: the first copy survives
    assert out[4]["clean_text"] == "self dup here now okay fin"
    assert out[4]["n_dup_tokens"] == 5


def test_span_merge_gaps_and_islands(spark):
    """Two separated dup phrases in one doc stay two spans; the gap
    tokens survive."""
    docs = spark.createDataFrame(
        [
            (1, "one two three four five GAPA GAPB six seven eight nine ten"),
            (2, "one two three four five MIDDLE six seven eight nine ten"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in ES.exactsubstr_clean(docs, window_tokens=5).collect()
    }
    assert out[1]["n_spans"] == 2 and out[1]["n_dup_tokens"] == 10
    assert out[1]["clean_text"] == "gapa gapb"
    assert out[2]["clean_text"] == "middle"


def test_plan_shapes(spark):
    """Scale contract: count-then-join dup detection (no per-key
    collect_list before the filter), no row-Python anywhere."""
    docs = _corpus(spark)
    out = ES.exactsubstr_clean(docs, window_tokens=5)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # the dup-window filter runs on the COUNT aggregate (map-side
    # combined), never on a collected position list: no plan line
    # aggregates a list while grouping on the window key
    final = plan.split("== Initial Plan ==")[0]
    bad = [
        ln
        for ln in final.splitlines()
        if "collect_list" in ln and "keys=[wkey" in ln
    ]
    assert not bad, bad


def test_windows_and_marks(spark):
    docs = _corpus(spark)
    w = ES.token_windows(docs, window_tokens=5)
    rows = w.collect()
    # doc 1: 11 tokens -> 7 windows; doc 5/6: none
    assert sum(1 for r in rows if r["id"] == 1) == 7
    assert not [r for r in rows if r["id"] in (5, 6)]
    marks = ES.dup_window_marks(w).collect()
    assert {(r["id"], r["pos"]) for r in marks} >= {(1, 0), (2, 0), (4, 0), (4, 5)}
