"""C4 cleaning rules (operators/c4rules.py): line filters, page gates,
three-sentence-span cross-corpus dedup.  DuckDB parity is the gate's job;
here the expected outputs are computable by eye."""

from pyspark.sql import functions as F

from httpz_spark.operators.c4rules import (
    c4_clean,
    c4_line_filters,
    c4_span_dedup,
)


def test_c4_line_filters_keep_rules(spark):
    text = "\n".join([
        "This line ends with a period.",        # kept
        "short one.",                            # 2 words -> dropped
        "No terminal punctuation here",          # dropped
        "Enable JavaScript to continue please.",  # javascript -> dropped
        'He said "stop" and left.',              # kept (ends .)
        "Is this a question?",                   # kept (ends ?)
    ])
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    r = c4_line_filters(df).collect()[0]
    assert r["n_lines"] == 6
    assert r["n_lines_kept"] == 3
    assert r["clean_text"].splitlines() == [
        "This line ends with a period.",
        'He said "stop" and left.',
        "Is this a question?",
    ]
    assert not r["has_brace"] and not r["has_lorem"]


def test_c4_page_gates(spark):
    good = " ".join(f"This is sentence number {i}." for i in range(6))
    df = spark.createDataFrame(
        [
            (0, good),
            (1, good + "\nvar x = { a: 1 };"),      # brace in ORIGINAL text
            (2, good.replace("number 3", "Lorem Ipsum filler")),
            (3, "Too few sentences in this one."),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in c4_line_filters(df).collect()}
    assert out[0]["page_keep"]
    assert out[1]["has_brace"] and not out[1]["page_keep"]
    assert out[2]["has_lorem"] and not out[2]["page_keep"]
    assert out[3]["n_sentences"] < 5 and not out[3]["page_keep"]


def test_c4_span_dedup_drops_second_occurrence(spark):
    shared = "Alpha beta gamma. Delta epsilon zeta. Eta theta iota"
    df = spark.createDataFrame(
        [
            (0, shared + ". Unique tail zero"),
            (1, shared + ". Unique tail one"),   # shares the 3-sent span
            (2, "Too short. To have spans"),     # < 3 sentences: untouched
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in c4_span_dedup(df).collect()}
    # doc 0 is the first occurrence: untouched
    assert out[0]["n_sent_dropped"] == 0
    assert out[0]["dedup_text"] == shared + ". Unique tail zero"
    # doc 1: sentences 0..2 dropped, tail survives
    assert out[1]["n_sent_dropped"] == 3
    assert out[1]["dedup_text"] == "Unique tail one"
    # doc 2 has < 3 sentences: passthrough
    assert out[2]["n_sent_dropped"] == 0
    assert out[2]["dedup_text"] == "Too short. To have spans"


def test_c4_span_dedup_within_doc_duplicate(spark):
    # the same span repeated within one doc: second occurrence dropped
    span = "One two three. Four five six. Seven eight nine"
    df = spark.createDataFrame(
        [(0, span + ". Bridge sentence here. " + span)],
        "doc_id long, text string",
    )
    r = c4_span_dedup(df).collect()[0]
    assert r["n_sentences"] == 7
    # sentences 4,5,6 form the duplicate span and are dropped
    assert r["n_sent_dropped"] == 3
    assert r["dedup_text"] == span + ". Bridge sentence here"


def test_c4_clean_composes(spark):
    sent6 = " ".join(f"Sentence number {i} is here." for i in range(6))
    df = spark.createDataFrame(
        [
            (0, sent6),
            (1, "Contains a brace { so dropped. " + sent6),
            (2, "no terminal punct so every line dies"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in c4_clean(df).collect()}
    assert set(out) == {0}          # 1 gated by brace, 2 has no kept lines
    assert out[0]["n_sent_dropped"] == 0


def test_c4_clean_no_python_udfs(spark):
    df = spark.createDataFrame([(0, "A b c. D e f. G h i. J k l. M n o.")],
                               "doc_id long, text string")
    plan = c4_clean(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
