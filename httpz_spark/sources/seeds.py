"""Seed-list sources (SURVEY §2 A1 — ``input_generator`` analogues).

The reference consumes files / stdin / iterables / raw strings lazily
(``utils.py:172-238``).  Spark-side equivalents:

* small seed lists (files, CLI input) -> a DataFrame with an explicit,
  persisted 0-based ``line_num`` — the only shard-stable line identity
  (``monotonically_increasing_id`` is NOT stable across re-computation);
* huge frontiers arrive as tables already (``spark.read`` / the frontier
  state), where line-modulo sharding is replaced by real hash partitioning
  (SURVEY §4 O8) and --shard parity is a filter for comparison runs.
* unbounded streams -> :mod:`httpz_spark.streaming.micro`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def seeds_from_lines(spark: SparkSession, lines) -> DataFrame:
    """In-memory iterable (list/tuple/generator) of lines -> seed table.
    Blank lines are KEPT (they consume shard line numbers —
    utils.py:214-216; the scan plan filters them after numbering)."""
    rows = [(i, "" if ln is None else str(ln)) for i, ln in enumerate(lines)]
    return spark.createDataFrame(rows, "line_num long, raw string")


def seeds_from_text(spark: SparkSession, path: str) -> DataFrame:
    """Seed file -> seed table with reference-exact line numbering.

    Read driver-side: seed lists are small by definition (the 10^10-scale
    input is the frontier TABLE, not a text file), and only a sequential
    read can reproduce the reference's exact physical line numbers."""
    with open(path, encoding="utf-8") as f:
        return seeds_from_lines(spark, f.read().splitlines())


def seeds_from_string(spark: SparkSession, content: str | bytes) -> DataFrame:
    """Raw newline-delimited string/bytes (utils.py:231-238)."""
    if isinstance(content, bytes):
        content = content.decode()
    return seeds_from_lines(spark, content.splitlines())


def seeds_from_stdin(spark: SparkSession, stream=None) -> DataFrame:
    """Piped input — the reference's ``-`` source (utils.py:186-196).

    Reads the stream to EOF with the same numbering contract as every other
    source: blank lines consume line numbers (they are filtered AFTER
    numbering, so ``--shard i/n`` parity holds for piped workflows too).
    ``stream`` defaults to ``sys.stdin``; tests inject a StringIO."""
    import sys

    stream = sys.stdin if stream is None else stream
    lines = []
    while True:
        line = stream.readline()
        if not line:
            break
        lines.append(line.rstrip("\n").rstrip("\r"))
    return seeds_from_lines(spark, lines)


def seeds_from_async_iterable(spark: SparkSession, ait) -> DataFrame:
    """Async iterable of lines (utils.py:208-217) — drained on a private
    event loop with the same numbering contract (bytes decoded, blanks
    numbered)."""
    import asyncio

    async def drain():
        out = []
        async for line in ait:
            if isinstance(line, bytes):
                line = line.decode()
            out.append(line)
        return out

    loop = asyncio.new_event_loop()
    try:
        lines = loop.run_until_complete(drain())
    finally:
        loop.close()
    return seeds_from_lines(spark, lines)


def seeds(spark: SparkSession, source) -> DataFrame:
    """Source dispatch mirroring the reference's input_generator ladder
    (utils.py:172-238): '-'/None -> stdin, existing path -> file, async
    iterable, sync iterable -> lines, str/bytes -> raw content."""
    import os

    if source == "-" or source is None:
        return seeds_from_stdin(spark)
    if isinstance(source, str) and os.path.exists(source):
        return seeds_from_text(spark, source)
    if hasattr(source, "__aiter__"):
        return seeds_from_async_iterable(spark, source)
    if hasattr(source, "__iter__") and not isinstance(source, (str, bytes)):
        return seeds_from_lines(spark, source)
    return seeds_from_string(spark, source)
