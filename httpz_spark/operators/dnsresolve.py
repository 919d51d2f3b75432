"""DNS operators — declarative joins against the dns table.

The reference resolves CNAME chains and A/AAAA with live dnspython
(``/root/reference/httpz_scanner/utils.py:107-169``).  Here DNS is a table
(sandbox: the fabric's dns fixture; production: a dns-cache Iceberg table),
so resolution becomes **joins** the optimizer can see:

* CNAME chain: MAX_CNAME_CHAIN=3 (scanner.py:50) means at most 2 hops ->
  exactly two broadcast self-joins, unrolled.  Loop detection lowercases the
  accumulated chain (utils.py:126,135,138).
* A/AAAA: one broadcast join + ``array_sort(array_distinct(...))`` — the
  exact ``sorted(set(ips))`` semantics of utils.py:169.

The dns table is one row per host -> always broadcast (no shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def resolve_cname_chain(
    df: DataFrame, dns: DataFrame, host_col: str = "base_domain", max_chain: int = 3
) -> DataFrame:
    """Adds ``cname_chain array<string>`` (null when length would be 1 —
    scanner.py:343-344 attaches only chains > 1) and ``scan_target string``
    (chain tail, scanner.py:344)."""
    d = F.broadcast(dns.select(F.lower("host").alias("_k"), "cname_target"))
    out = df.withColumn("_chain", F.array(F.col(host_col))).withColumn(
        "_cur", F.col(host_col)
    )
    for _hop in range(max_chain - 1):
        out = (
            out.join(d, F.lower(out["_cur"]) == d["_k"], "left")
            .withColumn(
                "_next",
                F.when(
                    F.col("cname_target").isNotNull()
                    & (F.col("cname_target") != "")
                    & ~F.array_contains(
                        F.transform(F.col("_chain"), lambda x: F.lower(x)),
                        F.lower(F.col("cname_target")),
                    ),
                    F.col("cname_target"),
                ),
            )
            .withColumn(
                "_chain",
                F.when(
                    F.col("_next").isNotNull(),
                    F.array_union(F.col("_chain"), F.array(F.col("_next"))),
                ).otherwise(F.col("_chain")),
            )
            .withColumn("_cur", F.coalesce(F.col("_next"), F.col("_cur")))
            .drop("_k", "cname_target", "_next")
        )
    return (
        out.withColumn(
            "cname_chain",
            F.when(F.size("_chain") > 1, F.col("_chain")),
        )
        .withColumn("scan_target", F.element_at("_chain", -1))
        .drop("_chain", "_cur")
    )


def ips_array(a: Column, aaaa: Column) -> Column:
    """sorted(set(A+AAAA)) — utils.py:169; null when empty (scanner.py:373-375
    attaches only non-empty)."""
    merged = F.array_distinct(
        F.concat(
            F.coalesce(a, F.array().cast("array<string>")),
            F.coalesce(aaaa, F.array().cast("array<string>")),
        )
    )
    return F.when(F.size(merged) > 0, F.array_sort(merged))


def resolve_ips(df: DataFrame, dns: DataFrame, target_col: str = "scan_target") -> DataFrame:
    """Adds ``ips array<string>`` for the scan target (reference resolves the
    post-CNAME target — scanner.py:348-350)."""
    d = F.broadcast(
        dns.select(F.lower("host").alias("_k"), "a_records", "aaaa_records")
    )
    return (
        df.join(d, F.lower(df[target_col]) == d["_k"], "left")
        .withColumn("ips", ips_array(F.col("a_records"), F.col("aaaa_records")))
        .drop("_k", "a_records", "aaaa_records")
    )
