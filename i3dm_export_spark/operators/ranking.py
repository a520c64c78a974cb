"""Corpus ranking / curation aggregates over the ``documents`` table
(training-data pipeline ops, webtext payload).

* :func:`bm25_rank` — Okapi BM25 relevance score of every document for a
  fixed term list. Plan shape: per-doc term frequencies are PURE
  PROJECTIONS (``size(filter(split(text)))`` — JVM higher-order
  functions, no explode, no shuffle), the corpus statistics (N, avgdl,
  per-term document frequencies) are ONE scalar aggregate row broadcast
  back via a cross join, and the final score is a fixed-order sum of one
  closed-form contribution per query term. One full scan + one 1-row
  aggregate: linear at 10^12 docs, no wide shuffle anywhere.

* :func:`source_stats` — per-source (per-domain, in Common-Crawl terms)
  curation metrics: document count, exact-dup rate (1 - distinct
  normalized-text fingerprints / docs), language spread, mean length.
  The signal a corpus-curation pipeline uses to down-weight or drop
  boilerplate-heavy domains. One hash aggregation on the source key.

Both are bit-stable against the DuckDB oracle: term frequencies and
document frequencies are integers; the only floats are the final BM25
arithmetic (identical literal op order in both engines, rounded) and the
rounded ratios.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import norm

BM25_K1 = 1.2
BM25_B = 0.75


def _tf(term: str):
    """Occurrences of ``term`` among the whitespace tokens of the
    normalized text — a pure array projection, no explode."""
    return F.size(
        F.filter(F.split(norm("text"), " "), lambda x: x == F.lit(term))
    ).cast("bigint")


def bm25_rank(
    docs: DataFrame,
    terms: tuple[str, ...],
    id_col: str = "doc_id",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """(id, dl, score) with score = sum_t idf(t) * tf*(k1+1) /
    (tf + k1*(1 - b + b*dl/avgdl)), idf(t) = ln(1 + (N - df + 0.5)/(df +
    0.5)) (the Robertson–Spärck Jones formulation used by Lucene).

    The per-term contributions are summed in the LITERAL order of
    ``terms`` — not via a row aggregation — so the float result is
    order-deterministic and hash-comparable across engines."""
    tf_cols = [F.col(f"_tf_{i}") for i in range(len(terms))]
    with_tf = docs.select(
        F.col(id_col),
        *[_tf(t).alias(f"_tf_{i}") for i, t in enumerate(terms)],
        F.when(F.length(norm("text")) == 0, F.lit(0))
        .otherwise(F.size(F.split(norm("text"), " ")))
        .cast("bigint")
        .alias("dl"),
    )
    stats = with_tf.agg(
        F.count(F.lit(1)).alias("_n"),
        F.avg("dl").alias("_avgdl"),
        *[
            F.sum((c > 0).cast("bigint")).alias(f"_df_{i}")
            for i, c in enumerate(tf_cols)
        ],
    )
    j = with_tf.crossJoin(F.broadcast(stats))
    score = F.lit(0.0)
    for i in range(len(terms)):
        tf = F.col(f"_tf_{i}").cast("double")
        df = F.col(f"_df_{i}").cast("double")
        n = F.col("_n").cast("double")
        idf = F.log(F.lit(1.0) + (n - df + F.lit(0.5)) / (df + F.lit(0.5)))
        denom = tf + F.lit(k1) * (
            F.lit(1.0 - b)
            + F.lit(b) * F.col("dl").cast("double") / F.col("_avgdl")
        )
        score = score + idf * tf * F.lit(k1 + 1.0) / denom
    return j.select(
        id_col, "dl", F.round(score, 6).alias("bm25")
    )


def bm25_oracle_sql(
    terms: tuple[str, ...], k1: float = BM25_K1, b: float = BM25_B
) -> str:
    """DuckDB twin of :func:`bm25_rank` — same normalization, same tf/df
    integers, same literal-order float arithmetic."""
    nt = "lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))"
    tf_exprs = ", ".join(
        f"CAST(len(list_filter(string_split({nt}, ' '), x -> x = '{t}')) "
        f"AS BIGINT) AS tf_{i}"
        for i, t in enumerate(terms)
    )
    df_exprs = ", ".join(
        f"SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(terms))
    )
    contribs = " + ".join(
        f"(ln(1.0 + (CAST(n AS DOUBLE) - CAST(df_{i} AS DOUBLE) + 0.5) / "
        f"(CAST(df_{i} AS DOUBLE) + 0.5)) * CAST(tf_{i} AS DOUBLE) * "
        f"{k1 + 1.0!r} / (CAST(tf_{i} AS DOUBLE) + {k1!r} * "
        f"({1.0 - b!r} + {b!r} * CAST(dl AS DOUBLE) / avgdl)))"
        for i in range(len(terms))
    )
    return (
        f"WITH tf AS (SELECT doc_id, {tf_exprs}, "
        f"CASE WHEN length({nt}) = 0 THEN 0 "
        f"ELSE CAST(len(string_split({nt}, ' ')) AS BIGINT) END AS dl "
        "FROM documents),\n"
        f"st AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl, {df_exprs} FROM tf)\n"
        f"SELECT doc_id, dl, ROUND(0.0 + {contribs}, 6) AS bm25 "
        "FROM tf CROSS JOIN st"
    )


def source_stats(docs: DataFrame) -> DataFrame:
    """Per-source curation metrics: (source, n_docs, n_unique, dup_rate,
    n_langs, avg_chars). ``dup_rate`` uses the md5 of normalized text —
    the same fingerprint exact dedup keys on — so a source whose pages
    are copies scores high and gets down-weighted by the curation layer."""
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct(F.md5(norm("text"))).alias("n_unique"),
            F.countDistinct("lang").alias("n_langs"),
            F.round(F.avg(F.col("n_chars").cast("double")), 4).alias(
                "avg_chars"
            ),
        )
        .select(
            "source",
            "n_docs",
            "n_unique",
            F.round(
                F.lit(1.0)
                - F.col("n_unique").cast("double")
                / F.col("n_docs").cast("double"),
                6,
            ).alias("dup_rate"),
            "n_langs",
            "avg_chars",
        )
    )


SOURCE_STATS_ORACLE_SQL = (
    "WITH f AS (SELECT source, lang, n_chars, "
    "md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp "
    "FROM documents)\n"
    "SELECT source, COUNT(*) AS n_docs, "
    "COUNT(DISTINCT fp) AS n_unique, "
    "ROUND(1.0 - CAST(COUNT(DISTINCT fp) AS DOUBLE) / COUNT(*), 6) "
    "AS dup_rate, "
    "COUNT(DISTINCT lang) AS n_langs, "
    "ROUND(AVG(CAST(n_chars AS DOUBLE)), 4) AS avg_chars "
    "FROM f GROUP BY source"
)
