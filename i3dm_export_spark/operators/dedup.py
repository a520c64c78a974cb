"""Deduplication suite for web-text corpora (training-data pipeline ops).

Beyond-reference operators required at 10^12-document scale; all pure
DataFrame/JVM expressions (no Python in the hot path), all deterministic
across engines (hashes are md5 hex — identical in Spark and DuckDB, which
is what makes the driver's oracle comparison possible):

* exact dedup          — hash-groupBy on normalized text
* MinHash + LSH        — shingle -> per-band min(md5) signature -> band
                         bucket join -> candidate pairs
* SimHash              — 16-bit sign-of-sum over md5-derived token bits
                         (integer sums only -> bit-exact everywhere)
* n-gram Jaccard       — exact pairwise similarity over candidate pairs

Scale notes: every op is one or two shuffles; LSH banding keeps the
candidate join linear-ish in corpus size (pairs only form inside a band
bucket); band buckets are naturally salted by the signature itself. The
embedding-cosine near-dup variant lives in operators/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def normalize_text(col="text"):
    """Whitespace-collapse + lowercase (shared normalization)."""
    return F.lower(F.regexp_replace(F.trim(F.col(col)), r"\s+", " "))


def exact_dedup(docs: DataFrame, id_col="doc_id", text_col="text") -> DataFrame:
    """One row per distinct normalized text: representative = min id,
    n_dups = group size. Single hash-aggregate shuffle."""
    return (
        docs.withColumn("text_hash", F.md5(normalize_text(text_col)))
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias("representative"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def shingles(docs: DataFrame, id_col="doc_id", text_col="text", n: int = 5) -> DataFrame:
    """Distinct character n-gram shingles per doc (JVM-side explode of
    substring positions — no UDF)."""
    norm = normalize_text(text_col)
    d = docs.select(F.col(id_col), norm.alias("_t"))
    d = d.withColumn("_pos", F.explode(F.sequence(F.lit(1), F.greatest(F.length("_t") - (n - 1), F.lit(1)))))
    return d.select(
        id_col, F.substring(F.col("_t"), F.col("_pos"), n).alias("shingle")
    ).distinct()


def minhash_signatures(
    docs: DataFrame, n_bands: int = 8, rows_per_band: int = 2,
    id_col="doc_id", text_col="text", shingle_n: int = 5,
) -> DataFrame:
    """(id, band, sig): banded MinHash. Each band's signature concatenates
    ``rows_per_band`` independent minhashes (hash r of band b =
    min over shingles of md5(b '.' r '#' shingle)); a bucket collision
    requires ALL rows of a band to agree — the standard LSH S-curve.
    Min over fixed-length hex strings == min over the 128-bit value, and
    md5 is engine-portable (the DuckDB oracle computes the same bytes)."""
    sh = shingles(docs, id_col, text_col, shingle_n)
    spark = sh.sparkSession
    hashes = spark.range(n_bands * rows_per_band).select(
        (F.col("id") / rows_per_band).cast("bigint").alias("band"),
        (F.col("id") % rows_per_band).alias("row"),
    )
    exploded = sh.crossJoin(F.broadcast(hashes))
    per_hash = (
        exploded.withColumn(
            "h",
            F.md5(
                F.concat_ws(
                    "#",
                    F.concat_ws(".", F.col("band").cast("string"), F.col("row").cast("string")),
                    F.col("shingle"),
                )
            ),
        )
        .groupBy(id_col, "band", "row")
        .agg(F.min("h").alias("mh"))
    )
    return (
        per_hash.groupBy(id_col, "band")
        .agg(F.array_join(F.array_sort(F.collect_list(
            F.concat_ws(":", F.col("row").cast("string"), F.col("mh"))
        )), "|").alias("sig"))
    )


def lsh_candidate_pairs(signatures: DataFrame, id_col="doc_id") -> DataFrame:
    """Distinct (a, b) with a < b sharing >= 1 band signature — the LSH
    bucket self-join. Buckets are (band, sig) keys; the join shuffles
    signature rows, never documents."""
    left = signatures.select(F.col(id_col).alias("a"), "band", "sig")
    right = signatures.select(F.col(id_col).alias("b"), "band", "sig")
    return (
        left.join(right, ["band", "sig"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame, candidates: DataFrame, id_col="doc_id",
    text_col="text", n: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard for candidate (a, b) pairs: two joins against
    the shingle table + one aggregation. jaccard = |A n B| / (|A| + |B| -
    |A n B|) — a single integer division, bit-stable."""
    sh = shingles(docs, id_col, text_col, n)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        candidates.join(sh.withColumnRenamed(id_col, "a").withColumnRenamed("shingle", "s"), "a")
        .join(sh.withColumnRenamed(id_col, "b").withColumnRenamed("shingle", "s2"), "b")
        .filter(F.col("s") == F.col("s2"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed(id_col, "a").withColumnRenamed("sz", "sz_a"), "a")
        .join(sizes.withColumnRenamed(id_col, "b").withColumnRenamed("sz", "sz_b"), "b")
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")),
        )
        .select("a", "b", "n_inter", "sz_a", "sz_b", "jaccard")
    )


def simhash(docs: DataFrame, id_col="doc_id", text_col="text", bits: int = 16) -> DataFrame:
    """(id, simhash): sign-of-sum SimHash over whitespace tokens.

    Bit j of a token = 1 iff hex digit j of md5(token) >= '8' (top bit of
    the nibble). Column sums are INTEGER (+1/-1), so the result is
    bit-exact in any engine — no FP in the pipeline."""
    toks = docs.select(
        F.col(id_col), F.explode(F.split(normalize_text(text_col), " ")).alias("tok")
    ).filter(F.length("tok") > 0)
    toks = toks.withColumn("h", F.md5(F.col("tok")))
    aggs = []
    for j in range(bits):
        nibble_gte8 = F.substring(F.col("h"), j + 1, 1).isin(
            *"89abcdef"
        )
        aggs.append(
            F.sum(F.when(nibble_gte8, 1).otherwise(-1)).alias(f"_b{j}")
        )
    summed = toks.groupBy(id_col).agg(*aggs)
    sim = F.lit(0).cast("bigint")
    for j in range(bits):
        sim = sim + F.when(F.col(f"_b{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return summed.select(F.col(id_col), sim.alias("simhash"))


def dedup_rank_representatives(
    docs: DataFrame, key_col: str, id_col="doc_id"
) -> DataFrame:
    """Generic 'keep first per group' (window + row_number) used by all
    dedup flavors to elect survivors deterministically."""
    w = Window.partitionBy(key_col).orderBy(F.col(id_col).asc())
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1")
        .drop("_rn")
    )
