"""Text-analysis column expressions (training-data pipeline ops).

All pure JVM-side column expressions (Catalyst/codegen, no UDFs) so they
run at scan speed over 10^12 documents and evaluate identically in the
DuckDB oracle (integer counts + single divisions only):

* token counting       — whitespace split + a BPE-ish sub-word regex count
* quality scoring      — alpha/digit/punct/space ratios, mean word length
* language ID          — stopword-hit scoring over 4 languages (en/fr/de/nl)
* fingerprinting       — md5 of normalized text + a polynomial rolling hash
                         on the first 32 chars (integer arithmetic)
"""

from __future__ import annotations

from pyspark.sql import functions as F

WORD_RE = r"[a-z]+"
# BPE-ish: runs of letters, runs of digits, or single non-space symbols
BPE_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

STOPWORDS = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for"),
    "fr": ("le", "la", "les", "des", "est", "une", "dans", "pour"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "mit", "ein"),
    "nl": ("de", "het", "een", "van", "en", "dat", "niet", "met"),
}


def norm(col="text"):
    return F.lower(F.regexp_replace(F.trim(F.col(col)), r"\s+", " "))


def token_count(col="text"):
    """Whitespace token count (0 for empty)."""
    t = norm(col)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, " "))
    ).cast("bigint")


def bpe_ish_token_count(col="text"):
    """Sub-word-ish token count via regexp_count of BPE_RE."""
    return F.regexp_count(norm(col), F.lit(BPE_RE)).cast("bigint")


def _count_class(col, pattern: str):
    t = norm(col)
    return (F.length(t) - F.length(F.regexp_replace(t, pattern, ""))).cast("bigint")


def quality_features(col="text"):
    """Struct of quality signals; every ratio is one integer/integer
    division (bit-stable cross-engine)."""
    t = norm(col)
    n = F.length(t).cast("bigint")
    alpha = _count_class(col, "[a-z]")
    digit = _count_class(col, "[0-9]")
    space = _count_class(col, " ")
    punct = n - alpha - digit - space
    ntok = token_count(col)
    safe_n = F.greatest(n, F.lit(1))
    return {
        "n_chars_norm": n,
        "n_tokens": ntok,
        "alpha_ratio": alpha / safe_n,
        "digit_ratio": digit / safe_n,
        "punct_ratio": punct / safe_n,
        "mean_token_len": (n - space) / F.greatest(ntok, F.lit(1)),
    }


def stopword_hits(col, lang: str):
    """Number of stopword occurrences (word-boundary matches) for a lang."""
    t = norm(col)
    total = F.lit(0).cast("bigint")
    for w in STOPWORDS[lang]:
        total = total + F.regexp_count(
            t, F.lit(rf"\b{w}\b")
        ).cast("bigint")
    return total


def lang_id(col="text"):
    """Argmax stopword score over en/fr/de/nl; deterministic tie-break by
    language code order (en < fr < de < nl by score comparison chain)."""
    scores = {lang: stopword_hits(col, lang) for lang in STOPWORDS}
    best = F.lit("en")
    best_score = scores["en"]
    for lang in ("fr", "de", "nl"):
        cond = scores[lang] > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, scores[lang]).otherwise(best_score)
    return best


def fingerprint_md5(col="text"):
    return F.md5(norm(col))


def rolling_hash32(col="text", base: int = 131, mod: int = 1_000_000_007):
    """Polynomial rolling hash of the first 32 normalized chars — pure
    integer column arithmetic (ascii() per position), portable to any SQL
    engine for oracle checks."""
    t = norm(col)
    h = F.lit(0).cast("bigint")
    for i in range(1, 33):
        c = F.when(F.length(t) >= i, F.ascii(F.substring(t, i, 1))).otherwise(F.lit(0))
        h = (h * base + c.cast("bigint")) % mod
    return h
