"""Text-analysis operators for a large-scale training-data pipeline:
language-ID heuristic, quality scoring, token counting, document
fingerprinting.  All built-in ``pyspark.sql.functions`` expressions —
JVM-side, whole-stage-codegen, no Python in the hot path — so each scales
linearly over a 100 TB documents table (narrow, no shuffle).

Every function takes/returns DataFrames; column semantics are chosen to be
expressible in ANSI SQL so the DuckDB oracle can verify them exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# deterministic stopword list for the quality heuristic
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")

# marker-word table for the language-ID heuristic (n-gram-lite: presence of
# high-frequency function words; deterministic, SQL-expressible)
LANG_MARKERS = (
    ("es", ("el", "la", "de", "que", "y")),
    ("de", ("der", "die", "das", "und", "ist")),
    ("fr", ("le", "la", "les", "et", "est")),
    ("zh", ("de5", "shi4", "le5", "zai4", "he2")),  # pinyin-ish markers
)


def tokenize(col):
    """Whitespace tokenization as an expression."""
    return F.split(F.trim(F.regexp_replace(col, r"\s+", " ")), " ")


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish subword count (regex of word
    pieces / digits / punctuation — the common pre-tokenizer shape)."""
    ws = F.size(tokenize(F.col(text_col)))
    bpe = F.size(F.regexp_extract_all(
        F.col(text_col), F.lit(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"), 0))
    return df.withColumn("n_tokens_ws", ws).withColumn("n_tokens_bpe", bpe)


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic quality heuristics: length, mean word length,
    punctuation ratio, stopword ratio, and a composite score in [0,1].
    (The C4/Gopher-style rule family, expressed as pure column algebra.)"""
    toks = tokenize(F.col(text_col))
    n_tok = F.size(toks)
    n_chars = F.length(F.col(text_col))
    n_punct = F.size(F.regexp_extract_all(
        F.col(text_col), F.lit(r"[^\w\s]"), 0))
    n_stop = F.size(F.filter(toks, lambda t: F.lower(t).isin(*STOPWORDS)))
    mean_wl = F.when(n_tok > 0, (n_chars - (n_tok - 1)) / n_tok).otherwise(0.0)
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(0.0)
    stop_ratio = F.when(n_tok > 0, n_stop / n_tok).otherwise(0.0)
    score = (
        F.when((n_tok >= 10) & (n_tok <= 100000), F.lit(0.25)).otherwise(0.0)
        + F.when((mean_wl >= 3) & (mean_wl <= 12), F.lit(0.25)).otherwise(0.0)
        + F.when(punct_ratio <= 0.2, F.lit(0.25)).otherwise(0.0)
        + F.when(stop_ratio >= 0.05, F.lit(0.25)).otherwise(0.0)
    )
    return (df.withColumn("n_tokens", n_tok)
            .withColumn("mean_word_len", F.round(mean_wl, 4))
            .withColumn("punct_ratio", F.round(punct_ratio, 4))
            .withColumn("stopword_ratio", F.round(stop_ratio, 4))
            .withColumn("quality_score", F.round(score, 2)))


def quality_flags(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Integer-exact variant of :func:`quality_score` for cross-engine
    oracle equality: raw counts plus ``score_q`` = number of passed
    heuristics (0-4).  No fractional rounding anywhere, so a DuckDB oracle
    matches bit-for-bit."""
    toks = tokenize(F.col(text_col))
    n_tok = F.size(toks)
    n_chars = F.length(F.col(text_col))
    n_punct = F.size(F.regexp_extract_all(
        F.col(text_col), F.lit(r"[^A-Za-z0-9_\s]"), 0))
    n_stop = F.size(F.filter(toks, lambda t: F.lower(t).isin(*STOPWORDS)))
    mean_wl = (n_chars - (n_tok - 1)) / n_tok
    score_q = (
        F.when((n_tok >= 10) & (n_tok <= 100000), 1).otherwise(0)
        + F.when((mean_wl >= 3) & (mean_wl <= 12), 1).otherwise(0)
        + F.when(n_punct * 5 <= n_chars, 1).otherwise(0)          # ratio<=0.2
        + F.when(n_stop * 20 >= n_tok, 1).otherwise(0)            # ratio>=0.05
    )
    return df.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        n_chars.alias("n_chars"),
        n_punct.alias("n_punct"),
        n_stop.alias("n_stop"),
        score_q.cast("int").alias("score_q"))


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language-ID heuristic: count hits per language's marker
    set over whitespace tokens, argmax with 'en' fallback.  Deterministic
    and SQL-expressible (the real-world version swaps in fastText — this
    is the Spark plumbing with an honest heuristic)."""
    toks = tokenize(F.lower(F.col(text_col)))

    def _marker_pred(markers):
        # single-arg lambda: a 2-arg lambda would be called as (element, index)
        return lambda t: t.isin(*markers)

    scores = [
        F.size(F.filter(toks, _marker_pred(markers))).alias(lang)
        for lang, markers in LANG_MARKERS
    ]
    out = df
    for (lang, markers), sc in zip(LANG_MARKERS, scores):
        out = out.withColumn(f"_s_{lang}", sc)
    best = F.lit("en")
    best_score = F.lit(0)
    for lang, _ in LANG_MARKERS:
        cond = F.col(f"_s_{lang}") > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, F.col(f"_s_{lang}")).otherwise(best_score)
    out = out.withColumn("lang_pred", best)
    return out.drop(*[f"_s_{lang}" for lang, _ in LANG_MARKERS])


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of the whitespace-normalized lowercase
    text (exact-dedup key), plus a 64-bit rolling-hash style fingerprint
    (xxhash64 over the normalized form) for cheap joins."""
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    return (df.withColumn("fp_md5", F.md5(norm))
            .withColumn("fp_xx64", F.xxhash64(norm)))
