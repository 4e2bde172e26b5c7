"""Text analysis for training-data pipelines — all JVM-side expressions.

- token_count: whitespace tokens + a BPE-ish subword estimate.
- quality_features / quality_score: length, punctuation ratio,
  stopword ratio, mean word length — composable into a 0..1 score.
- lang_id: marker-word n-gram heuristic (deterministic argmax).
- doc_fingerprint: winnowing-style rolling-hash fingerprint set.

Each is a plain Column/DataFrame transform (codegen-friendly); nothing
here calls into Python per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")

# marker words per language for the n-gram-ish heuristic; deterministic
# and intentionally SQL-expressible (regexp counts) so the DuckDB oracle
# can replay it exactly.
LANG_MARKERS = {
    "en": ("the", "and", "of", "is"),
    "es": ("el", "la", "de", "que"),
    "fr": ("le", "la", "et", "les"),
    "de": ("der", "die", "und", "das"),
}


def token_count(text: Column) -> Column:
    """Whitespace token count; 0 for empty/blank strings."""
    trimmed = F.trim(text)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(F.size(F.split(trimmed, r"\s+")))


def bpe_ish_token_estimate(text: Column) -> Column:
    """Subword-count estimate: word-chunks + digits + punctuation runs,
    long words counted as ceil(len/4) subwords (BPE-like)."""
    words = F.split(F.trim(text), r"\s+")
    per_word = F.transform(words, lambda w: F.ceil(F.length(w) / F.lit(4.0)).cast("long"))
    return F.when(F.length(F.trim(text)) == 0, F.lit(0).cast("long")).otherwise(
        F.aggregate(per_word, F.lit(0).cast("long"), lambda acc, x: acc + x)
    )


def quality_features(df: DataFrame, text_col: str) -> DataFrame:
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = token_count(t)
    n_punct = F.length(t) - F.length(F.regexp_replace(t, r"[\.,;:!\?]", ""))
    stop_pattern = r"\b(" + "|".join(_STOPWORDS) + r")\b"
    n_stop = F.size(F.regexp_extract_all(F.lower(t), F.lit(stop_pattern), 0))
    return (
        df.withColumn("n_chars_calc", n_chars)
        .withColumn("n_tokens", n_tokens)
        .withColumn("punct_ratio", F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0)))
        .withColumn("stopword_ratio", F.when(n_tokens > 0, n_stop / n_tokens).otherwise(F.lit(0.0)))
        .withColumn("mean_word_len", F.when(n_tokens > 0, (n_chars - n_tokens + 1) / n_tokens).otherwise(F.lit(0.0)))
    )


def quality_score(df: DataFrame, text_col: str, out: str = "quality") -> DataFrame:
    """Deterministic 0..1 quality score from the features: rewards
    mid-length docs with a healthy stopword ratio, penalizes
    punctuation soup."""
    feats = quality_features(df, text_col)
    len_score = F.least(F.col("n_tokens") / F.lit(50.0), F.lit(1.0))
    stop_score = F.least(F.col("stopword_ratio") * 5.0, F.lit(1.0))
    punct_penalty = F.greatest(F.lit(1.0) - F.col("punct_ratio") * 10.0, F.lit(0.0))
    # no rounding: every input is an IEEE-exact division of ints, so the
    # same expression in DuckDB reproduces the double bit-for-bit.
    return feats.withColumn(out, (len_score + stop_score + punct_penalty) / 3.0)


def lang_scores(text: Column) -> dict[str, Column]:
    scores = {}
    for lang, markers in LANG_MARKERS.items():
        pat = r"\b(" + "|".join(markers) + r")\b"
        scores[lang] = F.size(F.regexp_extract_all(F.lower(text), F.lit(pat), 0))
    return scores


def lang_id(df: DataFrame, text_col: str, out: str = "lang_pred") -> DataFrame:
    """Argmax over marker-word counts; ties broken by language code
    ascending; all-zero -> 'und'. Deterministic, SQL-replayable."""
    scores = lang_scores(F.col(text_col))
    df2 = df
    for lang, sc in scores.items():
        df2 = df2.withColumn(f"__s_{lang}", sc)
    # argmax with lexicographic tiebreak via greatest over structs
    best = F.greatest(*[F.struct(F.col(f"__s_{lang}").alias("s"), F.lit(_inv_code(lang)).alias("inv"), F.lit(lang).alias("lang")) for lang in LANG_MARKERS])
    out_col = F.when(best["s"] > 0, best["lang"]).otherwise(F.lit("und"))
    return df2.withColumn(out, out_col).drop(*[f"__s_{lang}" for lang in LANG_MARKERS])


def _inv_code(lang: str) -> str:
    """Invert the code so greatest() prefers the alphabetically-first
    language on score ties (struct comparison is lexicographic)."""
    return "".join(chr(255 - ord(ch)) for ch in lang)


def doc_fingerprints(
    df: DataFrame, id_col: str, text_col: str, k: int = 8, window: int = 4, hash_fn: str = "xxhash64"
) -> DataFrame:
    """Winnowing fingerprints: k-char rolling shingle hashes, min per
    sliding window of ``window`` hashes, distinct mins kept.

    Output: (id, fingerprint) rows — the standard local fingerprinting
    scheme for copy-detection, built from substr/transform/<hash>.

    ``hash_fn``: ``xxhash64`` (default; fastest, bigint fingerprints) or
    ``md5`` (16-hex-char string fingerprints; fixed-width lowercase hex
    compares lexicographically == numerically in every engine, so an
    ANSI-SQL oracle reproduces the output exactly).
    """
    from pyspark.sql import Window

    t = F.col(text_col)
    if hash_fn == "md5":
        h = lambda c: F.substring(F.md5(c), 1, 16)  # noqa: E731
    else:
        h = F.xxhash64
    offsets = F.sequence(F.lit(1), F.greatest(F.length(t) - F.lit(k - 1), F.lit(1)))
    hashes = F.transform(offsets, lambda i: h(F.substr(t, i, F.lit(k))))
    # posexplode BEFORE windowing so each gram is hashed exactly once;
    # computing window mins over the array expression instead would
    # re-inline (and re-hash) the whole array per window -> O(len*w).
    ex = df.select(F.col(id_col).alias("id"), F.posexplode(hashes).alias("pos", "h"))
    w_min = Window.partitionBy("id").orderBy("pos").rowsBetween(0, window - 1)
    w_all = Window.partitionBy("id")
    return (
        ex.withColumn("__mh", F.min("h").over(w_min))
        .withColumn("__n", F.count("*").over(w_all))
        .filter(F.col("pos") <= F.greatest(F.col("__n") - window, F.lit(0)))
        .select("id", F.col("__mh").alias("fingerprint"))
        .distinct()
    )
