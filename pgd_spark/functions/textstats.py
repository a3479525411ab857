"""Text-analysis operators for training-data pipelines.

All JVM-side column expressions (no Python in the hot path): token
counting, quality scoring, language ID heuristics, and document
fingerprinting.  Every function returns a DataFrame keyed by the id
column so results join back to the corpus; semantics are deliberately
simple + deterministic so an external SQL engine can replicate them
for oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# small stopword sets per language for the n-gram/stopword heuristic
_LANG_MARKERS = {
    "en": [" the ", " and ", " of ", " to ", " is "],
    "de": [" der ", " die ", " und ", " ist ", " das "],
    "fr": [" le ", " la ", " et ", " est ", " les "],
    "es": [" el ", " la ", " que ", " los ", " es "],
}


def token_count(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """[id, n_tokens, n_chars, n_words]: whitespace tokens plus a
    BPE-ish subword estimate (⌈chars/4⌉ floor-capped by words), the
    standard cheap proxy when no tokenizer ships with the cluster."""
    words = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    words = F.when(F.length(F.trim(F.col(text_col))) == 0, F.lit(0)).otherwise(words)
    chars = F.length(F.col(text_col))
    return df.select(
        F.col(id_col),
        words.cast("long").alias("n_words"),
        chars.cast("long").alias("n_chars"),
        F.greatest(words, F.ceil(chars / 4)).cast("long").alias("n_tokens_est"),
    )


def quality_score(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """[id, len_score, punct_ratio, upper_ratio, digit_ratio, quality]
    — length/punctuation/case/digit heuristics in [0,1]."""
    t = F.col(text_col)
    chars = F.length(t).cast("double")
    nz = F.greatest(chars, F.lit(1.0))
    punct = F.length(F.regexp_replace(t, r"[^.,;:!?]", "")).cast("double") / nz
    upper = F.length(F.regexp_replace(t, r"[^A-Z]", "")).cast("double") / nz
    digit = F.length(F.regexp_replace(t, r"[^0-9]", "")).cast("double") / nz
    len_score = F.least(chars / F.lit(500.0), F.lit(1.0))
    quality = F.greatest(
        F.lit(0.0),
        len_score - punct * 2.0 - F.greatest(upper - 0.3, F.lit(0.0)) - digit,
    )
    return df.select(
        F.col(id_col),
        F.round(len_score, 6).alias("len_score"),
        F.round(punct, 6).alias("punct_ratio"),
        F.round(upper, 6).alias("upper_ratio"),
        F.round(digit, 6).alias("digit_ratio"),
        F.round(F.least(quality, F.lit(1.0)), 6).alias("quality"),
    )


def langid(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """[id, lang_guess, lang_hits] — stopword-marker voting; 'und'
    (undetermined) when nothing matches.  A heuristic, not a model —
    the point is deterministic, vectorized, shuffle-free language
    bucketing at corpus scale."""
    padded = F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))
    hit_cols = []
    for lang, markers in _LANG_MARKERS.items():
        h = None
        for m in markers:
            c = (F.length(padded) - F.length(F.replace(padded, F.lit(m), F.lit("")))) / len(m)
            h = c if h is None else h + c
        hit_cols.append(h.cast("long").alias(f"hits_{lang}"))
    scored = df.select(F.col(id_col), F.col(text_col), *hit_cols)
    langs = list(_LANG_MARKERS)
    best_hits = F.greatest(*[F.col(f"hits_{lang}") for lang in langs])
    guess = F.lit("und")
    # iterate reversed so earlier languages win ties deterministically
    for lang in reversed(langs):
        guess = F.when(
            (F.col(f"hits_{lang}") == best_hits) & (best_hits > 0), F.lit(lang)
        ).otherwise(guess)
    return scored.select(
        F.col(id_col), guess.alias("lang_guess"), best_hits.alias("lang_hits")
    )


def fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """[id, fp_md5, fp_sim64] — md5 of whitespace-normalized lowercase
    text (exact-dup key) plus a 64-bit xxhash content id."""
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    return df.select(
        F.col(id_col),
        F.md5(norm).alias("fp_md5"),
        F.xxhash64(norm).alias("fp_sim64"),
    )
