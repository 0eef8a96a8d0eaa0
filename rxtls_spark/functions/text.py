"""Text-analysis operators for the training-data pipeline
(driver mandate: language-ID, quality scoring, token counting,
document fingerprinting over the `documents` table).

Everything except the fingerprint is pure Catalyst expressions
(JVM-side, whole-stage codegen) with an exact DuckDB-SQL mirror in
queries.py; the fingerprint uses the vectorized XXH3 batch hasher.

Language-ID is a deliberately simple marker-token heuristic so the
oracle can recompute it: per-language scores are substring occurrence
counts ((len(text) - len(replace(text, m, ''))) / len(m) summed over
markers), CJK languages score by CJK-codepoint count, and the argmax
uses a fixed priority order as the deterministic tiebreak.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# marker tokens per language — lowercase, space-padded to avoid
# substring false hits; shared verbatim with the SQL oracle
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " die "],
    "fr": [" le ", " et ", " les "],
    "es": [" el ", " y ", " de la "],
}
# priority order for argmax tiebreaks (first wins on equal score)
LANG_PRIORITY = ["en", "de", "fr", "es", "zh"]

CJK_RE = "[\\u4e00-\\u9fff]"


def _occurrences(text: Column, marker: str) -> Column:
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(marker), F.lit(""))))
        / F.lit(len(marker))
    ).cast("long")


def lang_scores(text_col: str = "text") -> dict[str, Column]:
    t = F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))
    scores = {
        lang: sum(
            (_occurrences(t, m) for m in markers), start=F.lit(0).cast("long")
        )
        for lang, markers in LANG_MARKERS.items()
    }
    scores["zh"] = F.length(
        F.regexp_replace(F.col(text_col), "[^\\u4e00-\\u9fff]", "")
    ).cast("long")
    return scores


def lang_guess(text_col: str = "text") -> Column:
    """argmax over language scores, fixed priority tiebreak, 'und' when
    every score is 0."""
    s = lang_scores(text_col)
    # first language (in priority order) whose score equals the row max
    mx = F.greatest(*[s[lang] for lang in LANG_PRIORITY])
    expr = F.lit("und")
    for lang in reversed(LANG_PRIORITY):
        expr = F.when(s[lang] == mx, F.lit(lang)).otherwise(expr)
    return F.when(mx <= 0, F.lit("und")).otherwise(expr)


def token_count(text_col: str = "text") -> Column:
    """Whitespace tokenization; empty/blank → 0."""
    t = F.trim(F.col(text_col))
    return (
        F.when(t == "", F.lit(0))
        .otherwise(F.size(F.split(t, "[ \\t\\n\\x0B\\f\\r]+")))
        .cast("long")
    )


# Frozen multi-language stopword set (mirrored in the SQL oracle) —
# a fixed list, not a model: the ratio feeds quality filtering.
STOPWORDS = (
    "the a an and or of to in is it for on with as at this that be are was "
    "der die das und ist den le la les et el los y de que"
).split()

# BPE-ish pre-tokenization: letter runs | digit runs | symbol runs.
# The three classes are DISJOINT, so Java regex (Spark) and RE2
# (DuckDB) agree exactly — no alternation-order or longest-match
# sensitivity.  This is the GPT-2 pre-tokenizer shape minus the
# contraction lookaheads RE2 can't express.  The whitespace set is
# spelled out because Java \s includes \x0B while RE2's does not.
BPE_PATTERN = r"\p{L}+|\p{N}+|[^\p{L}\p{N} \t\n\x0B\f\r]+"


def token_count_bpe(text_col: str = "text") -> Column:
    """Subword-ish token count: number of BPE_PATTERN matches."""
    return F.regexp_count(F.col(text_col), F.lit(BPE_PATTERN)).cast("long")


def stopword_ratio(text_col: str = "text") -> Column:
    """Fraction of whitespace tokens that are stopwords; blank → 0."""
    t = F.trim(F.col(text_col))
    words = F.split(F.lower(t), "[ \\t\\n\\x0B\\f\\r]+")
    n = F.size(words).cast("double")
    sw = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS))).cast("double")
    return F.when(t == "", F.lit(0.0)).otherwise(sw / n)


def quality_features(text_col: str = "text") -> dict[str, Column]:
    """Length/punct/stopword ratios (the reference has no text quality
    analog; this is the training-data-pipeline extension)."""
    t = F.col(text_col)
    n = F.length(t).cast("double")
    alpha = F.length(F.regexp_replace(t, "[^A-Za-z]", "")).cast("double")
    digits = F.length(F.regexp_replace(t, "[^0-9]", "")).cast("double")
    punct = F.length(F.regexp_replace(t, "[^.,;:!?]", "")).cast("double")
    spaces = F.length(F.regexp_replace(t, "[^ ]", "")).cast("double")
    nz = F.when(n > 0, n).otherwise(F.lit(1.0))
    return {
        "n_chars": n.cast("long"),
        "alpha_ratio": alpha / nz,
        "digit_ratio": digits / nz,
        "punct_ratio": punct / nz,
        "space_ratio": spaces / nz,
        "n_tokens": token_count(text_col),
    }


def round5_stable(c: Column) -> Column:
    """Round a NON-NEGATIVE per-row scalar to 5 dp identically on both
    engines: floor(x*1e5 + 0.5)/1e5.  Engine round() implementations
    disagree on exact decimal halves (Spark rounds the double's exact
    BigDecimal value, DuckDB multiplies then rounds), and power-of-2
    length denominators make exact halves REAL — 2 of 5000 sf0.1 docs
    hit the quality boundary.  floor of identically-computed doubles
    cannot diverge.  Per-row chains only — aggregate outputs keep
    round(), where sum-order ulp noise dominates either way."""
    return F.floor(c * F.lit(100000.0) + F.lit(0.5)) / F.lit(100000.0)


def round3_stable(c: Column) -> Column:
    """3-dp sibling of `round5_stable`, safe for SIGNED per-row scalars
    (log-ratio weights, avg log-probs): floor() rounds exact halves
    toward +inf identically on both engines, unlike engine round()
    (Spark BigDecimal HALF_UP vs DuckDB multiply-then-round, which
    already disagree on positive halves and differ again on sign
    handling).  floor of identically-computed doubles cannot diverge."""
    return F.floor(c * F.lit(1000.0) + F.lit(0.5)) / F.lit(1000.0)


def quality_score(text_col: str = "text") -> Column:
    """Composite [0,1] score: rewards alpha-heavy prose of reasonable
    length, penalizes digit/punct noise.  Formula is frozen (mirrored
    in the SQL oracle); not a learned model."""
    f = quality_features(text_col)
    length_term = F.least(f["n_chars"].cast("double") / F.lit(500.0), F.lit(1.0))
    return round5_stable(
        F.greatest(
            F.lit(0.0),
            F.least(
                F.lit(1.0),
                0.4 * f["alpha_ratio"]
                + 0.3 * length_term
                + 0.3 * (1.0 - F.least(F.lit(1.0), 4.0 * f["punct_ratio"] + 4.0 * f["digit_ratio"])),
            ),
        ),
    )


# ---------------------------------------------------------------------------
# Repetition filters (Gopher-style, Rae et al. 2021 §A1.1)
# ---------------------------------------------------------------------------
#
# Repeated n-grams are the single strongest signal of low-quality /
# machine-generated web text.  At 100 TB these MUST stay per-row: an
# explode→groupBy over the token stream is a 10^14-row shuffle, so the
# most-frequent-gram and duplicated-gram statistics are computed with
# an O(n log n) sort + O(n) run-length fold over the row's own gram
# array (F.array_sort + F.aggregate — whole-stage codegen, zero
# exchanges).  The SQL oracle mirrors the SEMANTICS (unnest + group
# by), not the implementation, which is exactly what an oracle is for.


def _word_ngrams(words: Column, n_words: Column, n: int) -> Column:
    """Array of space-joined word n-grams; empty when the doc is too
    short (guarded: Spark's sequence(1, 0) counts DOWN, not empty)."""
    grams = F.transform(
        F.sequence(F.lit(1), n_words - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(words, (i + j).cast("int")) for j in range(n)]
        ),
    )
    return F.when(n_words >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def _top_gram_chars(grams: Column) -> Column:
    """max over distinct grams of count(gram) * length(gram), via a
    run-length fold over the sorted gram array."""
    zero = F.lit(0).cast("long")
    acc0 = F.struct(
        F.lit("").alias("prev"), zero.alias("run"), zero.alias("best")
    )

    def step(acc: Column, x: Column) -> Column:
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(
            F.lit(1).cast("long")
        )
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run * F.length(x)).alias("best"),
        )

    return F.aggregate(F.array_sort(grams), acc0, step, lambda a: a["best"])


def _dup_gram_chars(grams: Column) -> Column:
    """sum over grams occurring >= 2 times of count * length — chars
    covered by any repeated gram (each occurrence counted).  Same
    sorted-run fold; completed runs flush on value change, the final
    run flushes in the finish lambda."""
    zero = F.lit(0).cast("long")
    acc0 = F.struct(
        F.lit("").alias("prev"), zero.alias("run"), zero.alias("dup")
    )

    def flush(acc: Column) -> Column:
        return acc["dup"] + F.when(
            acc["run"] >= 2, acc["run"] * F.length(acc["prev"])
        ).otherwise(F.lit(0).cast("long"))

    def step(acc: Column, x: Column) -> Column:
        same = x == acc["prev"]
        return F.struct(
            x.alias("prev"),
            F.when(same, acc["run"] + 1)
            .otherwise(F.lit(1).cast("long"))
            .alias("run"),
            F.when(same, acc["dup"]).otherwise(flush(acc)).alias("dup"),
        )

    return F.aggregate(F.array_sort(grams), acc0, step, flush)


def repetition_features(text_col: str = "text") -> dict[str, Column]:
    """Per-doc repetition fractions: duplicate-word fraction, fraction
    of characters in the most frequent word 2-gram, fraction of
    characters in repeated word 3-grams.  Denominator is the raw text
    length; all fractions are 0 for docs too short to have grams."""
    t = F.trim(F.col(text_col))
    words = F.split(t, "[ \\t\\n\\x0B\\f\\r]+")
    n = F.when(t == "", F.lit(0)).otherwise(F.size(words)).cast("long")
    chars = F.greatest(F.length(F.col(text_col)), F.lit(1)).cast("double")
    dup_word = F.when(
        n > 0, 1.0 - F.size(F.array_distinct(words)) / n.cast("double")
    ).otherwise(F.lit(0.0))
    top2 = _top_gram_chars(_word_ngrams(words, n, 2)).cast("double") / chars
    dup3 = _dup_gram_chars(_word_ngrams(words, n, 3)).cast("double") / chars
    return {
        "n_words": n,
        "dup_word_frac": dup_word,
        "top2gram_char_frac": top2,
        "dup3gram_char_frac": dup3,
    }


# ---------------------------------------------------------------------------
# PII scrubbing — redact emails / phone numbers / IPv4 literals
# ---------------------------------------------------------------------------
#
# A web-scale training corpus must strip contact PII before the mix
# stage.  Patterns are deliberately simple, anchored ones that Java
# regex (Spark) and RE2 (DuckDB oracle) match IDENTICALLY — no
# lookarounds, no backreferences — so the whole scrub is value-hash
# checkable.  Everything stays JVM-side (regexp_count/regexp_replace,
# whole-stage codegen); replacement order is email → IPv4 → phone so
# the digit-heavy phone pattern never eats a redacted token.

PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_IPV4 = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
PII_PHONE = "\\+[0-9][0-9 -]{7,}[0-9]"


def pii_counts(text_col: str = "text") -> dict[str, Column]:
    """Match counts per PII class on the RAW text (pre-scrub)."""
    t = F.col(text_col)
    return {
        "n_emails": F.regexp_count(t, F.lit(PII_EMAIL)).cast("long"),
        "n_ipv4": F.regexp_count(t, F.lit(PII_IPV4)).cast("long"),
        "n_phones": F.regexp_count(t, F.lit(PII_PHONE)).cast("long"),
    }


def pii_scrub(text_col: str = "text") -> Column:
    """Text with every PII match replaced by a typed redaction token."""
    t = F.col(text_col)
    t = F.regexp_replace(t, PII_EMAIL, "<EMAIL>")
    t = F.regexp_replace(t, PII_IPV4, "<IP>")
    t = F.regexp_replace(t, PII_PHONE, "<PHONE>")
    return t
