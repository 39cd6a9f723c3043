"""Text-analysis primitives for large-scale document pipelines.

All functions return Spark Columns built purely from JVM built-ins
(whole-stage-codegen friendly — no Python UDFs), so they run at full
scan speed over a 100 TB documents table. Each has a documented
DuckDB-SQL equivalent (used by the oracle queries) — the pair is kept
deterministic cross-engine by sticking to length/replace/md5
arithmetic and integer-exact math.

Reference: the reference engine has no text functions at all
(SURVEY.md §2.3); these are part of the pipeline-operator extension
surface (BASELINE.json north star).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Stopword markers per language for the n-gram language heuristic.
# Spaces on both sides so they only match whole words mid-text.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": (" the ", " and ", " of "),
    "de": (" der ", " und ", " die "),
    "es": (" el ", " la ", " los "),
    "fr": (" le ", " et ", " les "),
}


def norm_ws(col: Column) -> Column:
    """Whitespace-normalized text: trim + collapse runs to single spaces.

    DuckDB equivalent: ``regexp_replace(trim(text), '\\s+', ' ', 'g')``
    (note DuckDB needs the 'g' flag; Spark replaces all matches by default).
    """
    return F.regexp_replace(F.trim(col), r"\s+", " ")


def token_count(col: Column) -> Column:
    """Whitespace token count as BIGINT, 0 for empty/blank text.

    Computed via length arithmetic (count of separators + 1) rather than
    ``split`` so the same formula is expressible in any SQL dialect.
    """
    n = norm_ws(col)
    return (
        F.when(n == "", F.lit(0))
        .otherwise(F.length(n) - F.length(F.replace(n, F.lit(" "), F.lit(""))) + 1)
        .cast("bigint")
    )


def occurrences(col: Column, needle: str) -> Column:
    """Non-overlapping occurrence count of ``needle`` as BIGINT."""
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit("")))) / len(needle)
    ).cast("bigint")


def char_ratio(col: Column, char_class: str) -> Column:
    """Fraction of characters matching a regex class, 0.0 for empty text."""
    total = F.length(col)
    matched = total - F.length(F.regexp_replace(col, char_class, ""))
    return F.when(total == 0, F.lit(0.0)).otherwise(matched.cast("double") / total.cast("double"))


def quality_score(col: Column) -> Column:
    """Heuristic document quality in [0, 1]: length, word shape, stopwords.

    A cheap C4-style filter: favors documents with a reasonable token
    count, moderate mean word length, and at least some English
    stopword mass. Deterministic double arithmetic.
    """
    n = norm_ws(col)
    toks = token_count(col)
    mean_word = F.when(toks == 0, F.lit(0.0)).otherwise(
        F.length(F.replace(n, F.lit(" "), F.lit(""))).cast("double") / toks.cast("double")
    )
    # case-insensitive like gopher_rules/lang_scores in this module: an
    # all-caps English document must not lose the full stopword weight
    stop_hits = sum(
        (
            occurrences(F.concat(F.lit(" "), F.lower(n), F.lit(" ")), m)
            for m in LANG_MARKERS["en"]
        ),
        F.lit(0),
    )
    len_score = F.least(toks.cast("double") / 50.0, F.lit(1.0))
    word_score = F.when((mean_word >= 3.0) & (mean_word <= 10.0), 1.0).otherwise(0.5)
    stop_score = F.least(stop_hits.cast("double") / 3.0, F.lit(1.0))
    return (0.4 * len_score + 0.3 * word_score + 0.3 * stop_score).alias("quality")


def gopher_rules(
    col: Column,
    min_words: int = 30,
    max_words: int = 100_000,
    min_mean_word: float = 3.0,
    max_mean_word: float = 10.0,
    min_stop_hits: int = 2,
    max_symbol_ratio: float = 0.1,
) -> dict[str, Column]:
    """Gopher-style document quality rules as named boolean Columns.

    The classic rule family from the Gopher/MassiveText filtering
    recipe: word-count bounds, mean-word-length bounds, minimum English
    stopword evidence, and a symbol-to-character ratio cap. Returned as
    a dict of independent flags (wc_ok / mwl_ok / stop_ok / sym_ok) so
    pipelines can report per-rule rejection rates, not just a verdict —
    all pure length/replace arithmetic, exactly mirrorable in any SQL
    dialect.
    """
    n = F.lower(norm_ws(col))
    toks = token_count(col)
    chars = F.length(F.replace(n, F.lit(" "), F.lit("")))
    mean_word = F.when(toks == 0, F.lit(0.0)).otherwise(
        chars.cast("double") / toks.cast("double")
    )
    stop_hits = sum(
        (occurrences(F.concat(F.lit(" "), n, F.lit(" ")), m) for m in LANG_MARKERS["en"]),
        F.lit(0),
    )
    sym_ratio = char_ratio(n, "[^a-z0-9 ]")
    return {
        "wc_ok": (toks >= min_words) & (toks <= max_words),
        "mwl_ok": (mean_word >= min_mean_word) & (mean_word <= max_mean_word),
        "stop_ok": stop_hits >= min_stop_hits,
        "sym_ok": sym_ratio <= max_symbol_ratio,
    }


def lang_scores(col: Column) -> dict[str, Column]:
    """Per-language stopword-hit counts over whitespace-normalized text."""
    padded = F.concat(F.lit(" "), F.lower(norm_ws(col)), F.lit(" "))
    return {
        lang: sum((occurrences(padded, m) for m in markers), F.lit(0)).cast("bigint")
        for lang, markers in LANG_MARKERS.items()
    }


def lang_guess(col: Column) -> Column:
    """n-gram-heuristic language ID over en/de/es/fr ('und' if no signal).

    Ties break in the fixed order en > de > es > fr — the oracle SQL
    must use the same CASE chain.
    """
    s = lang_scores(col)
    return (
        F.when((s["en"] + s["de"] + s["es"] + s["fr"]) == 0, "und")
        .when((s["en"] >= s["de"]) & (s["en"] >= s["es"]) & (s["en"] >= s["fr"]), "en")
        .when((s["de"] >= s["es"]) & (s["de"] >= s["fr"]), "de")
        .when(s["es"] >= s["fr"], "es")
        .otherwise("fr")
    )


def add_lang_guess(df, text_col: str, out: str = "lang_guess"):
    """Attach a ``lang_guess`` column via staged projections.

    Same semantics as :func:`lang_guess`, but the padded text and the
    four per-language scores are materialized as named columns in
    intermediate selects. Catalyst's CollapseProject keeps a projection
    boundary when a non-trivial expression is referenced more than once
    downstream, so the normalize/lower/pad work is planned once instead
    of being re-expanded ~70x inside one giant CASE tree — an order of
    magnitude less analysis/codegen work for identical results.
    """
    from pyspark.sql import functions as F  # local alias for clarity

    keep = [c for c in df.columns]
    padded = F.concat(F.lit(" "), F.lower(norm_ws(F.col(text_col))), F.lit(" "))
    staged = df.select(*keep, padded.alias("__pad"))
    scored = staged.select(
        *keep,
        *[
            sum((occurrences(F.col("__pad"), m) for m in markers), F.lit(0))
            .cast("bigint")
            .alias(f"__s_{lang}")
            for lang, markers in LANG_MARKERS.items()
        ],
    )
    s = {lang: F.col(f"__s_{lang}") for lang in LANG_MARKERS}
    guess = (
        F.when((s["en"] + s["de"] + s["es"] + s["fr"]) == 0, "und")
        .when((s["en"] >= s["de"]) & (s["en"] >= s["es"]) & (s["en"] >= s["fr"]), "en")
        .when((s["de"] >= s["es"]) & (s["de"] >= s["fr"]), "de")
        .when(s["es"] >= s["fr"], "es")
        .otherwise("fr")
    )
    return scored.select(*keep, guess.alias(out))


def fingerprint(col: Column) -> Column:
    """Canonical document fingerprint: md5 of lowercased normalized text.

    md5 output is identical across engines, making this the exact-dedup
    key of choice for cross-system pipelines.
    """
    return F.md5(F.lower(norm_ws(col)))


def word_shingles(col: Column, k: int = 3) -> Column:
    """Array of k-word shingles (n-grams of words) from the text.

    Built with split + transform over index sequences — stays inside
    codegen, no UDF. Returns an empty array when there are fewer than
    ``k`` words.
    """
    words = F.split(norm_ws(col), " ")
    n = F.size(words)
    idx = F.sequence(F.lit(1), F.greatest(n - k + 1, F.lit(0)))
    return F.when(n < k, F.array().cast("array<string>")).otherwise(
        F.transform(idx, lambda i: F.array_join(F.slice(words, i, k), " "))
    )


# PII patterns kept to syntax RE2 (DuckDB) and java.util.regex both
# implement identically: char classes, bounded repeats, \b — no
# lookarounds (RE2 has none).
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "phone": (r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b", "<PHONE>"),
    "ssn": (r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
}


def redact_pii(col: Column, kinds: tuple[str, ...] = ("email", "phone", "ssn")) -> Column:
    """Replace each PII pattern with its placeholder token.

    Order matters (phone before ssn would mis-tag 3-2-4 digit groups if
    the patterns overlapped; these don't, but the chain is applied in
    ``kinds`` order deterministically). Pure regexp_replace chain —
    codegen'd, scan-speed. DuckDB equivalent: the same patterns with
    the 'g' flag.
    """
    out = col
    for kind in kinds:
        pat, repl = PII_PATTERNS[kind]
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_count(col: Column, kind: str) -> Column:
    """Occurrence count of one PII pattern as BIGINT.

    DuckDB equivalent: ``len(regexp_extract_all(col, pattern))``.
    """
    return F.regexp_count(col, F.lit(PII_PATTERNS[kind][0])).cast("bigint")
