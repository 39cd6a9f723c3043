"""Document/text-pipeline queries over the ``documents`` table.

Exercises functions/text.py and operators/dedup.py. Oracle SQL mirrors
the exact arithmetic (length/replace/md5) so results hash-match; the
DuckDB regexp_replace calls carry the 'g' flag (DuckDB replaces only
the first match by default, Spark replaces all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import register
from ._util import t
from ..functions.text import add_lang_guess, fingerprint, norm_ws, token_count
from ..operators.dedup import (
    exact_dedup_groups,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    winnow_fingerprints,
)

# DuckDB-side expression fragments mirroring functions/text.py
_NORM = "regexp_replace(trim(text), '\\s+', ' ', 'g')"
_NTOK = (
    f"CASE WHEN {_NORM} = '' THEN 0 "
    f"ELSE length({_NORM}) - length(replace({_NORM}, ' ', '')) + 1 END"
)


@register(
    "q60_doc_token_stats",
    f"""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM({_NTOK}) AS BIGINT) AS total_tokens,
           CAST(SUM(length(text)) AS BIGINT) AS total_chars,
           CAST(MAX({_NTOK}) AS BIGINT) AS max_tokens
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
    tags=("text", "tokens"),
)
def q60_doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    toks = token_count(F.col("text"))
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(toks).cast("bigint").alias("total_tokens"),
            F.sum(F.length("text")).cast("bigint").alias("total_chars"),
            F.max(toks).cast("bigint").alias("max_tokens"),
        )
        .orderBy("source")
    )


def _sql_occ(padded: str, needle: str) -> str:
    n = needle.replace("'", "''")
    return f"CAST((length({padded}) - length(replace({padded}, '{n}', ''))) / {len(needle)} AS BIGINT)"


def _sql_lang_scores() -> dict[str, str]:
    from ..functions.text import LANG_MARKERS

    padded = f"concat(' ', lower({_NORM}), ' ')"
    return {
        lang: "(" + " + ".join(_sql_occ(padded, m) for m in markers) + ")"
        for lang, markers in LANG_MARKERS.items()
    }


_S = _sql_lang_scores()
_SQL_LANG_GUESS = f"""
    CASE WHEN ({_S['en']} + {_S['de']} + {_S['es']} + {_S['fr']}) = 0 THEN 'und'
         WHEN {_S['en']} >= {_S['de']} AND {_S['en']} >= {_S['es']} AND {_S['en']} >= {_S['fr']} THEN 'en'
         WHEN {_S['de']} >= {_S['es']} AND {_S['de']} >= {_S['fr']} THEN 'de'
         WHEN {_S['es']} >= {_S['fr']} THEN 'es'
         ELSE 'fr' END
"""


@register(
    "q61_doc_language_id",
    f"""
    SELECT {_SQL_LANG_GUESS} AS lang_guess, COUNT(*) AS n
    FROM documents
    GROUP BY lang_guess
    ORDER BY n DESC, lang_guess
    """,
    tags=("text", "langid"),
)
def q61_doc_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    guessed = add_lang_guess(
        t(spark, sf_dir, "documents").select("text"), "text"
    )
    return (
        guessed.groupBy("lang_guess")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "lang_guess")
    )


@register(
    "q62_doc_exact_dedup",
    f"""
    SELECT md5(lower({_NORM})) AS fingerprint,
           CAST(MIN(doc_id) AS BIGINT) AS keeper,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY fingerprint
    ORDER BY fingerprint
    """,
    tags=("text", "dedup-exact"),
)
def q62_doc_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup_groups(t(spark, sf_dir, "documents"), "text", "doc_id").orderBy(
        "fingerprint"
    )


@register(
    "q63_doc_top_tokens",
    f"""
    SELECT token, COUNT(*) AS n
    FROM (SELECT unnest(string_split({_NORM}, ' ')) AS token FROM documents)
    WHERE token <> ''
    GROUP BY token
    ORDER BY n DESC, token
    LIMIT 20
    """,
    tags=("text", "explode"),
)
def q63_doc_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "documents")
        .select(F.explode(F.split(norm_ws(F.col("text")), " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(20)
    )


# DuckDB word-3-gram shingles: list comprehension over split words.
_DUCK_SHINGLES = (
    "[array_to_string(words[i:i+2], ' ') for i in range(1, len(words) - 1)]"
)


@register(
    "q64_doc_ngram_jaccard",
    f"""
    WITH docs AS (
      SELECT doc_id, source, string_split({_NORM}, ' ') AS words FROM documents
    ),
    shingled AS (
      SELECT DISTINCT doc_id, source, unnest({_DUCK_SHINGLES}) AS shingle
      FROM docs WHERE len(words) >= 3
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM shingled GROUP BY doc_id),
    shared AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
      FROM shingled a JOIN shingled b
        ON a.shingle = b.shingle AND a.source = b.source AND a.doc_id < b.doc_id
      GROUP BY id_a, id_b
    )
    SELECT id_a, id_b,
           CAST(shared AS DOUBLE) / (sa.set_size + sb.set_size - shared) AS jaccard
    FROM shared
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(shared AS DOUBLE) / (sa.set_size + sb.set_size - shared) > 0.05
    ORDER BY id_a, id_b
    """,
    tags=("text", "dedup-jaccard"),
)
def q64_doc_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_jaccard_pairs(
        t(spark, sf_dir, "documents"),
        "text",
        "doc_id",
        shingle_k=3,
        threshold=0.05,
        partition_col="source",
    ).orderBy("id_a", "id_b")


# Recursive min-label propagation over the q64 pair graph. The edge CTEs
# are the q64 oracle verbatim; `reach` then propagates every label along
# edges until fixpoint (UNION-distinct terminates it), so MIN(lbl) per
# node is the least node id in its connected component — exactly what
# operators/dedup.connected_components computes iteratively on Spark.
_DUCK_CLUSTERS = f"""
    WITH RECURSIVE docs AS (
      SELECT doc_id, source, string_split({_NORM}, ' ') AS words FROM documents
    ),
    shingled AS (
      SELECT DISTINCT doc_id, source, unnest({_DUCK_SHINGLES}) AS shingle
      FROM docs WHERE len(words) >= 3
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM shingled GROUP BY doc_id),
    shared AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
      FROM shingled a JOIN shingled b
        ON a.shingle = b.shingle AND a.source = b.source AND a.doc_id < b.doc_id
      GROUP BY id_a, id_b
    ),
    pairs AS (
      SELECT id_a, id_b
      FROM shared
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE CAST(shared AS DOUBLE) / (sa.set_size + sb.set_size - shared) > 0.05
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ),
    reach(id, lbl) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id
    ),
    comp AS (SELECT id, MIN(lbl) AS component FROM reach GROUP BY id)
"""


@register(
    "r63_dedup_clusters",
    f"""
    {_DUCK_CLUSTERS}
    SELECT component, COUNT(*) AS cluster_size, CAST(SUM(id) AS BIGINT) AS id_sum
    FROM comp
    GROUP BY component
    ORDER BY component
    """,
    tags=("text", "dedup-clusters", "iterative"),
    doc=(
        "Near-duplicate clustering: the q64 Jaccard pair graph collapsed "
        "into connected components by iterative min-label propagation "
        "(operators/dedup.connected_components), reported as one row per "
        "cluster. The DuckDB oracle re-derives the same components with a "
        "recursive CTE, so the whole iterate-until-fixpoint loop is "
        "value-checked — the step that turns pair generators into actual "
        "keep/drop dedup decisions."
    ),
)
def r63_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import connected_components

    pairs = ngram_jaccard_pairs(
        t(spark, sf_dir, "documents"),
        "text",
        "doc_id",
        shingle_k=3,
        threshold=0.05,
        partition_col="source",
    )
    comps = connected_components(pairs)
    return (
        comps.groupBy("component")
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.sum("id").cast("bigint").alias("id_sum"),
        )
        .orderBy("component")
    )


# BPE-ish tokenizer classes: letter runs, digit runs, single
# non-alnum marks — the pre-merge word split a byte-pair tokenizer
# starts from. Same RE2/Java-compatible patterns on both engines
# (no lookarounds; RE2 has none).
_BPE_ALPHA, _BPE_NUM, _BPE_PUNCT = "[A-Za-z]+", "[0-9]+", r"[^A-Za-z0-9\s]"


@register(
    "q68_doc_bpe_tokens",
    f"""
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(len(regexp_extract_all(text, '{_BPE_ALPHA}'))) AS BIGINT) AS alpha_tokens,
           CAST(SUM(len(regexp_extract_all(text, '{_BPE_NUM}'))) AS BIGINT) AS num_tokens,
           CAST(SUM(len(regexp_extract_all(text, '{_BPE_PUNCT}'))) AS BIGINT) AS punct_tokens
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
    tags=("text", "tokens", "bpe"),
    doc="BPE-style pre-tokenization counts (letter/digit/punct token classes) per source.",
)
def q68_doc_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    n_tok = lambda pat: F.sum(  # noqa: E731
        F.size(F.regexp_extract_all("text", F.lit(pat), 0))
    ).cast("bigint")
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            n_tok(_BPE_ALPHA).alias("alpha_tokens"),
            n_tok(_BPE_NUM).alias("num_tokens"),
            n_tok(_BPE_PUNCT).alias("punct_tokens"),
        )
        .orderBy("source")
    )


@register(
    "q69_doc_winnow_fingerprint",
    f"""
    WITH g AS (
      SELECT doc_id, {_NORM} AS txt FROM documents WHERE length({_NORM}) >= 11
    ),
    grams AS (
      SELECT doc_id, length(txt) - 7 AS g, txt,
             unnest(generate_series(1, length(txt) - 7)) AS i
      FROM g
    ),
    hashed AS (
      SELECT doc_id, g, i,
             substring(md5(substring(txt, CAST(i AS INT), 8)), 1, 16) AS h
      FROM grams
    ),
    winnowed AS (
      SELECT doc_id, i, g,
             MIN(h) OVER (PARTITION BY doc_id ORDER BY i
                          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
      FROM hashed
    )
    SELECT doc_id, CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_fps, MIN(fp) AS min_fp
    FROM winnowed WHERE i <= g - 3
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    tags=("text", "fingerprint", "rolling-hash"),
    doc=(
        "Winnowing rolling-hash fingerprints (k=8 char grams, window "
        "w=4) summarized per document; operators/dedup.py "
        "winnow_fingerprints is the fingerprint-set operator."
    ),
)
def q69_doc_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    fps = winnow_fingerprints(t(spark, sf_dir, "documents"), "text", "doc_id", k=8, w=4)
    return (
        fps.groupBy(F.col("doc").alias("doc_id"))
        .agg(
            F.countDistinct("fp").cast("bigint").alias("n_fps"),
            F.min("fp").alias("min_fp"),
        )
        .orderBy("doc_id")
    )


# DuckDB MinHash mirror: min(md5(shingle || '#seed')) per seed; docs
# collide when any of the 4 single-hash bands matches.
def _duck_minhash(seed: int) -> str:
    return f"MIN(md5(shingle || '#{seed}'))"


@register(
    "q65_doc_minhash_lsh",
    f"""
    WITH docs AS (
      SELECT doc_id, string_split({_NORM}, ' ') AS words FROM documents
    ),
    shingled AS (
      SELECT DISTINCT doc_id, unnest({_DUCK_SHINGLES}) AS shingle
      FROM docs WHERE len(words) >= 3
    ),
    sigs AS (
      SELECT doc_id,
             {', '.join(f'{_duck_minhash(i)} AS h{i}' for i in range(4))}
      FROM shingled GROUP BY doc_id
    ),
    bands AS (
      {' UNION ALL '.join(f"SELECT doc_id, '{i}|' || h{i} AS band_key FROM sigs" for i in range(4))}
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.doc_id < b.doc_id
    GROUP BY id_a, id_b
    ORDER BY id_a, id_b
    """,
    tags=("text", "dedup-minhash"),
    doc=(
        "MinHash LSH with 4 seeds, band size 1 (engine-portable md5 "
        "string-min hashes — see operators/dedup.py docstring)."
    ),
)
def q65_doc_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_lsh_pairs(
        t(spark, sf_dir, "documents"),
        "text",
        "doc_id",
        seeds=4,
        band_size=1,
        shingle_k=3,
    ).orderBy("id_a", "id_b")


@register(
    "q79_token_type_ratio",
    f"""
    WITH toks AS (
      SELECT lang, unnest(string_split(lower({_NORM}), ' ')) AS tok
      FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_tokens,
           COUNT(DISTINCT tok) AS n_types,
           CAST(COUNT(DISTINCT tok) AS DOUBLE) / COUNT(*) AS ttr
    FROM toks
    WHERE tok <> ''
    GROUP BY lang
    ORDER BY lang
    """,
    tags=("text", "explode", "vocabulary"),
    doc=(
        "Vocabulary statistics per language: token count, distinct types, "
        "type-token ratio. Explode -> groupBy stays fully relational "
        "(codegen'd split + generator, partial counts map-side); the "
        "distinct-count shuffle is keyed on (lang, tok) so it spreads "
        "over the cluster instead of hot-spotting per language."
    ),
)
def q79_token_type_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = (
        t(spark, sf_dir, "documents")
        .select(
            "lang",
            F.explode(F.split(F.lower(norm_ws(F.col("text"))), " ")).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )
    return (
        toks.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.countDistinct("tok").alias("n_types"),
            (F.countDistinct("tok").cast("double") / F.count(F.lit(1))).alias("ttr"),
        )
        .orderBy("lang")
    )
