"""Distribution statistics, drift detection and graph-structure queries.

The statistical layer a data-curation pipeline runs *between* ingestion
and training: distribution-drift monitors (PSI), nonparametric
two-sample tests (Kolmogorov-Smirnov, Mann-Whitney), fraud/quality
audits (Benford), load analytics (sweep-line peak concurrency), growth
accounting (cumulative distinct users), corpus statistics (ARI
readability, Zipf exponent) and k-core graph peeling.

None of these exist in the reference (its surface stops at basic
aggregates — SURVEY.md §2.5); they are pure extensions in the same
oracle-checked contract as the rest of the inventory.

Cross-engine determinism strategy (see queries/__init__.py): every
aggregate accumulates integers (counts, micros, or round(x*1e9)
fixed-point) so sums are order-independent, then the final statistic is
one identically-spelled IEEE-double expression on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from . import register
from ._util import copurchase_edges, t
from ..functions.stats import (
    exp9,
    hash_cohort,
    iln6,
    midrank_twice,
    moments_xy,
    ols_slope,
    pearson_r,
    positional_median,
    ses_terms,
    with_cum_before,
)
from ..functions.text import norm_ws, token_count

# DuckDB fragments mirroring functions/text.py (same as queries/text.py)
_NORM = "regexp_replace(trim(text), '\\s+', ' ', 'g')"
_NTOK = (
    f"CASE WHEN {_NORM} = '' THEN 0 "
    f"ELSE length({_NORM}) - length(replace({_NORM}, ' ', '')) + 1 END"
)


@register(
    "s69_psi_value_drift",
    """
    WITH ref AS (
      SELECT value FROM events WHERE ts < TIMESTAMP '2024-01-16'
    ),
    cur AS (
      SELECT value FROM events WHERE ts >= TIMESTAMP '2024-01-16'
    ),
    edges AS (
      SELECT MIN(value) AS lo, (MAX(value) - MIN(value)) / 10.0 AS width
      FROM ref
    ),
    binned_ref AS (
      SELECT LEAST(9, GREATEST(0,
               CAST(floor((value - lo) / width) AS INT))) AS bin,
             COUNT(*) AS c_ref
      FROM ref CROSS JOIN edges GROUP BY 1
    ),
    binned_cur AS (
      SELECT LEAST(9, GREATEST(0,
               CAST(floor((value - lo) / width) AS INT))) AS bin,
             COUNT(*) AS c_cur
      FROM cur CROSS JOIN edges GROUP BY 1
    ),
    bins AS (SELECT UNNEST(range(10)) AS bin),
    joined AS (
      SELECT CAST(b.bin AS INT) AS bin,
             CAST(COALESCE(r.c_ref, 0) AS BIGINT) AS c_ref,
             CAST(COALESCE(c.c_cur, 0) AS BIGINT) AS c_cur,
             CAST(SUM(COALESCE(r.c_ref, 0)) OVER () AS BIGINT) AS n_ref,
             CAST(SUM(COALESCE(c.c_cur, 0)) OVER () AS BIGINT) AS n_cur
      FROM bins b
      LEFT JOIN binned_ref r ON r.bin = b.bin
      LEFT JOIN binned_cur c ON c.bin = b.bin
    ),
    terms AS (
      SELECT bin, c_ref, c_cur,
             (CAST(c_cur AS DOUBLE) + 0.5) / (CAST(n_cur AS DOUBLE) + 5.0)
               AS p_cur,
             (CAST(c_ref AS DOUBLE) + 0.5) / (CAST(n_ref AS DOUBLE) + 5.0)
               AS p_ref
      FROM joined
    )
    SELECT bin, c_ref, c_cur, psi_term,
           CAST(SUM(CAST(round(psi_term * 1e12) AS BIGINT)) OVER ()
                AS DOUBLE) / 1e12 AS psi_total
    FROM (
      SELECT bin, c_ref, c_cur,
             round((p_cur - p_ref) * ln(p_cur / p_ref), 12) AS psi_term
      FROM terms
    )
    ORDER BY bin
    """,
    tags=("stats", "drift", "psi"),
    doc=(
        "Population Stability Index between the first and second half of "
        "the event window — the standard production monitor for feature/"
        "score drift. Bin edges are 10 equal-width bins over the "
        "REFERENCE period's [min, max] (exact doubles, identical on both "
        "engines), counts are one grouped aggregate per period, and the "
        "Laplace-smoothed (+0.5) PSI terms evaluate in identically-"
        "spelled doubles. Scale shape: two map-side-combinable "
        "aggregations over the fact table plus a broadcast of the "
        "2-scalar edge row; the total PSI is re-accumulated from "
        "round(term*1e12) integers so the 10-term sum is order-"
        "independent. At 100 TB this is two scans, no wide shuffle."
    ),
)
def s69_psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    split = F.lit("2024-01-16").cast("timestamp")
    ref = ev.filter(F.col("ts") < split).select("value")
    cur = ev.filter(F.col("ts") >= split).select("value")
    edges = ref.agg(
        F.min("value").alias("lo"),
        ((F.max("value") - F.min("value")) / 10.0).alias("width"),
    )

    def binned(df: DataFrame, cname: str) -> DataFrame:
        return (
            df.crossJoin(F.broadcast(edges))
            .select(
                F.least(
                    F.lit(9),
                    F.greatest(
                        F.lit(0),
                        F.floor((F.col("value") - F.col("lo")) / F.col("width"))
                        .cast("int"),
                    ),
                ).alias("bin")
            )
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias(cname))
        )

    bins = spark.range(10).select(F.col("id").cast("int").alias("bin"))
    joined = (
        bins.join(F.broadcast(binned(ref, "c_ref")), "bin", "left")
        .join(F.broadcast(binned(cur, "c_cur")), "bin", "left")
        .select(
            "bin",
            F.coalesce("c_ref", F.lit(0)).cast("bigint").alias("c_ref"),
            F.coalesce("c_cur", F.lit(0)).cast("bigint").alias("c_cur"),
        )
        .withColumn("n_ref", F.sum("c_ref").over(W.partitionBy()).cast("bigint"))
        .withColumn("n_cur", F.sum("c_cur").over(W.partitionBy()).cast("bigint"))
    )
    p_cur = (F.col("c_cur").cast("double") + 0.5) / (
        F.col("n_cur").cast("double") + 5.0
    )
    p_ref = (F.col("c_ref").cast("double") + 0.5) / (
        F.col("n_ref").cast("double") + 5.0
    )
    # ln here takes a NON-integer argument, so the two engines' libm may
    # disagree by 1 ulp (observed at sf0.1); round(x, 12) restores the
    # suite's portable-low-bits contract (README determinism rules) —
    # both terms are non-negative, so HALF_UP == away-from-zero.
    term = F.round((p_cur - p_ref) * F.log(p_cur / p_ref), 12)
    return (
        joined.select("bin", "c_ref", "c_cur", term.alias("psi_term"))
        .withColumn(
            "psi_total",
            F.sum(F.round(F.col("psi_term") * 1e12).cast("bigint"))
            .over(W.partitionBy())
            .cast("double")
            / 1e12,
        )
        .orderBy("bin")
    )


@register(
    "s70_ks_two_sample",
    """
    WITH per_v AS (
      SELECT value,
             COUNT(*) FILTER (WHERE event_type = 'view') AS c1,
             COUNT(*) FILTER (WHERE event_type = 'purchase') AS c2
      FROM events
      WHERE event_type IN ('view', 'purchase')
      GROUP BY value
    ),
    cum AS (
      SELECT SUM(c1) OVER (ORDER BY value
                           ROWS UNBOUNDED PRECEDING) AS cum1,
             SUM(c2) OVER (ORDER BY value
                           ROWS UNBOUNDED PRECEDING) AS cum2,
             SUM(c1) OVER () AS n1,
             SUM(c2) OVER () AS n2
      FROM per_v
    )
    SELECT CAST(MAX(n1) AS BIGINT) AS n1,
           CAST(MAX(n2) AS BIGINT) AS n2,
           MAX(abs(CAST(cum1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                   - CAST(cum2 AS DOUBLE) / CAST(n2 AS DOUBLE))) AS ks_d
    FROM cum
    """,
    tags=("stats", "hypothesis-test", "ks"),
    doc=(
        "Two-sample Kolmogorov-Smirnov statistic between the 'view' and "
        "'purchase' value distributions: D = max |ECDF1 - ECDF2|, "
        "evaluated only at distinct observed values (where the ECDF "
        "difference can change). Scale shape: the fact table collapses "
        "to per-distinct-value integer counts first (bounded by value "
        "cardinality, not row count); the single-ordered cumulative "
        "window runs over that collapsed set. All accumulation is "
        "integer; the final division/abs/max is order-independent."
    ),
)
def s70_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    per_v = ev.groupBy("value").agg(
        F.count(F.when(F.col("event_type") == "view", 1)).alias("c1"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("c2"),
    )
    wo = W.orderBy("value").rowsBetween(W.unboundedPreceding, W.currentRow)
    wall = W.partitionBy()
    cum = per_v.select(
        F.sum("c1").over(wo).alias("cum1"),
        F.sum("c2").over(wo).alias("cum2"),
        F.sum("c1").over(wall).alias("n1"),
        F.sum("c2").over(wall).alias("n2"),
    )
    return cum.agg(
        F.max("n1").cast("bigint").alias("n1"),
        F.max("n2").cast("bigint").alias("n2"),
        F.max(
            F.abs(
                F.col("cum1").cast("double") / F.col("n1").cast("double")
                - F.col("cum2").cast("double") / F.col("n2").cast("double")
            )
        ).alias("ks_d"),
    )


@register(
    "s71_mann_whitney_u",
    """
    WITH per_v AS (
      SELECT value,
             COUNT(*) FILTER (WHERE event_type = 'view') AS c1,
             COUNT(*) FILTER (WHERE event_type = 'purchase') AS c2
      FROM events
      WHERE event_type IN ('view', 'purchase')
      GROUP BY value
    ),
    ranked AS (
      SELECT c1, c2,
             SUM(c1 + c2) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING)
               - (c1 + c2) AS cum_before
      FROM per_v
    ),
    moments AS (
      -- 2*avg_rank = 2*cum_before + (c1 + c2 + 1); all-integer sums
      SELECT SUM(c1) AS n1, SUM(c2) AS n2,
             SUM(c1 * (2 * cum_before + c1 + c2 + 1)) AS r1_twice
      FROM ranked
    )
    SELECT CAST(n1 AS BIGINT) AS n1,
           CAST(n2 AS BIGINT) AS n2,
           CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
             + CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1.0) / 2.0
             - CAST(r1_twice AS DOUBLE) / 2.0 AS u1,
           (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
             + CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1.0) / 2.0
             - CAST(r1_twice AS DOUBLE) / 2.0
             - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0)
           / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                  * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) + 1.0) / 12.0)
             AS z_score
    FROM moments
    """,
    tags=("stats", "hypothesis-test", "rank"),
    doc=(
        "Mann-Whitney U (rank-sum) test between 'view' and 'purchase' "
        "values, with exact average-rank tie handling: per distinct "
        "value, 2*avg_rank = 2*cum_before + (c1+c2+1) — an INTEGER — so "
        "the rank-sum R1 accumulates as SUM(c1 * that) in exact integer "
        "arithmetic, order-independent at any cluster size. The normal "
        "z approximation (no tie-variance correction; documented) is "
        "one identically-spelled double expression. Same collapsed "
        "per-distinct-value scale shape as the KS test."
    ),
)
def s71_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    per_v = ev.groupBy("value").agg(
        F.count(F.when(F.col("event_type") == "view", 1)).alias("c1"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("c2"),
    )
    both = F.col("c1") + F.col("c2")
    ranked = with_cum_before(per_v, "value", both)
    m = ranked.agg(
        F.sum("c1").alias("n1"),
        F.sum("c2").alias("n2"),
        F.sum(midrank_twice(F.col("c1"), both)).alias("r1_twice"),
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    u1 = n1d * n2d + n1d * (n1d + 1.0) / 2.0 - F.col("r1_twice").cast("double") / 2.0
    z = (u1 - n1d * n2d / 2.0) / F.sqrt(n1d * n2d * (n1d + n2d + 1.0) / 12.0)
    return m.select(
        F.col("n1").cast("bigint").alias("n1"),
        F.col("n2").cast("bigint").alias("n2"),
        u1.alias("u1"),
        z.alias("z_score"),
    )


@register(
    "s72_benford_first_digit",
    """
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                              AS VARCHAR), 1, 1) AS INT) AS digit
      FROM orders
    ),
    counts AS (
      SELECT digit, COUNT(*) AS n,
             CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS n_total
      FROM digits GROUP BY digit
    )
    SELECT digit, CAST(n AS BIGINT) AS n,
           CAST(n AS DOUBLE) / CAST(n_total AS DOUBLE) AS p_observed,
           ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0) AS p_benford,
           (CAST(n AS DOUBLE)
            - CAST(n_total AS DOUBLE)
              * (ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0)))
           * (CAST(n AS DOUBLE)
              - CAST(n_total AS DOUBLE)
                * (ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0)))
           / (CAST(n_total AS DOUBLE)
              * (ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0)))
             AS chi2_term
    FROM counts
    ORDER BY digit
    """,
    tags=("stats", "data-quality", "benford"),
    doc=(
        "Benford's-law first-significant-digit audit of order totals — "
        "the classic anomaly/fraud screen for monetary columns. The "
        "first digit is extracted via exact integer arithmetic "
        "(round(price*100) -> BIGINT -> first character), deliberately "
        "avoiding floor(log10(x)): Java's and C's log10 are each "
        "allowed 1-ulp error, so a boundary value like 1000.00 could "
        "bucket differently across engines. One grouped count (9 "
        "groups), map-side combinable; chi-square terms against "
        "ln(1+1/d)/ln(10) evaluate in identically-spelled doubles."
    ),
)
def s72_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    digit = (
        F.substring(
            F.round(F.col("o_totalprice") * 100).cast("bigint").cast("string"), 1, 1
        )
    ).cast("int")
    counts = (
        t(spark, sf_dir, "orders")
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("n_total", F.sum("n").over(W.partitionBy()).cast("bigint"))
    )
    nd = F.col("n").cast("double")
    ntd = F.col("n_total").cast("double")
    p_b = F.log(1.0 + 1.0 / F.col("digit").cast("double")) / F.log(F.lit(10.0))
    exp_n = ntd * p_b
    return counts.select(
        "digit",
        F.col("n").cast("bigint").alias("n"),
        (nd / ntd).alias("p_observed"),
        p_b.alias("p_benford"),
        ((nd - exp_n) * (nd - exp_n) / exp_n).alias("chi2_term"),
    ).orderBy("digit")


@register(
    "s73_peak_concurrency",
    """
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
                  OR LAG(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT user_id, session_seq,
             MIN(epoch_us(ts)) AS start_us, MAX(epoch_us(ts)) AS end_us
      FROM (
        SELECT user_id, ts,
               SUM(new_session) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM flagged
      )
      GROUP BY user_id, session_seq
    ),
    points AS (
      SELECT start_us AS t, 1 AS d FROM sessions
      UNION ALL
      SELECT end_us AS t, -1 AS d FROM sessions
    ),
    swept AS (
      SELECT date_trunc('day', make_timestamp(t)) AS day,
             SUM(d) OVER (ORDER BY t, d ROWS UNBOUNDED PRECEDING) AS conc
      FROM points
    )
    SELECT day, CAST(MAX(conc) AS BIGINT) AS peak_concurrent_sessions
    FROM swept
    GROUP BY day
    ORDER BY day
    """,
    tags=("events", "interval", "sweep-line"),
    doc=(
        "Peak concurrent sessions per day via the sweep-line algorithm: "
        "sessions (30-min-gap sessionization, shared with q51) emit "
        "(start,+1)/(end,-1) deltas; one running integer sum over "
        "(t, d) order gives instantaneous concurrency; a session ending "
        "exactly when another starts does not overlap (the -1 sorts "
        "first). This is THE scalable alternative to an interval self-"
        "join (quadratic in overlap degree): 2 rows per session, one "
        "ordered window. Tie blocks carry equal deltas, so the partial-"
        "sum multiset — hence the per-day MAX — is order-independent. "
        "All integer micros arithmetic."
    ),
)
def s73_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    wuser = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(wuser))
    flagged = ev.select(
        "user_id",
        "ts",
        F.when(gap_us.isNull() | (gap_us > 1_800_000_000), 1)
        .otherwise(0)
        .alias("new_session"),
        "event_id",
    ).withColumn(
        "session_seq",
        F.sum("new_session").over(
            wuser.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    sessions = flagged.groupBy("user_id", "session_seq").agg(
        F.min(F.unix_micros("ts")).alias("start_us"),
        F.max(F.unix_micros("ts")).alias("end_us"),
    )
    points = sessions.select(
        F.col("start_us").alias("t"), F.lit(1).alias("d")
    ).unionAll(sessions.select(F.col("end_us").alias("t"), F.lit(-1).alias("d")))
    swept = points.select(
        F.date_trunc("day", F.timestamp_micros(F.col("t"))).alias("day"),
        F.sum("d")
        .over(W.orderBy("t", "d").rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("conc"),
    )
    return (
        swept.groupBy("day")
        .agg(F.max("conc").cast("bigint").alias("peak_concurrent_sessions"))
        .orderBy("day")
    )


@register(
    "s74_cumulative_distinct_users",
    """
    WITH first_seen AS (
      SELECT user_id, MIN(date_trunc('day', ts)) AS day
      FROM events GROUP BY user_id
    )
    SELECT day,
           COUNT(*) AS new_users,
           CAST(SUM(COUNT(*)) OVER (ORDER BY day
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS cum_users
    FROM first_seen
    GROUP BY day
    ORDER BY day
    """,
    tags=("events", "growth", "window"),
    doc=(
        "Cumulative distinct users per day — the growth-accounting "
        "curve. Spark's window frames cannot express COUNT(DISTINCT) "
        "over a running frame; the scalable re-expression is first-"
        "touch attribution: collapse each user to their MIN(date) (one "
        "map-side-combinable aggregate on user_id), then a running sum "
        "over ~30 day rows. At 100 TB the only shuffle is the user_id "
        "aggregation; the window runs on the day-level rollup. Distinct-"
        "over-frame via first-touch is exact, unlike sketch approaches."
    ),
)
def s74_cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    first_seen = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.min(F.date_trunc("day", F.col("ts"))).alias("day"))
    )
    return (
        first_seen.groupBy("day")
        .agg(F.count(F.lit(1)).alias("new_users"))
        .withColumn(
            "cum_users",
            F.sum("new_users")
            .over(W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow))
            .cast("bigint"),
        )
        .orderBy("day")
    )


@register(
    "s75_readability_ari",
    f"""
    WITH per_doc AS (
      SELECT source,
             length(replace({_NORM}, ' ', '')) AS chars_ns,
             {_NTOK} AS words,
             GREATEST(1,
               length(regexp_replace({_NORM}, '[.!?]+', '.', 'g'))
               - length(replace(regexp_replace({_NORM}, '[.!?]+', '.', 'g'),
                                '.', ''))) AS sentences
      FROM documents
    ),
    scored AS (
      SELECT source, chars_ns, words, sentences,
             4.71 * (CAST(chars_ns AS DOUBLE) / CAST(words AS DOUBLE))
             + 0.5 * (CAST(words AS DOUBLE) / CAST(sentences AS DOUBLE))
             - 21.43 AS ari
      FROM per_doc WHERE words > 0
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CAST(chars_ns AS DECIMAL(38,0))) AS DOUBLE)
             / CAST(SUM(CAST(words AS DECIMAL(38,0))) AS DOUBLE)
             AS chars_per_word,
           CAST(SUM(CAST(words AS DECIMAL(38,0))) AS DOUBLE)
             / CAST(SUM(CAST(sentences AS DECIMAL(38,0))) AS DOUBLE)
             AS words_per_sentence,
           CAST(SUM(CAST(round(ari * 1e9) AS BIGINT)) AS DOUBLE)
             / COUNT(*) / 1e9 AS avg_ari
    FROM scored
    GROUP BY source
    ORDER BY source
    """,
    tags=("text", "quality", "readability"),
    doc=(
        "Automated Readability Index per source — a standard pretraining "
        "quality-scoring feature (complements the Gopher rules in r60). "
        "Syllable-free by design: ARI needs only chars/word and words/"
        "sentence, both computable with length arithmetic that is "
        "expressible identically in any dialect (sentence runs [.!?]+ "
        "collapsed to one '.', counted by length difference — no "
        "regex-split, whose trailing-empty semantics differ between "
        "engines). Per-doc ARI doubles are re-accumulated as "
        "round(x*1e9) integers so the per-source mean is order-"
        "independent. One narrow projection + one grouped aggregate."
    ),
)
def s75_readability_ari(spark: SparkSession, sf_dir: str) -> DataFrame:
    norm = norm_ws(F.col("text"))
    collapsed = F.regexp_replace(norm, r"[.!?]+", ".")
    per_doc = t(spark, sf_dir, "documents").select(
        "source",
        F.length(F.replace(norm, F.lit(" "), F.lit(""))).alias("chars_ns"),
        token_count(F.col("text")).alias("words"),
        F.greatest(
            F.lit(1),
            F.length(collapsed)
            - F.length(F.replace(collapsed, F.lit("."), F.lit(""))),
        ).alias("sentences"),
    )
    ari = (
        4.71 * (F.col("chars_ns").cast("double") / F.col("words").cast("double"))
        + 0.5 * (F.col("words").cast("double") / F.col("sentences").cast("double"))
        - 21.43
    )
    scored = per_doc.filter(F.col("words") > 0).withColumn("ari", ari)
    dec = "decimal(38,0)"
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (
                F.sum(F.col("chars_ns").cast(dec)).cast("double")
                / F.sum(F.col("words").cast(dec)).cast("double")
            ).alias("chars_per_word"),
            (
                F.sum(F.col("words").cast(dec)).cast("double")
                / F.sum(F.col("sentences").cast(dec)).cast("double")
            ).alias("words_per_sentence"),
            (
                F.sum(F.round(F.col("ari") * 1e9).cast("bigint")).cast("double")
                / F.count(F.lit(1))
                / 1e9
            ).alias("avg_ari"),
        )
        .orderBy("source")
    )


@register(
    "s76_zipf_exponent",
    f"""
    WITH tokens AS (
      SELECT unnest(string_split(lower({_NORM}), ' ')) AS tok FROM documents
    ),
    freq AS (
      SELECT tok, COUNT(*) AS n FROM tokens WHERE tok <> '' GROUP BY tok
    ),
    ranked AS (
      SELECT ROW_NUMBER() OVER (ORDER BY n DESC, tok) AS r, n
      FROM freq
      QUALIFY r <= 200
    ),
    ints AS (
      -- 1e6 fixed-point: |x| < 2.4e7, so x*y < 6e14 stays inside BIGINT
      SELECT CAST(round(ln(CAST(r AS DOUBLE)) * 1e6) AS BIGINT) AS x,
             CAST(round(ln(CAST(n AS DOUBLE)) * 1e6) AS BIGINT) AS y
      FROM ranked
    ),
    m AS (
      SELECT COUNT(*) AS k,
             SUM(CAST(x AS DECIMAL(38,0))) AS sx,
             SUM(CAST(y AS DECIMAL(38,0))) AS sy,
             SUM(CAST(x * y AS DECIMAL(38,0))) AS sxy,
             SUM(CAST(x * x AS DECIMAL(38,0))) AS sxx
      FROM ints
    )
    SELECT CAST(k AS BIGINT) AS n_ranks,
           (CAST(k AS DOUBLE) * (CAST(sxy AS DOUBLE) / 1e12)
             - (CAST(sx AS DOUBLE) / 1e6) * (CAST(sy AS DOUBLE) / 1e6))
           / (CAST(k AS DOUBLE) * (CAST(sxx AS DOUBLE) / 1e12)
             - (CAST(sx AS DOUBLE) / 1e6) * (CAST(sx AS DOUBLE) / 1e6))
             AS zipf_slope,
           ((CAST(sy AS DOUBLE) / 1e6)
            - ((CAST(k AS DOUBLE) * (CAST(sxy AS DOUBLE) / 1e12)
                - (CAST(sx AS DOUBLE) / 1e6) * (CAST(sy AS DOUBLE) / 1e6))
               / (CAST(k AS DOUBLE) * (CAST(sxx AS DOUBLE) / 1e12)
                  - (CAST(sx AS DOUBLE) / 1e6) * (CAST(sx AS DOUBLE) / 1e6)))
              * (CAST(sx AS DOUBLE) / 1e6))
           / CAST(k AS DOUBLE) AS log_intercept
    FROM m
    """,
    tags=("text", "corpus-stats", "regression"),
    doc=(
        "Zipf-law exponent of the corpus: OLS slope of ln(freq) ~ "
        "ln(rank) over the top-200 token ranks (a healthy natural-"
        "language corpus fits slope ~ -1; machine-generated or boiler-"
        "plate-heavy corpora deviate — a cheap corpus-level quality "
        "monitor). Scale shape: token counting is the same exploded "
        "aggregate as q63; only the 200-row rank head enters the "
        "regression. ln values are fixed-point-scaled (round(x*1e6), "
        "keeping x*y inside BIGINT under ANSI mode) so the moment sums "
        "are exact integers (same contract as s55's "
        "normal equations); slope/intercept are identically-spelled "
        "double expressions over those exact moments."
    ),
)
def s76_zipf_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.lower(norm_ws(F.col("text"))), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    # top-200 via TakeOrderedAndProject (distributed top-k), then rank
    # within the 200-row head — never a global window over the vocabulary
    head = freq.orderBy(F.desc("n"), "tok").limit(200)
    ranked = head.select(
        F.row_number().over(W.orderBy(F.desc("n"), "tok")).alias("r"), "n"
    )
    ints = ranked.select(
        iln6(F.col("r")).alias("x"),
        iln6(F.col("n")).alias("y"),
    )
    m = moments_xy(ints)
    kd = F.col("k").cast("double")
    sx = F.col("sx").cast("double") / 1e6
    sy = F.col("sy").cast("double") / 1e6
    sxy = F.col("sxy").cast("double") / 1e12
    sxx = F.col("sxx").cast("double") / 1e12
    slope = ols_slope(kd, sx, sy, sxy, sxx)
    intercept = (sy - slope * sx) / kd
    return m.select(
        F.col("k").cast("bigint").alias("n_ranks"),
        slope.alias("zipf_slope"),
        intercept.alias("log_intercept"),
    )


@register(
    "s77_kcore_peel",
    """
    WITH basket AS (
      -- per-key cap mirroring copurchase_edges(cap=64): bounds the
      -- wedge self-join at 64^2 rows/order on power-law data (TPC-H
      -- baskets <= 13, results unchanged)
      SELECT l_orderkey, l_partkey FROM (
        SELECT l_orderkey, l_partkey,
               ROW_NUMBER() OVER (
                 PARTITION BY l_orderkey
                 ORDER BY l_partkey, l_linenumber) AS rn
        FROM lineitem) WHERE rn <= 64
    ),
    edges0 AS (
      SELECT a.l_partkey AS p1, b.l_partkey AS p2
      FROM basket a JOIN basket b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING COUNT(*) >= 2
    ),
    deg0 AS (
      SELECT p, COUNT(*) AS d FROM (
        SELECT p1 AS p FROM edges0 UNION ALL SELECT p2 FROM edges0
      ) GROUP BY p
    ),
    keep1 AS (SELECT p FROM deg0 WHERE d >= 3),
    edges1 AS (
      SELECT e.p1, e.p2 FROM edges0 e
      JOIN keep1 k1 ON k1.p = e.p1
      JOIN keep1 k2 ON k2.p = e.p2
    ),
    deg1 AS (
      SELECT p, COUNT(*) AS d FROM (
        SELECT p1 AS p FROM edges1 UNION ALL SELECT p2 FROM edges1
      ) GROUP BY p
    ),
    keep2 AS (SELECT p FROM deg1 WHERE d >= 3),
    edges2 AS (
      SELECT e.p1, e.p2 FROM edges1 e
      JOIN keep2 k1 ON k1.p = e.p1
      JOIN keep2 k2 ON k2.p = e.p2
    )
    SELECT CAST((SELECT COUNT(*) FROM deg0) AS BIGINT) AS nodes_0,
           CAST((SELECT COUNT(*) FROM edges0) AS BIGINT) AS edges_0,
           CAST((SELECT COUNT(*) FROM keep1) AS BIGINT) AS nodes_1,
           CAST((SELECT COUNT(*) FROM edges1) AS BIGINT) AS edges_1,
           CAST((SELECT COUNT(*) FROM keep2) AS BIGINT) AS nodes_2,
           CAST((SELECT COUNT(*) FROM edges2) AS BIGINT) AS edges_2
    """,
    tags=("graph", "kcore", "market-basket"),
    doc=(
        "3-core peeling (two bounded rounds) of the part co-purchase "
        "graph — the dense-subgraph filter used to find tightly-coupled "
        "product clusters before community detection. Each round is one "
        "degree aggregation plus two semi-join-shaped filters on the "
        "edge list; rounds are BOUNDED (2) and documented as such, the "
        "same bounded-iteration contract as r74's PageRank. The edge "
        "list is built once (same support-thresholded co-purchase "
        "construction as s49, bounded by order size squared) and "
        "persisted across rounds. All counts exact integers."
    ),
)
def s77_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import kcore_peel_counts

    # kcore_peel_counts is size-tiered (round-11, guide §1.1): the
    # sf0.1 co-purchase graph is ~3.9k edges, for which the distributed
    # peel's ~30 tiny jobs were pure scheduler floor (4-7 s); the
    # driver tier computes the same exact counts in one task's worth of
    # work, and the distributed path remains the uncapped scale tier.
    return kcore_peel_counts(
        copurchase_edges(spark, sf_dir), src="p1", dst="p2", k=3, rounds=2
    )


@register(
    "s78_execute_hive_dialect",
    """
    SELECT o_orderpriority AS priority,
           COUNT(*) AS n_urgent_f,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_final
    FROM orders
    WHERE regexp_matches(o_orderpriority, '^[12]-')
    GROUP BY o_orderpriority
    ORDER BY priority
    """,
    tags=("execute-api", "dialect", "hive"),
    doc=(
        "HiveQL through execute(dialect='hive'): backquoted identifiers, "
        "IF(cond, a, b) and RLIKE — the Hadoop-ecosystem dialect the "
        "reference covers via sqlglot (reference core.py:102 delegates "
        "to sqlglot.transpile; its README lists hive). Hive is in "
        "Spark's own syntax family, so the token-stream fallback mostly "
        "passes tokens through — the test value is pinning that the "
        "family mapping stays a no-op (no over-rewriting)."
    ),
)
def s78_execute_hive_dialect(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..core import execute

    sql = """
    SELECT `o_orderpriority` AS priority,
           COUNT(*) AS n_urgent_f,
           CAST(SUM(IF(`o_orderstatus` = 'F', 1, 0)) AS BIGINT) AS n_final
    FROM orders
    WHERE `o_orderpriority` RLIKE '^[12]-'
    GROUP BY `o_orderpriority`
    ORDER BY priority
    """
    return execute(
        sql,
        dialect="hive",
        tables={"orders": t(spark, sf_dir, "orders")},
        spark=spark,
    )


@register(
    "s79_sorted_array_agg",
    """
    WITH ints AS (
      SELECT DISTINCT event_type,
             CAST(round(value * 100) AS BIGINT) AS v
      FROM events
    ),
    ranked AS (
      SELECT event_type, v,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n_distinct
      FROM ints
    )
    SELECT event_type,
           CAST(MAX(n_distinct) AS BIGINT) AS n_distinct,
           string_agg(CAST(v AS VARCHAR), ',' ORDER BY v) AS lowest5
    FROM ranked
    WHERE rn <= 5
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("aggregate", "array-agg", "collect"),
    doc=(
        "Ordered array aggregation (ARRAY_AGG ... ORDER BY / Spark "
        "collect_list): the 5 smallest distinct cent-scaled values per "
        "event type, emitted as a canonical comma-joined string. Spark's "
        "collect_list order is partition-arrival nondeterministic BY "
        "DESIGN — the engine re-establishes determinism with array_sort "
        "before joining, the required pattern for reproducible collected "
        "aggregates on any cluster. The rank filter bounds the collected "
        "set (never collect unbounded groups); values are integer-scaled "
        "so string rendering is engine-independent."
    ),
)
def s79_sorted_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ints = (
        t(spark, sf_dir, "events")
        .select(
            "event_type", F.round(F.col("value") * 100).cast("bigint").alias("v")
        )
        .distinct()
    )
    wtype = W.partitionBy("event_type")
    ranked = ints.select(
        "event_type",
        "v",
        F.row_number().over(wtype.orderBy("v")).alias("rn"),
        F.count(F.lit(1)).over(wtype).alias("n_distinct"),
    )
    return (
        ranked.filter(F.col("rn") <= 5)
        .groupBy("event_type")
        .agg(
            F.max("n_distinct").cast("bigint").alias("n_distinct"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("v")), lambda x: x.cast("string")
                ),
                ",",
            ).alias("lowest5"),
        )
        .orderBy("event_type")
    )


@register(
    "s80_exact_group_median",
    """
    WITH ranked AS (
      SELECT event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    )
    SELECT event_type,
           CAST(MAX(n) AS BIGINT) AS n,
           SUM(value) / COUNT(*) AS median
    FROM ranked
    WHERE rn = CAST(floor((n + 1) / 2.0) AS BIGINT)
       OR rn = CAST(floor(n / 2.0) AS BIGINT) + 1
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("aggregate", "median", "window"),
    doc=(
        "EXACT per-group median via positional selection: rank rows "
        "within each group, keep the one (odd n) or two (even n) middle "
        "positions, average them. Interpolating percentile built-ins "
        "(percentile_cont) evaluate (1-f)*a + f*b with engine-internal "
        "spelling, so their low bits are not portable; positional "
        "selection is — the picked values are raw column doubles and "
        "the 2-element average is order-independent. Scale shape: one "
        "per-group sort (the unavoidable cost of an exact median), no "
        "driver-side collection; for sketch-grade needs at 100 TB the "
        "engine offers approx_tiles (q57/q93) instead."
    ),
)
def s80_exact_group_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    return positional_median(
        t(spark, sf_dir, "events").select("event_type", "value"),
        "value",
        part_cols=("event_type",),
        alias="median",
        n_alias="n",
    ).orderBy("event_type")


@register(
    "s81_hll_sketch_rollup",
    None,  # sketch binary/estimates are engine-specific; the merge==direct
    # equality is asserted in tests/test_operators.py instead
    tags=("events", "sketch", "approx", "rollup"),
    doc=(
        "Mergeable-sketch rollup — the pattern that makes distinct "
        "counts tractable at 100 TB: build one DataSketches HLL per "
        "(day, event_type) cell (hll_sketch_agg), then merge the daily "
        "sketches per event_type with hll_union_agg instead of "
        "re-scanning the fact table. HLL union at equal lgConfigK is "
        "lossless, so the merged estimate is IDENTICAL to the estimate "
        "of a sketch built directly over the whole period — asserted "
        "exactly in tests (merge==direct), which is the property that "
        "lets daily pre-aggregates answer any date-range distinct query "
        "without touching raw data. No DuckDB oracle: sketch registers "
        "are engine-specific (rows-only driver check)."
    ),
)
def s81_hll_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").alias("day"), "event_type"
    ).agg(F.hll_sketch_agg("user_id").alias("sketch"))
    return (
        daily.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_daily_sketches"),
            F.hll_sketch_estimate(F.hll_union_agg("sketch"))
            .cast("bigint")
            .alias("merged_distinct_users"),
        )
        .orderBy("event_type")
    )


@register(
    "s84_time_decayed_value",
    """
    WITH terms AS (
      SELECT user_id,
             round(value * pow(0.95,
                   CAST(date_diff('day', CAST(ts AS DATE),
                                  DATE '2024-01-31') AS BIGINT)), 12)
               AS term
      FROM events
      WHERE event_type = 'purchase'
    )
    SELECT user_id,
           COUNT(*) AS n_purchases,
           CAST(SUM(CAST(term AS DECIMAL(28,12))) AS DOUBLE) AS decayed_value
    FROM terms
    GROUP BY user_id
    ORDER BY decayed_value DESC, user_id
    LIMIT 20
    """,
    tags=("events", "feature-engineering", "decay"),
    doc=(
        "Exponentially time-decayed user value (half-life scoring, the "
        "standard recency-weighted feature for ranking/churn models): "
        "each purchase contributes value * 0.95^age_days toward a "
        "per-user score. pow() runs on an integer exponent but is still "
        "libm — so each term is round(x, 12)-ed before the DECIMAL cast "
        "(README determinism rule: rounded terms cannot re-tie at the "
        "cast digit), making the per-user sum exact-decimal and "
        "order-independent at any cluster size. One filtered scan, one "
        "user-keyed aggregate, top-20 via TakeOrdered."
    ),
)
def s84_time_decayed_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    age = F.datediff(
        F.lit("2024-01-31").cast("date"), F.col("ts").cast("date")
    ).cast("bigint")
    term = F.round(F.col("value") * F.pow(F.lit(0.95), age), 12)
    return (
        ev.select("user_id", term.alias("term"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(F.col("term").cast("decimal(28,12)"))
            .cast("double")
            .alias("decayed_value"),
        )
        .orderBy(F.desc("decayed_value"), "user_id")
        .limit(20)
    )


@register(
    "s85_eventually_follows",
    """
    WITH spans AS (
      SELECT user_id, event_type,
             MIN(epoch_us(ts)) AS tmin, MAX(epoch_us(ts)) AS tmax
      FROM events
      GROUP BY user_id, event_type
    )
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           COUNT(*) AS n_users
    FROM spans a JOIN spans b
      ON a.user_id = b.user_id
     AND a.event_type <> b.event_type
     AND a.tmin < b.tmax
    GROUP BY a.event_type, b.event_type
    ORDER BY type_a, type_b
    """,
    tags=("events", "process-mining", "sequence"),
    doc=(
        "Eventually-follows matrix — the process-mining primitive behind "
        "directly/eventually-follows graphs: for each ordered pair of "
        "event types, how many users did A at some point before (any "
        "occurrence of) B. The trick that keeps it linear: 'exists "
        "a_ts < b_ts' collapses to MIN(ts of A) < MAX(ts of B), so the "
        "fact table reduces to one (user, type) span aggregate and the "
        "pair join expands at most |types|^2 = 25 rows per user — never "
        "event-count quadratic (same bounded-context shape as s67's "
        "PMI). All integer micros comparisons and counts."
    ),
)
def s85_eventually_follows(spark: SparkSession, sf_dir: str) -> DataFrame:
    spans = (
        t(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(
            F.min(F.unix_micros("ts")).alias("tmin"),
            F.max(F.unix_micros("ts")).alias("tmax"),
        )
    )
    a, b = spans.alias("a"), spans.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") != F.col("b.event_type"))
            & (F.col("a.tmin") < F.col("b.tmax")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("type_a", "type_b")
    )


@register(
    "s86_session_length_histogram",
    """
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
                  OR LAG(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT user_id, session_seq, COUNT(*) AS n_events
      FROM (
        SELECT user_id, ts,
               SUM(new_session) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM flagged
      )
      GROUP BY user_id, session_seq
    )
    SELECT CASE WHEN n_events = 1 THEN '1_bounce'
                WHEN n_events = 2 THEN '2'
                WHEN n_events <= 5 THEN '3-5'
                WHEN n_events <= 10 THEN '6-10'
                ELSE '11+' END AS bucket,
           COUNT(*) AS n_sessions,
           CAST(SUM(n_events) AS BIGINT) AS n_events_total
    FROM sessions
    GROUP BY bucket
    ORDER BY bucket
    """,
    tags=("events", "sessionize", "histogram"),
    doc=(
        "Session-length histogram with an explicit bounce bucket — the "
        "engagement-shape report product analytics runs daily. Shares "
        "q51/s73's 30-min-gap sessionization exactly (one windowed pass "
        "keyed on user), then collapses to per-session event counts and "
        "a 5-bucket census. All integer counts; bucket labels sort "
        "deterministically."
    ),
)
def s86_session_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    wuser = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(wuser))
    sessions = (
        t(spark, sf_dir, "events")
        .select(
            "user_id",
            "ts",
            "event_id",
            F.when(gap_us.isNull() | (gap_us > 1_800_000_000), 1)
            .otherwise(0)
            .alias("new_session"),
        )
        .withColumn(
            "session_seq",
            F.sum("new_session").over(
                wuser.rowsBetween(W.unboundedPreceding, W.currentRow)
            ),
        )
        .groupBy("user_id", "session_seq")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    bucket = (
        F.when(F.col("n_events") == 1, "1_bounce")
        .when(F.col("n_events") == 2, "2")
        .when(F.col("n_events") <= 5, "3-5")
        .when(F.col("n_events") <= 10, "6-10")
        .otherwise("11+")
    )
    return (
        sessions.select(bucket.alias("bucket"), "n_events")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").cast("bigint").alias("n_events_total"),
        )
        .orderBy("bucket")
    )


@register(
    "s87_kwic_contexts",
    f"""
    WITH arrs AS (
      SELECT doc_id, string_split(lower({_NORM}), ' ') AS arr FROM documents
    ),
    toks AS (
      SELECT doc_id, arr, unnest(arr) AS tok,
             unnest(range(1, len(arr) + 1)) AS pos
      FROM arrs
    )
    SELECT doc_id, CAST(pos AS BIGINT) AS pos,
           array_to_string(arr[GREATEST(1, pos - 2) :
                               LEAST(len(arr), pos + 2)], ' ') AS context
    FROM toks
    WHERE tok = 'vector'
    ORDER BY doc_id, pos
    LIMIT 50
    """,
    tags=("text", "search", "kwic"),
    doc=(
        "Keyword-in-context (KWIC) extraction for the term 'vector': "
        "each occurrence with a +/-2-token window — the concordance "
        "view linguists and data-quality reviewers use to inspect how a "
        "term is actually used in a corpus. Built on the same exploded "
        "positional index as s83 (1-based positions here, matching "
        "DuckDB list slicing; Spark's slice(arr, start, length) is "
        "spelled to the identical clamped bounds). The context slice is "
        "computed from the doc's own array — no join at all; the term "
        "filter bounds output before the global sort, and the top-50 is "
        "TakeOrdered."
    ),
)
def s87_kwic_contexts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    arrs = docs.select(
        "doc_id", F.split(F.lower(norm_ws(F.col("text"))), " ").alias("arr")
    )
    toks = arrs.select(
        "doc_id",
        "arr",
        F.posexplode(F.col("arr")).alias("pos0", "tok"),
    ).withColumn("pos", F.col("pos0") + 1)
    start = F.greatest(F.lit(1), F.col("pos") - 2)
    end = F.least(F.size("arr"), F.col("pos") + 2)
    return (
        toks.filter(F.col("tok") == "vector")
        .select(
            "doc_id",
            F.col("pos").cast("bigint").alias("pos"),
            F.array_join(
                F.slice(F.col("arr"), start, end - start + 1), " "
            ).alias("context"),
        )
        .orderBy("doc_id", "pos")
        .limit(50)
    )


@register(
    "s88_quantile_normalize",
    f"""
    WITH scored AS (
      SELECT doc_id, source, {_NTOK} AS words FROM documents
    ),
    ranked AS (
      SELECT source, doc_id, words,
             PERCENT_RANK() OVER (PARTITION BY source
                                  ORDER BY words, doc_id) AS pct
      FROM scored
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN pct >= 0.9 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_top_decile,
           CAST(MIN(CASE WHEN pct >= 0.9 THEN words END) AS BIGINT)
             AS top_decile_cutoff_words
    FROM ranked
    GROUP BY source
    ORDER BY source
    """,
    tags=("text", "feature-engineering", "quantile"),
    doc=(
        "Within-source quantile normalization — the cross-domain "
        "calibration step before mixing corpora: a doc's raw length "
        "(or quality) score is replaced by its percentile WITHIN its "
        "source, so 'top decile' means the same thing for every domain "
        "regardless of scale differences. percent_rank is partitioned "
        "by source (never global), with a deterministic (words, doc_id) "
        "tie order; its value is (rank-1)/(n-1) over integers — "
        "identical doubles on both engines. Output: per-source top-"
        "decile census and the raw-score cutoff that decile maps to."
    ),
)
def s88_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = t(spark, sf_dir, "documents").select(
        "doc_id", "source", token_count(F.col("text")).alias("words")
    )
    ranked = scored.select(
        "source",
        "words",
        F.percent_rank()
        .over(W.partitionBy("source").orderBy("words", "doc_id"))
        .alias("pct"),
    )
    top = F.when(F.col("pct") >= 0.9, 1).otherwise(0)
    return (
        ranked.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(top).cast("bigint").alias("n_top_decile"),
            F.min(F.when(F.col("pct") >= 0.9, F.col("words")))
            .cast("bigint")
            .alias("top_decile_cutoff_words"),
        )
        .orderBy("source")
    )


@register(
    "s89_association_rules",
    """
    WITH baskets AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    n_orders AS (
      SELECT COUNT(DISTINCT l_orderkey) AS n FROM lineitem
    ),
    item_counts AS (
      SELECT l_partkey, COUNT(*) AS c FROM baskets GROUP BY l_partkey
    ),
    pair_counts AS (
      SELECT a.l_partkey AS item_a, b.l_partkey AS item_b, COUNT(*) AS cab
      FROM baskets a JOIN baskets b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING COUNT(*) >= 3
    )
    SELECT item_a, item_b,
           CAST(cab AS BIGINT) AS n_both,
           CAST(cab AS DOUBLE) / CAST(n.n AS DOUBLE) AS support,
           CAST(cab AS DOUBLE) / CAST(ia.c AS DOUBLE) AS confidence,
           (CAST(cab AS DOUBLE) * CAST(n.n AS DOUBLE))
             / (CAST(ia.c AS DOUBLE) * CAST(ib.c AS DOUBLE)) AS lift
    FROM pair_counts
    JOIN item_counts ia ON ia.l_partkey = item_a
    JOIN item_counts ib ON ib.l_partkey = item_b
    CROSS JOIN n_orders n
    ORDER BY lift DESC, item_a, item_b
    LIMIT 20
    """,
    tags=("market-basket", "association-rules", "stats"),
    doc=(
        "Association-rule mining over order baskets: support, "
        "confidence and lift for co-purchased part pairs above a "
        "support threshold — the classic frequent-itemset stage 1-2 "
        "(pairs) of Apriori, expressed relationally. Scale shape: the "
        "basket pair join is keyed on orderkey and bounded by order "
        "size squared (TPC-H ~4 lines/order); the support threshold "
        "prunes BEFORE the metric joins; item counts broadcast; the "
        "1-row order total broadcasts. All ratios are identically-"
        "spelled doubles over exact integer counts; top-20 by lift via "
        "TakeOrdered with full deterministic tie-break."
    ),
)
def s89_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    baskets = li.select("l_orderkey", "l_partkey").distinct()
    n_orders = li.agg(F.countDistinct("l_orderkey").alias("n"))
    item_counts = baskets.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c"))
    a, b = baskets.alias("a"), baskets.alias("b")
    pair_counts = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("item_a"),
            F.col("b.l_partkey").alias("item_b"),
        )
        .agg(F.count(F.lit(1)).alias("cab"))
        .filter(F.col("cab") >= 3)
    )
    ia = item_counts.select(
        F.col("l_partkey").alias("item_a"), F.col("c").alias("ca")
    )
    ib = item_counts.select(
        F.col("l_partkey").alias("item_b"), F.col("c").alias("cb")
    )
    nd = F.col("n").cast("double")
    return (
        pair_counts.join(F.broadcast(ia), "item_a")
        .join(F.broadcast(ib), "item_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "item_a",
            "item_b",
            F.col("cab").cast("bigint").alias("n_both"),
            (F.col("cab").cast("double") / nd).alias("support"),
            (F.col("cab").cast("double") / F.col("ca").cast("double")).alias(
                "confidence"
            ),
            (
                (F.col("cab").cast("double") * nd)
                / (F.col("ca").cast("double") * F.col("cb").cast("double"))
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "item_a", "item_b")
        .limit(20)
    )


@register(
    "s90_naive_bayes_langid",
    f"""
    WITH toks AS (
      SELECT doc_id, lang, unnest(string_split(lower({_NORM}), ' ')) AS tok
      FROM documents
    ),
    toks_clean AS (SELECT * FROM toks WHERE tok <> ''),
    train AS (SELECT * FROM toks_clean WHERE doc_id % 5 <> 0),
    test AS (
      SELECT doc_id, lang, tok, COUNT(*) AS n_occ
      FROM toks_clean WHERE doc_id % 5 = 0
      GROUP BY doc_id, lang, tok
    ),
    counts AS (
      SELECT lang, tok, COUNT(*) AS c FROM train GROUP BY lang, tok
    ),
    totals AS (
      SELECT lang, COUNT(*) AS total,
             COUNT(DISTINCT doc_id) AS n_docs
      FROM train GROUP BY lang
    ),
    vocab AS (SELECT COUNT(DISTINCT tok) AS v FROM train),
    n_train AS (SELECT COUNT(DISTINCT doc_id) AS n FROM train),
    -- integer fixed-point log-likelihoods: ln taken ONLY of integers
    scores AS (
      SELECT te.doc_id, te.lang AS actual, t.lang AS cand,
             SUM(te.n_occ * (CAST(round(ln(CAST(COALESCE(c.c, 0) + 1
                                              AS DOUBLE)) * 1e6) AS BIGINT)
                             - CAST(round(ln(CAST(t.total + v.v AS DOUBLE))
                                          * 1e6) AS BIGINT)))
             + CAST(round(ln(CAST(t.n_docs AS DOUBLE)) * 1e6) AS BIGINT)
             - CAST(round(ln(CAST(n.n AS DOUBLE)) * 1e6) AS BIGINT)
               AS score
      FROM test te
      CROSS JOIN totals t
      CROSS JOIN vocab v
      CROSS JOIN n_train n
      LEFT JOIN counts c ON c.lang = t.lang AND c.tok = te.tok
      GROUP BY te.doc_id, te.lang, t.lang, t.n_docs, v.v, n.n
    ),
    predicted AS (
      SELECT doc_id, actual, cand AS predicted
      FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                     ORDER BY score DESC, cand) AS rk
        FROM scores
      ) WHERE rk = 1
    )
    SELECT actual, predicted, COUNT(*) AS n_docs
    FROM predicted
    GROUP BY actual, predicted
    ORDER BY actual, predicted
    """,
    tags=("text", "ml", "naive-bayes", "classification"),
    doc=(
        "Multinomial Naive Bayes language identification, trained AND "
        "applied entirely relationally: token likelihoods with Laplace "
        "smoothing learned on the doc_id%5<>0 split, the held-out split "
        "classified by argmax log-posterior, output as a confusion "
        "matrix against the true labels — distributed ML as dataflow, "
        "no driver-side model object. Bit-exactness trick: every log "
        "term is ln OF AN INTEGER (ln(c+1) - ln(total+V), priors as "
        "ln(n_docs) - ln(n)), fixed-point-scaled to round(x*1e6) "
        "BIGINTs, so scores are exact integer sums (order-independent "
        "at any parallelism) and argmax has a deterministic lang "
        "tie-break. Scale shape: the model IS a (lang, token) count "
        "table — the classic shape that broadcasts (5 langs x vocab); "
        "scoring is one join keyed on token, partial-aggregated by "
        "(doc, candidate). The reference has no ML surface at all."
    ),
)
def s90_naive_bayes_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    toks = (
        docs.select(
            "doc_id",
            "lang",
            F.explode(F.split(F.lower(norm_ws(F.col("text"))), " ")).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )
    train = toks.filter(F.col("doc_id") % 5 != 0)
    test = (
        toks.filter(F.col("doc_id") % 5 == 0)
        .groupBy("doc_id", F.col("lang").alias("actual"), "tok")
        .agg(F.count(F.lit(1)).alias("n_occ"))
    )
    counts = train.groupBy(F.col("lang").alias("cand"), "tok").agg(
        F.count(F.lit(1)).alias("c")
    )
    totals = train.groupBy(F.col("lang").alias("cand")).agg(
        F.count(F.lit(1)).alias("total"),
        F.countDistinct("doc_id").alias("n_docs"),
    )
    vocab = train.agg(F.countDistinct("tok").alias("v"))
    n_train = train.agg(F.countDistinct("doc_id").alias("n"))

    fxln = iln6  # shared fixed-point ln guard (functions/stats.py)

    grid = (
        test.crossJoin(F.broadcast(totals))
        .join(F.broadcast(counts), ["cand", "tok"], "left")
        .crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(n_train))
    )
    term = F.col("n_occ") * (
        fxln(F.coalesce(F.col("c"), F.lit(0)) + 1)
        - fxln(F.col("total") + F.col("v"))
    )
    scores = grid.groupBy(
        "doc_id", "actual", "cand", "n_docs", "v", "n"
    ).agg(F.sum(term).alias("tok_score"))
    scores = scores.select(
        "doc_id",
        "actual",
        "cand",
        (F.col("tok_score") + fxln(F.col("n_docs")) - fxln(F.col("n"))).alias(
            "score"
        ),
    )
    wdoc = W.partitionBy("doc_id").orderBy(F.desc("score"), "cand")
    predicted = (
        scores.withColumn("rk", F.row_number().over(wdoc))
        .filter(F.col("rk") == 1)
        .select("actual", F.col("cand").alias("predicted"))
    )
    return (
        predicted.groupBy("actual", "predicted")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("actual", "predicted")
    )


@register(
    "s92_ses_forecast",
    """
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS revenue
      FROM events WHERE event_type IN ('purchase', 'click')
      GROUP BY event_type, day
    ),
    indexed AS (
      SELECT event_type, revenue,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS i,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM daily
    ),
    terms AS (
      -- closed form: level_n = sum_i alpha*(1-alpha)^(n-i)*x_i
      --              + (1-alpha)^n * x_1  (l0 = first observation)
      SELECT event_type, n,
             -- round to 9 (not 12): terms reach ~1e4, so a 1-ulp pow
             -- divergence (~1e-12 absolute) could flip a 12th-digit
             -- rounding; at 9 digits the margin is 500x the error
             round(0.3 * pow(0.7, CAST(n - i AS BIGINT)) * revenue, 9)
               AS w_term,
             CASE WHEN i = 1
                  THEN round(pow(0.7, CAST(n AS BIGINT)) * revenue, 9)
                  ELSE 0.0 END AS init_term
      FROM indexed
    )
    SELECT event_type,
           CAST(MAX(n) AS BIGINT) AS n_days,
           CAST(SUM(CAST(w_term AS DECIMAL(28,12)))
                + SUM(CAST(init_term AS DECIMAL(28,12))) AS DOUBLE)
             AS ses_forecast
    FROM terms
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("events", "time-series", "forecast"),
    doc=(
        "Simple exponential smoothing forecast of next-day revenue per "
        "event type (alpha=0.3, seeded with the first observation). The "
        "sequential recurrence l_t = a*x_t + (1-a)*l_(t-1) unrolls to a "
        "closed-form weighted sum — the re-expression that turns an "
        "inherently serial update into ONE parallel aggregate (each "
        "day's weight depends only on its distance from the end), the "
        "same serial->dataflow move as s74's first-touch trick. Daily "
        "revenues are exact decimal sums; pow terms follow the round("
        "x,12)-before-decimal-cast rule (s84), so the weighted sum is "
        "exact and order-independent."
    ),
)
def s92_ses_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("revenue"))
    wtype = W.partitionBy("event_type")
    indexed = daily.select(
        "event_type",
        "revenue",
        F.row_number().over(wtype.orderBy("day")).alias("i"),
        F.count(F.lit(1)).over(wtype).alias("n"),
    )
    w_term, init_term = ses_terms(F.col("n"), F.col("i"), F.col("revenue"))
    dec = "decimal(28,12)"
    return (
        indexed.select(
            "event_type", "n", w_term.alias("w_term"), init_term.alias("init_term")
        )
        .groupBy("event_type")
        .agg(
            F.max("n").cast("bigint").alias("n_days"),
            (
                F.sum(F.col("w_term").cast(dec)) + F.sum(F.col("init_term").cast(dec))
            )
            .cast("double")
            .alias("ses_forecast"),
        )
        .orderBy("event_type")
    )


@register(
    "s93_lagged_cross_correlation",
    """
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day,
             COUNT(*) FILTER (WHERE event_type = 'view') AS views,
             COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchases
      FROM events GROUP BY day
    ),
    lags AS (SELECT UNNEST(range(-3, 4)) AS lag),
    pairs AS (
      SELECT l.lag, a.views AS x, b.purchases AS y
      FROM daily a
      JOIN lags l ON TRUE
      JOIN daily b ON b.day = a.day + to_days(CAST(l.lag AS INT))
    ),
    m AS (
      SELECT lag, COUNT(*) AS k,
             SUM(CAST(x AS DECIMAL(38,0))) AS sx,
             SUM(CAST(y AS DECIMAL(38,0))) AS sy,
             SUM(CAST(x * y AS DECIMAL(38,0))) AS sxy,
             SUM(CAST(x * x AS DECIMAL(38,0))) AS sxx,
             SUM(CAST(y * y AS DECIMAL(38,0))) AS syy
      FROM pairs GROUP BY lag
    )
    SELECT CAST(lag AS INT) AS lag, CAST(k AS BIGINT) AS n_days,
           (CAST(k AS DOUBLE) * CAST(sxy AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (sqrt(CAST(k AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * sqrt(CAST(k AS DOUBLE) * CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
             AS xcorr
    FROM m
    ORDER BY lag
    """,
    tags=("events", "time-series", "correlation"),
    doc=(
        "Lead-lag cross-correlation between daily view and purchase "
        "volumes at lags -3..+3 — the signal analysts use to measure "
        "how many days views precede purchases. The lag alignment is "
        "an equi-join on (day + lag), never a window over a replicated "
        "series; moments accumulate as exact DECIMAL(38,0) integer "
        "sums per lag (s55's contract), and each Pearson r is one "
        "identically-spelled double expression. 7 lags x 30 days — "
        "everything after the daily rollup is constant-size."
    ),
)
def s93_lagged_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        t(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.count(F.when(F.col("event_type") == "view", 1)).alias("views"),
            F.count(F.when(F.col("event_type") == "purchase", 1)).alias(
                "purchases"
            ),
        )
    )
    lags = spark.range(-3, 4).select(F.col("id").cast("int").alias("lag"))
    a = daily.select("day", "views")
    b = daily.select(F.col("day").alias("bday"), "purchases")
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(
            b,
            F.col("bday")
            == F.col("day") + F.make_dt_interval(F.col("lag").cast("int")),
        )
        .select("lag", F.col("views").alias("x"), F.col("purchases").alias("y"))
    )
    m = moments_xy(pairs, part_cols=("lag",), with_syy=True)
    kd = F.col("k").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    r = pearson_r(kd, sx, sy, sxy, sxx, syy)
    return m.select(
        F.col("lag").cast("int").alias("lag"),
        F.col("k").cast("bigint").alias("n_days"),
        r.alias("xcorr"),
    ).orderBy("lag")


@register(
    "s95_cusum_changepoint",
    """
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day, COUNT(*) AS cnt
      FROM events GROUP BY event_type, day
    ),
    cum AS (
      SELECT event_type, day,
             SUM(cnt) OVER (PARTITION BY event_type ORDER BY day
                            ROWS UNBOUNDED PRECEDING) AS c,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS i,
             SUM(cnt) OVER (PARTITION BY event_type) AS total,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM daily
    ),
    scored AS (
      SELECT event_type, day, n,
             abs(CAST(n * c - i * total AS BIGINT)) AS t_abs,
             ROW_NUMBER() OVER (
               PARTITION BY event_type
               ORDER BY abs(CAST(n * c - i * total AS BIGINT)) DESC, day
             ) AS rk
      FROM cum
    )
    SELECT event_type, day AS change_day, CAST(n AS BIGINT) AS n_days,
           CAST(t_abs AS DOUBLE) / CAST(n AS DOUBLE) AS max_abs_cusum
    FROM scored WHERE rk = 1 ORDER BY event_type
    """,
    tags=("events", "time-series", "changepoint"),
    doc=(
        "CUSUM change-point detection over the daily event-count series "
        "of each event type: the classic mean-centered cumulative sum "
        "S_i = sum_j<=i (x_j - mean), with the change point at argmax "
        "|S_i|. The float-free trick: multiply through by n so "
        "T_i = n*cumsum_i - i*total is PURE INTEGER (exact, "
        "order-independent); the reported excursion max|S_i| = |T_i|/n "
        "is one identical IEEE division of two integers on both "
        "engines. One small shuffle (per-type daily grid) and windows "
        "over it; series length is days, not events, so the windowed "
        "stage is O(types x days) regardless of raw volume."
    ),
)
def s95_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    wtype = W.partitionBy("event_type")
    cum = daily.select(
        "event_type",
        "day",
        F.sum("cnt")
        .over(wtype.orderBy("day").rowsBetween(W.unboundedPreceding, 0))
        .alias("c"),
        F.row_number().over(wtype.orderBy("day")).alias("i"),
        F.sum("cnt").over(wtype).alias("total"),
        F.count(F.lit(1)).over(wtype).alias("n"),
    )
    t_abs = F.abs(
        (F.col("n") * F.col("c") - F.col("i") * F.col("total")).cast("bigint")
    )
    scored = cum.select(
        "event_type",
        "day",
        "n",
        t_abs.alias("t_abs"),
        F.row_number()
        .over(wtype.orderBy(t_abs.desc(), "day"))
        .alias("rk"),
    )
    return (
        scored.filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("day").alias("change_day"),
            F.col("n").cast("bigint").alias("n_days"),
            (F.col("t_abs").cast("double") / F.col("n").cast("double")).alias(
                "max_abs_cusum"
            ),
        )
        .orderBy("event_type")
    )


@register(
    "s98_kaplan_meier",
    """
    WITH bounds AS (SELECT max(ts) AS end_ts FROM events),
    users AS (
      SELECT user_id,
             date_diff('day', CAST(min(ts) AS DATE), CAST(max(ts) AS DATE))
               AS dur,
             CASE WHEN max(ts) < (SELECT end_ts FROM bounds)
                                 - INTERVAL 7 DAY
                  THEN 1 ELSE 0 END AS observed
      FROM events GROUP BY user_id
    ),
    alldur AS (
      SELECT dur, COUNT(*) AS c_all, SUM(observed) AS d
      FROM users GROUP BY dur
    ),
    risk AS (
      SELECT dur, d,
             SUM(c_all) OVER (ORDER BY dur DESC
                              ROWS UNBOUNDED PRECEDING) AS n_risk
      FROM alldur
    ),
    -- fixed-point ln of INTEGERS only (house s90 discipline):
    -- ln((n-d)/n) decomposes to fxln(n-d) - fxln(n), both integer args
    km AS (
      SELECT dur, d, n_risk,
             CASE WHEN n_risk > d THEN
               CAST(round(ln(CAST(n_risk - d AS DOUBLE)) * 1e6) AS BIGINT)
               - CAST(round(ln(CAST(n_risk AS DOUBLE)) * 1e6) AS BIGINT)
             ELSE NULL END AS lnterm
      FROM risk WHERE d > 0
    ),
    curve AS (
      SELECT dur, d, n_risk,
             SUM(lnterm) OVER (ORDER BY dur
                               ROWS UNBOUNDED PRECEDING) AS lnsum
      FROM km
    )
    SELECT CAST(dur AS INT) AS t_days,
           CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d AS BIGINT) AS n_events,
           CASE WHEN n_risk = d THEN 0.0
                ELSE round(exp(CAST(lnsum AS DOUBLE) / 1e6), 9)
           END AS survival
    FROM curve ORDER BY t_days
    """,
    tags=("events", "survival", "statistics"),
    doc=(
        "Kaplan-Meier product-limit survival curve of user lifetime "
        "(days between first and last event), right-censoring users "
        "still active within 7 days of the corpus end. The product "
        "prod(1 - d_i/n_i) is rewritten as exp(sum(ln(n_i - d_i) - "
        "ln(n_i))): each ln has an INTEGER argument, fixed-point "
        "quantized to round(x*1e6) BIGINT (s90 discipline), so the "
        "cumulative log-sum is exact integer arithmetic on both "
        "engines and only the final one-shot exp/round touches "
        "floats. Risk sets come from a descending cumulative count "
        "over the per-duration histogram - no correlated subquery, "
        "no self-join; the windowed stage is O(distinct durations)."
    ),
)
def s98_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    bounds = ev.agg(F.max("ts").alias("end_ts"))
    users = (
        ev.groupBy("user_id")
        .agg(
            F.datediff(F.to_date(F.max("ts")), F.to_date(F.min("ts"))).alias(
                "dur"
            ),
            F.max("ts").alias("last_ts"),
        )
        .crossJoin(F.broadcast(bounds))
        .select(
            "dur",
            F.when(
                F.col("last_ts")
                < F.col("end_ts") - F.expr("INTERVAL 7 DAYS"),
                1,
            )
            .otherwise(0)
            .alias("observed"),
        )
    )
    alldur = users.groupBy("dur").agg(
        F.count(F.lit(1)).alias("c_all"), F.sum("observed").alias("d")
    )
    wdesc = W.orderBy(F.col("dur").desc()).rowsBetween(
        W.unboundedPreceding, 0
    )
    risk = alldur.select(
        "dur", "d", F.sum("c_all").over(wdesc).alias("n_risk")
    )

    fxln = iln6  # shared fixed-point ln guard (functions/stats.py)

    km = risk.filter(F.col("d") > 0).select(
        "dur",
        "d",
        "n_risk",
        F.when(
            F.col("n_risk") > F.col("d"),
            fxln(F.col("n_risk") - F.col("d")) - fxln(F.col("n_risk")),
        ).alias("lnterm"),
    )
    wasc = W.orderBy("dur").rowsBetween(W.unboundedPreceding, 0)
    curve = km.select(
        "dur", "d", "n_risk", F.sum("lnterm").over(wasc).alias("lnsum")
    )
    return curve.select(
        F.col("dur").cast("int").alias("t_days"),
        F.col("n_risk").cast("bigint").alias("n_risk"),
        F.col("d").cast("bigint").alias("n_events"),
        F.when(F.col("n_risk") == F.col("d"), F.lit(0.0))
        .otherwise(
            exp9(F.col("lnsum").cast("double") / F.lit(1e6))
        )
        .alias("survival"),
    ).orderBy("t_days")


@register(
    "s99_gini_inequality",
    """
    WITH ranked AS (
      SELECT source, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars) AS i,
             COUNT(*) OVER (PARTITION BY source) AS n,
             SUM(n_chars) OVER (PARTITION BY source) AS tot
      FROM documents WHERE n_chars IS NOT NULL
    )
    SELECT source, CAST(MAX(n) AS BIGINT) AS n_docs,
           CAST(SUM(CAST((2 * i - n - 1) * n_chars AS DECIMAL(38, 0)))
                AS DOUBLE)
             / (CAST(MAX(n) AS DOUBLE) * CAST(MAX(tot) AS DOUBLE)) AS gini
    FROM ranked GROUP BY source ORDER BY source
    """,
    tags=("text", "statistics", "inequality"),
    doc=(
        "Gini coefficient of document-length inequality per source via "
        "the sorted-rank identity G = sum((2i - n - 1) x_(i)) / "
        "(n sum(x)): every aggregate is integer/decimal-exact (the "
        "rank weights summed within a tie-block are invariant to the "
        "arbitrary row_number order among equal lengths), and the "
        "final statistic is one identical IEEE division on both "
        "engines. Complements s12 (Pareto share) and s26 (HHI) with "
        "the standard inequality measure. One shuffle to rank within "
        "source; DECIMAL(38,0) accumulation keeps the weighted sum "
        "overflow-safe at 100 TB row counts."
    ),
)
def s99_gini_inequality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").filter(F.col("n_chars").isNotNull())
    wsrc = W.partitionBy("source")
    ranked = docs.select(
        "source",
        "n_chars",
        F.row_number().over(wsrc.orderBy("n_chars")).alias("i"),
        F.count(F.lit(1)).over(wsrc).alias("n"),
        F.sum("n_chars").over(wsrc).alias("tot"),
    )
    weighted = (
        (2 * F.col("i") - F.col("n") - 1) * F.col("n_chars")
    ).cast("decimal(38,0)")
    return (
        ranked.groupBy("source")
        .agg(
            F.max("n").cast("bigint").alias("n_docs"),
            (
                F.sum(weighted).cast("double")
                / (F.max("n").cast("double") * F.max("tot").cast("double"))
            ).alias("gini"),
        )
        .orderBy("source")
    )


# Inverse-CDF thresholds for Poisson(1) on a 32-bit uniform hash:
# floor(cumsum_{k=0..8} e^-1/k! * 2^32). Integer literals, so replicate
# weights are EXACT integer comparisons on both engines (no float CDF).
_POIS1_T = (
    1580030168,
    3160060337,
    3950075421,
    4213413783,
    4279248373,
    4292415291,
    4294609777,
    4294923276,
    4294962463,
)


@register(
    "t01_poisson_bootstrap_ci",
    f"""
    WITH reps AS (
      SELECT d.doc_id, d.n_chars, b.b,
             ('0x' || substring(md5(d.doc_id::VARCHAR || '-' || b.b::VARCHAR),
                                1, 8))::BIGINT AS u
      FROM documents d
      CROSS JOIN (SELECT unnest(range(100)) AS b) b
    ),
    weighted AS (
      SELECT b, n_chars,
             CASE {' '.join(f"WHEN u < {t} THEN {k}" for k, t in enumerate(_POIS1_T))}
                  ELSE 9 END AS w
      FROM reps
    ),
    means AS (
      SELECT b,
             CAST(SUM(w * n_chars) AS DOUBLE) / CAST(SUM(w) AS DOUBLE)
               AS mean_b
      FROM weighted GROUP BY b
    ),
    ranked AS (
      SELECT mean_b, ROW_NUMBER() OVER (ORDER BY mean_b, b) AS rn
      FROM means
    ),
    ci AS (
      SELECT MIN(CASE WHEN rn = 3 THEN mean_b END) AS boot_lo,
             MIN(CASE WHEN rn = 98 THEN mean_b END) AS boot_hi
      FROM ranked
    ),
    base AS (
      SELECT COUNT(*) AS n_docs,
             CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS mean_chars
      FROM documents
    )
    SELECT base.n_docs, base.mean_chars,
           CAST(100 AS BIGINT) AS n_replicates,
           ci.boot_lo, ci.boot_hi
    FROM base CROSS JOIN ci
    """,
    tags=("statistics", "bootstrap", "sampling"),
    doc=(
        "95% bootstrap confidence interval for mean document length via "
        "the POISSON bootstrap - the distributed-systems form of the "
        "bootstrap (Chamandy et al., Google 2012): instead of resampling "
        "n rows with replacement (which needs global coordination), each "
        "row independently draws a Poisson(1) replicate weight, which is "
        "map-side and embarrassingly parallel. Weights come from a "
        "32-bit md5 hash of (doc_id, replicate) compared against "
        "PRECOMPUTED INTEGER inverse-CDF thresholds - no float CDF "
        "evaluation, so replicate membership is bit-equal across "
        "engines; replicate means are exact-integer-sum IEEE divisions, "
        "and the CI is positional selection (ranks 3/98 of 100 "
        "replicate means). Scale shape: the 100x row expansion is the "
        "algorithm's stated cost and is pure map-side; everything "
        "reduces through one 100-group aggregate."
    ),
)
def t01_poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    reps = docs.select(
        "doc_id",
        "n_chars",
        F.explode(F.sequence(F.lit(0), F.lit(99))).alias("b"),
    ).select(
        "n_chars",
        "b",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit("-"),
                        F.col("b").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("u"),
    )
    w = F.lit(9)
    for k in range(len(_POIS1_T) - 1, -1, -1):
        w = F.when(F.col("u") < _POIS1_T[k], k).otherwise(w)
    means = (
        reps.select("b", "n_chars", w.alias("w"))
        .groupBy("b")
        .agg(
            (
                F.sum(F.col("w") * F.col("n_chars")).cast("double")
                / F.sum("w").cast("double")
            ).alias("mean_b")
        )
    )
    ranked = means.select(
        "mean_b", F.row_number().over(W.orderBy("mean_b", "b")).alias("rn")
    )
    ci = ranked.agg(
        F.min(F.when(F.col("rn") == 3, F.col("mean_b"))).alias("boot_lo"),
        F.min(F.when(F.col("rn") == 98, F.col("mean_b"))).alias("boot_hi"),
    )
    base = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias(
            "mean_chars"
        ),
    )
    return base.crossJoin(F.broadcast(ci)).select(
        "n_docs",
        "mean_chars",
        F.lit(100).cast("bigint").alias("n_replicates"),
        "boot_lo",
        "boot_hi",
    )


@register(
    "t03_weighted_median",
    """
    WITH wl AS (
      SELECT l_returnflag AS flag,
             CAST(l_extendedprice AS DECIMAL(18,6)) AS price,
             CAST(l_quantity AS DECIMAL(18,6)) AS qty
      FROM lineitem
    ),
    cum AS (
      SELECT flag, price,
             SUM(qty) OVER (PARTITION BY flag ORDER BY price
                            RANGE BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS cw,
             SUM(qty) OVER (PARTITION BY flag) AS tw
      FROM wl
    )
    SELECT flag,
           CAST(MIN(CASE WHEN 2 * cw >= tw THEN price END) AS DOUBLE)
             AS weighted_median,
           CAST(MAX(tw) AS DOUBLE) AS total_weight
    FROM cum GROUP BY flag ORDER BY flag
    """,
    tags=("tpch", "statistics", "percentile"),
    doc=(
        "Exact quantity-weighted median of extended price per return "
        "flag: the smallest price whose cumulative weight reaches half "
        "the total. The cumulative sum uses a RANGE frame (value-based, "
        "so tied prices all carry the same cumulative weight - the "
        "result is tie-order invariant, unlike a ROWS frame over an "
        "ambiguous sort) and DECIMAL accumulation, making the selection "
        "predicate 2*cw >= tw exact rational arithmetic on both "
        "engines. Extends s80 (unweighted positional median) to the "
        "weighted case every sampling/pricing pipeline needs. One "
        "shuffle to order within flag; O(rows) window, no self-join."
    ),
)
def t03_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    dec = "decimal(18,6)"
    wl = li.select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").cast(dec).alias("price"),
        F.col("l_quantity").cast(dec).alias("qty"),
    )
    wflag = W.partitionBy("flag")
    cum = wl.select(
        "flag",
        "price",
        F.sum("qty")
        .over(
            wflag.orderBy("price").rangeBetween(W.unboundedPreceding, 0)
        )
        .alias("cw"),
        F.sum("qty").over(wflag).alias("tw"),
    )
    return (
        cum.groupBy("flag")
        .agg(
            F.min(F.when(2 * F.col("cw") >= F.col("tw"), F.col("price")))
            .cast("double")
            .alias("weighted_median"),
            F.max("tw").cast("double").alias("total_weight"),
        )
        .orderBy("flag")
    )


@register(
    "t05_two_proportion_ab",
    """
    WITH u AS (
      SELECT user_id,
             ('0x' || substring(md5(user_id::VARCHAR), 1, 8))::BIGINT % 2
               AS grp,
             MAX(CASE WHEN event_type = 'purchase' AND value >= 150
                      THEN 1 ELSE 0 END) AS conv
      FROM events GROUP BY user_id
    ),
    g AS (
      SELECT SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS n_a,
             SUM(CASE WHEN grp = 0 THEN conv ELSE 0 END) AS c_a,
             SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS n_b,
             SUM(CASE WHEN grp = 1 THEN conv ELSE 0 END) AS c_b
      FROM u
    )
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(c_a AS BIGINT) AS conv_a,
           CAST(n_b AS BIGINT) AS n_b, CAST(c_b AS BIGINT) AS conv_b,
           CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS p_a,
           CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS p_b,
           (CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE)
            - CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE))
           / sqrt((CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
                  * (1 - CAST(c_a + c_b AS DOUBLE)
                         / CAST(n_a + n_b AS DOUBLE))
                  * (1.0 / CAST(n_a AS DOUBLE)
                     + 1.0 / CAST(n_b AS DOUBLE))) AS z_score
    FROM g
    """,
    tags=("events", "experimentation", "hypothesis-test"),
    doc=(
        "Two-proportion z-test on user conversion (any purchase of "
        "value >= 150 - a partial-rate outcome on this corpus) "
        "between deterministic hash-split A/B cohorts - the workhorse "
        "of online experimentation, completing the hypothesis-test "
        "family (s70 KS, s71 Mann-Whitney, r59 chi-square). Assignment "
        "is md5(user_id) % 2 (reproducible across runs/engines, the "
        "q77 split discipline); all counts are exact integer "
        "aggregates; the pooled-variance z statistic is one "
        "identically-spelled IEEE expression (/,-,*,sqrt are "
        "correctly-rounded - no libm, no quantization needed). Two "
        "map-side-combinable aggregations, single-row output."
    ),
)
def t05_two_proportion_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") >= 150),
                1,
            ).otherwise(0)
        ).alias("conv")
    ).select(
        hash_cohort(F.col("user_id")).alias("grp"),
        "conv",
    )
    g = u.agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("grp") == 0, F.col("conv")).otherwise(0)).alias(
            "c_a"
        ),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("grp") == 1, F.col("conv")).otherwise(0)).alias(
            "c_b"
        ),
    )
    na, ca = F.col("n_a").cast("double"), F.col("c_a").cast("double")
    nb, cb = F.col("n_b").cast("double"), F.col("c_b").cast("double")
    p_pool = (F.col("c_a") + F.col("c_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    z = (ca / na - cb / nb) / F.sqrt(
        p_pool * (1 - p_pool) * (F.lit(1.0) / na + F.lit(1.0) / nb)
    )
    return g.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("c_a").cast("bigint").alias("conv_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.col("c_b").cast("bigint").alias("conv_b"),
        (ca / na).alias("p_a"),
        (cb / nb).alias("p_b"),
        z.alias("z_score"),
    )


@register(
    "t06_chatterjee_xi",
    """
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day,
             COUNT(*) FILTER (WHERE event_type = 'view') AS x,
             COUNT(*) FILTER (WHERE event_type = 'purchase') AS y
      FROM events GROUP BY day
    ),
    rk AS (
      SELECT day, x, y,
             COUNT(*) OVER (ORDER BY y RANGE BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS r,
             COUNT(*) OVER (ORDER BY y DESC RANGE BETWEEN UNBOUNDED
                            PRECEDING AND CURRENT ROW) AS l,
             COUNT(*) OVER () AS n
      FROM daily
    ),
    seq AS (
      SELECT r, l, n, LEAD(r) OVER (ORDER BY x, day) AS r_next
      FROM rk
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_days,
           1.0 - CAST(MAX(n) AS DOUBLE)
                 * CAST(SUM(abs(r_next - r)) AS DOUBLE)
                 / (2.0 * CAST(SUM(l * (n - l)) AS DOUBLE)) AS xi
    FROM seq
    """,
    tags=("events", "statistics", "correlation"),
    doc=(
        "Chatterjee's xi rank correlation (JASA 2021) between daily "
        "view and purchase counts - the modern dependence coefficient "
        "that, unlike Pearson (s93) or rank-linear measures, detects "
        "ANY functional relationship (xi -> 1 iff y is a measurable "
        "function of x). The ties-aware estimator xi = 1 - n*sum|r_(i+1)"
        "-r_i| / (2*sum l_i(n-l_i)) is computed entirely from integer "
        "ranks: r_i and l_i are tie-inclusive cumulative counts via "
        "RANGE frames (value-based, so tied y days agree on both "
        "engines), the x-order walk breaks x ties deterministically by "
        "day, and the final statistic is one IEEE expression over "
        "exact integer sums. O(days) after the daily collapse."
    ),
)
def t06_chatterjee_xi(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.when(F.col("event_type") == "view", 1)).alias("x"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("y"),
    )
    rk = daily.select(
        "day",
        "x",
        "y",
        F.count(F.lit(1))
        .over(W.orderBy("y").rangeBetween(W.unboundedPreceding, 0))
        .alias("r"),
        F.count(F.lit(1))
        .over(
            W.orderBy(F.col("y").desc()).rangeBetween(
                W.unboundedPreceding, 0
            )
        )
        .alias("l"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("n"),
    )
    seq = rk.select(
        "r",
        "l",
        "n",
        F.lead("r").over(W.orderBy("x", "day")).alias("r_next"),
    )
    return seq.agg(
        F.max("n").cast("bigint").alias("n_days"),
        (
            F.lit(1.0)
            - F.max("n").cast("double")
            * F.sum(F.abs(F.col("r_next") - F.col("r"))).cast("double")
            / (
                F.lit(2.0)
                * F.sum(F.col("l") * (F.col("n") - F.col("l"))).cast(
                    "double"
                )
            )
        ).alias("xi"),
    )


@register(
    "t07_capture_recapture",
    """
    WITH b AS (SELECT CAST(min(ts) AS DATE) AS d0 FROM events),
    u AS (
      SELECT user_id,
             MAX(CASE WHEN date_diff('day', b.d0, CAST(ts AS DATE))
                      BETWEEN 0 AND 6 THEN 1 ELSE 0 END) AS s1,
             MAX(CASE WHEN date_diff('day', b.d0, CAST(ts AS DATE))
                      BETWEEN 7 AND 13 THEN 1 ELSE 0 END) AS s2
      FROM events CROSS JOIN b GROUP BY user_id
    )
    SELECT CAST(SUM(s1) AS BIGINT) AS n1,
           CAST(SUM(s2) AS BIGINT) AS n2,
           CAST(SUM(s1 * s2) AS BIGINT) AS n_both,
           CAST(floor((CAST(SUM(s1) + 1 AS DOUBLE)
                       * CAST(SUM(s2) + 1 AS DOUBLE))
                      / CAST(SUM(s1 * s2) + 1 AS DOUBLE))
                AS BIGINT) - 1 AS est_population,
           COUNT(*) AS n_observed_total
    FROM u
    """,
    tags=("events", "statistics", "estimation"),
    doc=(
        "Capture-recapture population estimate: treat week 1 and week "
        "2 of activity as two independent 'captures' of the user "
        "population and estimate the TRUE population size from the "
        "overlap via the Chapman bias-corrected Lincoln-Petersen "
        "estimator (n1+1)(n2+1)/(m+1) - 1 (defined even at zero "
        "overlap). The same estimator audits dedup pipelines: two "
        "independent near-dup passes' overlap estimates the true "
        "duplicate count. Membership flags are exact integer MAX "
        "aggregates per user; the estimate is floor of one IEEE "
        "division of integers. Two aggregations, no joins beyond the "
        "broadcast of the 1-row corpus-start date."
    ),
)
def t07_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    b = ev.agg(F.to_date(F.min("ts")).alias("d0"))
    dd = F.datediff(F.to_date(F.col("ts")), F.col("d0"))
    u = (
        ev.crossJoin(F.broadcast(b))
        .groupBy("user_id")
        .agg(
            F.max(F.when(dd.between(0, 6), 1).otherwise(0)).alias("s1"),
            F.max(F.when(dd.between(7, 13), 1).otherwise(0)).alias("s2"),
        )
    )
    n1, n2 = F.sum("s1"), F.sum("s2")
    m = F.sum(F.col("s1") * F.col("s2"))
    return u.agg(
        n1.cast("bigint").alias("n1"),
        n2.cast("bigint").alias("n2"),
        m.cast("bigint").alias("n_both"),
        (
            F.floor(
                ((n1 + 1).cast("double") * (n2 + 1).cast("double"))
                / (m + 1).cast("double")
            ).cast("bigint")
            - 1
        ).alias("est_population"),
        F.count(F.lit(1)).alias("n_observed_total"),
    )


@register(
    "t09_mann_kendall_trend",
    """
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day, COUNT(*) AS x
      FROM events GROUP BY day
    ),
    pairs AS (
      SELECT CASE WHEN b.x > a.x THEN 1
                  WHEN b.x < a.x THEN -1 ELSE 0 END AS sgn
      FROM daily a JOIN daily b ON b.day > a.day
    ),
    s AS (SELECT SUM(sgn) AS s_stat, (SELECT COUNT(*) FROM daily) AS n
          FROM pairs),
    ties AS (
      SELECT COALESCE(SUM(c * (c - 1) * (2 * c + 5)), 0) AS tie_term
      FROM (SELECT COUNT(*) AS c FROM daily GROUP BY x) g
      WHERE c > 1
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           CAST(s_stat AS BIGINT) AS s_stat,
           (CAST(n * (n - 1) * (2 * n + 5) - tie_term AS DOUBLE)) / 18.0
             AS variance,
           CASE WHEN s_stat > 0 THEN
                  CAST(s_stat - 1 AS DOUBLE)
                  / sqrt((CAST(n * (n - 1) * (2 * n + 5) - tie_term
                               AS DOUBLE)) / 18.0)
                WHEN s_stat < 0 THEN
                  CAST(s_stat + 1 AS DOUBLE)
                  / sqrt((CAST(n * (n - 1) * (2 * n + 5) - tie_term
                               AS DOUBLE)) / 18.0)
                ELSE 0.0 END AS z_score
    FROM s CROSS JOIN ties
    """,
    tags=("events", "time-series", "hypothesis-test"),
    doc=(
        "Mann-Kendall nonparametric trend test on the daily event-count "
        "series: S = sum over day pairs of sign(x_j - x_i), with the "
        "tie-corrected variance n(n-1)(2n+5)/18 - sum t(t-1)(2t+5)/18 "
        "and the continuity-corrected z. The monotone-trend companion "
        "to t06 (dependence) and r57 (OLS slope): distribution-free, "
        "robust to outliers. S and the tie term are pure integers; "
        "variance and z are one identically-spelled IEEE expression. "
        "The pair join is over the DAILY series - O(days^2) with days "
        "bounded by the calendar, independent of event volume; the "
        "heavy reduction (events -> days) happens first."
    ),
)
def t09_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import _persist

    ev = t(spark, sf_dir, "events")
    # persisted: feeds 4 plan branches (both self-join sides, n, ties)
    # — without it each branch re-scans and re-aggregates the events
    # fact (the t67 fan-out lesson, stats.py round-6 review)
    daily = _persist(
        ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
            F.count(F.lit(1)).alias("x")
        )
    )
    a, b = daily.alias("a"), daily.alias("b")
    sgn = (
        F.when(F.col("b.x") > F.col("a.x"), 1)
        .when(F.col("b.x") < F.col("a.x"), -1)
        .otherwise(0)
    )
    s = a.join(b, F.col("b.day") > F.col("a.day")).agg(
        F.sum(sgn).alias("s_stat")
    )
    n_row = daily.agg(F.count(F.lit(1)).alias("n"))
    ties = (
        daily.groupBy("x")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .agg(
            F.coalesce(
                F.sum(
                    F.col("c") * (F.col("c") - 1) * (2 * F.col("c") + 5)
                ),
                F.lit(0),
            ).alias("tie_term")
        )
    )
    joined = s.crossJoin(F.broadcast(n_row)).crossJoin(F.broadcast(ties))
    n, ss = F.col("n"), F.col("s_stat")
    var = (
        (n * (n - 1) * (2 * n + 5) - F.col("tie_term")).cast("double")
        / 18.0
    )
    z = (
        F.when(ss > 0, (ss - 1).cast("double") / F.sqrt(var))
        .when(ss < 0, (ss + 1).cast("double") / F.sqrt(var))
        .otherwise(0.0)
    )
    return joined.select(
        n.cast("bigint").alias("n_days"),
        ss.cast("bigint").alias("s_stat"),
        var.alias("variance"),
        z.alias("z_score"),
    )


@register(
    "t10_theil_sen_slope",
    """
    WITH daily AS (
      SELECT ROW_NUMBER() OVER (ORDER BY date_trunc('day', ts)) AS i,
             COUNT(*) AS x
      FROM events GROUP BY date_trunc('day', ts)
    ),
    slopes AS (
      SELECT a.i AS i, b.i AS j,
             CAST(b.x - a.x AS DOUBLE) / CAST(b.i - a.i AS DOUBLE) AS m
      FROM daily a JOIN daily b ON b.i > a.i
    ),
    ranked AS (
      SELECT m, ROW_NUMBER() OVER (ORDER BY m, i, j) AS rn,
             COUNT(*) OVER () AS k
      FROM slopes
    )
    SELECT CAST(MAX(k) AS BIGINT) AS n_pairs,
           (MIN(CASE WHEN rn = (k + 1) // 2 THEN m END)
            + MIN(CASE WHEN rn = (k + 2) // 2 THEN m END)) / 2.0
             AS theil_sen_slope
    FROM ranked
    """,
    tags=("events", "time-series", "robust-statistics"),
    doc=(
        "Theil-Sen robust trend slope of the daily event-count series: "
        "the median of all pairwise slopes (y_j - y_i)/(j - i) - the "
        "29%-breakdown-point companion to the Mann-Kendall test (t09), "
        "immune to the outlier days that drag an OLS fit (r57). Each "
        "slope is one IEEE division of exact integers; the median is "
        "positional selection over a deterministic (slope, i, j) order "
        "(s80 discipline), averaging the middle two for even counts. "
        "O(days^2) pairs AFTER the daily collapse - bounded by the "
        "calendar, not the event volume."
    ),
)
def t10_theil_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).alias("x")
    ).select(
        F.row_number().over(W.orderBy("day")).alias("i"), "x"
    )
    a, b = daily.alias("a"), daily.alias("b")
    slopes = a.join(b, F.col("b.i") > F.col("a.i")).select(
        F.col("a.i").alias("i"),
        F.col("b.i").alias("j"),
        (
            (F.col("b.x") - F.col("a.x")).cast("double")
            / (F.col("b.i") - F.col("a.i")).cast("double")
        ).alias("m"),
    )
    return positional_median(
        slopes,
        "m",
        alias="theil_sen_slope",
        tiebreak=("i", "j"),
        n_alias="n_pairs",
    )


@register(
    "t11_adamic_adar_linkpred",
    """
    WITH basket AS (
      -- per-key cap mirroring copurchase_edges(cap=64): bounds the
      -- wedge self-join at 64^2 rows/order on power-law data (TPC-H
      -- baskets <= 13, results unchanged)
      SELECT l_orderkey, l_partkey FROM (
        SELECT l_orderkey, l_partkey,
               ROW_NUMBER() OVER (
                 PARTITION BY l_orderkey
                 ORDER BY l_partkey, l_linenumber) AS rn
        FROM lineitem) WHERE rn <= 64
    ),
    pairs_raw AS (
      SELECT a.l_partkey AS p1, b.l_partkey AS p2
      FROM basket a JOIN basket b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING COUNT(*) >= 2
    ),
    adj AS (
      SELECT p1 AS u, p2 AS z FROM pairs_raw
      UNION ALL SELECT p2, p1 FROM pairs_raw
    ),
    deg AS (SELECT z, COUNT(*) AS d FROM adj GROUP BY z),
    -- hub cap: a common neighbor of degree > 50 contributes little
    -- AA weight but quadratic candidate pairs; drop it (documented)
    adj_capped AS (
      SELECT adj.u, adj.z, deg.d FROM adj JOIN deg USING (z)
      WHERE deg.d BETWEEN 2 AND 50
    ),
    cands AS (
      SELECT x.u AS u, y.u AS v,
             COUNT(*) AS n_common,
             SUM(CAST(round(1e9 / ln(CAST(x.d AS DOUBLE))) AS BIGINT))
               AS aa_q
      FROM adj_capped x JOIN adj_capped y
        ON y.z = x.z AND y.u > x.u
      GROUP BY x.u, y.u
    ),
    new_links AS (
      SELECT c.* FROM cands c
      LEFT JOIN pairs_raw e ON e.p1 = c.u AND e.p2 = c.v
      WHERE e.p1 IS NULL
    )
    SELECT u, v, CAST(n_common AS BIGINT) AS n_common,
           CAST(aa_q AS BIGINT) AS aa_score_q
    FROM new_links
    ORDER BY aa_score_q DESC, u, v
    LIMIT 15
    """,
    tags=("graph", "link-prediction", "market-basket"),
    doc=(
        "Adamic-Adar link prediction over the part co-purchase graph "
        "(same support>=2 edge set as s49): score non-adjacent part "
        "pairs by sum over common neighbors z of 1/ln(deg(z)) - "
        "low-degree shared neighbors are stronger evidence. The "
        "wedge-generating self-join is capped to neighbors of degree "
        "<= 50 (a hub contributes O(d^2) candidate pairs but only "
        "1/ln(d) weight each - the standard prune, stated in the "
        "output contract); existing edges are removed by anti-join. "
        "Weights are fixed-point round(1e9/ln(d)) BIGINTs (ln of an "
        "INTEGER degree, s90 discipline), so scores sum exactly and "
        "rank identically on both engines; top-15 via TakeOrdered."
    ),
)
def t11_adamic_adar_linkpred(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import _persist

    edges = _persist(copurchase_edges(spark, sf_dir))
    adj = edges.select(
        F.col("p1").alias("u"), F.col("p2").alias("z")
    ).unionAll(edges.select(F.col("p2").alias("u"), F.col("p1").alias("z")))
    deg = adj.groupBy("z").agg(F.count(F.lit(1)).alias("d"))
    # Persist the hub-capped adjacency: it feeds BOTH sides of the
    # wedge self-join below — uncached, the union + degree join runs
    # twice (guide §5). Short (z, u, d) rows, bounded by the cap.
    adj_capped = _persist(adj.join(deg, "z").filter(F.col("d").between(2, 50)))
    x, y = adj_capped.alias("x"), adj_capped.alias("y")
    aa_w = F.round(
        F.lit(1e9) / F.log(F.col("x.d").cast("double"))
    ).cast("bigint")
    cands = (
        x.join(
            y,
            (F.col("y.z") == F.col("x.z")) & (F.col("y.u") > F.col("x.u")),
        )
        .groupBy(F.col("x.u").alias("u"), F.col("y.u").alias("v"))
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.sum(aa_w).alias("aa_q"),
        )
    )
    new_links = cands.join(
        edges,
        (F.col("p1") == F.col("u")) & (F.col("p2") == F.col("v")),
        "left_anti",
    )
    return (
        new_links.select(
            "u",
            "v",
            F.col("n_common").cast("bigint").alias("n_common"),
            F.col("aa_q").cast("bigint").alias("aa_score_q"),
        )
        .orderBy(F.desc("aa_score_q"), "u", "v")
        .limit(15)
    )


@register(
    "t12_weekday_seasonality",
    """
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day, COUNT(*) AS x
      FROM events GROUP BY day
    ),
    byday AS (
      SELECT isodow(day) AS dow, COUNT(*) AS n_w,
             CAST(SUM(x) AS BIGINT) AS sum_w
      FROM daily GROUP BY dow
    ),
    tot AS (
      SELECT COUNT(*) AS n_all, CAST(SUM(x) AS BIGINT) AS sum_all
      FROM daily
    )
    SELECT CAST(dow AS INT) AS iso_weekday,
           CAST(n_w AS BIGINT) AS n_days,
           CAST(sum_w AS DOUBLE) / CAST(n_w AS DOUBLE) AS mean_events,
           CAST(sum_w * n_all AS DOUBLE)
             / CAST(n_w * sum_all AS DOUBLE) AS seasonal_index
    FROM byday CROSS JOIN tot
    ORDER BY iso_weekday
    """,
    tags=("events", "time-series", "seasonality"),
    doc=(
        "Weekday seasonality index: mean daily event count per ISO "
        "weekday divided by the overall daily mean - the multiplicative "
        "seasonal factor used to deseasonalize KPI series before trend "
        "tests like t09/t10. Spark's weekday() (0=Monday) maps to "
        "DuckDB's isodow (1=Monday) by +1, pinned cross-engine. The "
        "index is (sum_w * n_all)/(n_w * sum_all): integer products, "
        "ONE IEEE division - exact, no intermediate float means. Two "
        "tiny aggregates off the daily collapse."
    ),
)
def t12_weekday_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).alias("x")
    )
    byday = daily.groupBy(
        (F.weekday("day") + 1).alias("dow")
    ).agg(
        F.count(F.lit(1)).alias("n_w"),
        F.sum("x").cast("bigint").alias("sum_w"),
    )
    tot = daily.agg(
        F.count(F.lit(1)).alias("n_all"),
        F.sum("x").cast("bigint").alias("sum_all"),
    )
    return (
        byday.crossJoin(F.broadcast(tot))
        .select(
            F.col("dow").cast("int").alias("iso_weekday"),
            F.col("n_w").cast("bigint").alias("n_days"),
            (F.col("sum_w").cast("double") / F.col("n_w").cast("double")).alias(
                "mean_events"
            ),
            (
                (F.col("sum_w") * F.col("n_all")).cast("double")
                / (F.col("n_w") * F.col("sum_all")).cast("double")
            ).alias("seasonal_index"),
        )
        .orderBy("iso_weekday")
    )


@register(
    "t13_fano_burstiness",
    """
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day, COUNT(*) AS x
      FROM events GROUP BY event_type, day
    ),
    mom AS (
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(x) AS BIGINT) AS s,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM daily GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean_daily,
           (CAST(n * sxx - s * s AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE))
             / (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) AS fano_factor
    FROM mom WHERE n > 1 ORDER BY event_type
    """,
    tags=("events", "time-series", "statistics"),
    doc=(
        "Fano factor (index of dispersion) of the daily count series "
        "per event type: sample variance over mean. 1 = Poisson-like "
        "arrivals, >1 = bursty/overdispersed, <1 = regular - the "
        "single-number burstiness monitor that pairs with s30's "
        "per-user regularity audit and flags event types whose traffic "
        "is clumping (incidents, bots, batch replays). All moments are "
        "exact integer aggregates off the daily collapse; the statistic "
        "is one identically-spelled IEEE expression. Two "
        "map-side-combinable aggregations, no joins."
    ),
)
def t13_fano_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("x"))
    mom = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("bigint").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    n, s, sxx = F.col("n"), F.col("s"), F.col("sxx")
    mean = s.cast("double") / n.cast("double")
    var = (n * sxx - s * s).cast("double") / (n * (n - 1)).cast("double")
    return (
        mom.filter(n > 1)
        .select(
            "event_type",
            n.cast("bigint").alias("n_days"),
            mean.alias("mean_daily"),
            (var / mean).alias("fano_factor"),
        )
        .orderBy("event_type")
    )


@register(
    "t14_skyline_pareto_frontier",
    """
    WITH pts AS (
      SELECT DISTINCT p_retailprice AS price, p_size AS size FROM part
    ),
    walk AS (
      SELECT price, size,
             MAX(size) OVER (ORDER BY price ASC, size DESC
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING) AS prev_max
      FROM pts
    )
    SELECT price, CAST(size AS INT) AS size
    FROM walk
    WHERE prev_max IS NULL OR size > prev_max
    ORDER BY price
    """,
    tags=("relational", "skyline", "operator"),
    doc=(
        "2D skyline (Pareto frontier) of parts: minimize price, "
        "maximize size - the classic SKYLINE OF operator (Borzsonyi et "
        "al., ICDE 2001) Spark has no native form of. The naive "
        "formulation is a quadratic NOT-EXISTS dominance anti-join; "
        "the 2D re-expression here is ONE sort: walk points in (price "
        "ASC, size DESC) order and keep a point iff its size exceeds "
        "the running max of every strictly-preceding row - equal-price "
        "ties sort larger-size first so the dominated twin is dropped, "
        "and exact (price, size) duplicates are collapsed by DISTINCT "
        "(documented convention). No arithmetic at all, so cross-engine "
        "equality is structural. At 100 TB: range-partition on price, "
        "per-partition skyline, then merge the per-partition frontiers "
        "- the standard distributed skyline; the global window here is "
        "over the DISTINCT value pairs."
    ),
)
def t14_skyline_pareto_frontier(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    pts = (
        t(spark, sf_dir, "part")
        .select(
            F.col("p_retailprice").alias("price"),
            F.col("p_size").alias("size"),
        )
        .distinct()
    )
    walk = pts.withColumn(
        "prev_max",
        F.max("size").over(
            W.orderBy(F.col("price").asc(), F.col("size").desc()).rowsBetween(
                W.unboundedPreceding, -1
            )
        ),
    )
    return (
        walk.filter(
            F.col("prev_max").isNull() | (F.col("size") > F.col("prev_max"))
        )
        .select("price", F.col("size").cast("int").alias("size"))
        .orderBy("price")
    )


@register(
    "t16_rfm_segmentation",
    """
    WITH bounds AS (SELECT CAST(max(ts) AS DATE) AS d1 FROM events),
    rfm AS (
      SELECT user_id,
             date_diff('day', CAST(max(ts) AS DATE),
                       (SELECT d1 FROM bounds)) AS recency,
             COUNT(*) AS frequency,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS monetary
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id
    ),
    scored AS (
      SELECT user_id,
             NTILE(5) OVER (ORDER BY recency DESC, user_id) AS r_score,
             NTILE(5) OVER (ORDER BY frequency ASC, user_id) AS f_score,
             NTILE(5) OVER (ORDER BY monetary ASC, user_id) AS m_score
      FROM rfm
    )
    SELECT CAST(r_score AS INT) AS r_score,
           CAST(f_score AS INT) AS f_score,
           CAST(m_score AS INT) AS m_score,
           COUNT(*) AS n_users
    FROM scored
    GROUP BY r_score, f_score, m_score
    ORDER BY r_score, f_score, m_score
    """,
    tags=("events", "segmentation", "marketing"),
    doc=(
        "RFM customer segmentation: quintile-score each purchasing "
        "user on Recency (days since last purchase - recent = high), "
        "Frequency and Monetary value, then census the 5x5x5 segment "
        "grid - the classic marketing/LTV segmentation, and the same "
        "shape a curation pipeline uses to tier contributors by "
        "activity. Recency counts from the corpus-end date (exact "
        "integer), monetary sums in DECIMAL; every NTILE orders with a "
        "user_id tie-break so bucket assignment is deterministic on "
        "both engines (NTILE's larger-earlier-bucket rule matches). "
        "One shuffle to score, one tiny grid aggregate."
    ),
)
def t16_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    bounds = ev.agg(F.to_date(F.max("ts")).alias("d1"))
    rfm = (
        ev.groupBy("user_id")
        .agg(
            F.to_date(F.max("ts")).alias("last_day"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("monetary"),
        )
        .crossJoin(F.broadcast(bounds))
        .select(
            "user_id",
            F.datediff(F.col("d1"), F.col("last_day")).alias("recency"),
            "frequency",
            "monetary",
        )
    )
    scored = rfm.select(
        F.ntile(5)
        .over(W.orderBy(F.col("recency").desc(), F.col("user_id")))
        .alias("r_score"),
        F.ntile(5)
        .over(W.orderBy(F.col("frequency").asc(), F.col("user_id")))
        .alias("f_score"),
        F.ntile(5)
        .over(W.orderBy(F.col("monetary").asc(), F.col("user_id")))
        .alias("m_score"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(
            F.col("r_score").cast("int").alias("r_score"),
            F.col("f_score").cast("int").alias("f_score"),
            F.col("m_score").cast("int").alias("m_score"),
            "n_users",
        )
        .orderBy("r_score", "f_score", "m_score")
    )


@register(
    "t17_degree_assortativity",
    """
    WITH basket AS (
      -- per-key cap mirroring copurchase_edges(cap=64): bounds the
      -- wedge self-join at 64^2 rows/order on power-law data (TPC-H
      -- baskets <= 13, results unchanged)
      SELECT l_orderkey, l_partkey FROM (
        SELECT l_orderkey, l_partkey,
               ROW_NUMBER() OVER (
                 PARTITION BY l_orderkey
                 ORDER BY l_partkey, l_linenumber) AS rn
        FROM lineitem) WHERE rn <= 64
    ),
    edges AS (
      SELECT a.l_partkey AS p1, b.l_partkey AS p2
      FROM basket a JOIN basket b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING COUNT(*) >= 2
    ),
    adj AS (
      SELECT p1 AS u, p2 AS v FROM edges
      UNION ALL SELECT p2, p1 FROM edges
    ),
    deg AS (SELECT u AS p, COUNT(*) AS d FROM adj GROUP BY u),
    de AS (
      SELECT du.d AS x, dv.d AS y
      FROM adj
      JOIN deg du ON du.p = adj.u
      JOIN deg dv ON dv.p = adj.v
    ),
    m AS (
      SELECT COUNT(*) AS k,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM de
    )
    SELECT CAST(k / 2 AS BIGINT) AS n_edges,
           (CAST(k AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
           / (CAST(k AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             AS assortativity
    FROM m
    """,
    tags=("graph", "statistics", "market-basket"),
    doc=(
        "Degree assortativity of the part co-purchase graph (same "
        "support>=2 edge set as s49/t11): the Pearson correlation of "
        "endpoint degrees over directed edge stubs (Newman 2002) - "
        "positive means hubs link to hubs, negative means hub-leaf "
        "structure, which predicts how the graph shatters under "
        "dedup/cleaning cuts. Over the symmetric stub list the x and y "
        "marginals coincide, so r = (k*Sxy - Sx^2)/(k*Sxx - Sx^2) with "
        "every S an exact integer aggregate and the statistic one "
        "identically-spelled IEEE expression. Joins are equi-keyed on "
        "part ids; no pair explosion beyond the bounded edge set."
    ),
)
def t17_degree_assortativity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.dedup import _persist

    edges = _persist(copurchase_edges(spark, sf_dir))
    adj = edges.select(
        F.col("p1").alias("u"), F.col("p2").alias("v")
    ).unionAll(edges.select(F.col("p2").alias("u"), F.col("p1").alias("v")))
    deg = adj.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    de = (
        adj.join(deg.select(F.col("u").alias("__u"), F.col("d").alias("x")),
                 F.col("u") == F.col("__u"))
        .join(deg.select(F.col("u").alias("__v"), F.col("d").alias("y")),
              F.col("v") == F.col("__v"))
        .select("x", "y")
    )
    m = de.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    k, sx = F.col("k").cast("double"), F.col("sx").cast("double")
    # symmetric stub list: the y marginal coincides with x, so the
    # assortativity is ols_slope with sy = sx
    r = ols_slope(
        k, sx, sx, F.col("sxy").cast("double"), F.col("sxx").cast("double")
    )
    return m.select(
        (F.col("k") / 2).cast("bigint").alias("n_edges"),
        r.alias("assortativity"),
    )


@register(
    "t18_wasserstein_distance",
    """
    WITH vals AS (
      SELECT value,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
      FROM events WHERE event_type IN ('purchase', 'click')
    ),
    tot AS (
      SELECT SUM(is_p) AS n1, SUM(1 - is_p) AS n2 FROM vals
    ),
    pts AS (
      SELECT value,
             SUM(is_p) AS c1_here, SUM(1 - is_p) AS c2_here
      FROM vals GROUP BY value
    ),
    walk AS (
      SELECT value,
             SUM(c1_here) OVER (ORDER BY value
                                ROWS UNBOUNDED PRECEDING) AS c1,
             SUM(c2_here) OVER (ORDER BY value
                                ROWS UNBOUNDED PRECEDING) AS c2,
             LEAD(value) OVER (ORDER BY value) AS next_value
      FROM pts
    ),
    terms AS (
      SELECT round(CAST(abs(c1 * t.n2 - c2 * t.n1) AS DOUBLE)
                   * (next_value - value)
                   / (CAST(t.n1 AS DOUBLE) * CAST(t.n2 AS DOUBLE)),
                   12) AS term
      FROM walk CROSS JOIN tot t
      WHERE next_value IS NOT NULL
    )
    SELECT (SELECT CAST(n1 AS BIGINT) FROM tot) AS n_purchase,
           (SELECT CAST(n2 AS BIGINT) FROM tot) AS n_click,
           CAST(SUM(CAST(term AS DECIMAL(38,15))) AS DOUBLE)
             AS wasserstein_1
    FROM terms
    """,
    tags=("events", "statistics", "drift"),
    doc=(
        "1D Wasserstein-1 (earth mover's) distance between the "
        "purchase and click value distributions: the integral of "
        "|ECDF1 - ECDF2|, computed as sum over adjacent distinct "
        "values of |c1*n2 - c2*n1|/(n1*n2) * gap. Where KS (s70) "
        "reports only the worst ECDF gap, W1 integrates the whole "
        "discrepancy - the drift metric of choice when small "
        "everywhere-shifts matter. The ECDF difference numerator is "
        "pure integer; each term is one IEEE expression rounded to 12 "
        "digits and summed in DECIMAL (the s69 PSI discipline), so "
        "the total is order-independent and bit-equal across engines. "
        "O(distinct values) after the per-value collapse, same shape "
        "as s70/s71."
    ),
)
def t18_wasserstein_distance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    vals = ev.select(
        "value",
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("is_p"),
    )
    tot = vals.agg(
        F.sum("is_p").alias("n1"),
        F.sum(1 - F.col("is_p")).alias("n2"),
    )
    pts = vals.groupBy("value").agg(
        F.sum("is_p").alias("c1_here"),
        F.sum(1 - F.col("is_p")).alias("c2_here"),
    )
    wv = W.orderBy("value").rowsBetween(W.unboundedPreceding, 0)
    walk = pts.select(
        "value",
        F.sum("c1_here").over(wv).alias("c1"),
        F.sum("c2_here").over(wv).alias("c2"),
        F.lead("value").over(W.orderBy("value")).alias("next_value"),
    )
    terms = (
        walk.crossJoin(F.broadcast(tot))
        .filter(F.col("next_value").isNotNull())
        .select(
            "n1",
            "n2",
            F.round(
                F.abs(
                    F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1")
                ).cast("double")
                * (F.col("next_value") - F.col("value"))
                / (F.col("n1").cast("double") * F.col("n2").cast("double")),
                12,
            ).alias("term"),
        )
    )
    return terms.agg(
        F.max("n1").cast("bigint").alias("n_purchase"),
        F.max("n2").cast("bigint").alias("n_click"),
        F.sum(F.col("term").cast("decimal(38,15)"))
        .cast("double")
        .alias("wasserstein_1"),
    )


@register(
    "t20_cuped_adjustment",
    """
    WITH b AS (SELECT CAST(min(ts) AS DATE) AS d0 FROM events),
    u AS (
      SELECT user_id,
             ('0x' || substring(md5(user_id::VARCHAR), 1, 8))::BIGINT % 2
               AS grp,
             SUM(CASE WHEN event_type = 'purchase'
                       AND date_diff('day', b.d0, CAST(ts AS DATE)) < 15
                      THEN CAST(round(value * 100) AS BIGINT)
                      ELSE 0 END) AS pre,
             SUM(CASE WHEN event_type = 'purchase'
                       AND date_diff('day', b.d0, CAST(ts AS DATE)) >= 15
                      THEN CAST(round(value * 100) AS BIGINT)
                      ELSE 0 END) AS post
      FROM events CROSS JOIN b GROUP BY user_id
    ),
    mom AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(pre) AS BIGINT) AS sp,
             CAST(SUM(post) AS BIGINT) AS ss,
             CAST(SUM(pre * pre) AS BIGINT) AS spp,
             CAST(SUM(post * post) AS BIGINT) AS sss,
             CAST(SUM(pre * post) AS BIGINT) AS sps,
             CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_a,
             CAST(SUM(CASE WHEN grp = 0 THEN pre ELSE 0 END) AS BIGINT)
               AS sp_a,
             CAST(SUM(CASE WHEN grp = 0 THEN post ELSE 0 END) AS BIGINT)
               AS ss_a,
             CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_b,
             CAST(SUM(CASE WHEN grp = 1 THEN pre ELSE 0 END) AS BIGINT)
               AS sp_b,
             CAST(SUM(CASE WHEN grp = 1 THEN post ELSE 0 END) AS BIGINT)
               AS ss_b
      FROM u
    )
    SELECT CAST(n AS BIGINT) AS n_users,
           (CAST(n AS DOUBLE) * CAST(sps AS DOUBLE)
            - CAST(sp AS DOUBLE) * CAST(ss AS DOUBLE))
           / (CAST(n AS DOUBLE) * CAST(spp AS DOUBLE)
              - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE)) AS theta,
           (CAST(ss_a AS DOUBLE) / CAST(n_a AS DOUBLE)
            - CAST(ss_b AS DOUBLE) / CAST(n_b AS DOUBLE)) / 100.0
             AS raw_delta,
           ((CAST(ss_a AS DOUBLE) / CAST(n_a AS DOUBLE)
             - CAST(ss_b AS DOUBLE) / CAST(n_b AS DOUBLE))
            - ((CAST(n AS DOUBLE) * CAST(sps AS DOUBLE)
                - CAST(sp AS DOUBLE) * CAST(ss AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(spp AS DOUBLE)
                  - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE)))
              * (CAST(sp_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                 - CAST(sp_b AS DOUBLE) / CAST(n_b AS DOUBLE))) / 100.0
             AS adjusted_delta,
           100.0 * (CAST(n AS DOUBLE) * CAST(sps AS DOUBLE)
                    - CAST(sp AS DOUBLE) * CAST(ss AS DOUBLE))
                 * (CAST(n AS DOUBLE) * CAST(sps AS DOUBLE)
                    - CAST(sp AS DOUBLE) * CAST(ss AS DOUBLE))
           / ((CAST(n AS DOUBLE) * CAST(spp AS DOUBLE)
               - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE))
              * (CAST(n AS DOUBLE) * CAST(sss AS DOUBLE)
                 - CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE)))
             AS var_reduction_pct
    FROM mom
    """,
    tags=("events", "experimentation", "variance-reduction"),
    doc=(
        "CUPED variance-reduced A/B comparison of per-user purchase "
        "spend (Deng et al., WSDM 2013): use each user's PRE-period "
        "spend (first 15 days) as the control covariate for the "
        "post-period metric, theta = cov(pre,post)/var(pre); the "
        "group-mean adjustment reduces metric variance by corr^2 - "
        "the technique every large experimentation platform runs to "
        "shrink confidence intervals without more traffic. Spend is "
        "integer CENTS (round(value*100)), so every moment is an "
        "exact integer aggregate (the global pre-mean cancels in the "
        "between-group difference, so no second per-user pass is "
        "needed); theta, deltas and the variance-reduction percentage "
        "are identically-spelled IEEE expressions. ONE aggregation "
        "over users after the per-user collapse."
    ),
)
def t20_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    b = ev.agg(F.to_date(F.min("ts")).alias("d0"))
    dd = F.datediff(F.to_date(F.col("ts")), F.col("d0"))
    cents = F.round(F.col("value") * 100).cast("bigint")
    is_p = F.col("event_type") == "purchase"
    u = (
        ev.crossJoin(F.broadcast(b))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(is_p & (dd < 15), cents).otherwise(0)).alias(
                "pre"
            ),
            F.sum(F.when(is_p & (dd >= 15), cents).otherwise(0)).alias(
                "post"
            ),
        )
        .select(
            hash_cohort(F.col("user_id")).alias("grp"),
            "pre",
            "post",
        )
    )
    g0, g1 = F.col("grp") == 0, F.col("grp") == 1
    mom = u.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("pre").cast("bigint").alias("sp"),
        F.sum("post").cast("bigint").alias("ss"),
        F.sum(F.col("pre") * F.col("pre")).cast("bigint").alias("spp"),
        F.sum(F.col("post") * F.col("post")).cast("bigint").alias("sss"),
        F.sum(F.col("pre") * F.col("post")).cast("bigint").alias("sps"),
        F.sum(F.when(g0, 1).otherwise(0)).cast("bigint").alias("n_a"),
        F.sum(F.when(g0, F.col("pre")).otherwise(0))
        .cast("bigint")
        .alias("sp_a"),
        F.sum(F.when(g0, F.col("post")).otherwise(0))
        .cast("bigint")
        .alias("ss_a"),
        F.sum(F.when(g1, 1).otherwise(0)).cast("bigint").alias("n_b"),
        F.sum(F.when(g1, F.col("pre")).otherwise(0))
        .cast("bigint")
        .alias("sp_b"),
        F.sum(F.when(g1, F.col("post")).otherwise(0))
        .cast("bigint")
        .alias("ss_b"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    cov_n = d("n") * d("sps") - d("sp") * d("ss")
    var_n = d("n") * d("spp") - d("sp") * d("sp")
    theta = cov_n / var_n
    raw = d("ss_a") / d("n_a") - d("ss_b") / d("n_b")
    pre_diff = d("sp_a") / d("n_a") - d("sp_b") / d("n_b")
    return mom.select(
        F.col("n").cast("bigint").alias("n_users"),
        theta.alias("theta"),
        (raw / 100.0).alias("raw_delta"),
        ((raw - theta * pre_diff) / 100.0).alias("adjusted_delta"),
        (
            100.0
            * cov_n
            * cov_n
            / (var_n * (d("n") * d("sss") - d("ss") * d("ss")))
        ).alias("var_reduction_pct"),
    )


@register(
    "t21_difference_in_differences",
    """
    WITH b AS (SELECT CAST(min(ts) AS DATE) AS d0 FROM events),
    cells AS (
      SELECT ('0x' || substring(md5(user_id::VARCHAR), 1, 8))::BIGINT % 2
               AS grp,
             CASE WHEN date_diff('day', b.d0, CAST(ts AS DATE)) < 15
                  THEN 0 ELSE 1 END AS period,
             COUNT(*) AS n,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events CROSS JOIN b
      WHERE event_type = 'purchase'
      GROUP BY grp, period
    ),
    wide AS (
      SELECT
        MIN(CASE WHEN grp = 1 AND period = 0
                 THEN CAST(cents AS DOUBLE) / CAST(n AS DOUBLE) END)
          AS t_pre,
        MIN(CASE WHEN grp = 1 AND period = 1
                 THEN CAST(cents AS DOUBLE) / CAST(n AS DOUBLE) END)
          AS t_post,
        MIN(CASE WHEN grp = 0 AND period = 0
                 THEN CAST(cents AS DOUBLE) / CAST(n AS DOUBLE) END)
          AS c_pre,
        MIN(CASE WHEN grp = 0 AND period = 1
                 THEN CAST(cents AS DOUBLE) / CAST(n AS DOUBLE) END)
          AS c_post
      FROM cells
    )
    SELECT t_pre / 100.0 AS treat_pre, t_post / 100.0 AS treat_post,
           c_pre / 100.0 AS control_pre, c_post / 100.0 AS control_post,
           ((t_post - t_pre) - (c_post - c_pre)) / 100.0
             AS did_estimate
    FROM wide
    """,
    tags=("events", "experimentation", "causal-inference"),
    doc=(
        "Difference-in-differences estimate of the treatment effect on "
        "mean purchase value: hash-split cohorts x pre/post periods "
        "(split at day 15), DiD = (treat_post - treat_pre) - "
        "(control_post - control_pre) - the workhorse quasi-"
        "experimental design when randomization alone can't rule out "
        "time trends; under A/A hashing the estimate should hover near "
        "zero, making this doubly useful as a pipeline health check. "
        "Cell sums are integer cents, cell means single IEEE "
        "divisions; one aggregation over purchase events, 4-cell "
        "pivot, single-row output."
    ),
)
def t21_difference_in_differences(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = t(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    b = ev.agg(F.to_date(F.min("ts")).alias("d0"))
    dd = F.datediff(F.to_date(F.col("ts")), F.col("d0"))
    cells = (
        ev.crossJoin(F.broadcast(b))
        .groupBy(
            hash_cohort(F.col("user_id")).alias("grp"),
            F.when(dd < 15, 0).otherwise(1).alias("period"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents"),
        )
    )
    mean = F.col("cents").cast("double") / F.col("n").cast("double")

    def cell(g, p, alias):
        return F.min(
            F.when((F.col("grp") == g) & (F.col("period") == p), mean)
        ).alias(alias)

    wide = cells.agg(
        cell(1, 0, "t_pre"),
        cell(1, 1, "t_post"),
        cell(0, 0, "c_pre"),
        cell(0, 1, "c_post"),
    )
    return wide.select(
        (F.col("t_pre") / 100.0).alias("treat_pre"),
        (F.col("t_post") / 100.0).alias("treat_post"),
        (F.col("c_pre") / 100.0).alias("control_pre"),
        (F.col("c_post") / 100.0).alias("control_post"),
        (
            (
                (F.col("t_post") - F.col("t_pre"))
                - (F.col("c_post") - F.col("c_pre"))
            )
            / 100.0
        ).alias("did_estimate"),
    )


@register(
    "t22_seasonal_residual_anomalies",
    """
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day, COUNT(*) AS x
      FROM events GROUP BY day
    ),
    idx AS (
      SELECT day, x, isodow(day) AS dow,
             ROW_NUMBER() OVER (ORDER BY day) AS i
      FROM daily
    ),
    fit AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(i) AS BIGINT) AS si,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(i * x) AS BIGINT) AS six,
             CAST(SUM(i * i) AS BIGINT) AS sii
      FROM idx
    ),
    dows AS (
      SELECT dow, COUNT(*) AS n_w, CAST(SUM(x) AS BIGINT) AS sum_w
      FROM idx GROUP BY dow
    ),
    pred AS (
      SELECT idx.day, idx.x, idx.i,
             -- trend a + b*i from exact integer moments
             (CAST(f.sx AS DOUBLE)
              - ((CAST(f.n AS DOUBLE) * CAST(f.six AS DOUBLE)
                  - CAST(f.si AS DOUBLE) * CAST(f.sx AS DOUBLE))
                 / (CAST(f.n AS DOUBLE) * CAST(f.sii AS DOUBLE)
                    - CAST(f.si AS DOUBLE) * CAST(f.si AS DOUBLE)))
                * CAST(f.si AS DOUBLE)) / CAST(f.n AS DOUBLE)
             + ((CAST(f.n AS DOUBLE) * CAST(f.six AS DOUBLE)
                 - CAST(f.si AS DOUBLE) * CAST(f.sx AS DOUBLE))
                / (CAST(f.n AS DOUBLE) * CAST(f.sii AS DOUBLE)
                   - CAST(f.si AS DOUBLE) * CAST(f.si AS DOUBLE)))
               * CAST(idx.i AS DOUBLE)
             -- additive weekday offset mean_w - mean_all
             + (CAST(d.sum_w * f.n - d.n_w * f.sx AS DOUBLE)
                / CAST(d.n_w * f.n AS DOUBLE)) AS predicted
      FROM idx
      JOIN dows d ON d.dow = isodow(idx.day)
      CROSS JOIN fit f
    ),
    resid AS (
      SELECT day, x, predicted,
             CAST(round((CAST(x AS DOUBLE) - predicted) * 1e6) AS BIGINT)
               AS rq
      FROM pred
    ),
    sd AS (
      SELECT COUNT(*) AS k,
             CAST(SUM(rq) AS BIGINT) AS sr,
             CAST(SUM(rq * rq) AS BIGINT) AS srr
      FROM resid
    )
    SELECT r.day, CAST(r.x AS BIGINT) AS n_events,
           r.predicted,
           (CAST(r.rq AS DOUBLE) / 1e6)
           / sqrt((CAST(s.k AS DOUBLE) * CAST(s.srr AS DOUBLE)
                   - CAST(s.sr AS DOUBLE) * CAST(s.sr AS DOUBLE))
                  / (CAST(s.k AS DOUBLE) * CAST(s.k - 1 AS DOUBLE))
                  / 1e12) AS z_score
    FROM resid r CROSS JOIN sd s
    WHERE abs(CAST(r.rq AS DOUBLE) / 1e6)
          > 2 * sqrt((CAST(s.k AS DOUBLE) * CAST(s.srr AS DOUBLE)
                      - CAST(s.sr AS DOUBLE) * CAST(s.sr AS DOUBLE))
                     / (CAST(s.k AS DOUBLE) * CAST(s.k - 1 AS DOUBLE))
                     / 1e12)
    ORDER BY r.day
    """,
    tags=("events", "time-series", "anomaly"),
    doc=(
        "Seasonal-plus-trend residual anomaly detection: fit the daily "
        "event-count series with an OLS linear trend (r57's exact "
        "integer moments) plus an ADDITIVE weekday offset (t12's "
        "seasonality as mean_w - mean_all), then flag days whose "
        "residual exceeds 2 residual-sigmas - the STL-lite "
        "decomposition that catches a bad day a raw z-score (r56) "
        "misses because weekends always look 'anomalous' without "
        "deseasonalization. Trend and offsets are IEEE expressions "
        "over exact integer moments; residuals are fixed-point "
        "round(r*1e6) BIGINTs so the residual variance is again exact "
        "integer arithmetic. One daily collapse, a 7-row equi-join, "
        "two scalar broadcasts."
    ),
)
def t22_seasonal_residual_anomalies(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).alias("x")
    )
    idx = daily.select(
        "day",
        "x",
        (F.weekday("day") + 1).alias("dow"),
        F.row_number().over(W.orderBy("day")).alias("i"),
    )
    fit = idx.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("i").cast("bigint").alias("si"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(F.col("i") * F.col("x")).cast("bigint").alias("six"),
        F.sum(F.col("i") * F.col("i")).cast("bigint").alias("sii"),
    )
    dows = idx.groupBy("dow").agg(
        F.count(F.lit(1)).alias("n_w"),
        F.sum("x").cast("bigint").alias("sum_w"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    slope = (d("n") * d("six") - d("si") * d("sx")) / (
        d("n") * d("sii") - d("si") * d("si")
    )
    intercept = (d("sx") - slope * d("si")) / d("n")
    offset = (
        (F.col("sum_w") * F.col("n") - F.col("n_w") * F.col("sx")).cast(
            "double"
        )
        / (F.col("n_w") * F.col("n")).cast("double")
    )
    pred = (
        idx.join(F.broadcast(dows), "dow")
        .crossJoin(F.broadcast(fit))
        .select(
            "day",
            "x",
            (intercept + slope * F.col("i").cast("double") + offset).alias(
                "predicted"
            ),
        )
    )
    resid = pred.select(
        "day",
        "x",
        "predicted",
        F.round((F.col("x").cast("double") - F.col("predicted")) * 1e6)
        .cast("bigint")
        .alias("rq"),
    )
    sd = resid.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("rq").cast("bigint").alias("sr"),
        F.sum(F.col("rq") * F.col("rq")).cast("bigint").alias("srr"),
    )
    sigma = F.sqrt(
        (d("k") * d("srr") - d("sr") * d("sr"))
        / (d("k") * (F.col("k") - 1).cast("double"))
        / 1e12
    )
    return (
        resid.crossJoin(F.broadcast(sd))
        .filter(F.abs(F.col("rq").cast("double") / 1e6) > 2 * sigma)
        .select(
            "day",
            F.col("x").cast("bigint").alias("n_events"),
            "predicted",
            ((F.col("rq").cast("double") / 1e6) / sigma).alias("z_score"),
        )
        .orderBy("day")
    )


@register(
    "t24_l_diversity_audit",
    """
    WITH groups AS (
      SELECT c_nationkey,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
             COUNT(*) AS k,
             COUNT(DISTINCT c_mktsegment) AS l
      FROM customer
      GROUP BY c_nationkey, bal_band
    )
    SELECT CAST(l AS BIGINT) AS distinct_sensitive,
           COUNT(*) AS n_groups,
           CAST(SUM(k) AS BIGINT) AS n_individuals
    FROM groups
    GROUP BY l ORDER BY l
    """,
    tags=("pipeline", "privacy", "audit"),
    doc=(
        "l-diversity audit complementing t02's k-anonymity: within "
        "each quasi-identifier group (nation, $1000 balance band), "
        "count DISTINCT values of the sensitive attribute (market "
        "segment) - a group can be k-anonymous yet still leak the "
        "sensitive value if everyone in it shares one segment "
        "(Machanavajjhala et al. 2006: the homogeneity attack). "
        "Output is the census of groups by their diversity level l; "
        "l=1 rows are the exposed populations. One grouped "
        "COUNT(DISTINCT) (two-phase shuffle, scale-safe) and a tiny "
        "histogram aggregate."
    ),
)
def t24_l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    groups = cust.groupBy(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("bal_band"),
    ).agg(
        F.count(F.lit(1)).alias("k"),
        F.countDistinct("c_mktsegment").alias("l"),
    )
    return (
        groups.groupBy(F.col("l").cast("bigint").alias("distinct_sensitive"))
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum("k").cast("bigint").alias("n_individuals"),
        )
        .orderBy("distinct_sensitive")
    )


@register(
    "t25_power_analysis",
    """
    WITH u AS (
      SELECT user_id,
             ('0x' || substring(md5(user_id::VARCHAR), 1, 8))::BIGINT % 2
               AS grp,
             MAX(CASE WHEN event_type = 'purchase' AND value >= 150
                      THEN 1 ELSE 0 END) AS conv
      FROM events GROUP BY user_id
    ),
    g AS (
      SELECT SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS n_a,
             SUM(CASE WHEN grp = 0 THEN conv ELSE 0 END) AS c_a,
             SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS n_b,
             SUM(CASE WHEN grp = 1 THEN conv ELSE 0 END) AS c_b
      FROM u
    ),
    p AS (
      SELECT CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS p1,
             CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS p2,
             CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE) AS pbar
      FROM g
    )
    SELECT p1 AS p_a, p2 AS p_b, p1 - p2 AS observed_delta,
           CAST(ceil(
             (1.96 * sqrt(2 * pbar * (1 - pbar))
              + 0.8416 * sqrt(p1 * (1 - p1) + p2 * (1 - p2)))
             * (1.96 * sqrt(2 * pbar * (1 - pbar))
                + 0.8416 * sqrt(p1 * (1 - p1) + p2 * (1 - p2)))
             / ((p1 - p2) * (p1 - p2))) AS BIGINT) AS n_per_arm_80pct,
           CAST(ceil(
             (1.96 * sqrt(2 * pbar * (1 - pbar))
              + 1.2816 * sqrt(p1 * (1 - p1) + p2 * (1 - p2)))
             * (1.96 * sqrt(2 * pbar * (1 - pbar))
                + 1.2816 * sqrt(p1 * (1 - p1) + p2 * (1 - p2)))
             / ((p1 - p2) * (p1 - p2))) AS BIGINT) AS n_per_arm_90pct
    FROM p
    """,
    tags=("events", "experimentation", "power-analysis"),
    doc=(
        "Prospective power analysis closing the experimentation loop "
        "(t05 test -> t20 CUPED -> here): given the observed "
        "conversion rates of the two hash cohorts, the classical "
        "two-proportion sample size n = (z_a*sqrt(2*pbar*qbar) + "
        "z_b*sqrt(p1q1 + p2q2))^2 / (p1-p2)^2 per arm to detect the "
        "observed delta at alpha=0.05 with 80% and 90% power "
        "(Fleiss). Normal quantiles are the textbook LITERALS 1.96 / "
        "0.8416 / 1.2816 (no erf needed, identical on both engines); "
        "rates come from exact integer counts; the whole formula is "
        "one IEEE expression with a final ceil. Single-row output "
        "from one user-level aggregation."
    ),
)
def t25_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") >= 150),
                1,
            ).otherwise(0)
        ).alias("conv")
    ).select(
        hash_cohort(F.col("user_id")).alias("grp"),
        "conv",
    )
    g = u.agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("grp") == 0, F.col("conv")).otherwise(0)).alias(
            "c_a"
        ),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("grp") == 1, F.col("conv")).otherwise(0)).alias(
            "c_b"
        ),
    )
    p1 = F.col("c_a").cast("double") / F.col("n_a").cast("double")
    p2 = F.col("c_b").cast("double") / F.col("n_b").cast("double")
    pbar = (F.col("c_a") + F.col("c_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")

    def n_arm(zb):
        num = F.lit(1.96) * F.sqrt(2 * pbar * (1 - pbar)) + F.lit(
            zb
        ) * F.sqrt(p1 * (1 - p1) + p2 * (1 - p2))
        return F.ceil(num * num / ((p1 - p2) * (p1 - p2))).cast("bigint")

    return g.select(
        p1.alias("p_a"),
        p2.alias("p_b"),
        (p1 - p2).alias("observed_delta"),
        n_arm(0.8416).alias("n_per_arm_80pct"),
        n_arm(1.2816).alias("n_per_arm_90pct"),
    )


@register(
    "t27_abc_analysis",
    """
    WITH rev AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(18,6))) AS revenue
      FROM lineitem GROUP BY l_partkey
    ),
    walk AS (
      SELECT l_partkey, revenue,
             SUM(revenue) OVER (ORDER BY revenue DESC, l_partkey
                                ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(revenue) OVER () AS total
      FROM rev
    ),
    classed AS (
      SELECT CASE WHEN 5 * cum <= 4 * total THEN 'A'
                  WHEN 20 * cum <= 19 * total THEN 'B'
                  ELSE 'C' END AS abc_class,
             revenue, total
      FROM walk
    )
    SELECT abc_class,
           COUNT(*) AS n_parts,
           CAST(SUM(revenue) AS DOUBLE) AS class_revenue,
           CAST(SUM(revenue) AS DOUBLE) / CAST(MAX(total) AS DOUBLE)
             AS revenue_share
    FROM classed GROUP BY abc_class ORDER BY abc_class
    """,
    tags=("tpch", "inventory", "pareto"),
    doc=(
        "ABC inventory classification: rank parts by revenue, class A "
        "= the head covering 80% of cumulative revenue, B to 95%, C "
        "the tail - the operations-management standard that s12's "
        "Pareto share stops short of (it reports the curve; this "
        "assigns and censuses the classes). Revenue accumulates in "
        "DECIMAL so the cumulative walk and the 0.80/0.95 boundary "
        "comparisons are exact rational arithmetic - no float "
        "boundary flicker between engines; the census and shares are "
        "integer counts and one IEEE division. At scale the ordered "
        "walk range-partitions on revenue with a per-partition offset "
        "pass (s73's pattern)."
    ),
)
def t27_abc_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(18,6)"
            )
        ).alias("revenue")
    )
    wwalk = W.orderBy(F.col("revenue").desc(), "l_partkey").rowsBetween(
        W.unboundedPreceding, 0
    )
    walk = rev.select(
        "revenue",
        F.sum("revenue").over(wwalk).alias("cum"),
        F.sum("revenue").over(W.partitionBy()).alias("total"),
    )
    # integer-scaled boundaries: a Python float literal (0.80 * total)
    # coerces the DECIMAL to DOUBLE on the Spark side while DuckDB keeps
    # exact DECIMAL, so a part within one double ulp of the boundary
    # could classify differently across engines; 5*cum <= 4*total is the
    # same predicate in exact decimal arithmetic on both
    abc = (
        F.when(5 * F.col("cum") <= 4 * F.col("total"), "A")
        .when(20 * F.col("cum") <= 19 * F.col("total"), "B")
        .otherwise("C")
    )
    return (
        walk.select(abc.alias("abc_class"), "revenue", "total")
        .groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("revenue").cast("double").alias("class_revenue"),
            (
                F.sum("revenue").cast("double")
                / F.max("total").cast("double")
            ).alias("revenue_share"),
        )
        .orderBy("abc_class")
    )


@register(
    "t28_bollinger_breakouts",
    """
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events WHERE event_type = 'purchase' GROUP BY day
    ),
    roll AS (
      SELECT day, cents,
             ROW_NUMBER() OVER (ORDER BY day) AS rn,
             SUM(cents) OVER (ORDER BY day
                              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
               AS s7,
             SUM(cents * cents) OVER (ORDER BY day
                              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
               AS ss7
      FROM daily
    )
    SELECT day,
           CAST(cents AS DOUBLE) / 100.0 AS revenue,
           CAST(s7 AS DOUBLE) / 7.0 / 100.0 AS ma7,
           (CAST(cents AS DOUBLE) - CAST(s7 AS DOUBLE) / 7.0)
           / sqrt((7.0 * CAST(ss7 AS DOUBLE)
                   - CAST(s7 AS DOUBLE) * CAST(s7 AS DOUBLE))
                  / (7.0 * 6.0)) AS band_z
    FROM roll
    WHERE rn >= 7
      AND abs(CAST(cents AS DOUBLE) - CAST(s7 AS DOUBLE) / 7.0)
          > 2 * sqrt((7.0 * CAST(ss7 AS DOUBLE)
                      - CAST(s7 AS DOUBLE) * CAST(s7 AS DOUBLE))
                     / (7.0 * 6.0))
    ORDER BY day
    """,
    tags=("events", "time-series", "anomaly"),
    doc=(
        "Bollinger-band breakout days for daily purchase revenue: a "
        "trailing 7-day moving mean and sample std (the band), "
        "flagging days outside mean +/- 2 sigma - the "
        "rolling-context anomaly monitor that complements the "
        "global-model detectors (r56 z-score, t22 seasonal "
        "residuals) by adapting to recent level shifts. Revenue is "
        "integer cents, the rolling sum/sum-of-squares are exact "
        "windowed integer aggregates, and the band math is one "
        "identically-spelled IEEE expression - no incremental float "
        "state to diverge. O(days) after the daily collapse."
    ),
)
def t28_bollinger_breakouts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = t(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    w7 = W.orderBy("day").rowsBetween(-6, 0)
    roll = daily.select(
        "day",
        "cents",
        F.row_number().over(W.orderBy("day")).alias("rn"),
        F.sum("cents").over(w7).alias("s7"),
        F.sum(F.col("cents") * F.col("cents")).over(w7).alias("ss7"),
    )
    c, s7, ss7 = (
        F.col("cents").cast("double"),
        F.col("s7").cast("double"),
        F.col("ss7").cast("double"),
    )
    sigma = F.sqrt((7.0 * ss7 - s7 * s7) / (7.0 * 6.0))
    return (
        roll.filter(
            (F.col("rn") >= 7) & (F.abs(c - s7 / 7.0) > 2 * sigma)
        )
        .select(
            "day",
            (c / 100.0).alias("revenue"),
            (s7 / 7.0 / 100.0).alias("ma7"),
            ((c - s7 / 7.0) / sigma).alias("band_z"),
        )
        .orderBy("day")
    )


@register(
    "t29_runs_test",
    """
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day, COUNT(*) AS x
      FROM events GROUP BY day
    ),
    med AS (
      SELECT CAST(SUM(CASE WHEN rn IN ((n + 1) // 2, (n + 2) // 2)
                           THEN x ELSE 0 END) AS DOUBLE)
             / CAST(SUM(CASE WHEN rn IN ((n + 1) // 2, (n + 2) // 2)
                             THEN 1 ELSE 0 END) AS DOUBLE) AS m
      FROM (
        SELECT x, ROW_NUMBER() OVER (ORDER BY x, day) AS rn,
               COUNT(*) OVER () AS n
        FROM daily
      )
    ),
    signs AS (
      SELECT day, CASE WHEN CAST(x AS DOUBLE) > m.m THEN 1 ELSE -1 END
               AS s
      FROM daily CROSS JOIN med m
      WHERE CAST(x AS DOUBLE) <> m.m
    ),
    runs AS (
      SELECT s, LAG(s) OVER (ORDER BY day) AS prev_s FROM signs
    ),
    agg AS (
      SELECT SUM(CASE WHEN prev_s IS NULL OR s <> prev_s
                      THEN 1 ELSE 0 END) AS r,
             SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS n1,
             SUM(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS n2
      FROM runs
    )
    SELECT CAST(r AS BIGINT) AS n_runs,
           CAST(n1 AS BIGINT) AS n_above,
           CAST(n2 AS BIGINT) AS n_below,
           (CAST(r AS DOUBLE)
            - (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
               / CAST(n1 + n2 AS DOUBLE) + 1.0))
           / sqrt(2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                  * (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                     - CAST(n1 AS DOUBLE) - CAST(n2 AS DOUBLE))
                  / (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 AS DOUBLE)
                     * CAST(n1 + n2 - 1 AS DOUBLE))) AS z_score
    FROM agg
    """,
    tags=("events", "time-series", "hypothesis-test"),
    doc=(
        "Wald-Wolfowitz runs test for randomness of the daily "
        "event-count series: dichotomize days above/below the median "
        "(median-equal days dropped, the standard convention), count "
        "sign runs, and compare against the null mean 2*n1*n2/(n1+n2) "
        "+ 1 - too FEW runs means level-shift clustering, too many "
        "means oscillation; either invalidates the i.i.d. assumption "
        "the other monitors lean on. The median is s80's positional "
        "selection, runs and counts are exact integers from one "
        "ordered walk over the daily collapse, and z is one IEEE "
        "expression."
    ),
)
def t29_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).alias("x")
    )
    med = positional_median(daily, "x", alias="m", tiebreak=("day",))
    signs = (
        daily.crossJoin(F.broadcast(med))
        .filter(F.col("x").cast("double") != F.col("m"))
        .select(
            "day",
            F.when(F.col("x").cast("double") > F.col("m"), 1)
            .otherwise(-1)
            .alias("s"),
        )
    )
    runs = signs.select(
        "s", F.lag("s").over(W.orderBy("day")).alias("prev_s")
    )
    agg = runs.agg(
        F.sum(
            F.when(
                F.col("prev_s").isNull() | (F.col("s") != F.col("prev_s")),
                1,
            ).otherwise(0)
        ).alias("r"),
        F.sum(F.when(F.col("s") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("s") == -1, 1).otherwise(0)).alias("n2"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    ntot = (F.col("n1") + F.col("n2")).cast("double")
    two_n1n2 = 2.0 * d("n1") * d("n2")
    mu = two_n1n2 / ntot + 1.0
    var = (
        two_n1n2
        * (two_n1n2 - d("n1") - d("n2"))
        / (ntot * ntot * (F.col("n1") + F.col("n2") - 1).cast("double"))
    )
    return agg.select(
        F.col("r").cast("bigint").alias("n_runs"),
        F.col("n1").cast("bigint").alias("n_above"),
        F.col("n2").cast("bigint").alias("n_below"),
        ((d("r") - mu) / F.sqrt(var)).alias("z_score"),
    )


@register(
    "t30_hellinger_distance",
    """
    WITH binned AS (
      SELECT LEAST(CAST(floor(value / 25) AS BIGINT), 15) AS bin,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
      FROM events WHERE event_type IN ('purchase', 'click')
    ),
    cells AS (
      SELECT bin, SUM(is_p) AS c1, SUM(1 - is_p) AS c2
      FROM binned GROUP BY bin
    ),
    tot AS (SELECT SUM(c1) AS n1, SUM(c2) AS n2 FROM cells),
    terms AS (
      SELECT round(sqrt(CAST(c1 * c2 AS DOUBLE)), 6) AS bc_term
      FROM cells
    )
    SELECT (SELECT CAST(n1 AS BIGINT) FROM tot) AS n_purchase,
           (SELECT CAST(n2 AS BIGINT) FROM tot) AS n_click,
           round(sqrt(1 - CAST(SUM(CAST(bc_term AS DECIMAL(38,10)))
                               AS DOUBLE)
                          / sqrt((SELECT CAST(n1 AS DOUBLE) FROM tot)
                                 * (SELECT CAST(n2 AS DOUBLE) FROM tot))),
                 9) AS hellinger
    FROM terms
    """,
    tags=("events", "statistics", "drift"),
    doc=(
        "Hellinger distance between the purchase and click value "
        "histograms ($25 bins, top-coded at bin 15): H = sqrt(1 - "
        "sum sqrt(p_i * q_i)), the bounded-in-[0,1] f-divergence "
        "that, unlike PSI (s69), never blows up on empty bins and, "
        "unlike KS/W1 (s70/t18), is shape-based rather than "
        "CDF-based - the third lens in the drift toolkit. The "
        "Bhattacharyya terms are sqrt of integer PRODUCTS (sqrt is "
        "correctly-rounded IEEE - no libm risk), rounded to 6 and "
        "summed in DECIMAL, then one final normalize/sqrt rounded to "
        "9. Two map-side aggregations over a fixed 16-bin grid."
    ),
)
def t30_hellinger_distance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    binned = ev.select(
        F.least(
            F.floor(F.col("value") / 25).cast("bigint"), F.lit(15)
        ).alias("bin"),
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("is_p"),
    )
    cells = binned.groupBy("bin").agg(
        F.sum("is_p").alias("c1"),
        F.sum(1 - F.col("is_p")).alias("c2"),
    )
    tot = cells.agg(
        F.sum("c1").alias("n1"), F.sum("c2").alias("n2")
    )
    terms = cells.select(
        F.round(
            F.sqrt((F.col("c1") * F.col("c2")).cast("double")), 6
        ).alias("bc_term")
    )
    bc_sum = F.sum(F.col("bc_term").cast("decimal(38,10)")).cast("double")
    return (
        terms.agg(bc_sum.alias("bc"))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("n1").cast("bigint").alias("n_purchase"),
            F.col("n2").cast("bigint").alias("n_click"),
            F.round(
                F.sqrt(
                    1
                    - F.col("bc")
                    / F.sqrt(
                        F.col("n1").cast("double")
                        * F.col("n2").cast("double")
                    )
                ),
                9,
            ).alias("hellinger"),
        )
    )


@register(
    "t31_shapley_attribution",
    """
    WITH fp AS (
      SELECT user_id, min(ts) AS first_purchase
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    masks AS (
      SELECT e.user_id,
             CAST(MAX(CASE WHEN e.event_type = 'view'
                           AND (fp.first_purchase IS NULL
                                OR e.ts < fp.first_purchase)
                      THEN 1 ELSE 0 END)
             + MAX(CASE WHEN e.event_type = 'click'
                        AND (fp.first_purchase IS NULL
                             OR e.ts < fp.first_purchase)
                      THEN 2 ELSE 0 END)
             + MAX(CASE WHEN e.event_type = 'signup'
                        AND (fp.first_purchase IS NULL
                             OR e.ts < fp.first_purchase)
                      THEN 4 ELSE 0 END)
             + MAX(CASE WHEN e.event_type = 'error'
                        AND (fp.first_purchase IS NULL
                             OR e.ts < fp.first_purchase)
                      THEN 8 ELSE 0 END) AS BIGINT) AS mask,
             MAX(CASE WHEN e.event_type = 'purchase'
                      THEN 1 ELSE 0 END) AS conv
      FROM events e LEFT JOIN fp ON fp.user_id = e.user_id
      GROUP BY e.user_id
    ),
    observed AS (
      SELECT mask, COUNT(*) AS n, SUM(conv) AS c FROM masks GROUP BY mask
    ),
    grid AS (
      SELECT g.mask,
             COALESCE(CAST(o.c AS DOUBLE) / CAST(o.n AS DOUBLE), 0.0)
               AS v
      FROM (SELECT unnest(range(16)) AS mask) g
      LEFT JOIN observed o ON o.mask = g.mask
    ),
    channels AS (
      SELECT * FROM (VALUES ('view', 1), ('click', 2),
                            ('signup', 4), ('error', 8)) AS t(ch, bit)
    ),
    terms AS (
      SELECT c.ch,
             CASE bit_count(g1.mask)
                  WHEN 0 THEN 0.25 WHEN 1 THEN 1.0 / 12
                  WHEN 2 THEN 1.0 / 12 WHEN 3 THEN 0.25 END
             * (g2.v - g1.v) AS term
      FROM channels c
      JOIN grid g1 ON (g1.mask & c.bit) = 0
      JOIN grid g2 ON g2.mask = g1.mask + c.bit
    )
    SELECT ch AS channel,
           CAST(SUM(CAST(round(term * 1e9) AS BIGINT)) AS DOUBLE) / 1e9
             AS shapley_value
    FROM terms GROUP BY ch ORDER BY ch
    """,
    tags=("events", "attribution", "game-theory"),
    doc=(
        "Shapley-value marketing attribution: treat the four "
        "non-purchase event types a user emits BEFORE first purchase "
        "as a coalition of channels, the characteristic function "
        "v(S) = observed conversion rate of users with exactly "
        "channel-set S (v=0 for unobserved sets, stated), and credit "
        "each channel its exact Shapley value - the only attribution "
        "satisfying efficiency/symmetry/additivity axioms, and the "
        "principled upgrade over s18's last-touch. With 4 channels "
        "the 16-subset game is EXACT (weights k!(4-k-1)!/4! as the "
        "literal fractions 0.25 and 1/12): the subset grid is 16 "
        "rows, masks are bit arithmetic on exact integer aggregates, "
        "marginal-contribution terms are fixed-point summed. The "
        "corpus-scale work is one per-user collapse; everything "
        "after is constant-size."
    ),
)
def t31_shapley_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    fp = ev.filter(F.col("event_type") == "purchase").groupBy(
        "user_id"
    ).agg(F.min("ts").alias("first_purchase"))
    pre = F.col("first_purchase").isNull() | (
        F.col("ts") < F.col("first_purchase")
    )

    def bit(ch, b):
        return F.max(
            F.when((F.col("event_type") == ch) & pre, b).otherwise(0)
        )

    masks = (
        ev.join(fp, "user_id", "left")
        .groupBy("user_id")
        .agg(
            (bit("view", 1) + bit("click", 2) + bit("signup", 4)
             + bit("error", 8)).cast("bigint").alias("mask"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("conv"),
        )
    )
    observed = masks.groupBy("mask").agg(
        F.count(F.lit(1)).alias("n"), F.sum("conv").alias("c")
    )
    grid = (
        spark.range(16)
        .select(F.col("id").alias("mask"))
        .join(F.broadcast(observed), "mask", "left")
        .select(
            "mask",
            F.coalesce(
                F.col("c").cast("double") / F.col("n").cast("double"),
                F.lit(0.0),
            ).alias("v"),
        )
    )
    channels = spark.createDataFrame(
        [("view", 1), ("click", 2), ("signup", 4), ("error", 8)],
        ["ch", "bit"],
    )
    g1 = grid.select(F.col("mask").alias("m1"), F.col("v").alias("v1"))
    g2 = grid.select(F.col("mask").alias("m2"), F.col("v").alias("v2"))
    weight = (
        F.when(F.bit_count(F.col("m1")) == 0, 0.25)
        .when(F.bit_count(F.col("m1")) == 1, F.lit(1.0) / 12)
        .when(F.bit_count(F.col("m1")) == 2, F.lit(1.0) / 12)
        .when(F.bit_count(F.col("m1")) == 3, 0.25)
    )
    terms = (
        channels.join(g1, F.col("m1").bitwiseAND(F.col("bit")) == 0)
        .join(g2, F.col("m2") == F.col("m1") + F.col("bit"))
        .select(
            "ch", (weight * (F.col("v2") - F.col("v1"))).alias("term")
        )
    )
    return (
        terms.groupBy(F.col("ch").alias("channel"))
        .agg(
            (
                F.sum(F.round(F.col("term") * 1e9).cast("bigint")).cast(
                    "double"
                )
                / 1e9
            ).alias("shapley_value")
        )
        .orderBy("channel")
    )


@register(
    "t33_forecast_backtest",
    """
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS rev
      FROM events WHERE event_type IN ('purchase', 'click')
      GROUP BY event_type, day
    ),
    indexed AS (
      SELECT event_type, rev,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
               AS i,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM daily
    ),
    -- one-step-ahead SES forecast for every origin t >= 7: the
    -- closed-form unrolling (s92) evaluated per origin via a
    -- bounded (t, i<=t) pair join over the daily collapse
    fcst AS (
      SELECT o.event_type, o.i AS t,
             SUM(round(0.3 * pow(0.7, CAST(o.i - h.i AS BIGINT))
                       * h.rev, 9))
             + SUM(CASE WHEN h.i = 1
                        THEN round(pow(0.7, CAST(o.i AS BIGINT))
                                   * h.rev, 9)
                        ELSE 0 END) AS yhat
      FROM indexed o
      JOIN indexed h ON h.event_type = o.event_type AND h.i <= o.i
      WHERE o.i >= 7 AND o.i < o.n
      GROUP BY o.event_type, o.i
    ),
    errs AS (
      SELECT f.event_type,
             round(abs(a.rev - CAST(f.yhat AS DOUBLE)), 6) AS abs_err
      FROM fcst f
      JOIN indexed a ON a.event_type = f.event_type AND a.i = f.t + 1
    )
    SELECT event_type,
           COUNT(*) AS n_forecasts,
           CAST(SUM(CAST(abs_err AS DECIMAL(28,10))) AS DOUBLE)
             / COUNT(*) AS mae
    FROM errs GROUP BY event_type ORDER BY event_type
    """,
    tags=("events", "time-series", "forecast", "evaluation"),
    doc=(
        "Rolling-origin backtest of the SES forecaster (s92): for "
        "every origin day t >= 7, produce the one-step-ahead forecast "
        "from the prefix [1..t] via the same closed-form unrolling, "
        "compare against day t+1's actual, and report per-type MAE - "
        "the evaluation harness that tells you whether a forecasting "
        "operator is WORTH deploying, expressed as dataflow (no "
        "serial refit loop: each origin's forecast is an independent "
        "weighted aggregate, all origins computed in one bounded "
        "(t, i<=t) pair join over the daily collapse - O(days^2) "
        "with days bounded by the calendar). Decay terms follow "
        "s92's round-9 discipline; absolute errors round to 6 and "
        "sum in DECIMAL, so the MAE is order-independent."
    ),
)
def t33_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double")
        .alias("rev")
    )
    from ..operators.dedup import _persist

    wtype = W.partitionBy("event_type")
    # persisted: feeds 3-4 plan branches (both pair-join sides, the
    # actuals join, the naive lag) — each would otherwise re-scan and
    # re-aggregate the events fact (the t67 fan-out lesson)
    indexed = _persist(
        daily.select(
            "event_type",
            "rev",
            F.row_number().over(wtype.orderBy("day")).alias("i"),
            F.count(F.lit(1)).over(wtype).alias("n"),
        )
    )
    o = indexed.alias("o")
    h = indexed.alias("h")
    w_term, init_term = ses_terms(F.col("o.i"), F.col("h.i"), F.col("h.rev"))
    fcst = (
        o.join(
            h,
            (F.col("h.event_type") == F.col("o.event_type"))
            & (F.col("h.i") <= F.col("o.i")),
        )
        .filter((F.col("o.i") >= 7) & (F.col("o.i") < F.col("o.n")))
        .groupBy(F.col("o.event_type").alias("event_type"),
                 F.col("o.i").alias("t"))
        .agg((F.sum(w_term) + F.sum(init_term)).alias("yhat"))
    )
    a = indexed.alias("a")
    errs = fcst.join(
        a,
        (F.col("a.event_type") == fcst["event_type"])
        & (F.col("a.i") == F.col("t") + 1),
    ).select(
        fcst["event_type"].alias("event_type"),
        F.round(
            F.abs(F.col("a.rev") - F.col("yhat").cast("double")), 6
        ).alias("abs_err"),
    )
    return (
        errs.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_forecasts"),
            (
                F.sum(F.col("abs_err").cast("decimal(28,10)")).cast(
                    "double"
                )
                / F.count(F.lit(1))
            ).alias("mae"),
        )
        .orderBy("event_type")
    )


@register(
    "t34_discount_elasticity",
    """
    WITH rows_x AS (
      SELECT CAST(round(l_discount * 100) AS BIGINT) AS x,
             CAST(l_quantity AS DECIMAL(18,6)) AS y
      FROM lineitem
    ),
    mom AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             SUM(y) AS sy,
             SUM(x * y) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM rows_x
    )
    SELECT CAST(n AS BIGINT) AS n_lineitems,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             AS qty_per_discount_pt,
           (CAST(sy AS DOUBLE)
            - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
              * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)
             AS base_qty
    FROM mom
    """,
    tags=("tpch", "econometrics", "regression"),
    doc=(
        "Discount elasticity of order quantity: row-level OLS of "
        "quantity on the discount level (in whole points, "
        "round(l_discount*100)) across all lineitems - does a deeper "
        "discount actually move volume? The demand-curve slope that "
        "pricing analytics starts from. x is an exact integer, y and "
        "the cross-moment x*y accumulate in DECIMAL, so all five "
        "regression moments are exact and order-independent; slope "
        "and intercept are identically-spelled IEEE expressions. ONE "
        "map-side-combinable aggregation over the fact table - no "
        "shuffle beyond the single-row reduce."
    ),
)
def t34_discount_elasticity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    rows_x = li.select(
        F.round(F.col("l_discount") * 100).cast("bigint").alias("x"),
        F.col("l_quantity").cast("decimal(18,6)").alias("y"),
    )
    mom = rows_x.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    slope = (d("n") * d("sxy") - d("sx") * d("sy")) / (
        d("n") * d("sxx") - d("sx") * d("sx")
    )
    return mom.select(
        F.col("n").cast("bigint").alias("n_lineitems"),
        slope.alias("qty_per_discount_pt"),
        ((d("sy") - slope * d("sx")) / d("n")).alias("base_qty"),
    )


@register(
    "t35_revenue_bridge",
    """
    WITH b AS (SELECT CAST(min(ts) AS DATE) AS d0 FROM events),
    cells AS (
      SELECT event_type,
             CASE WHEN date_diff('day', b.d0, CAST(ts AS DATE)) < 15
                  THEN 0 ELSE 1 END AS period,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events CROSS JOIN b GROUP BY event_type, period
    ),
    wide AS (
      SELECT event_type,
             CAST(SUM(CASE WHEN period = 0 THEN cents ELSE 0 END)
                  AS BIGINT) AS c1,
             CAST(SUM(CASE WHEN period = 1 THEN cents ELSE 0 END)
                  AS BIGINT) AS c2
      FROM cells GROUP BY event_type
    ),
    tot AS (SELECT SUM(c2 - c1) AS total_delta FROM wide)
    SELECT w.event_type,
           CAST(w.c1 AS DOUBLE) / 100.0 AS first_half,
           CAST(w.c2 AS DOUBLE) / 100.0 AS second_half,
           CAST(w.c2 - w.c1 AS DOUBLE) / 100.0 AS delta,
           CAST(w.c2 - w.c1 AS DOUBLE) / CAST(t.total_delta AS DOUBLE)
             AS share_of_change
    FROM wide w CROSS JOIN tot t
    ORDER BY w.event_type
    """,
    tags=("events", "kpi", "decomposition"),
    doc=(
        "Revenue bridge (waterfall decomposition): split the corpus "
        "at day 15 and attribute the total half-over-half value "
        "change to each event type - the 'why did the number move' "
        "decomposition every KPI review starts with, with the "
        "accounting identity sum(per-segment delta) = total delta "
        "holding EXACTLY because all cells are integer cents. One "
        "aggregation, a per-segment pivot, and a 1-row total "
        "broadcast; shares are single IEEE divisions."
    ),
)
def t35_revenue_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    b = ev.agg(F.to_date(F.min("ts")).alias("d0"))
    period = F.when(
        F.datediff(F.to_date(F.col("ts")), F.col("d0")) < 15, 0
    ).otherwise(1)
    cents = F.round(F.col("value") * 100).cast("bigint")
    cells = (
        ev.crossJoin(F.broadcast(b))
        .groupBy("event_type", period.alias("period"))
        .agg(F.sum(cents).cast("bigint").alias("cents"))
    )
    wide = cells.groupBy("event_type").agg(
        F.sum(F.when(F.col("period") == 0, F.col("cents")).otherwise(0))
        .cast("bigint")
        .alias("c1"),
        F.sum(F.when(F.col("period") == 1, F.col("cents")).otherwise(0))
        .cast("bigint")
        .alias("c2"),
    )
    tot = wide.agg(
        F.sum(F.col("c2") - F.col("c1")).alias("total_delta")
    )
    return (
        wide.crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            (F.col("c1").cast("double") / 100.0).alias("first_half"),
            (F.col("c2").cast("double") / 100.0).alias("second_half"),
            ((F.col("c2") - F.col("c1")).cast("double") / 100.0).alias(
                "delta"
            ),
            (
                (F.col("c2") - F.col("c1")).cast("double")
                / F.col("total_delta").cast("double")
            ).alias("share_of_change"),
        )
        .orderBy("event_type")
    )


@register(
    "t37_simpson_paradox_detector",
    """
    WITH u AS (
      SELECT user_id,
             ('0x' || substring(md5(user_id::VARCHAR), 1, 8))::BIGINT % 2
               AS grp,
             COUNT(*) AS activity,
             MAX(CASE WHEN event_type = 'purchase' AND value >= 150
                      THEN 1 ELSE 0 END) AS conv
      FROM events GROUP BY user_id
    ),
    strat AS (
      SELECT grp, conv,
             NTILE(4) OVER (ORDER BY activity, user_id) AS stratum
      FROM u
    ),
    cells AS (
      SELECT stratum,
             SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS n_a,
             SUM(CASE WHEN grp = 0 THEN conv ELSE 0 END) AS c_a,
             SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS n_b,
             SUM(CASE WHEN grp = 1 THEN conv ELSE 0 END) AS c_b
      FROM strat GROUP BY stratum
    ),
    overall AS (
      SELECT SUM(c_a) * SUM(n_b) - SUM(c_b) * SUM(n_a) AS num
      FROM cells
    )
    SELECT CAST(c.stratum AS INT) AS activity_quartile,
           CAST(c.c_a AS DOUBLE) / CAST(c.n_a AS DOUBLE) AS p_a,
           CAST(c.c_b AS DOUBLE) / CAST(c.n_b AS DOUBLE) AS p_b,
           -- sign comparison, never the PRODUCT of the two cross
           -- terms: each is O(n_users^2/16), so their product blows
           -- through int64 at ~10M users and ANSI/DuckDB abort
           CASE WHEN ((c.c_a * c.n_b - c.c_b * c.n_a) < 0 AND o.num > 0)
                  OR ((c.c_a * c.n_b - c.c_b * c.n_a) > 0 AND o.num < 0)
                THEN 1 ELSE 0 END AS sign_flips_vs_overall
    FROM cells c CROSS JOIN overall o
    ORDER BY activity_quartile
    """,
    tags=("events", "experimentation", "diagnostics"),
    doc=(
        "Simpson's-paradox detector for the A/B comparison: compare "
        "the SIGN of the conversion-rate difference within each "
        "user-activity quartile against the overall sign - a stratum "
        "whose effect direction flips means the aggregate number is "
        "confounded by activity mix and the experiment readout (t05) "
        "cannot be trusted without stratification. Sign comparison "
        "uses the cross-multiplied INTEGER numerator c_a*n_b - "
        "c_b*n_a (no float rate subtraction near zero), so the flip "
        "flag is exact on both engines; strata come from a "
        "deterministic NTILE with user_id tie-break. One user-level "
        "collapse, a 4-cell census, a 1-row overall broadcast."
    ),
)
def t37_simpson_paradox_detector(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("activity"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") >= 150),
                1,
            ).otherwise(0)
        ).alias("conv"),
    ).select(
        hash_cohort(F.col("user_id")).alias("grp"),
        "conv",
        "activity",
        "user_id",
    )
    strat = u.select(
        "grp",
        "conv",
        F.ntile(4).over(W.orderBy("activity", "user_id")).alias("stratum"),
    )
    cells = strat.groupBy("stratum").agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("grp") == 0, F.col("conv")).otherwise(0)).alias(
            "c_a"
        ),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("grp") == 1, F.col("conv")).otherwise(0)).alias(
            "c_b"
        ),
    )
    overall = cells.agg(
        (
            F.sum("c_a") * F.sum("n_b") - F.sum("c_b") * F.sum("n_a")
        ).alias("num")
    )
    strat_num = F.col("c_a") * F.col("n_b") - F.col("c_b") * F.col("n_a")
    return (
        cells.crossJoin(F.broadcast(overall))
        .select(
            F.col("stratum").cast("int").alias("activity_quartile"),
            (F.col("c_a").cast("double") / F.col("n_a").cast("double")).alias(
                "p_a"
            ),
            (F.col("c_b").cast("double") / F.col("n_b").cast("double")).alias(
                "p_b"
            ),
            # sign comparison, never the product (each cross term is
            # O(n_users^2/16); the product overflows int64 at ~10M
            # users and ANSI aborts the job)
            F.when(
                ((strat_num < 0) & (F.col("num") > 0))
                | ((strat_num > 0) & (F.col("num") < 0)),
                1,
            )
            .otherwise(0)
            .alias("sign_flips_vs_overall"),
        )
        .orderBy("activity_quartile")
    )


@register(
    "t38_effective_diversity",
    f"""
    WITH toks AS (
      SELECT source, unnest(string_split(lower({_NORM}), ' ')) AS tok
      FROM documents
    ),
    counts AS (
      SELECT source, COUNT(*) AS c FROM toks WHERE tok <> ''
      GROUP BY source
    ),
    tot AS (SELECT SUM(c) AS n, COUNT(*) AS s FROM counts),
    -- H = ln(N) - sum(c_i * ln(c_i)) / N : ln of INTEGERS only
    terms AS (
      SELECT CAST(SUM(c * (CAST(round(ln(CAST(c AS DOUBLE)) * 1e6)
                                AS BIGINT))) AS BIGINT) AS sq
      FROM counts
    )
    SELECT CAST(t.s AS BIGINT) AS n_sources,
           CAST(t.n AS BIGINT) AS n_tokens,
           round(ln(CAST(t.n AS DOUBLE))
                 - CAST(terms.sq AS DOUBLE) / 1e6
                   / CAST(t.n AS DOUBLE), 9) AS shannon_entropy,
           round(exp(ln(CAST(t.n AS DOUBLE))
                     - CAST(terms.sq AS DOUBLE) / 1e6
                       / CAST(t.n AS DOUBLE)), 9) AS effective_sources
    FROM tot t CROSS JOIN terms
    """,
    tags=("text", "corpus-statistics", "diversity"),
    doc=(
        "Effective source diversity of the token mixture: Shannon "
        "entropy of per-source token shares and its exponential - "
        "Hill number N1, the 'effective number of equally-sized "
        "sources' (Jost 2006) - the single number a mixture designer "
        "tracks so that one giant crawl doesn't silently dominate "
        "the training mix (20 sources with N1=3 is a 3-source diet). "
        "The identity H = ln(N) - sum(c_i ln c_i)/N keeps every ln "
        "argument an INTEGER (s90 discipline; the share-ratio form "
        "would take ln of rationals); the weighted sum is exact "
        "integer fixed-point, with one final exp rounded to 9. One "
        "token-stream aggregation."
    ),
)
def t38_effective_diversity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..functions.text import norm_ws

    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        F.explode(F.split(F.lower(norm_ws(F.col("text"))), " ")).alias(
            "tok"
        ),
    ).filter(F.col("tok") != "")
    counts = toks.groupBy("source").agg(F.count(F.lit(1)).alias("c"))
    tot = counts.agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("s")
    )
    terms = counts.agg(
        F.sum(
            F.col("c")
            * F.round(F.log(F.col("c").cast("double")) * 1e6).cast(
                "bigint"
            )
        )
        .cast("bigint")
        .alias("sq")
    )
    h = F.log(F.col("n").cast("double")) - F.col("sq").cast(
        "double"
    ) / 1e6 / F.col("n").cast("double")
    return (
        tot.crossJoin(F.broadcast(terms))
        .select(
            F.col("s").cast("bigint").alias("n_sources"),
            F.col("n").cast("bigint").alias("n_tokens"),
            F.round(h, 9).alias("shannon_entropy"),
            exp9(h).alias("effective_sources"),
        )
    )


@register(
    "t40_loo_target_encoding",
    """
    WITH c AS (
      SELECT c_nationkey,
             CAST(round(c_acctbal * 100) AS BIGINT) AS cents
      FROM customer
    ),
    g AS (
      SELECT c_nationkey, COUNT(*) AS n,
             CAST(SUM(cents) AS BIGINT) AS s,
             CAST(MIN(cents) AS BIGINT) AS mn,
             CAST(MAX(cents) AS BIGINT) AS mx
      FROM c GROUP BY c_nationkey
    )
    SELECT CAST(c_nationkey AS INT) AS nation,
           CAST(n AS BIGINT) AS n_customers,
           CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 AS mean_balance,
           CAST(s - mn AS DOUBLE) / CAST(n - 1 AS DOUBLE) / 100.0
             AS loo_encoding_max,
           CAST(s - mx AS DOUBLE) / CAST(n - 1 AS DOUBLE) / 100.0
             AS loo_encoding_min
    FROM g WHERE n > 1 ORDER BY nation
    """,
    tags=("pipeline", "feature-engineering", "ml"),
    doc=(
        "Leave-one-out target encoding audit: the ML feature that "
        "replaces a categorical (nation) with the mean of the target "
        "(account balance) computed EXCLUDING the row itself - the "
        "standard leakage guard (a plain group mean leaks each row's "
        "own target into its feature). The audit form reports, per "
        "category, the plain mean and the LOO encoding's exact range "
        "((S-min)/(n-1), (S-max)/(n-1)) - all from integer-cent "
        "aggregates, so no per-row second pass is needed and the "
        "leakage spread is visible at a glance (wide range = "
        "small-n categories where LOO matters most). One grouped "
        "aggregation, map-side combinable."
    ),
)
def t40_loo_target_encoding(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    c = cust.select(
        "c_nationkey",
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("cents"),
    )
    g = c.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").cast("bigint").alias("s"),
        F.min("cents").cast("bigint").alias("mn"),
        F.max("cents").cast("bigint").alias("mx"),
    )
    d = lambda c_: F.col(c_).cast("double")  # noqa: E731
    return (
        g.filter(F.col("n") > 1)
        .select(
            F.col("c_nationkey").cast("int").alias("nation"),
            F.col("n").cast("bigint").alias("n_customers"),
            (d("s") / d("n") / 100.0).alias("mean_balance"),
            (
                (F.col("s") - F.col("mn")).cast("double")
                / (F.col("n") - 1).cast("double")
                / 100.0
            ).alias("loo_encoding_max"),
            (
                (F.col("s") - F.col("mx")).cast("double")
                / (F.col("n") - 1).cast("double")
                / 100.0
            ).alias("loo_encoding_min"),
        )
        .orderBy("nation")
    )


@register(
    "t41_new_vs_returning",
    """
    WITH firsts AS (
      SELECT user_id, date_trunc('day', min(ts)) AS first_day
      FROM events GROUP BY user_id
    ),
    dau AS (
      SELECT date_trunc('day', ts) AS day, user_id
      FROM events GROUP BY day, user_id
    )
    SELECT d.day,
           COUNT(*) AS dau,
           CAST(SUM(CASE WHEN f.first_day = d.day THEN 1 ELSE 0 END)
                AS BIGINT) AS new_users,
           CAST(SUM(CASE WHEN f.first_day <> d.day THEN 1 ELSE 0 END)
                AS BIGINT) AS returning_users
    FROM dau d JOIN firsts f ON f.user_id = d.user_id
    GROUP BY d.day ORDER BY d.day
    """,
    tags=("events", "kpi", "growth"),
    doc=(
        "Daily active users decomposed into new vs returning via each "
        "user's first-touch day - the growth-accounting split behind "
        "every DAU chart (is growth acquisition or retention?), "
        "complementing s31's cumulative curve and s74's distinct "
        "counting with the daily NEW/RETURNING classification. Two "
        "user-keyed aggregations and one equi-join on user_id; all "
        "counts exact integers. The first-touch table is the same "
        "re-expression trick as s74 - no window over raw events."
    ),
)
def t41_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("first_day")
    )
    dau = ev.select(
        F.date_trunc("day", "ts").alias("day"), "user_id"
    ).distinct()
    return (
        dau.join(firsts, "user_id")
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("dau"),
            F.sum(
                F.when(F.col("first_day") == F.col("day"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("new_users"),
            F.sum(
                F.when(F.col("first_day") != F.col("day"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("returning_users"),
        )
        .orderBy("day")
    )


@register(
    "t42_kendall_tau",
    """
    WITH parts AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(18,6))) AS rev,
             SUM(CAST(l_quantity AS DECIMAL(18,6))) AS qty
      FROM lineitem GROUP BY l_partkey
    ),
    classed AS (
      SELECT CASE WHEN (a.rev < b.rev AND a.qty < b.qty)
                    OR (a.rev > b.rev AND a.qty > b.qty) THEN 'c'
                  WHEN (a.rev < b.rev AND a.qty > b.qty)
                    OR (a.rev > b.rev AND a.qty < b.qty) THEN 'd'
                  WHEN a.rev = b.rev AND a.qty = b.qty THEN 'txy'
                  WHEN a.rev = b.rev THEN 'tx'
                  ELSE 'ty' END AS cls
      FROM parts a JOIN parts b ON a.l_partkey < b.l_partkey
    ),
    agg AS (
      SELECT SUM(CASE WHEN cls = 'c' THEN 1 ELSE 0 END) AS c,
             SUM(CASE WHEN cls = 'd' THEN 1 ELSE 0 END) AS d,
             SUM(CASE WHEN cls = 'tx' THEN 1 ELSE 0 END) AS tx,
             SUM(CASE WHEN cls = 'ty' THEN 1 ELSE 0 END) AS ty
      FROM classed
    )
    SELECT CAST(c AS BIGINT) AS concordant,
           CAST(d AS BIGINT) AS discordant,
           CAST(c - d AS DOUBLE)
           / sqrt(CAST(c + d + tx AS DOUBLE)
                  * CAST(c + d + ty AS DOUBLE)) AS kendall_tau_b
    FROM agg
    """,
    tags=("tpch", "statistics", "correlation"),
    doc=(
        "Kendall tau-b rank correlation between per-part revenue and "
        "quantity: classify every part pair as concordant/discordant/"
        "tied and compute tau_b = (C-D)/sqrt((C+D+Tx)(C+D+Ty)) - the "
        "tie-corrected ordinal association measure completing the "
        "correlation family (Pearson s93, Chatterjee t06, Spearman-"
        "adjacent s71). Pair comparisons are on EXACT DECIMAL "
        "aggregates so tie detection never flickers across engines; "
        "all four counts are integers and tau is one IEEE "
        "expression. The pair join is an audit over the part "
        "DIMENSION (bounded by part-catalog size squared, not fact "
        "volume); at larger catalogs the O(n log n) merge-count "
        "formulation replaces it."
    ),
)
def t42_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    parts = li.groupBy("l_partkey").agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(18,6)"
            )
        ).alias("rev"),
        F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("qty"),
    )
    # The pairwise classification is a BroadcastNestedLoopJoin whose
    # work is quadratic in |parts| while its INPUT is tiny — AQE sizes
    # the probe side by input bytes and coalesced it to 4 tasks, so a
    # ~2.5 s compute ran on 4 of 32 cores (round-11 profile). Spread
    # the probe side across the cluster's cores explicitly; the
    # round-robin exchange moves only |parts| aggregate rows, and the
    # classification sums are exact integers, so task assignment
    # cannot change the result. (Persisting `parts` was measured 3x
    # SLOWER than letting the broadcast build run as an overlapping
    # job — same serialization effect as copurchase_edges' note.)
    a = parts.repartition(spark.sparkContext.defaultParallelism).alias("a")
    b = parts.alias("b")
    ra, rb = F.col("a.rev"), F.col("b.rev")
    qa, qb = F.col("a.qty"), F.col("b.qty")
    cls = (
        F.when(((ra < rb) & (qa < qb)) | ((ra > rb) & (qa > qb)), "c")
        .when(((ra < rb) & (qa > qb)) | ((ra > rb) & (qa < qb)), "d")
        .when((ra == rb) & (qa == qb), "txy")
        .when(ra == rb, "tx")
        .otherwise("ty")
    )
    agg = (
        a.join(b, F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(cls.alias("cls"))
        .agg(
            F.sum(F.when(F.col("cls") == "c", 1).otherwise(0)).alias("c"),
            F.sum(F.when(F.col("cls") == "d", 1).otherwise(0)).alias("d"),
            F.sum(F.when(F.col("cls") == "tx", 1).otherwise(0)).alias(
                "tx"
            ),
            F.sum(F.when(F.col("cls") == "ty", 1).otherwise(0)).alias(
                "ty"
            ),
        )
    )
    dd = lambda c_: F.col(c_).cast("double")  # noqa: E731
    return agg.select(
        F.col("c").cast("bigint").alias("concordant"),
        F.col("d").cast("bigint").alias("discordant"),
        (
            (F.col("c") - F.col("d")).cast("double")
            / F.sqrt(
                (dd("c") + dd("d") + dd("tx"))
                * (dd("c") + dd("d") + dd("ty"))
            )
        ).alias("kendall_tau_b"),
    )


@register(
    "t43_price_volume_mix",
    """
    WITH b AS (SELECT CAST(min(o_orderdate) AS DATE) AS d0 FROM orders),
    li AS (
      SELECT l.l_partkey,
             CASE WHEN date_diff('day', b.d0,
                                 CAST(o.o_orderdate AS DATE)) < 200
                  THEN 0 ELSE 1 END AS period,
             CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                           AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS rev,
             CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,6)))
                  AS DECIMAL(18,6)) AS qty
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      CROSS JOIN b
      GROUP BY l.l_partkey, period
    ),
    wide AS (
      SELECT l_partkey,
             SUM(CASE WHEN period = 0 THEN rev ELSE 0 END) AS r1,
             SUM(CASE WHEN period = 0 THEN qty ELSE 0 END) AS q1,
             SUM(CASE WHEN period = 1 THEN rev ELSE 0 END) AS r2,
             SUM(CASE WHEN period = 1 THEN qty ELSE 0 END) AS q2
      FROM li GROUP BY l_partkey
      HAVING SUM(CASE WHEN period = 0 THEN qty ELSE 0 END) > 0
         AND SUM(CASE WHEN period = 1 THEN qty ELSE 0 END) > 0
    ),
    -- terms quantized to BIGINT millis: sums stay pure integer and
    -- the final /1e3 is one deterministic IEEE division (a DECIMAL
    -- sum above 2^53 quanta casts to DOUBLE with engine-dependent
    -- last-ulp rounding - observed on volume_effect at sf0.01)
    terms AS (
      SELECT CAST(round((CAST(r2 AS DOUBLE) / CAST(q2 AS DOUBLE)
                         - CAST(r1 AS DOUBLE) / CAST(q1 AS DOUBLE))
                        * CAST(q1 AS DOUBLE) * 1e3) AS BIGINT)
               AS price_q,
             CAST(round(CAST(r1 AS DOUBLE) / CAST(q1 AS DOUBLE)
                        * CAST(q2 - q1 AS DOUBLE) * 1e3) AS BIGINT)
               AS volume_q,
             CAST(round((CAST(r2 AS DOUBLE) / CAST(q2 AS DOUBLE)
                         - CAST(r1 AS DOUBLE) / CAST(q1 AS DOUBLE))
                        * CAST(q2 - q1 AS DOUBLE) * 1e3) AS BIGINT)
               AS joint_q,
             CAST(round(CAST(r2 - r1 AS DOUBLE) * 1e3) AS BIGINT)
               AS delta_q
      FROM wide
    )
    SELECT COUNT(*) AS n_parts,
           CAST(SUM(price_q) AS DOUBLE) / 1e3 AS price_effect,
           CAST(SUM(volume_q) AS DOUBLE) / 1e3 AS volume_effect,
           CAST(SUM(joint_q) AS DOUBLE) / 1e3 AS joint_effect,
           CAST(SUM(delta_q) AS DOUBLE) / 1e3 AS total_delta
    FROM terms
    """,
    tags=("tpch", "kpi", "decomposition"),
    doc=(
        "Price-volume-mix decomposition of the revenue change between "
        "the first 200 days of orders and the rest, over parts traded "
        "in BOTH periods: delta = sum (p2-p1)*q1 [price effect] + "
        "p1*(q2-q1) [volume effect] + (p2-p1)*(q2-q1) [joint] - the "
        "FP&A bridge that answers 'did revenue move because prices "
        "moved or because volumes moved', per part and exactly "
        "additive by construction. Per-part revenues/quantities are "
        "exact DECIMAL; realized unit prices are IEEE divisions; "
        "effect terms quantize to round(x*1e3) BIGINT so sums are "
        "pure integers (a DECIMAL sum above 2^53 quanta casts to "
        "DOUBLE with engine-dependent last-ulp rounding). One fact-side "
        "aggregation (orders joined for dates), a per-part pivot, "
        "and a single-row reduce."
    ),
)
def t43_price_volume_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    b = orders.agg(F.to_date(F.min("o_orderdate")).alias("d0"))
    period = F.when(
        F.datediff(F.to_date(F.col("o_orderdate")), F.col("d0")) < 200, 0
    ).otherwise(1)
    dec = "decimal(18,6)"
    per = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .crossJoin(F.broadcast(b))
        .groupBy("l_partkey", period.alias("period"))
        .agg(
            F.sum(
                (
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                ).cast(dec)
            )
            .cast(dec)
            .alias("rev"),
            F.sum(F.col("l_quantity").cast(dec)).cast(dec).alias("qty"),
        )
    )
    wide = (
        per.groupBy("l_partkey")
        .agg(
            F.sum(F.when(F.col("period") == 0, F.col("rev")).otherwise(0))
            .alias("r1"),
            F.sum(F.when(F.col("period") == 0, F.col("qty")).otherwise(0))
            .alias("q1"),
            F.sum(F.when(F.col("period") == 1, F.col("rev")).otherwise(0))
            .alias("r2"),
            F.sum(F.when(F.col("period") == 1, F.col("qty")).otherwise(0))
            .alias("q2"),
        )
        .filter((F.col("q1") > 0) & (F.col("q2") > 0))
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    p1 = d("r1") / d("q1")
    p2 = d("r2") / d("q2")
    terms = wide.select(
        F.round((p2 - p1) * d("q1") * 1e3).cast("bigint").alias("price_q"),
        F.round(p1 * (F.col("q2") - F.col("q1")).cast("double") * 1e3)
        .cast("bigint")
        .alias("volume_q"),
        F.round(
            (p2 - p1) * (F.col("q2") - F.col("q1")).cast("double") * 1e3
        )
        .cast("bigint")
        .alias("joint_q"),
        F.round((F.col("r2") - F.col("r1")).cast("double") * 1e3)
        .cast("bigint")
        .alias("delta_q"),
    )
    return terms.agg(
        F.count(F.lit(1)).alias("n_parts"),
        (F.sum("price_q").cast("double") / 1e3).alias("price_effect"),
        (F.sum("volume_q").cast("double") / 1e3).alias("volume_effect"),
        (F.sum("joint_q").cast("double") / 1e3).alias("joint_effect"),
        (F.sum("delta_q").cast("double") / 1e3).alias("total_delta"),
    )


@register(
    "t44_geometric_growth",
    """
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day, COUNT(*) AS x
      FROM events GROUP BY event_type, day
    ),
    lagged AS (
      SELECT event_type, x,
             LAG(x) OVER (PARTITION BY event_type ORDER BY day)
               AS prev_x
      FROM daily
    ),
    -- ln(x_t / x_(t-1)) = fxln(x_t) - fxln(x_(t-1)): integers only
    terms AS (
      SELECT event_type,
             CAST(round(ln(CAST(x AS DOUBLE)) * 1e6) AS BIGINT)
             - CAST(round(ln(CAST(prev_x AS DOUBLE)) * 1e6) AS BIGINT)
               AS lr
      FROM lagged WHERE prev_x IS NOT NULL
    )
    SELECT event_type,
           COUNT(*) AS n_ratios,
           round(exp(CAST(SUM(lr) AS DOUBLE) / COUNT(*) / 1e6) - 1, 9)
             AS geo_daily_growth
    FROM terms GROUP BY event_type ORDER BY event_type
    """,
    tags=("events", "time-series", "kpi"),
    doc=(
        "Geometric-mean daily growth rate per event type: the "
        "compound rate exp(mean ln(x_t/x_(t-1))) - 1, the correct "
        "average of growth RATIOS (an arithmetic mean of +50%/-50% "
        "days claims +0% while the series actually shrank 13%). Each "
        "log-ratio decomposes to fxln(x_t) - fxln(x_(t-1)) - ln of "
        "INTEGERS only (s90/s98 discipline) - so the mean log-return "
        "is exact integer arithmetic with one final exp, rounded to "
        "9. O(days) per type after the daily collapse."
    ),
)
def t44_geometric_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("x"))
    lagged = daily.select(
        "event_type",
        "x",
        F.lag("x")
        .over(W.partitionBy("event_type").orderBy("day"))
        .alias("prev_x"),
    )

    fxln = iln6  # shared fixed-point ln guard (functions/stats.py)

    terms = lagged.filter(F.col("prev_x").isNotNull()).select(
        "event_type",
        (fxln(F.col("x")) - fxln(F.col("prev_x"))).alias("lr"),
    )
    return (
        terms.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_ratios"),
            exp9(
                F.sum("lr").cast("double")
                / F.count(F.lit(1))
                / F.lit(1e6),
                shift=-1.0,
            ).alias("geo_daily_growth"),
        )
        .orderBy("event_type")
    )


@register(
    "t45_welch_ttest",
    """
    WITH u AS (
      SELECT ('0x' || substring(md5(user_id::VARCHAR), 1, 8))::BIGINT % 2
               AS grp,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id
    ),
    mom AS (
      SELECT grp, COUNT(*) AS n,
             CAST(SUM(cents) AS BIGINT) AS s,
             CAST(SUM(cents * cents) AS BIGINT) AS ss
      FROM u GROUP BY grp
    ),
    wide AS (
      SELECT MIN(CASE WHEN grp = 0 THEN n END) AS n1,
             MIN(CASE WHEN grp = 0 THEN s END) AS s1,
             MIN(CASE WHEN grp = 0 THEN ss END) AS ss1,
             MIN(CASE WHEN grp = 1 THEN n END) AS n2,
             MIN(CASE WHEN grp = 1 THEN s END) AS s2,
             MIN(CASE WHEN grp = 1 THEN ss END) AS ss2
      FROM mom
    ),
    v AS (
      SELECT n1, n2,
             CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
             CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS m2,
             (CAST(n1 AS DOUBLE) * CAST(ss1 AS DOUBLE)
              - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
             / (CAST(n1 AS DOUBLE) * CAST(n1 - 1 AS DOUBLE))
             / CAST(n1 AS DOUBLE) AS se1sq,
             (CAST(n2 AS DOUBLE) * CAST(ss2 AS DOUBLE)
              - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))
             / (CAST(n2 AS DOUBLE) * CAST(n2 - 1 AS DOUBLE))
             / CAST(n2 AS DOUBLE) AS se2sq
      FROM wide
    )
    SELECT CAST(n1 AS BIGINT) AS n_a, CAST(n2 AS BIGINT) AS n_b,
           m1 / 100.0 AS mean_a, m2 / 100.0 AS mean_b,
           (m1 - m2) / sqrt(se1sq + se2sq) AS t_stat,
           (se1sq + se2sq) * (se1sq + se2sq)
           / (se1sq * se1sq / CAST(n1 - 1 AS DOUBLE)
              + se2sq * se2sq / CAST(n2 - 1 AS DOUBLE)) AS welch_df
    FROM v
    """,
    tags=("events", "experimentation", "hypothesis-test"),
    doc=(
        "Welch's unequal-variance t-test on per-user purchase spend "
        "between the hash cohorts, with the Welch-Satterthwaite "
        "degrees of freedom - the CONTINUOUS-metric counterpart to "
        "t05's proportion z-test (spend is heavy-tailed and "
        "per-cohort variances differ; Student's pooled test would "
        "understate the error). Spend is integer cents so all four "
        "moments per cohort are exact; t and df are one "
        "identically-spelled IEEE expression over them. One per-user "
        "collapse and a 2-row pivot."
    ),
)
def t45_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    u = ev.groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    ).select(
        hash_cohort(F.col("user_id")).alias("grp"),
        "cents",
    )
    mom = u.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").cast("bigint").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).cast("bigint").alias("ss"),
    )

    def cell(g, c, alias):
        return F.min(F.when(F.col("grp") == g, F.col(c))).alias(alias)

    wide = mom.agg(
        cell(0, "n", "n1"), cell(0, "s", "s1"), cell(0, "ss", "ss1"),
        cell(1, "n", "n2"), cell(1, "s", "s2"), cell(1, "ss", "ss2"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    m1, m2 = d("s1") / d("n1"), d("s2") / d("n2")
    se1sq = (
        (d("n1") * d("ss1") - d("s1") * d("s1"))
        / (d("n1") * (F.col("n1") - 1).cast("double"))
        / d("n1")
    )
    se2sq = (
        (d("n2") * d("ss2") - d("s2") * d("s2"))
        / (d("n2") * (F.col("n2") - 1).cast("double"))
        / d("n2")
    )
    sesum = se1sq + se2sq
    return wide.select(
        F.col("n1").cast("bigint").alias("n_a"),
        F.col("n2").cast("bigint").alias("n_b"),
        (m1 / 100.0).alias("mean_a"),
        (m2 / 100.0).alias("mean_b"),
        ((m1 - m2) / F.sqrt(sesum)).alias("t_stat"),
        (
            sesum
            * sesum
            / (
                se1sq * se1sq / (F.col("n1") - 1).cast("double")
                + se2sq * se2sq / (F.col("n2") - 1).cast("double")
            )
        ).alias("welch_df"),
    )


@register(
    "t48_fd_histogram_binning",
    """
    WITH vals AS (
      SELECT event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    ),
    quartiles AS (
      SELECT event_type,
             MAX(n) AS n,
             MIN(CASE WHEN rn = (n + 3) // 4 THEN value END) AS q1,
             MIN(CASE WHEN rn = (3 * n + 3) // 4 THEN value END) AS q3,
             MIN(value) AS lo, MAX(value) AS hi
      FROM vals GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_values,
           q3 - q1 AS iqr,
           round(2.0 * (q3 - q1) / pow(CAST(n AS DOUBLE), 1.0 / 3),
                 9) AS fd_bin_width,
           CAST(ceil((hi - lo)
                     / (2.0 * (q3 - q1)
                        / pow(CAST(n AS DOUBLE), 1.0 / 3)))
                AS BIGINT) AS n_bins
    FROM quartiles
    WHERE q3 > q1
    ORDER BY event_type
    """,
    tags=("events", "statistics", "histogram"),
    doc=(
        "Freedman-Diaconis optimal histogram binning per event type: "
        "bin width 2*IQR/n^(1/3) - the principled, outlier-robust "
        "rule that replaces the magic bin counts hard-coded in ad-hoc "
        "histograms (q100, s61), and the right precursor to any "
        "binned drift metric (s69 PSI, t30 Hellinger). Quartiles are "
        "exact positional selections (s80 discipline, event_id "
        "tie-break); the width involves pow(n, 1/3) - a libm call "
        "that DID diverge by 1 ulp across engines at sf0.1 - so the "
        "reported width is rounded to 9 digits (1e6x margin) and "
        "the bin-count ceil tolerates the raw 1e-15 wobble. One ranked "
        "pass per type."
    ),
)
def t48_fd_histogram_binning(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    wtype = W.partitionBy("event_type")
    vals = ev.select(
        "event_type",
        "value",
        F.row_number()
        .over(wtype.orderBy("value", "event_id"))
        .alias("rn"),
        F.count(F.lit(1)).over(wtype).alias("n"),
    )
    q1_pos = F.floor((F.col("n") + 3) / 4)
    q3_pos = F.floor((3 * F.col("n") + 3) / 4)
    quart = vals.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.min(F.when(F.col("rn") == q1_pos, F.col("value"))).alias("q1"),
        F.min(F.when(F.col("rn") == q3_pos, F.col("value"))).alias("q3"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )
    width = (
        2.0
        * (F.col("q3") - F.col("q1"))
        / F.pow(F.col("n").cast("double"), F.lit(1.0) / 3)
    )
    return (
        quart.filter(F.col("q3") > F.col("q1"))
        .select(
            "event_type",
            F.col("n").cast("bigint").alias("n_values"),
            (F.col("q3") - F.col("q1")).alias("iqr"),
            F.round(width, 9).alias("fd_bin_width"),
            F.ceil((F.col("hi") - F.col("lo")) / width)
            .cast("bigint")
            .alias("n_bins"),
        )
        .orderBy("event_type")
    )


@register(
    "t54_giant_component_share",
    """
    WITH RECURSIVE basket AS (
      -- per-key cap: only the 64 first (partkey, linenumber) lines of
      -- each order feed the wedge self-join, bounding it at 64^2 rows
      -- per order key even on power-law data (TPC-H baskets are <= 13,
      -- so results here are unchanged)
      SELECT l_orderkey, l_partkey FROM (
        SELECT l_orderkey, l_partkey,
               ROW_NUMBER() OVER (
                 PARTITION BY l_orderkey
                 ORDER BY l_partkey, l_linenumber) AS rn
        FROM lineitem) WHERE rn <= 64
    ),
    pairs_raw AS (
      SELECT a.l_partkey AS p1, b.l_partkey AS p2
      FROM basket a JOIN basket b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING COUNT(*) >= 2
    ),
    edges AS (
      SELECT p1 AS src, p2 AS dst FROM pairs_raw
      UNION
      SELECT p2, p1 FROM pairs_raw
    ),
    reach(id, lbl) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id
    ),
    comp AS (SELECT id, MIN(lbl) AS component FROM reach GROUP BY id),
    sizes AS (
      SELECT component, COUNT(*) AS k FROM comp GROUP BY component
    ),
    tot AS (
      SELECT COUNT(*) AS n_components,
             CAST(SUM(k) AS BIGINT) AS n_nodes,
             CAST(MAX(k) AS BIGINT) AS giant
      FROM sizes
    )
    SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
           CAST(n_components AS BIGINT) AS n_components,
           CAST(giant AS BIGINT) AS giant_size,
           CAST(giant AS DOUBLE) / CAST(n_nodes AS DOUBLE)
             AS giant_share
    FROM tot
    """,
    tags=("graph", "connectivity", "market-basket"),
    doc=(
        "Giant-component share of the part co-purchase graph (same "
        "support>=2 edge set as s49/t11/t17): the fraction of "
        "connected parts inside the largest component - the "
        "percolation indicator that tells a dedup or recommendation "
        "pipeline whether its pair graph is many islands (per-cluster "
        "work is cheap) or one giant blob (cluster-level algorithms "
        "hit their worst case; r63's lineage truncation and t11's hub "
        "caps exist exactly for this regime). Spark runs the "
        "iterative min-label propagation operator; the oracle "
        "re-derives components with a recursive CTE (the r63 "
        "pattern). All counts exact integers, one final IEEE share."
    ),
)
def t54_giant_component_share(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.dedup import _persist, connected_components

    edges = _persist(
        copurchase_edges(spark, sf_dir).select(
            F.col("p1").alias("id_a"), F.col("p2").alias("id_b")
        )
    )
    comp = connected_components(edges)
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("k"))
    return sizes.agg(
        F.sum("k").cast("bigint").alias("n_nodes"),
        F.count(F.lit(1)).cast("bigint").alias("n_components"),
        F.max("k").cast("bigint").alias("giant_size"),
        (
            F.max("k").cast("double") / F.sum("k").cast("double")
        ).alias("giant_share"),
    )


@register(
    "t55_covariate_balance",
    """
    WITH b AS (SELECT CAST(min(ts) AS DATE) AS d0 FROM events),
    u AS (
      SELECT user_id,
             ('0x' || substring(md5(user_id::VARCHAR), 1, 8))::BIGINT % 2
               AS grp,
             SUM(CASE WHEN event_type = 'purchase'
                       AND date_diff('day', b.d0, CAST(ts AS DATE)) < 15
                      THEN CAST(round(value * 100) AS BIGINT)
                      ELSE 0 END) AS pre,
             SUM(CASE WHEN date_diff('day', b.d0, CAST(ts AS DATE)) < 15
                      THEN 1 ELSE 0 END) AS pre_events
      FROM events CROSS JOIN b GROUP BY user_id
    ),
    mom AS (
      SELECT grp, COUNT(*) AS n,
             CAST(SUM(pre) AS BIGINT) AS s1,
             CAST(SUM(pre * pre) AS BIGINT) AS ss1,
             CAST(SUM(pre_events) AS BIGINT) AS s2,
             CAST(SUM(pre_events * pre_events) AS BIGINT) AS ss2
      FROM u GROUP BY grp
    ),
    wide AS (
      SELECT MIN(CASE WHEN grp = 0 THEN n END) AS na,
             MIN(CASE WHEN grp = 0 THEN s1 END) AS s1a,
             MIN(CASE WHEN grp = 0 THEN ss1 END) AS ss1a,
             MIN(CASE WHEN grp = 0 THEN s2 END) AS s2a,
             MIN(CASE WHEN grp = 0 THEN ss2 END) AS ss2a,
             MIN(CASE WHEN grp = 1 THEN n END) AS nb,
             MIN(CASE WHEN grp = 1 THEN s1 END) AS s1b,
             MIN(CASE WHEN grp = 1 THEN ss1 END) AS ss1b,
             MIN(CASE WHEN grp = 1 THEN s2 END) AS s2b,
             MIN(CASE WHEN grp = 1 THEN ss2 END) AS ss2b
      FROM mom
    )
    SELECT 'pre_spend' AS covariate,
           (CAST(s1a AS DOUBLE) / CAST(na AS DOUBLE)
            - CAST(s1b AS DOUBLE) / CAST(nb AS DOUBLE))
           / sqrt(((CAST(na AS DOUBLE) * CAST(ss1a AS DOUBLE)
                    - CAST(s1a AS DOUBLE) * CAST(s1a AS DOUBLE))
                   / (CAST(na AS DOUBLE) * CAST(na - 1 AS DOUBLE))
                   + (CAST(nb AS DOUBLE) * CAST(ss1b AS DOUBLE)
                      - CAST(s1b AS DOUBLE) * CAST(s1b AS DOUBLE))
                     / (CAST(nb AS DOUBLE) * CAST(nb - 1 AS DOUBLE)))
                  / 2.0) AS smd
    FROM wide
    UNION ALL
    SELECT 'pre_events',
           (CAST(s2a AS DOUBLE) / CAST(na AS DOUBLE)
            - CAST(s2b AS DOUBLE) / CAST(nb AS DOUBLE))
           / sqrt(((CAST(na AS DOUBLE) * CAST(ss2a AS DOUBLE)
                    - CAST(s2a AS DOUBLE) * CAST(s2a AS DOUBLE))
                   / (CAST(na AS DOUBLE) * CAST(na - 1 AS DOUBLE))
                   + (CAST(nb AS DOUBLE) * CAST(ss2b AS DOUBLE)
                      - CAST(s2b AS DOUBLE) * CAST(s2b AS DOUBLE))
                     / (CAST(nb AS DOUBLE) * CAST(nb - 1 AS DOUBLE)))
                  / 2.0)
    FROM wide
    ORDER BY covariate
    """,
    tags=("events", "experimentation", "diagnostics"),
    doc=(
        "Covariate balance check (standardized mean difference) for "
        "the hash-split cohorts on two PRE-period covariates (spend "
        "and activity): SMD = (m_A - m_B)/sqrt((v_A + v_B)/2), the "
        "randomization sanity every experiment readout should gate on "
        "- |SMD| < 0.1 is the conventional 'balanced' bar, and a "
        "violation invalidates t05/t20/t45 before any effect is read. "
        "Covariates are integer cents/counts so the moments are "
        "exact; SMDs are identically-spelled IEEE expressions. One "
        "user-level collapse and a 2-row pivot."
    ),
)
def t55_covariate_balance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    b = ev.agg(F.to_date(F.min("ts")).alias("d0"))
    dd = F.datediff(F.to_date(F.col("ts")), F.col("d0"))
    cents = F.round(F.col("value") * 100).cast("bigint")
    u = (
        ev.crossJoin(F.broadcast(b))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    (F.col("event_type") == "purchase") & (dd < 15), cents
                ).otherwise(0)
            ).alias("pre"),
            F.sum(F.when(dd < 15, 1).otherwise(0)).alias("pre_events"),
        )
        .select(
            hash_cohort(F.col("user_id")).alias("grp"),
            "pre",
            "pre_events",
        )
    )
    mom = u.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("pre").cast("bigint").alias("s1"),
        F.sum(F.col("pre") * F.col("pre")).cast("bigint").alias("ss1"),
        F.sum("pre_events").cast("bigint").alias("s2"),
        F.sum(F.col("pre_events") * F.col("pre_events"))
        .cast("bigint")
        .alias("ss2"),
    )

    def cell(g, c, alias):
        return F.min(F.when(F.col("grp") == g, F.col(c))).alias(alias)

    wide = mom.agg(
        cell(0, "n", "na"), cell(0, "s1", "s1a"), cell(0, "ss1", "ss1a"),
        cell(0, "s2", "s2a"), cell(0, "ss2", "ss2a"),
        cell(1, "n", "nb"), cell(1, "s1", "s1b"), cell(1, "ss1", "ss1b"),
        cell(1, "s2", "s2b"), cell(1, "ss2", "ss2b"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731

    def smd(s_a, ss_a, s_b, ss_b):
        va = (d("na") * d(ss_a) - d(s_a) * d(s_a)) / (
            d("na") * (F.col("na") - 1).cast("double")
        )
        vb = (d("nb") * d(ss_b) - d(s_b) * d(s_b)) / (
            d("nb") * (F.col("nb") - 1).cast("double")
        )
        return (d(s_a) / d("na") - d(s_b) / d("nb")) / F.sqrt(
            (va + vb) / 2.0
        )

    spend = wide.select(
        F.lit("pre_spend").alias("covariate"),
        smd("s1a", "ss1a", "s1b", "ss1b").alias("smd"),
    )
    activity = wide.select(
        F.lit("pre_events").alias("covariate"),
        smd("s2a", "ss2a", "s2b", "ss2b").alias("smd"),
    )
    return spend.unionAll(activity).orderBy("covariate")


@register(
    "t58_wilcoxon_signed_rank",
    """
    WITH b AS (SELECT CAST(min(ts) AS DATE) AS d0 FROM events),
    u AS (
      SELECT user_id,
             SUM(CASE WHEN event_type = 'purchase'
                       AND date_diff('day', b.d0, CAST(ts AS DATE)) < 15
                      THEN CAST(round(value * 100) AS BIGINT)
                      ELSE 0 END) AS pre,
             SUM(CASE WHEN event_type = 'purchase'
                       AND date_diff('day', b.d0, CAST(ts AS DATE)) >= 15
                      THEN CAST(round(value * 100) AS BIGINT)
                      ELSE 0 END) AS post
      FROM events CROSS JOIN b GROUP BY user_id
    ),
    diffs AS (
      SELECT abs(post - pre) AS ad,
             CASE WHEN post > pre THEN 1 ELSE 0 END AS pos
      FROM u WHERE post <> pre
    ),
    per_v AS (
      SELECT ad, SUM(pos) AS c_pos, COUNT(*) AS c
      FROM diffs GROUP BY ad
    ),
    ranked AS (
      SELECT c_pos, c,
             SUM(c) OVER (ORDER BY ad ROWS UNBOUNDED PRECEDING) - c
               AS cum_before
      FROM per_v
    ),
    m AS (
      SELECT SUM(c) AS n,
             SUM(c_pos * (2 * cum_before + c + 1)) AS w_twice
      FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n_pairs,
           CAST(w_twice AS DOUBLE) / 2.0 AS w_plus,
           (CAST(w_twice AS DOUBLE) / 2.0
            - CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0) / 4.0)
           / sqrt(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)
                  * (2.0 * CAST(n AS DOUBLE) + 1.0) / 24.0) AS z_score
    FROM m
    """,
    tags=("events", "experimentation", "hypothesis-test"),
    doc=(
        "Wilcoxon signed-rank test of per-user purchase spend, first "
        "half vs second half of the corpus - the PAIRED nonparametric "
        "test (each user is their own control) completing the test "
        "family: s70/s71 compare independent samples, this compares "
        "matched pre/post outcomes without normality assumptions. "
        "Zero differences drop (standard); tied |differences| get "
        "exact average ranks via s71's integer identity 2*avg_rank = "
        "2*cum_before + (c+1) over the per-distinct-|d| collapse, so "
        "W+ accumulates in exact integer arithmetic; the z "
        "approximation (no tie-variance correction, documented) is "
        "one IEEE expression."
    ),
)
def t58_wilcoxon_signed_rank(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    b = ev.agg(F.to_date(F.min("ts")).alias("d0"))
    dd = F.datediff(F.to_date(F.col("ts")), F.col("d0"))
    cents = F.round(F.col("value") * 100).cast("bigint")
    is_p = F.col("event_type") == "purchase"
    u = (
        ev.crossJoin(F.broadcast(b))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(is_p & (dd < 15), cents).otherwise(0)).alias(
                "pre"
            ),
            F.sum(F.when(is_p & (dd >= 15), cents).otherwise(0)).alias(
                "post"
            ),
        )
    )
    diffs = u.filter(F.col("post") != F.col("pre")).select(
        F.abs(F.col("post") - F.col("pre")).alias("ad"),
        F.when(F.col("post") > F.col("pre"), 1).otherwise(0).alias("pos"),
    )
    per_v = diffs.groupBy("ad").agg(
        F.sum("pos").alias("c_pos"), F.count(F.lit(1)).alias("c")
    )
    ranked = with_cum_before(per_v, "ad", F.col("c"))
    m = ranked.agg(
        F.sum("c").alias("n"),
        F.sum(midrank_twice(F.col("c_pos"), F.col("c"))).alias("w_twice"),
    )
    nd = F.col("n").cast("double")
    w_plus = F.col("w_twice").cast("double") / 2.0
    z = (w_plus - nd * (nd + 1.0) / 4.0) / F.sqrt(
        nd * (nd + 1.0) * (2.0 * nd + 1.0) / 24.0
    )
    return m.select(
        F.col("n").cast("bigint").alias("n_pairs"),
        w_plus.alias("w_plus"),
        z.alias("z_score"),
    )


@register(
    "t59_mcnemar_test",
    """
    WITH b AS (SELECT CAST(min(ts) AS DATE) AS d0 FROM events),
    u AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'purchase' AND value >= 150
                       AND date_diff('day', b.d0, CAST(ts AS DATE)) < 15
                      THEN 1 ELSE 0 END) AS conv_pre,
             MAX(CASE WHEN event_type = 'purchase' AND value >= 150
                       AND date_diff('day', b.d0, CAST(ts AS DATE)) >= 15
                      THEN 1 ELSE 0 END) AS conv_post
      FROM events CROSS JOIN b GROUP BY user_id
    ),
    cells AS (
      SELECT SUM(CASE WHEN conv_pre = 1 AND conv_post = 0
                      THEN 1 ELSE 0 END) AS b_cell,
             SUM(CASE WHEN conv_pre = 0 AND conv_post = 1
                      THEN 1 ELSE 0 END) AS c_cell,
             COUNT(*) AS n
      FROM u
    )
    SELECT CAST(n AS BIGINT) AS n_users,
           CAST(b_cell AS BIGINT) AS pre_only,
           CAST(c_cell AS BIGINT) AS post_only,
           (abs(CAST(b_cell AS DOUBLE) - CAST(c_cell AS DOUBLE)) - 1.0)
           * (abs(CAST(b_cell AS DOUBLE) - CAST(c_cell AS DOUBLE)) - 1.0)
           / CAST(b_cell + c_cell AS DOUBLE) AS mcnemar_chi2
    FROM cells
    """,
    tags=("events", "experimentation", "hypothesis-test"),
    doc=(
        "McNemar's test for paired binary outcomes: did each user's "
        "high-value-conversion status CHANGE between the first and "
        "second half of the corpus? Only the discordant cells matter "
        "(b = converted-then-stopped, c = newly-converted); chi2 = "
        "(|b-c|-1)^2/(b+c) with the Edwards continuity correction "
        "(stated). The paired-binary member of the test family - "
        "t58 covers paired continuous, t05 independent binary. All "
        "cells exact integers from one user-level collapse; the "
        "statistic is one IEEE expression."
    ),
)
def t59_mcnemar_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    b = ev.agg(F.to_date(F.min("ts")).alias("d0"))
    dd = F.datediff(F.to_date(F.col("ts")), F.col("d0"))
    hv = (F.col("event_type") == "purchase") & (F.col("value") >= 150)
    u = (
        ev.crossJoin(F.broadcast(b))
        .groupBy("user_id")
        .agg(
            F.max(F.when(hv & (dd < 15), 1).otherwise(0)).alias(
                "conv_pre"
            ),
            F.max(F.when(hv & (dd >= 15), 1).otherwise(0)).alias(
                "conv_post"
            ),
        )
    )
    cells = u.agg(
        F.sum(
            F.when((F.col("conv_pre") == 1) & (F.col("conv_post") == 0), 1)
            .otherwise(0)
        ).alias("b_cell"),
        F.sum(
            F.when((F.col("conv_pre") == 0) & (F.col("conv_post") == 1), 1)
            .otherwise(0)
        ).alias("c_cell"),
        F.count(F.lit(1)).alias("n"),
    )
    bd = F.col("b_cell").cast("double")
    cd = F.col("c_cell").cast("double")
    chi2 = (
        (F.abs(bd - cd) - 1.0)
        * (F.abs(bd - cd) - 1.0)
        / (F.col("b_cell") + F.col("c_cell")).cast("double")
    )
    return cells.select(
        F.col("n").cast("bigint").alias("n_users"),
        F.col("b_cell").cast("bigint").alias("pre_only"),
        F.col("c_cell").cast("bigint").alias("post_only"),
        chi2.alias("mcnemar_chi2"),
    )


@register(
    "t60_cronbach_alpha",
    """
    WITH u AS (
      SELECT user_id,
             SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS x1,
             SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS x2,
             SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS x3,
             SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
               AS x4,
             SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS x5
      FROM events GROUP BY user_id
    ),
    m AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(x1) AS BIGINT) AS s1,
             CAST(SUM(x1 * x1) AS BIGINT) AS ss1,
             CAST(SUM(x2) AS BIGINT) AS s2,
             CAST(SUM(x2 * x2) AS BIGINT) AS ss2,
             CAST(SUM(x3) AS BIGINT) AS s3,
             CAST(SUM(x3 * x3) AS BIGINT) AS ss3,
             CAST(SUM(x4) AS BIGINT) AS s4,
             CAST(SUM(x4 * x4) AS BIGINT) AS ss4,
             CAST(SUM(x5) AS BIGINT) AS s5,
             CAST(SUM(x5 * x5) AS BIGINT) AS ss5,
             CAST(SUM(x1 + x2 + x3 + x4 + x5) AS BIGINT) AS st,
             CAST(SUM((x1 + x2 + x3 + x4 + x5)
                      * (x1 + x2 + x3 + x4 + x5)) AS BIGINT) AS sst
      FROM u
    )
    SELECT CAST(n AS BIGINT) AS n_users,
           (5.0 / 4.0)
           * (1.0
              - ((CAST(n AS DOUBLE) * CAST(ss1 AS DOUBLE)
                  - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                 + (CAST(n AS DOUBLE) * CAST(ss2 AS DOUBLE)
                    - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))
                 + (CAST(n AS DOUBLE) * CAST(ss3 AS DOUBLE)
                    - CAST(s3 AS DOUBLE) * CAST(s3 AS DOUBLE))
                 + (CAST(n AS DOUBLE) * CAST(ss4 AS DOUBLE)
                    - CAST(s4 AS DOUBLE) * CAST(s4 AS DOUBLE))
                 + (CAST(n AS DOUBLE) * CAST(ss5 AS DOUBLE)
                    - CAST(s5 AS DOUBLE) * CAST(s5 AS DOUBLE)))
                / (CAST(n AS DOUBLE) * CAST(sst AS DOUBLE)
                   - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)))
             AS cronbach_alpha
    FROM m
    """,
    tags=("events", "statistics", "reliability"),
    doc=(
        "Cronbach's alpha internal-consistency coefficient treating a "
        "user's five event-type counts as a 5-item activity scale: "
        "alpha = k/(k-1) * (1 - sum(item variances)/variance(total)) "
        "- the psychometric reliability measure, here answering "
        "whether 'user activity' is one coherent construct (items "
        "covary) or five independent behaviors - which decides if a "
        "single activity score is a legitimate stratification "
        "feature (t37) or an artifact. The n-scaled variance "
        "identity keeps every term a difference of exact integer "
        "moments (the n*(n-1) denominators cancel), so alpha is one "
        "IEEE expression over one user-level aggregation."
    ),
)
def t60_cronbach_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")

    def item(etype, alias):
        return F.sum(
            F.when(F.col("event_type") == etype, 1).otherwise(0)
        ).alias(alias)

    u = ev.groupBy("user_id").agg(
        item("view", "x1"),
        item("click", "x2"),
        item("purchase", "x3"),
        item("signup", "x4"),
        item("error", "x5"),
    )
    total = (
        F.col("x1") + F.col("x2") + F.col("x3") + F.col("x4") + F.col("x5")
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    for i in range(1, 6):
        aggs.append(F.sum(f"x{i}").cast("bigint").alias(f"s{i}"))
        aggs.append(
            F.sum(F.col(f"x{i}") * F.col(f"x{i}"))
            .cast("bigint")
            .alias(f"ss{i}")
        )
    aggs.append(F.sum(total).cast("bigint").alias("st"))
    aggs.append(F.sum(total * total).cast("bigint").alias("sst"))
    m = u.agg(*aggs)
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    item_var_sum = None
    for i in range(1, 6):
        v = d("n") * d(f"ss{i}") - d(f"s{i}") * d(f"s{i}")
        item_var_sum = v if item_var_sum is None else item_var_sum + v
    tot_var = d("n") * d("sst") - d("st") * d("st")
    alpha = (F.lit(5.0) / 4.0) * (1.0 - item_var_sum / tot_var)
    return m.select(
        F.col("n").cast("bigint").alias("n_users"),
        alpha.alias("cronbach_alpha"),
    )


# t61 shares t01's Poisson(1) inverse-CDF thresholds (one constant: a
# re-derivation applied to one copy only would silently put the two
# bootstrap queries on different replicate-weight distributions)
_POIS1_T2 = _POIS1_T


@register(
    "t61_bootstrap_delta_ci",
    f"""
    WITH u AS (
      SELECT user_id,
             ('0x' || substring(md5(user_id::VARCHAR), 1, 8))::BIGINT % 2
               AS grp,
             MAX(CASE WHEN event_type = 'purchase' AND value >= 150
                      THEN 1 ELSE 0 END) AS conv
      FROM events GROUP BY user_id
    ),
    reps AS (
      SELECT u.grp, u.conv, b.b,
             ('0x' || substring(md5(u.user_id::VARCHAR || '-'
                                    || b.b::VARCHAR), 1, 8))::BIGINT AS h
      FROM u CROSS JOIN (SELECT unnest(range(100)) AS b) b
    ),
    weighted AS (
      SELECT grp, conv, b,
             CASE {' '.join(f"WHEN h < {t} THEN {k}" for k, t in enumerate(_POIS1_T2))}
                  ELSE 9 END AS w
      FROM reps
    ),
    deltas AS (
      SELECT b,
             CAST(SUM(CASE WHEN grp = 0 THEN w * conv ELSE 0 END)
                  AS DOUBLE)
             / CAST(SUM(CASE WHEN grp = 0 THEN w ELSE 0 END) AS DOUBLE)
             - CAST(SUM(CASE WHEN grp = 1 THEN w * conv ELSE 0 END)
                    AS DOUBLE)
               / CAST(SUM(CASE WHEN grp = 1 THEN w ELSE 0 END)
                      AS DOUBLE) AS delta_b
      FROM weighted GROUP BY b
    ),
    ranked AS (
      SELECT delta_b, ROW_NUMBER() OVER (ORDER BY delta_b, b) AS rn
      FROM deltas
    )
    SELECT CAST(100 AS BIGINT) AS n_replicates,
           MIN(CASE WHEN rn = 3 THEN delta_b END) AS delta_ci_lo,
           MIN(CASE WHEN rn = 98 THEN delta_b END) AS delta_ci_hi,
           CAST(SUM(CASE WHEN delta_b > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_positive
    FROM ranked
    """,
    tags=("events", "experimentation", "bootstrap"),
    doc=(
        "Nonparametric 95% CI for the A/B conversion-rate delta via "
        "the Poisson bootstrap (t01's machinery applied to the "
        "EXPERIMENT readout): each user draws a Poisson(1) weight per "
        "replicate from integer inverse-CDF thresholds, replicate "
        "deltas are weighted-rate differences, and the CI is "
        "positional ranks 3/98 - the distribution-free companion to "
        "t05's normal-theory z (heavy-tailed or small-cell metrics "
        "where the z interval lies). Also reports how many replicates "
        "land positive (a sign-stability readout). Everything "
        "reduces through one 100-group aggregate; weights and counts "
        "are exact integers, each delta one IEEE expression."
    ),
)
def t61_bootstrap_delta_ci(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") >= 150),
                1,
            ).otherwise(0)
        ).alias("conv")
    ).select(
        "user_id",
        hash_cohort(F.col("user_id")).alias("grp"),
        "conv",
    )
    reps = u.select(
        "grp",
        "conv",
        F.explode(F.sequence(F.lit(0), F.lit(99))).alias("b"),
        "user_id",
    ).select(
        "grp",
        "conv",
        "b",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("user_id").cast("string"),
                        F.lit("-"),
                        F.col("b").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("h"),
    )
    w = F.lit(9)
    for k in range(len(_POIS1_T2) - 1, -1, -1):
        w = F.when(F.col("h") < _POIS1_T2[k], k).otherwise(w)
    g0, g1 = F.col("grp") == 0, F.col("grp") == 1
    deltas = (
        reps.select("grp", "conv", "b", w.alias("w"))
        .groupBy("b")
        .agg(
            (
                F.sum(F.when(g0, F.col("w") * F.col("conv")).otherwise(0))
                .cast("double")
                / F.sum(F.when(g0, F.col("w")).otherwise(0)).cast(
                    "double"
                )
                - F.sum(
                    F.when(g1, F.col("w") * F.col("conv")).otherwise(0)
                ).cast("double")
                / F.sum(F.when(g1, F.col("w")).otherwise(0)).cast(
                    "double"
                )
            ).alias("delta_b")
        )
    )
    ranked = deltas.select(
        "delta_b",
        F.row_number().over(W.orderBy("delta_b", "b")).alias("rn"),
    )
    return ranked.agg(
        F.lit(100).cast("bigint").alias("n_replicates"),
        F.min(F.when(F.col("rn") == 3, F.col("delta_b"))).alias(
            "delta_ci_lo"
        ),
        F.min(F.when(F.col("rn") == 98, F.col("delta_b"))).alias(
            "delta_ci_hi"
        ),
        F.sum(F.when(F.col("delta_b") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_positive"),
    )


@register(
    "t62_uchart_error_monitor",
    """
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day,
             SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
               AS errs,
             COUNT(*) AS total
      FROM events GROUP BY day
    ),
    tot AS (
      SELECT CAST(SUM(errs) AS BIGINT) AS se,
             CAST(SUM(total) AS BIGINT) AS st
      FROM daily
    )
    SELECT d.day,
           CAST(d.errs AS BIGINT) AS errors,
           CAST(d.total AS BIGINT) AS events,
           CAST(d.errs AS DOUBLE) / CAST(d.total AS DOUBLE) AS rate,
           CAST(t.se AS DOUBLE) / CAST(t.st AS DOUBLE)
             + 3.0 * sqrt((CAST(t.se AS DOUBLE) / CAST(t.st AS DOUBLE))
                          / CAST(d.total AS DOUBLE)) AS ucl
    FROM daily d CROSS JOIN tot t
    WHERE CAST(d.errs AS DOUBLE) / CAST(d.total AS DOUBLE)
          > CAST(t.se AS DOUBLE) / CAST(t.st AS DOUBLE)
            + 3.0 * sqrt((CAST(t.se AS DOUBLE) / CAST(t.st AS DOUBLE))
                         / CAST(d.total AS DOUBLE))
    ORDER BY d.day
    """,
    tags=("events", "spc", "anomaly"),
    doc=(
        "u-chart statistical process control for the daily error "
        "rate: the Poisson-based control chart for defects-per-unit "
        "with per-day sample-size-adjusted limits ubar + "
        "3*sqrt(ubar/n_day) - the Shewhart SPC member of the anomaly "
        "family (r56 global z, t22 seasonal residual, t28 rolling "
        "band); u-charts are the standard when daily volume varies, "
        "because the limit WIDENS on low-traffic days instead of "
        "false-alarming. Center line from exact corpus totals; each "
        "day's limit is one IEEE expression; out-of-control days "
        "only are emitted."
    ),
)
def t62_uchart_error_monitor(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(
            F.when(F.col("event_type") == "error", 1).otherwise(0)
        ).alias("errs"),
        F.count(F.lit(1)).alias("total"),
    )
    tot = daily.agg(
        F.sum("errs").cast("bigint").alias("se"),
        F.sum("total").cast("bigint").alias("st"),
    )
    ubar = F.col("se").cast("double") / F.col("st").cast("double")
    rate = F.col("errs").cast("double") / F.col("total").cast("double")
    ucl = ubar + 3.0 * F.sqrt(ubar / F.col("total").cast("double"))
    return (
        daily.crossJoin(F.broadcast(tot))
        .filter(rate > ucl)
        .select(
            "day",
            F.col("errs").cast("bigint").alias("errors"),
            F.col("total").cast("bigint").alias("events"),
            rate.alias("rate"),
            ucl.alias("ucl"),
        )
        .orderBy("day")
    )


@register(
    "t66_forecast_reconciliation",
    """
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS rev
      FROM events WHERE event_type IN ('purchase', 'click')
      GROUP BY event_type, day
    ),
    indexed AS (
      SELECT event_type, rev,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
               AS i,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM daily
    ),
    bu AS (
      SELECT event_type,
             SUM(round(0.3 * pow(0.7, CAST(n - i AS BIGINT)) * rev, 9))
             + SUM(CASE WHEN i = 1
                        THEN round(pow(0.7, CAST(n AS BIGINT)) * rev, 9)
                        ELSE 0 END) AS f
      FROM indexed GROUP BY event_type
    ),
    total_daily AS (
      SELECT day, CAST(SUM(CAST(rev AS DECIMAL(28,12))) AS DOUBLE)
               AS rev
      FROM daily GROUP BY day
    ),
    tindexed AS (
      SELECT rev, ROW_NUMBER() OVER (ORDER BY day) AS i,
             COUNT(*) OVER () AS n
      FROM total_daily
    ),
    td AS (
      SELECT SUM(round(0.3 * pow(0.7, CAST(n - i AS BIGINT)) * rev, 9))
             + SUM(CASE WHEN i = 1
                        THEN round(pow(0.7, CAST(n AS BIGINT)) * rev, 9)
                        ELSE 0 END) AS f_total
      FROM tindexed
    ),
    bu_sum AS (
      SELECT CAST(SUM(CAST(f AS DECIMAL(28,12))) AS DOUBLE) AS f_bu
      FROM bu
    )
    SELECT round(CAST(td.f_total AS DOUBLE), 6) AS top_down_forecast,
           round(CAST(bu_sum.f_bu AS DOUBLE), 6) AS bottom_up_forecast,
           round(CAST(td.f_total AS DOUBLE)
                 - CAST(bu_sum.f_bu AS DOUBLE), 6) + 0.0
             AS reconciliation_gap
    FROM td CROSS JOIN bu_sum
    """,
    tags=("events", "time-series", "forecast"),
    doc=(
        "Hierarchical forecast reconciliation check: the next-day SES "
        "forecast of TOTAL revenue (top-down, fit on the aggregated "
        "series) versus the SUM of per-type SES forecasts (bottom-up) "
        "- the coherence gap that hierarchical forecasting "
        "(Hyndman's reconciliation framework) exists to close, and a "
        "nonzero gap is structural for any nonlinear smoother "
        "because aggregation and exponential smoothing do not "
        "commute when series lengths or profiles differ. Both paths "
        "reuse s92's closed-form unrolling with round-9 decay terms; "
        "cross-level sums are DECIMAL; outputs round to 6 and the gap "
        "adds +0.0 to collapse IEEE signed zero (determinism class "
        "#4) so the reported gap is bit-stable."
    ),
)
def t66_forecast_reconciliation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double")
        .alias("rev")
    )

    def ses(df, part_cols):
        part = (
            W.partitionBy(*part_cols) if part_cols else W.partitionBy()
        )
        indexed = df.select(
            *part_cols,
            "rev",
            F.row_number().over(part.orderBy("day")).alias("i"),
            F.count(F.lit(1)).over(part).alias("n"),
        )
        w_term, init_term = ses_terms(F.col("n"), F.col("i"), F.col("rev"))
        grouped = (
            indexed.groupBy(*part_cols)
            if part_cols
            else indexed.groupBy()
        )
        return grouped.agg(
            (F.sum(w_term) + F.sum(init_term)).alias("f")
        )

    bu = ses(daily, ["event_type"])
    total_daily = daily.groupBy("day").agg(
        F.sum(F.col("rev").cast("decimal(28,12)"))
        .cast("double")
        .alias("rev")
    )
    td = ses(total_daily, []).select(F.col("f").alias("f_total"))
    bu_sum = bu.agg(
        F.sum(F.col("f").cast("decimal(28,12)"))
        .cast("double")
        .alias("f_bu")
    )
    return td.crossJoin(F.broadcast(bu_sum)).select(
        F.round(F.col("f_total").cast("double"), 6).alias(
            "top_down_forecast"
        ),
        F.round(F.col("f_bu").cast("double"), 6).alias(
            "bottom_up_forecast"
        ),
        # ``+ 0.0`` collapses IEEE signed zero: a gap of -epsilon rounds
        # to -0.0 on one engine and 0.0 on the other (rows compare
        # equal under ==, but the driver's stringifying value hash
        # sees "-0.0" != "0.0" — determinism class #4, see BASELINE.md).
        (
            F.round(
                F.col("f_total").cast("double")
                - F.col("f_bu").cast("double"),
                6,
            )
            + F.lit(0.0)
        ).alias("reconciliation_gap"),
    )


@register(
    "t67_anomaly_ensemble",
    """
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day, COUNT(*) AS x
      FROM events GROUP BY day
    ),
    -- detector 1: global z-score (r56's model)
    g AS (
      SELECT COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS s,
             CAST(SUM(x * x) AS BIGINT) AS ss
      FROM daily
    ),
    d1 AS (
      SELECT day FROM daily CROSS JOIN g
      WHERE abs(CAST(x AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
            > 2 * sqrt((CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)
                        - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                       / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))
    ),
    -- detector 2: trailing 7-day band (t28's model, count series)
    roll AS (
      SELECT day, x, ROW_NUMBER() OVER (ORDER BY day) AS rn,
             SUM(x) OVER (ORDER BY day
                          ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
               AS s7,
             SUM(x * x) OVER (ORDER BY day
                          ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
               AS ss7
      FROM daily
    ),
    d2 AS (
      SELECT day FROM roll
      WHERE rn >= 7
        AND abs(CAST(x AS DOUBLE) - CAST(s7 AS DOUBLE) / 7.0)
            > 2 * sqrt((7.0 * CAST(ss7 AS DOUBLE)
                        - CAST(s7 AS DOUBLE) * CAST(s7 AS DOUBLE))
                       / (7.0 * 6.0))
    ),
    -- detector 3: weekday-peer comparison (t12's seasonality lens)
    wd AS (
      SELECT isodow(day) AS dow, COUNT(*) AS nw,
             CAST(SUM(x) AS BIGINT) AS sw,
             CAST(SUM(x * x) AS BIGINT) AS ssw
      FROM daily GROUP BY dow
    ),
    d3 AS (
      SELECT d.day FROM daily d JOIN wd ON wd.dow = isodow(d.day)
      WHERE wd.nw > 1
        AND abs(CAST(d.x AS DOUBLE)
                - CAST(wd.sw AS DOUBLE) / CAST(wd.nw AS DOUBLE))
            > 2 * sqrt((CAST(wd.nw AS DOUBLE) * CAST(wd.ssw AS DOUBLE)
                        - CAST(wd.sw AS DOUBLE) * CAST(wd.sw AS DOUBLE))
                       / (CAST(wd.nw AS DOUBLE)
                          * CAST(wd.nw - 1 AS DOUBLE)))
    ),
    votes AS (
      SELECT day, COUNT(*) AS n_votes FROM (
        SELECT day FROM d1
        UNION ALL SELECT day FROM d2
        UNION ALL SELECT day FROM d3
      ) GROUP BY day
    )
    SELECT v.day, CAST(v.n_votes AS BIGINT) AS n_detectors,
           CAST(d.x AS BIGINT) AS n_events
    FROM votes v JOIN daily d ON d.day = v.day
    WHERE v.n_votes >= 2
    ORDER BY v.day
    """,
    tags=("events", "anomaly", "ensemble"),
    doc=(
        "Anomaly-detector ensemble vote: a day is flagged only when "
        "at least 2 of 3 INDEPENDENT detectors agree - global "
        "z-score (r56's lens), trailing 7-day band (t28's), and "
        "weekday-peer comparison (t12's) - the production practice "
        "that suppresses each model's idiosyncratic false alarms "
        "(global-z fires on every weekend, rolling bands fire after "
        "level shifts, weekday-peers fire on short history; their "
        "INTERSECTION is the defensible page). All three reuse the "
        "integer-moment discipline over the same daily collapse; "
        "the vote is a UNION ALL + count. One scan feeds everything."
    ),
)
def t67_anomaly_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import _persist

    ev = t(spark, sf_dir, "events")
    # `daily` fans into ~8 plan branches (three detectors, their
    # summary aggregates, and the final vote join); without the persist
    # each branch re-scans and re-aggregates the raw events fact table
    daily = _persist(
        ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
            F.count(F.lit(1)).alias("x")
        )
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    g = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("bigint").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("ss"),
    )
    sd_g = F.sqrt(
        (d("n") * d("ss") - d("s") * d("s"))
        / (d("n") * (F.col("n") - 1).cast("double"))
    )
    d1 = (
        daily.crossJoin(F.broadcast(g))
        .filter(F.abs(d("x") - d("s") / d("n")) > 2 * sd_g)
        .select("day")
    )
    w7 = W.orderBy("day").rowsBetween(-6, 0)
    roll = daily.select(
        "day",
        "x",
        F.row_number().over(W.orderBy("day")).alias("rn"),
        F.sum("x").over(w7).alias("s7"),
        F.sum(F.col("x") * F.col("x")).over(w7).alias("ss7"),
    )
    sd7 = F.sqrt(
        (7.0 * d("ss7") - d("s7") * d("s7")) / (7.0 * 6.0)
    )
    d2 = roll.filter(
        (F.col("rn") >= 7)
        & (F.abs(d("x") - d("s7") / 7.0) > 2 * sd7)
    ).select("day")
    wd = daily.groupBy((F.weekday("day") + 1).alias("dow")).agg(
        F.count(F.lit(1)).alias("nw"),
        F.sum("x").cast("bigint").alias("sw"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("ssw"),
    )
    sd_w = F.sqrt(
        (d("nw") * d("ssw") - d("sw") * d("sw"))
        / (d("nw") * (F.col("nw") - 1).cast("double"))
    )
    d3 = (
        daily.join(
            F.broadcast(wd),
            (F.weekday("day") + 1) == F.col("dow"),
        )
        .filter(
            (F.col("nw") > 1)
            & (F.abs(d("x") - d("sw") / d("nw")) > 2 * sd_w)
        )
        .select("day")
    )
    votes = (
        d1.unionAll(d2)
        .unionAll(d3)
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n_votes"))
        .filter(F.col("n_votes") >= 2)
    )
    return (
        votes.join(daily, "day")
        .select(
            "day",
            F.col("n_votes").cast("bigint").alias("n_detectors"),
            F.col("x").cast("bigint").alias("n_events"),
        )
        .orderBy("day")
    )


@register(
    "t73_mean_margin_planning",
    """
    WITH u AS (
      SELECT user_id,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    m AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(cents) AS BIGINT) AS s,
             CAST(SUM(cents * cents) AS BIGINT) AS ss
      FROM u
    )
    SELECT CAST(n AS BIGINT) AS n_observed,
           CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 AS mean_spend,
           sqrt((CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)
                 - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))) / 100.0
             AS std_spend,
           CAST(ceil(1.96 * 1.96
                     * ((CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)
                         - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                        / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))
                     / ((0.01 * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                        * (0.01 * CAST(s AS DOUBLE)
                           / CAST(n AS DOUBLE)))) AS BIGINT)
             AS n_for_1pct_margin,
           CAST(ceil(1.96 * 1.96
                     * ((CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)
                         - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                        / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))
                     / ((0.05 * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                        * (0.05 * CAST(s AS DOUBLE)
                           / CAST(n AS DOUBLE)))) AS BIGINT)
             AS n_for_5pct_margin
    FROM m
    """,
    tags=("events", "statistics", "sampling"),
    doc=(
        "Sample-size planning for a MEAN estimate: from the observed "
        "per-user spend distribution, the n needed so a 95% CI "
        "half-width stays within 1% (and 5%) of the mean - n = "
        "(1.96 * s / E)^2 - the continuous-metric companion to t25's "
        "proportion power analysis, and the number that sizes QA "
        "sampling audits (t96/s96 allocates a budget; this says "
        "whether the budget is ENOUGH). Spend is integer cents so "
        "variance comes from exact moments; the plan is one IEEE "
        "expression with literal 1.96 and a final ceil. One per-user "
        "collapse, single-row output."
    ),
)
def t73_mean_margin_planning(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = t(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    u = ev.groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    m = u.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").cast("bigint").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).cast("bigint").alias("ss"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    var = (d("n") * d("ss") - d("s") * d("s")) / (
        d("n") * (F.col("n") - 1).cast("double")
    )
    mean = d("s") / d("n")

    def n_for(frac):
        e = F.lit(frac) * mean
        return F.ceil(F.lit(1.96) * 1.96 * var / (e * e)).cast("bigint")

    return m.select(
        F.col("n").cast("bigint").alias("n_observed"),
        (mean / 100.0).alias("mean_spend"),
        (F.sqrt(var) / 100.0).alias("std_spend"),
        n_for(0.01).alias("n_for_1pct_margin"),
        n_for(0.05).alias("n_for_5pct_margin"),
    )


@register(
    "t82_higher_moments",
    """
    WITH u AS (
      SELECT user_id,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    m AS (
      -- 128-bit-first products (HUGEINT here, DECIMAL(38,0) chain on
      -- the Spark side): cents*cents*cents in BIGINT overflows at
      -- per-user spend >= ~$21k, far inside the documented 7-digit
      -- cent envelope — ANSI Spark / DuckDB would abort mid-job.
      SELECT COUNT(*) AS n,
             SUM(CAST(cents AS DECIMAL(38,0))) AS s1,
             SUM(CAST(CAST(cents AS HUGEINT) * cents
                      AS DECIMAL(38,0))) AS s2,
             SUM(CAST(CAST(cents AS HUGEINT) * cents * cents
                      AS DECIMAL(38,0))) AS s3,
             SUM(CAST((CAST(cents AS HUGEINT) * cents)
                      * (CAST(cents AS HUGEINT) * cents)
                      AS DECIMAL(38,0))) AS s4
      FROM u
    ),
    c AS (
      SELECT CAST(n AS DOUBLE) AS dn,
             CAST(s1 AS DOUBLE) AS d1, CAST(s2 AS DOUBLE) AS d2,
             CAST(s3 AS DOUBLE) AS d3, CAST(s4 AS DOUBLE) AS d4,
             n
      FROM m
    ),
    k AS (
      SELECT n, dn,
             d1 / dn AS mu,
             d2 / dn - (d1 / dn) * (d1 / dn) AS m2,
             d3 / dn - 3 * (d1 / dn) * (d2 / dn)
               + 2 * (d1 / dn) * (d1 / dn) * (d1 / dn) AS m3,
             d4 / dn - 4 * (d1 / dn) * (d3 / dn)
               + 6 * (d1 / dn) * (d1 / dn) * (d2 / dn)
               - 3 * (d1 / dn) * (d1 / dn) * (d1 / dn) * (d1 / dn)
               AS m4
      FROM c
    )
    SELECT CAST(n AS BIGINT) AS n_users,
           round(mu / 100.0, 6) AS mean_spend,
           round(m3 / pow(m2, 1.5), 9) AS skewness,
           round(m4 / (m2 * m2) - 3.0, 9) AS excess_kurtosis
    FROM k
    """,
    tags=("events", "statistics", "moments"),
    doc=(
        "Skewness and excess kurtosis of per-user purchase spend "
        "from a SINGLE pass of raw power sums - the distribution-"
        "shape diagnostics (heavy right tail? outlier-prone?) that "
        "decide between mean-based (t45) and rank-based (s71/t58) "
        "testing, and whether winsorization (r76) is warranted. "
        "Spend is integer cents; s1..s4 accumulate in DECIMAL(38,0) "
        "(the 4th power of a 7-digit cent value times 1e6 users "
        "stays within 38 digits), so the moments are exact and "
        "order-independent; the central-moment identities and the "
        "final ratios are identically-spelled IEEE expressions with "
        "round(x, 9) absorbing the class-3 cast ulp on the "
        "above-2^53 sums and the pow(m2, 1.5) libm call. One "
        "map-side-combinable aggregation."
    ),
)
def t82_higher_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    u = ev.groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    dec = "decimal(38,0)"
    # Decimal-first products (the moments_xy rule): cents*cents*cents
    # in BIGINT overflows at per-user spend >= ~$21k — ANSI aborts the
    # job. The decimal chain mirrors the oracle's HUGEINT arithmetic.
    cd = F.col("cents").cast(dec)
    c2 = (cd * F.col("cents")).cast(dec)
    m = u.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cd).alias("s1"),
        F.sum(c2).alias("s2"),
        F.sum((c2 * F.col("cents")).cast(dec)).alias("s3"),
        F.sum((c2 * c2).cast(dec)).alias("s4"),
    )
    dn = F.col("n").cast("double")
    d1, d2 = F.col("s1").cast("double"), F.col("s2").cast("double")
    d3, d4 = F.col("s3").cast("double"), F.col("s4").cast("double")
    mu = d1 / dn
    m2 = d2 / dn - mu * mu
    m3 = d3 / dn - 3 * mu * (d2 / dn) + 2 * mu * mu * mu
    m4 = (
        d4 / dn
        - 4 * mu * (d3 / dn)
        + 6 * mu * mu * (d2 / dn)
        - 3 * mu * mu * mu * mu
    )
    return m.select(
        F.col("n").cast("bigint").alias("n_users"),
        F.round(mu / 100.0, 6).alias("mean_spend"),
        F.round(m3 / F.pow(m2, 1.5), 9).alias("skewness"),
        F.round(m4 / (m2 * m2) - 3.0, 9).alias("excess_kurtosis"),
    )


@register(
    "t83_decision_stump",
    """
    WITH u AS (
      SELECT user_id, COUNT(*) AS activity,
             MAX(CASE WHEN event_type = 'purchase' AND value >= 150
                      THEN 1 ELSE 0 END) AS conv
      FROM events GROUP BY user_id
    ),
    per_v AS (
      SELECT activity AS thr, COUNT(*) AS c, SUM(conv) AS p
      FROM u GROUP BY activity
    ),
    walk AS (
      SELECT thr,
             SUM(c) OVER (ORDER BY thr ROWS UNBOUNDED PRECEDING)
               AS n_le,
             SUM(p) OVER (ORDER BY thr ROWS UNBOUNDED PRECEDING)
               AS p_le,
             SUM(c) OVER () AS n, SUM(p) OVER () AS p_tot
      FROM per_v
    ),
    scored AS (
      SELECT thr, n_le, p_le, n, p_tot,
             -- weighted Gini impurity * n, quantized to a BIGINT key:
             -- 2*[p_le*(n_le-p_le)/n_le + p_gt*(n_gt-p_gt)/n_gt]
             CAST(round((2.0 * CAST(p_le AS DOUBLE)
                         * CAST(n_le - p_le AS DOUBLE)
                         / CAST(n_le AS DOUBLE)
                         + 2.0 * CAST(p_tot - p_le AS DOUBLE)
                           * CAST((n - n_le) - (p_tot - p_le) AS DOUBLE)
                           / CAST(n - n_le AS DOUBLE)) * 1e9) AS BIGINT)
               AS imp_q
      FROM walk WHERE n_le < n
    ),
    best AS (
      SELECT thr, imp_q, n_le, p_le, n, p_tot,
             ROW_NUMBER() OVER (ORDER BY imp_q, thr) AS rk
      FROM scored
    )
    SELECT CAST(thr AS BIGINT) AS best_split_activity,
           CAST(imp_q AS DOUBLE) / 1e9 / CAST(n AS DOUBLE)
             AS weighted_gini,
           CAST(p_le AS DOUBLE) / CAST(n_le AS DOUBLE) AS rate_low_side,
           CAST(p_tot - p_le AS DOUBLE) / CAST(n - n_le AS DOUBLE)
             AS rate_high_side
    FROM best WHERE rk = 1
    """,
    tags=("events", "ml", "decision-tree"),
    doc=(
        "Decision-stump split finder: the single activity threshold "
        "that best separates high-value converters by weighted Gini "
        "impurity - the CART building block (and the strongest "
        "one-variable rule a fraud/propensity reviewer can apply by "
        "hand), computed relationally: candidate thresholds are the "
        "distinct activity values, both sides' class counts come "
        "from ONE cumulative walk over the per-value collapse (no "
        "per-threshold rescans - the same trick a scalable tree "
        "trainer uses for split finding), and the argmin key is "
        "impurity quantized to round(g*1e9) BIGINT so the chosen "
        "split never flickers across engines (ties break on the "
        "smaller threshold)."
    ),
)
def t83_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("activity"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") >= 150),
                1,
            ).otherwise(0)
        ).alias("conv"),
    )
    per_v = u.groupBy(F.col("activity").alias("thr")).agg(
        F.count(F.lit(1)).alias("c"), F.sum("conv").alias("p")
    )
    wv = W.orderBy("thr").rowsBetween(W.unboundedPreceding, 0)
    walk = per_v.select(
        "thr",
        F.sum("c").over(wv).alias("n_le"),
        F.sum("p").over(wv).alias("p_le"),
        F.sum("c").over(W.partitionBy()).alias("n"),
        F.sum("p").over(W.partitionBy()).alias("p_tot"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    p_gt = F.col("p_tot") - F.col("p_le")
    n_gt = F.col("n") - F.col("n_le")
    imp = (
        2.0 * d("p_le") * (F.col("n_le") - F.col("p_le")).cast("double")
        / d("n_le")
        + 2.0
        * p_gt.cast("double")
        * (n_gt - p_gt).cast("double")
        / n_gt.cast("double")
    )
    scored = walk.filter(F.col("n_le") < F.col("n")).select(
        "thr",
        "n_le",
        "p_le",
        "n",
        "p_tot",
        F.round(imp * 1e9).cast("bigint").alias("imp_q"),
    )
    best = scored.select(
        "*", F.row_number().over(W.orderBy("imp_q", "thr")).alias("rk")
    ).filter(F.col("rk") == 1)
    return best.select(
        F.col("thr").cast("bigint").alias("best_split_activity"),
        (F.col("imp_q").cast("double") / 1e9 / F.col("n").cast("double")).alias(
            "weighted_gini"
        ),
        (d("p_le") / d("n_le")).alias("rate_low_side"),
        (
            (F.col("p_tot") - F.col("p_le")).cast("double")
            / (F.col("n") - F.col("n_le")).cast("double")
        ).alias("rate_high_side"),
    )


@register(
    "t84_temporal_leakage_audit",
    """
    WITH b AS (SELECT CAST(min(ts) AS DATE) AS d0 FROM events),
    u AS (
      SELECT user_id,
             MAX(CASE WHEN date_diff('day', b.d0, CAST(ts AS DATE)) < 20
                      THEN 1 ELSE 0 END) AS in_train,
             MAX(CASE WHEN date_diff('day', b.d0, CAST(ts AS DATE)) >= 20
                      THEN 1 ELSE 0 END) AS in_test
      FROM events CROSS JOIN b GROUP BY user_id
    )
    SELECT CAST(SUM(in_train) AS BIGINT) AS n_train_users,
           CAST(SUM(in_test) AS BIGINT) AS n_test_users,
           CAST(SUM(in_train * in_test) AS BIGINT) AS n_overlap_users,
           CAST(SUM(in_train * in_test) AS DOUBLE)
             / CAST(SUM(in_test) AS DOUBLE) AS test_contamination_share
    FROM u
    """,
    tags=("events", "ml", "leakage"),
    doc=(
        "Temporal leakage audit for a time-based train/test split "
        "(day 20 boundary): how many TEST-period users also appear "
        "in the TRAIN period - for user-level models this overlap "
        "means the model has memorized those users' identities, and "
        "the test metric silently measures recall of known users "
        "rather than generalization; the standard remedies "
        "(user-disjoint splits, q77's hash split) are justified by "
        "exactly this number. The entity-level counterpart to q76's "
        "content decontamination. One user-level collapse, exact "
        "integer flags, one IEEE share."
    ),
)
def t84_temporal_leakage_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    b = ev.agg(F.to_date(F.min("ts")).alias("d0"))
    dd = F.datediff(F.to_date(F.col("ts")), F.col("d0"))
    u = (
        ev.crossJoin(F.broadcast(b))
        .groupBy("user_id")
        .agg(
            F.max(F.when(dd < 20, 1).otherwise(0)).alias("in_train"),
            F.max(F.when(dd >= 20, 1).otherwise(0)).alias("in_test"),
        )
    )
    return u.agg(
        F.sum("in_train").cast("bigint").alias("n_train_users"),
        F.sum("in_test").cast("bigint").alias("n_test_users"),
        F.sum(F.col("in_train") * F.col("in_test"))
        .cast("bigint")
        .alias("n_overlap_users"),
        (
            F.sum(F.col("in_train") * F.col("in_test")).cast("double")
            / F.sum("in_test").cast("double")
        ).alias("test_contamination_share"),
    )


@register(
    "t85_forecast_skill_score",
    """
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS rev
      FROM events WHERE event_type IN ('purchase', 'click')
      GROUP BY event_type, day
    ),
    indexed AS (
      SELECT event_type, rev,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
               AS i,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM daily
    ),
    ses AS (
      SELECT o.event_type, o.i AS t,
             SUM(round(0.3 * pow(0.7, CAST(o.i - h.i AS BIGINT))
                       * h.rev, 9))
             + SUM(CASE WHEN h.i = 1
                        THEN round(pow(0.7, CAST(o.i AS BIGINT))
                                   * h.rev, 9)
                        ELSE 0 END) AS yhat
      FROM indexed o
      JOIN indexed h ON h.event_type = o.event_type AND h.i <= o.i
      WHERE o.i >= 7 AND o.i < o.n
      GROUP BY o.event_type, o.i
    ),
    naive AS (
      SELECT event_type, i AS t,
             LAG(rev, 7) OVER (PARTITION BY event_type ORDER BY i)
               AS yhat_naive
      FROM indexed
    ),
    errs AS (
      SELECT s.event_type,
             round(abs(a.rev - CAST(s.yhat AS DOUBLE)), 6) AS e_ses,
             round(abs(a.rev - nv.yhat_naive), 6) AS e_naive
      FROM ses s
      JOIN indexed a ON a.event_type = s.event_type AND a.i = s.t + 1
      JOIN naive nv ON nv.event_type = s.event_type AND nv.t = s.t + 1
      WHERE nv.yhat_naive IS NOT NULL
    )
    SELECT event_type,
           COUNT(*) AS n_forecasts,
           CAST(SUM(CAST(e_ses AS DECIMAL(28,10))) AS DOUBLE)
             / COUNT(*) AS mae_ses,
           CAST(SUM(CAST(e_naive AS DECIMAL(28,10))) AS DOUBLE)
             / COUNT(*) AS mae_seasonal_naive,
           1.0 - (CAST(SUM(CAST(e_ses AS DECIMAL(28,10))) AS DOUBLE)
                  / CAST(SUM(CAST(e_naive AS DECIMAL(28,10)))
                         AS DOUBLE)) AS skill_score
    FROM errs GROUP BY event_type ORDER BY event_type
    """,
    tags=("events", "time-series", "forecast", "evaluation"),
    doc=(
        "Forecast skill score: the SES forecaster's rolling-origin "
        "MAE (t33's harness) against the SEASONAL-NAIVE baseline "
        "(predict what happened one week earlier) - forecasting's "
        "governance rule: a model that cannot beat the naive "
        "baseline (skill <= 0) should not ship, however "
        "sophisticated. The naive forecast for day t+1 is the lag-7 "
        "value at index t+1 (same weekday one week prior); both "
        "error streams round to 6 and sum in DECIMAL over the same "
        "origins, so the skill ratio is exact-over-exact. Bounded "
        "day-pair join for SES (t33), one lag for the baseline."
    ),
)
def t85_forecast_skill_score(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double")
        .alias("rev")
    )
    from ..operators.dedup import _persist

    wtype = W.partitionBy("event_type")
    # persisted: feeds 3-4 plan branches (both pair-join sides, the
    # actuals join, the naive lag) — each would otherwise re-scan and
    # re-aggregate the events fact (the t67 fan-out lesson)
    indexed = _persist(
        daily.select(
            "event_type",
            "rev",
            F.row_number().over(wtype.orderBy("day")).alias("i"),
            F.count(F.lit(1)).over(wtype).alias("n"),
        )
    )
    o, h = indexed.alias("o"), indexed.alias("h")
    w_term, init_term = ses_terms(F.col("o.i"), F.col("h.i"), F.col("h.rev"))
    ses = (
        o.join(
            h,
            (F.col("h.event_type") == F.col("o.event_type"))
            & (F.col("h.i") <= F.col("o.i")),
        )
        .filter((F.col("o.i") >= 7) & (F.col("o.i") < F.col("o.n")))
        .groupBy(
            F.col("o.event_type").alias("event_type"),
            F.col("o.i").alias("t"),
        )
        .agg((F.sum(w_term) + F.sum(init_term)).alias("yhat"))
    )
    naive = indexed.select(
        "event_type",
        F.col("i").alias("t"),
        F.lag("rev", 7).over(wtype.orderBy("i")).alias("yhat_naive"),
    )
    a = indexed.alias("a")
    errs = (
        ses.join(
            a,
            (F.col("a.event_type") == ses["event_type"])
            & (F.col("a.i") == ses["t"] + 1),
        )
        .join(
            naive.alias("nv"),
            (F.col("nv.event_type") == ses["event_type"])
            & (F.col("nv.t") == ses["t"] + 1),
        )
        .filter(F.col("nv.yhat_naive").isNotNull())
        .select(
            ses["event_type"].alias("event_type"),
            F.round(
                F.abs(F.col("a.rev") - F.col("yhat").cast("double")), 6
            ).alias("e_ses"),
            F.round(
                F.abs(F.col("a.rev") - F.col("nv.yhat_naive")), 6
            ).alias("e_naive"),
        )
    )
    dec = "decimal(28,10)"
    mae_s = F.sum(F.col("e_ses").cast(dec)).cast("double") / F.count(
        F.lit(1)
    )
    sum_s = F.sum(F.col("e_ses").cast(dec)).cast("double")
    sum_n = F.sum(F.col("e_naive").cast(dec)).cast("double")
    return (
        errs.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_forecasts"),
            mae_s.alias("mae_ses"),
            (
                F.sum(F.col("e_naive").cast(dec)).cast("double")
                / F.count(F.lit(1))
            ).alias("mae_seasonal_naive"),
            (F.lit(1.0) - sum_s / sum_n).alias("skill_score"),
        )
        .orderBy("event_type")
    )


@register(
    "t86_watermark_lateness_tradeoff",
    """
    WITH arr AS (
      SELECT event_id, ts,
             MAX(ts) OVER (ORDER BY event_id
                           ROWS UNBOUNDED PRECEDING) AS high_water
      FROM events
    ),
    lateness AS (
      -- elapsed FULL hours (micros // 3600e6), not clock-boundary
      -- crossings: matches Spark's duration semantics exactly
      SELECT (epoch_us(high_water) - epoch_us(ts)) // 3600000000
               AS late_hours
      FROM arr
    ),
    grid AS (SELECT unnest([0, 1, 6, 24, 72]) AS delay_hours)
    SELECT CAST(g.delay_hours AS INT) AS watermark_delay_hours,
           CAST(SUM(CASE WHEN l.late_hours > g.delay_hours
                         THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dropped_events,
           CAST(SUM(CASE WHEN l.late_hours > g.delay_hours
                         THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS dropped_share
    FROM grid g CROSS JOIN lateness l
    GROUP BY g.delay_hours
    ORDER BY watermark_delay_hours
    """,
    tags=("events", "streaming", "design-audit"),
    doc=(
        "Watermark-lateness tradeoff: replay the corpus in ARRIVAL "
        "order (event_id as the arrival proxy), track the running "
        "max event time (exactly Spark's watermark high-water mark), "
        "and for candidate delays {0, 1, 6, 24, 72} hours count the "
        "events whose event time trails the high-water mark by more "
        "- i.e. the rows a streaming job with that watermark WOULD "
        "DROP. This is the data-driven way to set the withWatermark "
        "delay every streaming entry (q80-96, s91, r84) hard-codes: "
        "pick the knee where dropped_share is acceptable vs the "
        "state each extra hour retains. The arrival-order scan is "
        "inherently sequential (the audit's nature); at scale it "
        "runs per arrival segment (hour/file) with segment-boundary "
        "high-water carryover - stated here, same pattern as s73."
    ),
)
def t86_watermark_lateness_tradeoff(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    arr = ev.select(
        "event_id",
        "ts",
        F.max("ts")
        .over(W.orderBy("event_id").rowsBetween(W.unboundedPreceding, 0))
        .alias("high_water"),
    )
    lateness = arr.select(
        (
            (F.unix_micros("high_water") - F.unix_micros("ts"))
            / F.lit(3600000000)
        )
        .cast("bigint")
        .alias("late_hours")
    )
    grid = spark.createDataFrame(
        [(0,), (1,), (6,), (24,), (72,)], ["delay_hours"]
    )
    dropped = F.sum(
        F.when(F.col("late_hours") > F.col("delay_hours"), 1).otherwise(0)
    )
    return (
        F.broadcast(grid)
        .crossJoin(lateness)
        .groupBy("delay_hours")
        .agg(
            dropped.cast("bigint").alias("n_dropped_events"),
            (dropped.cast("double") / F.count(F.lit(1))).alias(
                "dropped_share"
            ),
        )
        .select(
            F.col("delay_hours").cast("int").alias(
                "watermark_delay_hours"
            ),
            "n_dropped_events",
            "dropped_share",
        )
        .orderBy("watermark_delay_hours")
    )


@register(
    "t87_ljung_box_whiteness",
    """
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day, COUNT(*) AS x
      FROM events GROUP BY day
    ),
    idx AS (
      SELECT x, ROW_NUMBER() OVER (ORDER BY day) AS i FROM daily
    ),
    mom AS (
      SELECT COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS s,
             CAST(SUM(x * x) AS BIGINT) AS ss
      FROM idx
    ),
    lags AS (
      SELECT l.k,
             CAST(SUM(a.x * b.x) AS BIGINT) AS sxy,
             CAST(SUM(a.x) AS BIGINT) AS sa,
             CAST(SUM(b.x) AS BIGINT) AS sb,
             COUNT(*) AS m
      FROM (SELECT unnest([1, 2, 3]) AS k) l
      JOIN idx a ON TRUE
      JOIN idx b ON b.i = a.i + l.k
      GROUP BY l.k
    ),
    -- r_k with the standard denominator: total centered sum of squares
    rk AS (
      SELECT l.k,
             (CAST(l.sxy AS DOUBLE)
              - CAST(l.sa AS DOUBLE) * CAST(m0.s AS DOUBLE)
                / CAST(m0.n AS DOUBLE)
              - CAST(l.sb AS DOUBLE) * CAST(m0.s AS DOUBLE)
                / CAST(m0.n AS DOUBLE)
              + CAST(l.m AS DOUBLE)
                * (CAST(m0.s AS DOUBLE) / CAST(m0.n AS DOUBLE))
                * (CAST(m0.s AS DOUBLE) / CAST(m0.n AS DOUBLE)))
             / (CAST(m0.ss AS DOUBLE)
                - CAST(m0.s AS DOUBLE) * CAST(m0.s AS DOUBLE)
                  / CAST(m0.n AS DOUBLE)) AS r,
             m0.n AS n
      FROM lags l CROSS JOIN mom m0
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_days,
           round(MIN(CASE WHEN k = 1 THEN r END), 9) AS acf_lag1,
           round(MIN(CASE WHEN k = 2 THEN r END), 9) AS acf_lag2,
           round(MIN(CASE WHEN k = 3 THEN r END), 9) AS acf_lag3,
           round(CAST(MAX(n) AS DOUBLE) * (CAST(MAX(n) AS DOUBLE) + 2.0)
                 * SUM(r * r / CAST(n - k AS DOUBLE)), 9)
             AS ljung_box_q3
    FROM rk
    """,
    tags=("events", "time-series", "hypothesis-test"),
    doc=(
        "Ljung-Box whiteness check on the daily count series: "
        "autocorrelations at lags 1-3 and the portmanteau statistic "
        "Q = n(n+2) * sum(r_k^2/(n-k)) - the residual-diagnostic that "
        "closes the forecasting loop (t85 says whether SES beats "
        "naive; this says whether any structure REMAINS to model - "
        "Q near chi2(3)'s tail means yes). ACF numerators and "
        "denominators come from exact integer sums over the lagged "
        "equi-joins (k = 1..3 against the daily collapse); r_k and "
        "Q are identically-spelled IEEE expressions rounded to 9. "
        "O(days) work after the collapse."
    ),
)
def t87_ljung_box_whiteness(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.dedup import _persist

    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).alias("x")
    )
    # persisted: feeds 3 plan branches (moments + both lag-join sides)
    idx = _persist(
        daily.select("x", F.row_number().over(W.orderBy("day")).alias("i"))
    )
    mom = idx.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("bigint").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("ss"),
    )
    lag_grid = spark.createDataFrame([(1,), (2,), (3,)], ["k"])
    a, b = idx.alias("a"), idx.alias("b")
    lags = (
        F.broadcast(lag_grid)
        .join(a, F.lit(True))
        .join(b, F.col("b.i") == F.col("a.i") + F.col("k"))
        .groupBy("k")
        .agg(
            F.sum(F.col("a.x") * F.col("b.x")).cast("bigint").alias("sxy"),
            F.sum(F.col("a.x")).cast("bigint").alias("sa"),
            F.sum(F.col("b.x")).cast("bigint").alias("sb"),
            F.count(F.lit(1)).alias("m"),
        )
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    mu = d("s") / d("n")
    r = (
        d("sxy") - d("sa") * mu - d("sb") * mu + d("m") * mu * mu
    ) / (d("ss") - d("s") * d("s") / d("n"))
    rk = lags.crossJoin(F.broadcast(mom)).select(
        "k", r.alias("r"), F.col("n")
    )
    nd = F.max("n").cast("double")
    return rk.agg(
        F.max("n").cast("bigint").alias("n_days"),
        F.round(F.min(F.when(F.col("k") == 1, F.col("r"))), 9).alias(
            "acf_lag1"
        ),
        F.round(F.min(F.when(F.col("k") == 2, F.col("r"))), 9).alias(
            "acf_lag2"
        ),
        F.round(F.min(F.when(F.col("k") == 3, F.col("r"))), 9).alias(
            "acf_lag3"
        ),
        F.round(
            nd
            * (nd + 2.0)
            * F.sum(
                F.col("r")
                * F.col("r")
                / (F.col("n") - F.col("k")).cast("double")
            ),
            9,
        ).alias("ljung_box_q3"),
    )


@register(
    "t89_fold_balance_audit",
    """
    WITH u AS (
      SELECT user_id,
             ('0x' || substring(md5(user_id::VARCHAR), 1, 8))::BIGINT % 5
               AS fold,
             MAX(CASE WHEN event_type = 'purchase' AND value >= 150
                      THEN 1 ELSE 0 END) AS conv
      FROM events GROUP BY user_id
    ),
    tot AS (
      SELECT COUNT(*) AS n_all, CAST(SUM(conv) AS BIGINT) AS c_all
      FROM u
    )
    SELECT CAST(u.fold AS INT) AS fold,
           COUNT(*) AS n_users,
           CAST(SUM(u.conv) AS BIGINT) AS n_converters,
           CAST(SUM(u.conv) AS DOUBLE) / COUNT(*) AS fold_rate,
           (CAST(SUM(u.conv) AS DOUBLE) / COUNT(*))
           - (CAST(t.c_all AS DOUBLE) / CAST(t.n_all AS DOUBLE))
             AS rate_deviation
    FROM u CROSS JOIN tot t
    GROUP BY u.fold, t.c_all, t.n_all
    ORDER BY fold
    """,
    tags=("events", "ml", "cross-validation"),
    doc=(
        "k-fold assignment balance audit: hash users into 5 CV folds "
        "(the q77 deterministic-split discipline) and report each "
        "fold's size and positive-class rate against the global rate "
        "- unbalanced folds inflate cross-validation variance and, "
        "with rare positives, can leave a fold class-empty; this "
        "census is the pre-flight check (and the evidence for "
        "switching to stratified assignment when deviations are "
        "material). One user-level collapse, exact integer counts, "
        "IEEE rates against a 1-row total broadcast."
    ),
)
def t89_fold_balance_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") >= 150),
                1,
            ).otherwise(0)
        ).alias("conv")
    ).select(
        hash_cohort(F.col("user_id"), buckets=5).alias("fold"),
        "conv",
    )
    tot = u.agg(
        F.count(F.lit(1)).alias("n_all"),
        F.sum("conv").cast("bigint").alias("c_all"),
    )
    rate = F.sum("conv").cast("double") / F.count(F.lit(1))
    overall = F.col("c_all").cast("double") / F.col("n_all").cast("double")
    return (
        u.crossJoin(F.broadcast(tot))
        .groupBy("fold", "c_all", "n_all")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("conv").cast("bigint").alias("n_converters"),
            rate.alias("fold_rate"),
            (rate - overall).alias("rate_deviation"),
        )
        .select(
            F.col("fold").cast("int").alias("fold"),
            "n_users",
            "n_converters",
            "fold_rate",
            "rate_deviation",
        )
        .orderBy("fold")
    )


@register(
    "t88_state_capacity_planning",
    """
    WITH keys AS (
      SELECT COUNT(DISTINCT event_type) AS n_keys,
             COUNT(*) AS n_events FROM events
    ),
    grid AS (SELECT unnest([0, 1, 6, 24, 72]) AS delay_hours)
    SELECT CAST(g.delay_hours AS INT) AS watermark_delay_hours,
           CAST(k.n_keys * (g.delay_hours + 1) AS BIGINT)
             AS est_state_rows,
           CAST(k.n_keys * (g.delay_hours + 1) * 64 AS BIGINT)
             AS est_state_bytes,
           CAST(k.n_keys * (g.delay_hours + 1) AS DOUBLE)
             / CAST(k.n_events AS DOUBLE) AS state_to_input_ratio
    FROM grid g CROSS JOIN keys k
    ORDER BY watermark_delay_hours
    """,
    tags=("events", "streaming", "design-audit"),
    doc=(
        "Streaming state capacity plan for the 1-hour tumbling "
        "aggregation (q80's shape): retained state rows = distinct "
        "keys x (watermark delay in hours + 1 open window), priced "
        "at a stated 64 bytes/row (key + window + count + decimal "
        "sum) - the other half of t86's tradeoff: t86 prices a "
        "delay in DROPPED EVENTS, this prices it in STATE-STORE "
        "bytes, and together they bracket the withWatermark choice "
        "analytically before a single micro-batch runs. The "
        "state_to_input ratio makes the headline point: windowed "
        "state is bounded by keys x windows, never by event volume "
        "- the property that lets q80 run on 100 TB/day. Pure "
        "arithmetic over a 1-row key census and the 5-row grid."
    ),
)
def t88_state_capacity_planning(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    keys = ev.agg(
        F.countDistinct("event_type").alias("n_keys"),
        F.count(F.lit(1)).alias("n_events"),
    )
    grid = spark.createDataFrame(
        [(0,), (1,), (6,), (24,), (72,)], ["delay_hours"]
    )
    rows = F.col("n_keys") * (F.col("delay_hours") + 1)
    return (
        F.broadcast(grid)
        .crossJoin(F.broadcast(keys))
        .select(
            F.col("delay_hours").cast("int").alias(
                "watermark_delay_hours"
            ),
            rows.cast("bigint").alias("est_state_rows"),
            (rows * 64).cast("bigint").alias("est_state_bytes"),
            (rows.cast("double") / F.col("n_events").cast("double")).alias(
                "state_to_input_ratio"
            ),
        )
        .orderBy("watermark_delay_hours")
    )
