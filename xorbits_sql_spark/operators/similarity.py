"""Similarity search over embedding columns.

Two strategies:

* ``brute_topk`` — exact cosine top-k: broadcast the (small) query set
  against the corpus, score with codegen'd array math, take top-k per
  query with a window. The corpus is only scanned once and never
  shuffled — the right baseline even at 100 TB when the query set fits
  in a broadcast.
* ``lsh_topk`` — approximate: bucket corpus and queries by
  sign-bit LSH (functions.vectors.sign_bucket), score only within
  matching buckets. Turns the scan into a hash-join on the bucket key;
  recall traded via ``bits``.

No Python UDFs anywhere — scoring is zip_with/aggregate (JVM).

L2 norms are computed once per VECTOR before the pair join, not once
per PAIR: cosine(a, b) = dot(a, b) / (norm_a * norm_b) with the norms
carried through the join. Spark evaluates higher-order array lambdas
interpretively, so collapsing 3 per-pair dot products to 1 is ~3x on
the pair stage — and the arithmetic is identical FP ops in the same
order, so results stay bit-equal to the per-pair form (and to DuckDB's
``list_dot_product`` oracle).

The reference has no similarity surface (extension per BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions.vectors import dot, norm, sign_bucket
from .dedup import _persist  # shared cached-table registry (dedup.release_caches)


def _side(df: DataFrame, id_col: str, vec: str, id_alias: str, vec_alias: str,
          n_alias: str, bucket_bits: int | None = None) -> DataFrame:
    cols = [
        F.col(id_col).alias(id_alias),
        F.col(vec).alias(vec_alias),
        norm(F.col(vec)).alias(n_alias),
    ]
    if bucket_bits:
        cols.append(sign_bucket(F.col(vec), bucket_bits).alias("bucket"))
    return df.select(*cols)


def _drop_zero_norm(df: DataFrame, n_alias: str) -> DataFrame:
    """Exclude zero-norm vectors BEFORE any pair join: a zero-norm
    vector has no defined cosine, and under ANSI mode (this engine's
    default session) a plain per-pair division would raise
    DIVIDE_BY_ZERO on the first degenerate embedding. Filtering the
    SIDE costs one predicate per vector — the per-pair try_divide +
    NULL-filter alternative was measured 1.5x slower on t04's brute
    pair set — and afterwards ``_pair_cosine``'s divisor is provably
    positive."""
    return df.filter(F.col(n_alias) > 0)


def _pair_cosine() -> F.Column:
    """Cosine of a (qvec, cvec) pair; NULL when either norm is zero.

    ``try_divide`` instead of ``/`` keeps generic call sites
    (embedding_dup_pairs, semdedup's threshold filter) ANSI-safe on
    degenerate embeddings; the hot top-k paths pre-filter zero-norm
    SIDES via ``_drop_zero_norm`` so the guard never fires there."""
    return F.try_divide(
        dot(F.col("qvec"), F.col("cvec")), F.col("qn") * F.col("cn")
    )


def _tie_safe_topk(s, cids, top):
    """Indices of the ``top`` best rows of ``s`` by (score desc, cid asc).

    O(n) argpartition first, then the cut is EXTENDED to every row tied
    with the boundary score before the small composite lexsort — so a
    tie family larger than ``top`` (dedup corpora: whole cliques at
    cosine 1.0) cannot lose its globally-smallest cids to an arbitrary
    partition, at near-argpartition cost instead of a full per-batch
    O(n log n) lexsort. Falls back to the full lexsort when the
    boundary score is NaN (fewer than ``top`` finite scores, e.g.
    zero-norm vectors), preserving NaN-last ordering.
    """
    import numpy as np

    if top >= s.shape[0]:
        return np.lexsort((cids, -s))[:top]
    part = np.argpartition(-s, top - 1)
    kth = s[part[top - 1]]
    if not np.isfinite(kth):
        return np.lexsort((cids, -s))[:top]
    cut = np.flatnonzero(s >= kth)
    return cut[np.lexsort((cids[cut], -s[cut]))][:top]


def brute_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    qid: str = "vec_id",
    cid: str = "vec_id",
    vec: str = "embedding",
    exclude_self: bool = False,
) -> DataFrame:
    """Exact cosine top-k per query. Returns (qid, cid, cosine, rank).

    ``exclude_self`` drops qid == cid pairs before ranking (for
    leave-one-out evaluation over a corpus that contains the queries).
    """
    q = _drop_zero_norm(_side(queries, qid, vec, "qid", "qvec", "qn"), "qn")
    c = _drop_zero_norm(_side(corpus, cid, vec, "cid", "cvec", "cn"), "cn")
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .select("qid", "cid", _pair_cosine().alias("cosine"))
    )
    if exclude_self:
        scored = scored.filter(F.col("qid") != F.col("cid"))
    w = W.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def brute_topk_arrow(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    qid: str = "vec_id",
    cid: str = "vec_id",
    vec: str = "embedding",
    exclude_self: bool = False,
) -> DataFrame:
    """Exact cosine top-k via Arrow-batched numpy scoring — the 100 TB
    hot path for :func:`brute_topk`.

    Spark evaluates higher-order array lambdas interpretively (measured
    ~40k dot/s/core at dim 64 in the 100x scale rehearsal,
    scripts/scale_rehearsal.py), so pair-heavy exact scoring burns CPU
    two orders of magnitude over BLAS. This variant broadcasts the
    (small-by-contract) query matrix into a ``mapInPandas`` over the
    corpus: each Arrow batch computes one ``C @ Q.T`` GEMM and emits
    only its per-query top-(k+8) candidates, so the post-UDF window
    ranks partitions*queries*(k+8) rows, never the full pair set. The
    corpus is scanned once and never shuffled — identical shuffle
    economy to :func:`brute_topk`.

    Ranks match :func:`brute_topk` (ties broken by ascending cid on
    both paths; the +8 per-batch slack keeps ulp-level reorderings at
    the cut from dropping a true top-k member). Cosine VALUES may
    differ from the HOF path in the last ulps because BLAS accumulates
    in a different order than a sequential fold — which is why the
    DuckDB-oracle-checked inventory entries (q70/r73) keep the HOF
    spelling and this is the documented production swap-in.
    """
    import numpy as np
    import pandas as pd

    rows = queries.select(F.col(qid).alias("q"), F.col(vec).alias("v")).collect()
    if not rows:
        # empty query set: np.array([]) is 1-D and the axis-1 norm
        # would raise on the driver — return the empty result
        # brute_topk produces for the same input
        schema = "qid long, cid long, cosine double, rank int"
        return queries.sparkSession.createDataFrame([], schema)
    qids = np.array([r["q"] for r in rows], dtype=np.int64)
    qmat = np.array([list(r["v"]) for r in rows], dtype=np.float64)
    qn = np.sqrt((qmat * qmat).sum(axis=1))
    take = k + (1 if exclude_self else 0) + 8

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            cmat = np.array(pdf["cvec"].tolist(), dtype=np.float64)
            cids = pdf["cid"].to_numpy(dtype=np.int64)
            cn = np.sqrt((cmat * cmat).sum(axis=1))
            with np.errstate(divide="ignore", invalid="ignore"):
                sims = (cmat @ qmat.T) / np.outer(cn, qn)  # (batch, m)
            # a zero-norm vector has no defined cosine: mask to -inf so
            # it sorts LAST in the cut and is dropped before emission —
            # unmasked NaN would instead rank FIRST in the post-UDF
            # desc window (Spark orders NaN above all doubles), putting
            # a garbage vector at rank 1. Matches the HOF paths, which
            # NULL it via try_divide and filter.
            sims[~np.isfinite(sims)] = -np.inf
            top = min(take, sims.shape[0])
            out = []
            for j in range(sims.shape[1]):
                # tie-safe cut (see _tie_safe_topk): rows tied at the
                # boundary score join the composite sort so rank
                # identity with brute_topk holds on clique-sized ties.
                sel = _tie_safe_topk(sims[:, j], cids, top)
                sel = sel[np.isfinite(sims[sel, j])]
                out.append(
                    pd.DataFrame(
                        {
                            "qid": np.full(len(sel), qids[j]),
                            "cid": cids[sel],
                            "cosine": sims[sel, j],
                        }
                    )
                )
            yield pd.concat(out, ignore_index=True)

    cand = corpus.select(F.col(cid).alias("cid"), F.col(vec).alias("cvec")).mapInPandas(
        score, schema="qid long, cid long, cosine double"
    )
    if exclude_self:
        cand = cand.filter(F.col("qid") != F.col("cid"))
    w = W.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return cand.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    bits: int = 4,
    qid: str = "vec_id",
    cid: str = "vec_id",
    vec: str = "embedding",
    exclude_self: bool = False,
) -> DataFrame:
    """Approximate top-k: candidates share the sign-bit LSH bucket.

    Returns (qid, cid, cosine, rank) — rank within the bucket's
    candidates. Recall < 1; raise ``bits``→smaller buckets/faster,
    lower ``bits``→better recall, ``bits=0``→full scan (recall 1:
    delegates to :func:`brute_topk`, mirroring embedding_dup_pairs'
    bits=0 contract — previously an unresolved-column crash).
    ``exclude_self`` drops qid == cid candidates before ranking (for
    corpus ⊇ queries self-search).
    """
    if bits <= 0:
        return brute_topk(
            queries, corpus, k=k, qid=qid, cid=cid, vec=vec, exclude_self=exclude_self
        )
    q = _drop_zero_norm(_side(queries, qid, vec, "qid", "qvec", "qn", bits), "qn")
    c = _drop_zero_norm(_side(corpus, cid, vec, "cid", "cvec", "cn", bits), "cn")
    scored = q.join(c, "bucket")
    if exclude_self:
        scored = scored.filter(F.col("qid") != F.col("cid"))
    scored = scored.select("qid", "cid", _pair_cosine().alias("cosine"))
    w = W.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    cid: str = "vec_id",
    vec: str = "embedding",
    cell_id: str = "cell",
    cell_vec: str = "cvec",
) -> DataFrame:
    """Assign each corpus vector to its nearest centroid (max cosine).

    ``centroids`` is a small (cell_id, vector) table, broadcast; scoring
    every vector against every centroid is a map-side nested-loop with
    no corpus shuffle, and the argmax is a groupBy on the corpus id —
    partial aggregation collapses the |centroids| candidate rows per
    vector before the exchange, so the shuffle carries one row per
    vector. Ties break toward the smallest cell id.
    Returns (cid, cvec, cn, cell).
    """
    c = _side(corpus, cid, vec, "cid", "cvec", "cn")
    cents = centroids.select(
        F.col(cell_id).alias("cell"),
        F.col(cell_vec).alias("kvec"),
        norm(F.col(cell_vec)).alias("kn"),
    )
    # try_divide — zero-norm vectors/centroids score NULL (sorts last
    # under desc) instead of raising DIVIDE_BY_ZERO under ANSI
    score = F.try_divide(
        dot(F.col("cvec"), F.col("kvec")), F.col("cn") * F.col("kn")
    )
    scored = c.crossJoin(F.broadcast(cents)).select(
        "cid", "cvec", "cn", "cell", score.alias("score")
    )
    return scored.groupBy("cid").agg(
        F.max_by("cell", F.struct(F.col("score"), -F.col("cell"))).alias("cell"),
        F.first("cvec").alias("cvec"),
        F.first("cn").alias("cn"),
    )


def _probe_cells(
    q: DataFrame,
    centroids: DataFrame,
    nprobe: int,
    cell_id: str,
    cell_vec: str,
    carry: tuple[str, ...],
) -> DataFrame:
    """Pick each query's ``nprobe`` nearest cells against the broadcast
    centroid table — the probe-selection step shared by ivf_topk and
    ivf_topk_arrow (previously copy-pasted; round-7 review). try_divide:
    a zero-norm query/centroid has no cosine — NULL probe scores sort
    last (never probed) instead of raising under ANSI."""
    cents = centroids.select(
        F.col(cell_id).alias("cell"),
        F.col(cell_vec).alias("kvec"),
        norm(F.col(cell_vec)).alias("kn"),
    )
    qscore = F.try_divide(
        dot(F.col("qvec"), F.col("kvec")), F.col("qn") * F.col("kn")
    )
    wprobe = W.partitionBy("qid").orderBy(F.desc("probe_score"), F.asc("cell"))
    return (
        q.crossJoin(F.broadcast(cents))
        .select("qid", *carry, "cell", qscore.alias("probe_score"))
        .withColumn("probe_rank", F.row_number().over(wprobe))
        .filter(F.col("probe_rank") <= nprobe)
        .select("qid", *carry, "cell")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    qid: str = "vec_id",
    cid: str = "vec_id",
    vec: str = "embedding",
    cell_id: str = "cell",
    cell_vec: str = "cvec",
    exclude_self: bool = False,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k cosine search.

    Index: :func:`ivf_assign` buckets the corpus by nearest centroid —
    at scale this is the table you'd persist partitioned by ``cell`` so
    probes touch only matching partitions. Probe: each query scores the
    broadcast centroid table, takes its ``nprobe`` closest cells, and
    only candidates in those cells are scored exactly. Recall/cost is
    tuned by (|centroids|, nprobe). Returns (qid, cid, cosine, rank).
    """
    cells = ivf_assign(corpus, centroids, cid=cid, vec=vec, cell_id=cell_id, cell_vec=cell_vec)
    q = _side(queries, qid, vec, "qid", "qvec", "qn")
    probes = _probe_cells(q, centroids, nprobe, cell_id, cell_vec, ("qvec", "qn"))
    scored = probes.join(cells, "cell")
    if exclude_self:
        scored = scored.filter(F.col("qid") != F.col("cid"))
    scored = scored.select("qid", "cid", _pair_cosine().alias("cosine"))
    w = W.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_topk_arrow(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    qid: str = "vec_id",
    cid: str = "vec_id",
    vec: str = "embedding",
    cell_id: str = "cell",
    cell_vec: str = "cvec",
    exclude_self: bool = False,
) -> DataFrame:
    """IVF top-k with per-cell GEMM scoring — the 100 TB probe path.

    Same index and probe-selection plan as :func:`ivf_topk` (broadcast
    centroids pick each query's ``nprobe`` cells), but the candidate
    scoring runs as a cogrouped ``applyInPandas`` on the cell key: each
    cell's member matrix meets its probing queries in one numpy GEMM
    instead of per-pair interpreted array lambdas (measured ~40k
    dots/s/core for the HOF path at dim 64 — scripts/scale_rehearsal.py
    — vs BLAS throughput here). Each cell task emits only per-query
    top-(k+8) candidates, so the final window ranks
    queries*nprobe*(k+8) rows.

    Shuffle economy: probes (queries*nprobe short rows) and the cell
    members shuffle once on the cell key — at scale the corpus index is
    stored partitioned by cell, making the right side shuffle-free.
    Rank-identical to :func:`ivf_topk` (ties by ascending cid); cosine
    values may differ in the last ulps (BLAS accumulation order), which
    is why the oracle-checked entries keep the HOF spelling.
    """
    import numpy as np
    import pandas as pd

    cells = ivf_assign(
        corpus, centroids, cid=cid, vec=vec, cell_id=cell_id, cell_vec=cell_vec
    )
    q = _side(queries, qid, vec, "qid", "qvec", "qn")
    probes = _probe_cells(q, centroids, nprobe, cell_id, cell_vec, ("qvec",))
    take = k + (1 if exclude_self else 0) + 8
    empty = pd.DataFrame(
        {
            "qid": pd.Series(dtype="int64"),
            "cid": pd.Series(dtype="int64"),
            "cosine": pd.Series(dtype="float64"),
        }
    )

    def score_cell(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if not len(left) or not len(right):
            return empty
        qmat = np.array(left["qvec"].tolist(), dtype=np.float64)
        qn_ = np.sqrt((qmat * qmat).sum(axis=1))
        qids = left["qid"].to_numpy(dtype=np.int64)
        cmat = np.array(right["cvec"].tolist(), dtype=np.float64)
        cn_ = right["cn"].to_numpy(dtype=np.float64)
        cids = right["cid"].to_numpy(dtype=np.int64)
        with np.errstate(divide="ignore", invalid="ignore"):
            sims = (cmat @ qmat.T) / np.outer(cn_, qn_)  # (members, queries)
        # zero-norm mask — see brute_topk_arrow: NaN would rank FIRST
        # in the post-UDF desc window
        sims[~np.isfinite(sims)] = -np.inf
        top = min(take, sims.shape[0])
        out = []
        for j in range(sims.shape[1]):
            # tie-safe cut — see _tie_safe_topk: boundary-tied rows
            # join the composite sort, so clique-sized tie families
            # keep their smallest cids at near-argpartition cost.
            sel = _tie_safe_topk(sims[:, j], cids, top)
            sel = sel[np.isfinite(sims[sel, j])]
            out.append(
                pd.DataFrame(
                    {
                        "qid": np.full(len(sel), qids[j]),
                        "cid": cids[sel],
                        "cosine": sims[sel, j],
                    }
                )
            )
        return pd.concat(out, ignore_index=True)

    cand = (
        probes.groupBy("cell")
        .cogroup(cells.groupBy("cell"))
        .applyInPandas(score_cell, schema="qid long, cid long, cosine double")
    )
    if exclude_self:
        cand = cand.filter(F.col("qid") != F.col("cid"))
    w = W.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return cand.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_dup_pairs(
    df: DataFrame,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec: str = "embedding",
    bits: int = 4,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH buckets.

    Exact within buckets; pairs whose cosine exceeds ``threshold``.
    Sign-LSH buckets can miss boundary pairs (vectors straddling a
    hyperplane); for guaranteed recall run with bits=0 (full scan).
    Returns (id_a, id_b, cosine).
    """
    a = _side(df, id_col, vec, "id_a", "qvec", "qn", bits or None)
    b = _side(df, id_col, vec, "id_b", "cvec", "cn", bits or None)
    joined = a.join(b, "bucket") if bits else a.crossJoin(b)
    return (
        joined.filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", _pair_cosine().alias("cosine"))
        .filter(F.col("cosine") > threshold)
    )


def centroid_update(assigned: DataFrame, vec_col: str = "cvec") -> DataFrame:
    """Element-wise decimal-exact mean direction per cell: (cell, cvec).

    posexplode the member vectors to (cell, pos, val) rows, sum each
    dimension in DECIMAL (order-independent — identical on any cluster
    size and bit-equal to DuckDB), then reassemble the centroid array
    ordered by position. Values are ``round(val, 12)``-ed BEFORE the
    decimal cast: a float32 that is an exact 13-digit binary fraction
    (e.g. 0.1983642578125) ties at the cast's rounding digit, and
    Spark (HALF_UP) and DuckDB (HALF_EVEN) break that tie differently;
    ``round`` itself agrees in both engines (away from zero) and its
    output can never re-tie. Two aggregations, both keyed on (cell[, pos]) —
    fully parallel with map-side partial sums, no vector ever collected
    to the driver. The un-normalized dimension sums are used directly:
    cosine assignment only reads the centroid *direction*, so skipping
    the division by member count changes nothing and keeps the values
    exactly representable.
    """
    ex = assigned.select(
        "cell", F.posexplode(F.transform(F.col(vec_col), lambda x: x.cast("double"))).alias("pos", "val")
    )
    dims = ex.groupBy("cell", "pos").agg(
        F.sum(F.round(F.col("val"), 12).cast("decimal(28,12)")).cast("double").alias("v")
    )
    return dims.groupBy("cell").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "v"))), lambda s: s["v"]
        ).alias("cvec")
    )


def kmeans_lloyd(
    corpus: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """Spherical k-means by Lloyd iterations, fully relational.

    Deterministic seeding (the ``k`` lowest-id vectors are the initial
    centroids — reproducible across engines, unlike random init), then
    ``n_iter`` rounds of: assign every vector to its max-cosine centroid
    (broadcast nested-loop scoring, no corpus shuffle — see
    :func:`ivf_assign`) and rebuild centroids with
    :func:`centroid_update`. A fixed iteration count instead of a
    convergence test keeps the whole computation a pure dataflow that an
    oracle can replay; callers wanting convergence can loop externally
    on the centroid delta. Returns the final (cell, cvec) table —
    exactly the centroid input :func:`ivf_topk` expects, so this is the
    missing "train the IVF index" step.

    Empty cells drop out (standard Lloyd behavior); at scale each
    iteration is one broadcast join plus two hash aggregations.

    Each iteration's centroid table (k rows) is localCheckpoint'ed:
    without materialization, every downstream consumption — and
    ivf_topk consumes the centroids three times (cell assignment + two
    probe-side reads) — re-executes the whole training chain, turning
    n_iter scans into 3*n_iter (measured 4.1s -> 1.5s on the r73 bench
    entry when this was a persist). The checkpoint additionally
    truncates the logical plan, so Catalyst stops re-analyzing the
    nested Lloyd chain per consumer (round-11 profile: ~2 s of
    driver-side planning gaps removed); blocks are freed by the
    ContextCleaner, no release bookkeeping needed.
    """
    # the k lowest-id vectors, as documented — NOT filter(id < k),
    # which assumes a 0-based contiguous id space and silently seeds
    # fewer (or zero) centroids when ids start elsewhere. TakeOrdered
    # at k rows; identical output on 0-based contiguous ids.
    cents = corpus.orderBy(id_col).limit(k).select(
        F.col(id_col).cast("bigint").alias("cell"),
        F.transform(F.col(vec), lambda x: x.cast("double")).alias("cvec"),
    )
    # The only per-round shuffle is centroid_update's groupBy(cell) —
    # map-side partial aggregation reduces it to at most k wide
    # (sum-vector, count) rows per map task — so size the loop's
    # shuffles from k, not the session constant (guide §2 via
    # loop_shuffle_partitions; 10k wide centroid rows per partition:
    # k=8 runs each round as one reduce task instead of dozens of
    # near-empty ones, a paper-scale k≈sqrt(10^10) still fans out).
    # Rounds execute eagerly (localCheckpoint), so the scope covers
    # every iteration and the returned table is already materialized.
    from .dedup import loop_shuffle_partitions

    with loop_shuffle_partitions(corpus.sparkSession, k, 10_000):
        for _ in range(n_iter):
            assigned = ivf_assign(corpus, cents, cid=id_col, vec=vec)
            # localCheckpoint (eager), not persist: the centroid table
            # is k short rows, but a persist leaves the LOGICAL plan
            # one full Lloyd iteration deeper per round, and every
            # downstream consumer (ivf_topk reads the centroids three
            # times) makes Catalyst re-analyze the whole nested chain —
            # measured ~2 s of driver-side planning gaps on the
            # r72/r73 bench entries at sf0.1 (round-11 profile; guide
            # §7.3 / §3.3: truncate large plans). The checkpoint
            # materializes the same one execution per iteration the
            # persist did; blocks are freed by the ContextCleaner when
            # the previous iteration goes out of scope.
            cents = centroid_update(assigned).localCheckpoint()
    return cents


def semdedup(
    corpus: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al., 2023).

    Cluster the corpus by nearest centroid (k-means cells — train with
    :func:`kmeans_lloyd`), then compare vectors only WITHIN a cell and
    drop every vector that has a lower-id neighbor with cosine above
    ``threshold``. The kept set is the deterministic greedy
    representative choice (lowest id wins), matching the paper's
    keep-one-per-duplicate-group intent without an iterative component.

    Scale shape: one broadcast argmax assignment (map-only, no corpus
    shuffle — :func:`ivf_assign`), one self-join shuffled on the cell
    key, one anti-join on the id. The pair stage is quadratic in cell
    size, so size ``k`` so cells stay bounded (the paper uses
    k ≈ sqrt(n) or larger; hot cells can additionally be split with the
    salting pattern in operators/skew.py).

    Returns one decision row per corpus vector: (``id_col``, cell,
    kept) — callers keep ``kept`` rows or join back for the survivors.
    """
    # Deliberately NOT persisted although three branches consume it
    # (both self-join sides + the decision join): the assignment is a
    # map-only broadcast argmax — recomputing it is one codegen'd scan,
    # while caching materializes the wide (cvec, qvec) array columns.
    # Measured (round-11 ABBA at sf0.1): persisting made r70 1.5x
    # SLOWER (1.45 s -> 2.17 s). The §5 persist rule applies to
    # expensive-to-recompute subtrees, not map-only scans.
    cells = ivf_assign(corpus, centroids, cid=id_col, vec=vec)
    a = cells.select(
        "cell", F.col("cid").alias("id_a"), F.col("cvec").alias("qvec"), F.col("cn").alias("qn")
    )
    b = cells.select("cell", F.col("cid").alias("id_b"), "cvec", "cn")
    dropped = (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(_pair_cosine() > threshold)
        .select(F.col("id_b").alias("cid"))
        .distinct()
    )
    return (
        cells.join(dropped.withColumn("kept", F.lit(False)), "cid", "left_outer")
        .select(
            F.col("cid").alias(id_col),
            "cell",
            F.coalesce(F.col("kept"), F.lit(True)).alias("kept"),
        )
    )


def assign_with_score(
    corpus: DataFrame,
    centroids: DataFrame,
    cid: str = "vec_id",
    vec: str = "embedding",
    cell_id: str = "cell",
    cell_vec: str = "cvec",
) -> DataFrame:
    """Nearest-centroid assignment keeping the winning cosine:
    (cid, cell, score). Same broadcast/argmax plan as :func:`ivf_assign`
    (ties to the smallest cell), one shuffle of one row per vector.
    ``cell_id``/``cell_vec`` name the centroid table's columns, like
    ivf_assign (previously hardcoded; round-7 review)."""
    c = _side(corpus, cid, vec, "cid", "cvec", "cn")
    cents = centroids.select(
        F.col(cell_id).alias("cell"),
        F.col(cell_vec).alias("kvec"),
        norm(F.col(cell_vec)).alias("kn"),
    )
    # try_divide — zero-norm vectors/centroids score NULL (sorts last
    # under desc) instead of raising DIVIDE_BY_ZERO under ANSI
    score = F.try_divide(
        dot(F.col("cvec"), F.col("kvec")), F.col("cn") * F.col("kn")
    )
    scored = c.crossJoin(F.broadcast(cents)).select("cid", "cell", score.alias("score"))
    best = F.max(F.struct(F.col("score"), (-F.col("cell")).alias("neg_cell")))
    return scored.groupBy("cid").agg(best.alias("b")).select(
        "cid", (-F.col("b.neg_cell")).cast("bigint").alias("cell"), F.col("b.score").alias("score")
    )
