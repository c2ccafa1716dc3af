"""Embedding clustering: fixed-iteration Lloyd's k-means, Spark-first.

The iterative sibling of the one-shot assignment ops in similarity.py
(IVF assignment is exactly one k-means E-step). Used in training-data
pipelines for corpus bucketing / diversity sampling / IVF index builds.

Cross-engine determinism (the repo-wide rules): vectors are quantized to
integer fixed-point, squared-L2 distances come from the dot-product
identity |a-b|^2 = a.a - 2a.b + b.b — exact int64 arithmetic — argmin
ties break on lowest centroid id, and recomputed centroids are
ROUND(SUM/COUNT) back to integers, so every iteration's state is
bit-identical on any partitioning or engine.

Scale shape per iteration: the k centroids are a genuinely-small
broadcast (k rows — unlike a per-user relation this cannot grow with
the data), so the E-step is a map-side broadcast join + one hash
aggregate per vector (min-struct argmin, no window); the M-step is one
posexplode + hash aggregate on (cluster, dim) with map-side partials.
Nothing iterates on the driver; `iterations` is a small fixed constant
(production k-means runs 10-20 rounds — each round is this same DAG).
int64 headroom: dists <= dims * (quantized range)^2 ~ 1e11; SUM(dist)
over 1e9+ vectors approaches 2^63 — cast to decimal(38,0) there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import dot_q, quantized


def _rebalanced(q: DataFrame, norm_col: str | None = "__n2") -> DataFrame:
    """Round-robin the quantized relation across the cluster's default
    parallelism and materialize it. For COMPUTE-DENSE stages (k or m
    broadcast-side dot products per input row) the scan's bytes-based
    partitioning is the wrong unit of parallelism — a few tens of MB of
    vectors can carry minutes of per-row work. One bounded O(n) shuffle
    + checkpoint buys every downstream reference full-width execution
    and a single materialization of the scan. Results are
    partitioning-invariant (everything downstream is aggregates and
    equi-joins), so this changes nothing but the task graph.

    ``norm_col`` materializes each vector's squared norm dot(v, v) INTO
    the checkpoint (guide §2.3 "shuffle keys and metadata instead of
    payloads", applied to compute: the higher-order-function dot product
    is interpreted — CodegenFallback — so every scored pair used to pay
    THREE such dots for |a-b|² = a·a − 2a·b + b·b when two of the three
    terms are per-row constants; measured 3.10 s → 1.11 s on a 3.2M-pair
    assignment shape at 64 dims). Downstream distance expressions read
    the norm column and evaluate exactly ONE dot per pair — identical
    int64 values, same argmin, same ties."""
    if norm_col is not None:
        q = q.withColumn(norm_col, dot_q(F.col("__qv"), F.col("__qv")))
    sc = q.sparkSession.sparkContext
    return q.repartition(sc.defaultParallelism).localCheckpoint(eager=True)


def _assign_rounds(
    q: DataFrame, id_col: str, k: int, iterations: int
) -> DataFrame:
    """Shared Lloyd loop over a quantized relation ``q`` =
    (id_col, __qv): ``iterations`` rounds from deterministic seeds (the
    first ``k`` vectors by id), returning the final per-vector
    assignment (id_col, cid, __dist).

    The input is rebalanced and materialized ONCE before the loop
    (see _rebalanced): the scoring stage does k 64-dim dot products
    PER ROW off a broadcast, so its cost is k*dim times the scan bytes
    — parquet's bytes-based split sizing under-partitions it
    catastrophically (measured: the 100x probe corpus is ~50 MB = ONE
    scan partition, putting the entire n*k assignment on one core).
    Compute-dense stages must set their own parallelism floor; the
    checkpoint also stops the scan re-executing every iteration."""
    q = _rebalanced(q)
    cents = q.filter(F.col(id_col) < k).select(
        F.col(id_col).alias("cid"),
        F.col("__qv").alias("__cv"),
        F.col("__n2").alias("__cn2"),
    )
    assigned = None
    for i in range(iterations):
        # |a-b|² = n2(a) − 2a·b + n2(b) with both norms precomputed
        # (n2(a) rides the checkpoint, n2(b) is evaluated once per
        # centroid on the broadcast build side) — ONE interpreted-HOF
        # dot per scored pair instead of three, identical integers
        dist = (
            F.col("__n2")
            - 2 * dot_q(F.col("__qv"), F.col("__cv"))
            + F.col("__cn2")
        )
        scored = q.crossJoin(F.broadcast(cents)).select(
            F.col(id_col), F.col("cid"), dist.alias("__dist")
        )
        # argmin as min(struct(dist, cid)): one hash aggregate with
        # map-side partials — no per-vector window sort
        assigned = (
            scored.groupBy(id_col)
            .agg(F.min(F.struct("__dist", "cid")).alias("__m"))
            .select(
                F.col(id_col),
                F.col("__m.cid").alias("cid"),
                F.col("__m.__dist").alias("__dist"),
            )
        )
        if i < iterations - 1:
            ex = (
                q.join(assigned.select(id_col, "cid"), id_col)
                .select("cid", F.posexplode("__qv").alias("dim", "val"))
            )
            cd = ex.groupBy("cid", "dim").agg(
                F.round(F.sum("val").cast("double") / F.count(F.lit(1)))
                .cast("bigint")
                .alias("cq")
            )
            cents = cd.groupBy("cid").agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "cq"))),
                    lambda s: s["cq"],
                ).alias("__cv")
            ).withColumn("__cn2", dot_q(F.col("__cv"), F.col("__cv")))
    return assigned


def kmeans_fixed(
    embeddings: DataFrame,
    k: int = 8,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Run ``iterations`` Lloyd rounds from deterministic seeds (the
    first ``k`` vectors by id) and return per-cluster stats:
    (cluster, n_members, sum_distsq)."""
    q = embeddings.select(F.col(id_col), quantized(F.col(vec_col)).alias("__qv"))
    assigned = _assign_rounds(q, id_col, k, iterations)
    return assigned.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum("__dist").alias("sum_distsq"),
    ).select(F.col("cid").alias("cluster"), "n_members", "sum_distsq")


def semantic_dedup(
    embeddings: DataFrame,
    k: int = 8,
    threshold: float = 0.4,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the corpus, then prune near-duplicates
    WITHIN each cluster only — the cluster is the blocking key that
    keeps pairwise cosine work off the full corpus.

    Deterministic keep rule (documented divergence from the paper's
    centroid-distance tie-break, which depends on float ordering): a
    vector is dropped iff some LOWER-id member of its own cluster has
    rounded cosine >= ``threshold`` with it; the lowest id of every
    epsilon-neighborhood always survives. Returns one row per vector:
    (id_col, cluster, kept 1/0).

    Scale: the cluster-blocked self-join costs sum_c |c|^2 pairs, so
    ``k`` must grow with the corpus to bound cluster size; but Lloyd
    assignment costs O(n*k), so the exact algorithm's total is
    minimized at k = sqrt(n) — O(n^1.5), which the registered query
    derives from footer metadata. (The paper's web-scale regime fixes
    cluster SIZE and pays assignment approximately on GPUs/faiss; the
    in-engine analog is ``semantic_dedup_ivf`` below — registered and
    oracle-checked in its own right, with this exact form as its
    quality anchor.) The Lloyd rounds are broadcast-join +
    hash-aggregate shaped (see kmeans_fixed); the prune is ONE
    equi-join on cid — never an all-pairs product.
    """
    q = embeddings.select(F.col(id_col), quantized(F.col(vec_col)).alias("__qv"))
    member = (
        _assign_rounds(q, id_col, k, iterations)
        .select(id_col, "cid")
        .join(q, id_col)
    )
    # member is referenced THREE times below (both self-join sides and
    # the keep-flag join): materialize the Lloyd result ONCE — without
    # this, Spark re-executes the whole iterative assignment DAG per
    # reference (measured 14.3 s -> 5.4 s at sf0.1). Same eager-
    # checkpoint discipline as the other iterative kernels (pagerank /
    # connected components); the relation is O(n) rows of
    # (id, cid, quantized vector). The squared norm is computed here,
    # ONCE per member, not per candidate pair — the prune join then
    # evaluates one dot product per pair instead of three.
    member = member.withColumn(
        "__n2", dot_q(F.col("__qv"), F.col("__qv"))
    ).localCheckpoint(eager=True)
    return _prune_within_clusters(member, id_col, threshold)


def _prune_within_clusters(
    member: DataFrame, id_col: str, threshold: float
) -> DataFrame:
    """Shared SemDeDup prune over an (id, cid, __qv, __n2) relation that
    the caller has already materialized (it is referenced three times):
    a vector is dropped iff some LOWER-id member of its own cluster has
    rounded cosine >= threshold with it. ONE equi-join on cid — never an
    all-pairs product; the squared norms ride in so each candidate pair
    evaluates a single dot product."""
    a = member.select(
        F.col(id_col).alias("__ida"), "cid",
        F.col("__qv").alias("__qa"), F.col("__n2").alias("__n2a"),
    )
    b = member.select(
        F.col(id_col).alias("__idb"), "cid",
        F.col("__qv").alias("__qb"), F.col("__n2").alias("__n2b"),
    )
    # rounded cosine (6dp, matching the oracle) over exact integer dots
    cos = F.round(
        dot_q(F.col("__qa"), F.col("__qb")).cast("double")
        / F.sqrt(F.col("__n2a").cast("double") * F.col("__n2b").cast("double")),
        6,
    )
    dropped = (
        a.join(b, "cid")
        .filter(F.col("__ida") < F.col("__idb"))
        .filter(cos >= threshold)
        .select(F.col("__idb").alias(id_col))
        .distinct()
        .withColumn("__dup", F.lit(1))
    )
    return member.join(dropped, id_col, "left").select(
        id_col,
        F.col("cid").alias("cluster"),
        F.when(F.col("__dup").isNull(), 1).otherwise(0).alias("kept"),
    )


def semantic_dedup_ivf(
    embeddings: DataFrame,
    k: int,
    m: int,
    n_probe: int = 2,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The WEB-SCALE regime of SemDeDup (Abbas et al. 2023 §3 run their
    clustering approximately on GPUs/faiss): fix the target cluster SIZE
    (so ``k`` grows with the corpus) and make the assignment affordable
    with IVF-pruned scoring — a vector is scored only against the fine
    centroids living in its ``n_probe`` nearest COARSE cells, instead of
    against all k. Deterministic end-to-end (seed centroids are the
    first vectors by id, all distances exact int64, all ties break on
    lowest id), so the DuckDB oracle replays it exactly — approximate
    refers to the CLUSTERING being single-shot IVF rather than converged
    k-means, not to any nondeterminism.

    Assignment guarantee: every vector's nearest coarse cell always
    contains at least one fine centroid (coarse seed j is also fine seed
    j since m <= k, and the lowest-id member of any duplicate group
    assigns to itself), so the argmin is never empty and the output
    keeps one row per vector.

    Scale: coarse scoring is n*m rows off a broadcast (m = isqrt(k)
    rows); the top-p cells come from ONE hash aggregate
    (slice(array_sort(collect_list))) over m-element lists — no n*m
    window; fine scoring is n*p*(k/m) rows off a broadcast of the
    k-row (cell -> fine centroid) relation; the prune is the shared
    one-equi-join kernel. With cluster size fixed at S (k = n/S):
    O(n * p * sqrt(n/S)) ~ O(n^1.25) total vs the exact form's
    O(n^1.5) — the remaining superlinearity is the flat two-level
    IVF. MEASURED (BASELINE.md "IVF assignment-vs-prune crossover",
    round 10): assignment is 86-88% of this operator's cost from 30x
    data on, its 100->300x growth matches the per-row
    m + p*k/m ~ 3*sqrt(k) scoring model, and the prune stays S-bounded
    linear — deepening the hierarchy attacks nearly all of the cost;
    semantic_dedup_ivf3 below is that third level (per-row scoring
    O(k^(1/3))).

    Returns (id_col, cluster, kept) — same contract as semantic_dedup.
    """
    # Rebalance + materialize once: q is referenced four times below and
    # the probe/assignment stages are compute-dense (m and p*k/m dots
    # per row) — see _rebalanced for why the scan's partitioning is the
    # wrong unit here.
    q = _rebalanced(
        embeddings.select(F.col(id_col), quantized(F.col(vec_col)).alias("__qv"))
    )
    fine = q.filter(F.col(id_col) < k).select(
        F.col(id_col).alias("cid"),
        F.col("__qv").alias("__cv"),
        F.col("__n2").alias("__cn2"),
    )
    coarse = q.filter(F.col(id_col) < m).select(
        F.col(id_col).alias("__ccid"),
        F.col("__qv").alias("__ccv"),
        F.col("__n2").alias("__ccn2"),
    )
    cells = _ivf_cells(fine, coarse)
    assigned = _ivf_assign(q, cells, coarse, n_probe, id_col)
    # q's checkpoint already carries __n2, so member needs no extra dot
    member = assigned.join(q, id_col).localCheckpoint(eager=True)
    return _prune_within_clusters(member, id_col, threshold)


def _sq_dist(av, bv):
    """Exact int64 squared L2 via the dot-product identity. Three
    interpreted-HOF dots per evaluation — use only on tiny relations;
    the n-scaled scoring paths carry precomputed norms and use
    :func:`_sq_dist_pre` (one dot per pair, identical integers)."""
    return dot_q(av, av) - 2 * dot_q(av, bv) + dot_q(bv, bv)


def _sq_dist_pre(n2a, av, bv, n2b):
    """|a-b|² = n2(a) − 2a·b + n2(b) with BOTH squared norms
    precomputed: exactly one interpreted-HOF dot per pair (measured
    2.8× cheaper than the three-dot identity on the 64-dim assignment
    shape). Same int64 values, same argmins, same ties."""
    return n2a - 2 * dot_q(av, bv) + n2b


def _with_norm(df: DataFrame, vec: str, norm: str) -> DataFrame:
    """Ensure ``df`` carries ``norm`` = dot(vec, vec) — a no-op when the
    caller already materialized it (e.g. via _rebalanced). Centroid
    relations are genuinely small, so computing the norm on the
    broadcast build side costs k evaluations, not n*k."""
    if norm in df.columns:
        return df
    return df.withColumn(norm, dot_q(F.col(vec), F.col(vec)))


def _ivf_cells(fine: DataFrame, coarse: DataFrame) -> DataFrame:
    """(cid, __ccid, __cv[, __cn2]): each fine centroid mapped to its
    nearest coarse cell (lowest-ccid ties) — k x m rows, both relations
    tiny; norms are computed once per side when not already present."""
    fine = _with_norm(fine, "__cv", "__cn2")
    coarse = _with_norm(coarse, "__ccv", "__ccn2")
    fc = (
        fine.crossJoin(F.broadcast(coarse))
        .select(
            "cid",
            F.struct(
                _sq_dist_pre(
                    F.col("__cn2"), F.col("__cv"), F.col("__ccv"), F.col("__ccn2")
                ).alias("__d"),
                F.col("__ccid"),
            ).alias("__s"),
        )
        .groupBy("cid")
        .agg(F.min("__s").alias("__m"))
        .select("cid", F.col("__m.__ccid").alias("__ccid"))
    )
    return fc.join(fine, "cid")


def _ivf_assign(
    q: DataFrame, cells: DataFrame, coarse: DataFrame, n_probe: int, id_col: str
) -> DataFrame:
    """IVF-pruned assignment of (id, __qv, __n2) rows against a built
    index: score each vector against the m coarse centroids (broadcast),
    keep its n_probe nearest cells via ONE hash aggregate (never a
    window over the n*m relation), then argmin over only those cells'
    fine centroids. Both scoring stages evaluate ONE dot per pair —
    ``q``'s norms ride its checkpoint, centroid norms are computed on
    the broadcast build side when the caller (e.g. the store-probing
    path, whose index tables persist no norms) did not. Returns
    (id_col, cid)."""
    coarse = _with_norm(coarse, "__ccv", "__ccn2")
    cells = _with_norm(cells, "__cv", "__cn2")
    probes = (
        q.crossJoin(F.broadcast(coarse))
        .select(
            F.col(id_col),
            F.struct(
                _sq_dist_pre(
                    F.col("__n2"), F.col("__qv"), F.col("__ccv"), F.col("__ccn2")
                ).alias("__d"),
                F.col("__ccid"),
            ).alias("__s"),
        )
        .groupBy(id_col)
        .agg(
            F.slice(F.array_sort(F.collect_list("__s")), 1, n_probe).alias("__t")
        )
        .select(F.col(id_col), F.explode("__t.__ccid").alias("__ccid"))
    )
    return (
        probes.join(q, id_col)
        .join(F.broadcast(cells), "__ccid")
        .select(
            F.col(id_col),
            F.struct(
                _sq_dist_pre(
                    F.col("__n2"), F.col("__qv"), F.col("__cv"), F.col("__cn2")
                ).alias("__d"),
                F.col("cid"),
            ).alias("__s"),
        )
        .groupBy(id_col)
        .agg(F.min("__s").alias("__m"))
        .select(F.col(id_col), F.col("__m.cid").alias("cid"))
    )


def _ivf_top_cells(
    q: DataFrame, cents: DataFrame, n_probe: int, id_col: str,
    cent_id: str, cent_vec: str, out_col: str,
) -> DataFrame:
    """(id, out_col): each vector's n_probe nearest centroids from the
    broadcast ``cents`` (cent_id, cent_vec) — ONE hash aggregate
    (slice(array_sort(collect_list))), never a window over the scored
    relation. The shared probe step of every IVF level. One dot per
    pair: q carries __n2, the centroid norm is computed per centroid on
    the broadcast build side."""
    cents = _with_norm(cents, cent_vec, "__topn2")
    return (
        q.crossJoin(F.broadcast(cents))
        .select(
            F.col(id_col),
            F.struct(
                _sq_dist_pre(
                    F.col("__n2"), F.col("__qv"), F.col(cent_vec), F.col("__topn2")
                ).alias("__d"),
                F.col(cent_id),
            ).alias("__s"),
        )
        .groupBy(id_col)
        .agg(
            F.slice(F.array_sort(F.collect_list("__s")), 1, n_probe).alias("__t")
        )
        .select(F.col(id_col), F.explode(f"__t.{cent_id}").alias(out_col))
    )


def semantic_dedup_ivf3(
    embeddings: DataFrame,
    k: int,
    m2: int,
    c: int,
    n_probe: int = 2,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """THREE-level IVF SemDeDup — the deeper hierarchy the two-level
    form's crossover measurement calls for (BASELINE.md round 10:
    assignment is 86-88% of semantic_dedup_ivf's cost and grows as its
    per-row m + p*k/m ~ 3*sqrt(k) scoring term). Levels: c coarse
    cells -> m2 mid cells -> k fine centroids with c = icbrt(k) and
    m2 = c^2, so per-row scoring is c + p*(m2/c) + p*(k/m2) ~
    (1+2p)*k^(1/3) instead of ~3*sqrt(k) — with cluster size fixed at
    S (k = n/S), total assignment O(n^(7/6)) vs the flat form's
    O(n^1.25). The trade, stated: two pruned probe layers can mis-route
    more vectors than one (recall of the CLUSTERING, not determinism —
    the construction stays exact-integer end-to-end, lowest-id ties,
    so the oracle replays it bit-for-bit; the planted-quality test pins
    agreement with the two-level form on near-dup structure).

    Assignment guarantee (same nesting argument as the two-level form,
    applied twice): seed ids are nested (coarse ids < c are also mid
    seeds < m2 are also fine seeds < k), mid j's nearest coarse cell is
    j itself (distance 0, lowest-id tie), fine j's nearest mid cell is
    j — so every probed coarse cell contains its own mid centroid,
    every probed mid cell its own fine centroid: no vector's candidate
    set is ever empty and the output keeps one row per vector.

    Scale shape per stage: every centroid relation is a genuinely-small
    broadcast (c, m2, k rows); both probe layers are the shared
    hash-aggregate top-p (never a window over a scored relation); the
    mid->coarse (m2 x c) and fine->mid (k x m2) maps are exact argmins
    over tiny products; the prune is the shared one-equi-join kernel
    over S-bounded clusters."""
    q = _rebalanced(
        embeddings.select(F.col(id_col), quantized(F.col(vec_col)).alias("__qv"))
    )
    fine = q.filter(F.col(id_col) < k).select(
        F.col(id_col).alias("cid"),
        F.col("__qv").alias("__cv"),
        F.col("__n2").alias("__cn2"),
    )
    mid = q.filter(F.col(id_col) < m2).select(
        F.col(id_col).alias("__mid"),
        F.col("__qv").alias("__mv"),
        F.col("__n2").alias("__mn2"),
    )
    coarse = q.filter(F.col(id_col) < c).select(
        F.col(id_col).alias("__ccid"),
        F.col("__qv").alias("__ccv"),
        F.col("__n2").alias("__ccn2"),
    )
    # mid centroid -> its coarse cell (m2 x c, exact argmin); the norm
    # columns ride the group keys (functionally dependent on the vector)
    # so the scoring layers below get one-dot-per-pair distances
    mc = (
        mid.crossJoin(F.broadcast(coarse))
        .select(
            "__mid",
            "__mv",
            "__mn2",
            F.struct(
                _sq_dist_pre(
                    F.col("__mn2"), F.col("__mv"), F.col("__ccv"), F.col("__ccn2")
                ).alias("__d"),
                F.col("__ccid"),
            ).alias("__s"),
        )
        .groupBy("__mid", "__mv", "__mn2")
        .agg(F.min("__s").alias("__m"))
        .select("__mid", "__mv", "__mn2", F.col("__m.__ccid").alias("__ccid"))
    )
    # fine centroid -> its mid cell (k x m2, exact argmin)
    fm = (
        fine.crossJoin(F.broadcast(mid))
        .select(
            "cid",
            "__cv",
            "__cn2",
            F.struct(
                _sq_dist_pre(
                    F.col("__cn2"), F.col("__cv"), F.col("__mv"), F.col("__mn2")
                ).alias("__d"),
                F.col("__mid"),
            ).alias("__s"),
        )
        .groupBy("cid", "__cv", "__cn2")
        .agg(F.min("__s").alias("__m"))
        .select("cid", "__cv", "__cn2", F.col("__m.__mid").alias("__mid"))
    )
    # layer 1: vector -> top-p coarse cells
    p1 = _ivf_top_cells(q, coarse, n_probe, id_col, "__ccid", "__ccv", "__ccid")
    # layer 2: vector -> top-p mid cells among the probed coarse cells'
    # mid centroids (broadcast of the m2-row mid->coarse map)
    scored_mid = (
        p1.join(q, id_col)
        .join(F.broadcast(mc), "__ccid")
        .select(
            F.col(id_col),
            F.struct(
                _sq_dist_pre(
                    F.col("__n2"), F.col("__qv"), F.col("__mv"), F.col("__mn2")
                ).alias("__d"),
                F.col("__mid"),
            ).alias("__s"),
        )
        .groupBy(id_col)
        .agg(
            F.slice(F.array_sort(F.collect_list("__s")), 1, n_probe).alias("__t")
        )
        .select(F.col(id_col), F.explode("__t.__mid").alias("__mid"))
    )
    # layer 3: fine argmin among the probed mid cells' fine centroids
    assigned = (
        scored_mid.join(q, id_col)
        .join(F.broadcast(fm), "__mid")
        .select(
            F.col(id_col),
            F.struct(
                _sq_dist_pre(
                    F.col("__n2"), F.col("__qv"), F.col("__cv"), F.col("__cn2")
                ).alias("__d"),
                F.col("cid"),
            ).alias("__s"),
        )
        .groupBy(id_col)
        .agg(F.min("__s").alias("__m"))
        .select(F.col(id_col), F.col("__m.cid").alias("cid"))
    )
    # q's checkpoint already carries __n2, so member needs no extra dot
    member = assigned.join(q, id_col).localCheckpoint(eager=True)
    return _prune_within_clusters(member, id_col, threshold)


def ivf_index_build(
    corpus: DataFrame,
    fine_bound: int,
    coarse_bound: int,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Build the PERSISTABLE IVF index relations for incremental
    semantic dedup (VERDICT r9 #3): returns (coarse, cells, members)
    ready for TableStore writes —
      coarse  (ccid, ccv)          m rows
      cells   (cid, ccid, cv)      k rows (fine centroid -> coarse cell)
      members (vec_id, cid, ccid, qv, n2)  one row per corpus vector

    Seed selection is an ID-RANGE rule (corpus vectors with id below
    the bound), NOT a rank: a rank-based "first k" would need a global
    sort at build time, and an id range is just a pushed-down scan
    predicate. Callers size the bounds so the expected seed count hits
    their k target (the oracle replays the identical rule).

    Members carry their coarse cell so the table can be PARTITIONED BY
    ccid: a probing batch touches only its probed cells' partitions
    (m ~ sqrt(k) directories — bounded), so the per-increment read is
    O(probed members), never the whole corpus table."""
    q = _rebalanced(
        corpus.select(F.col(id_col), quantized(F.col(vec_col)).alias("__qv"))
    )
    fine = q.filter(F.col(id_col) < fine_bound).select(
        F.col(id_col).alias("cid"),
        F.col("__qv").alias("__cv"),
        F.col("__n2").alias("__cn2"),
    )
    coarse = q.filter(F.col(id_col) < coarse_bound).select(
        F.col(id_col).alias("__ccid"),
        F.col("__qv").alias("__ccv"),
        F.col("__n2").alias("__ccn2"),
    )
    cells = _ivf_cells(fine, coarse)
    assigned = _ivf_assign(q, cells, coarse, n_probe, id_col)
    members = (
        assigned.join(q, id_col)
        .join(cells.select("cid", "__ccid"), "cid")
        .select(
            F.col(id_col),
            "cid",
            F.col("__ccid").alias("ccid"),
            F.col("__qv").alias("qv"),
            # the norm materialized by _rebalanced — same int64 value
            F.col("__n2").alias("n2"),
        )
    )
    return (
        coarse.select(F.col("__ccid").alias("ccid"), F.col("__ccv").alias("ccv")),
        cells.select("cid", F.col("__ccid").alias("ccid"), F.col("__cv").alias("cv")),
        members,
    )


def semantic_dedup_probe(
    batch: DataFrame,
    coarse: DataFrame,
    cells: DataFrame,
    members: DataFrame,
    n_probe: int = 2,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Incremental (store-probing) SemDeDup: assign a NEW batch against
    a STORED IVF index and prune it against (a) the stored members of
    its own assigned clusters and (b) lower-id batch vectors in the
    same cluster — the semantic analog of the MinHash
    dedup_incremental_lsh_store probe. The corpus is never re-embedded,
    re-clustered, or re-pruned: per increment this costs
    O(|batch| * (m + p*k/m)) assignment dots off broadcasts plus ONE
    equi-join on cid against the probed clusters' stored members
    (cluster-size-bounded candidates), with the members read
    partition-pruned by ccid when the store table is partitioned so.

    Keep rule (matches semantic_dedup's deterministic variant with the
    corpus ordered before the batch): a batch vector is dropped iff any
    CORPUS member of its cluster, or any LOWER-ID batch vector of its
    cluster, has rounded cosine >= threshold with it. Returns
    (id_col, cluster, kept) for the batch only."""
    coarse = coarse.select(
        F.col("ccid").alias("__ccid"), F.col("ccv").alias("__ccv")
    )
    cells = cells.select(
        "cid", F.col("ccid").alias("__ccid"), F.col("cv").alias("__cv")
    )
    qb = _rebalanced(
        batch.select(F.col(id_col), quantized(F.col(vec_col)).alias("__qv"))
    )
    assigned = _ivf_assign(qb, cells, coarse, n_probe, id_col)
    # bm is referenced three times (corpus prune, both batch-prune
    # sides, keep-flag join) — same single-materialization discipline
    # as semantic_dedup's member relation; qb's checkpoint already
    # carries __n2
    bm = assigned.join(qb, id_col).localCheckpoint(eager=True)

    def cos(qa, n2a, qb_, n2b):
        return F.round(
            dot_q(qa, qb_).cast("double")
            / F.sqrt(n2a.cast("double") * n2b.cast("double")),
            6,
        )

    corp = members.select(
        "cid", F.col("qv").alias("__qc"), F.col("n2").alias("__n2c")
    )
    dropped_corpus = (
        bm.join(corp, "cid")
        .filter(
            cos(F.col("__qc"), F.col("__n2c"), F.col("__qv"), F.col("__n2"))
            >= threshold
        )
        .select(F.col(id_col))
    )
    a = bm.select(
        F.col(id_col).alias("__ida"), "cid",
        F.col("__qv").alias("__qa"), F.col("__n2").alias("__n2a"),
    )
    b = bm.select(
        F.col(id_col).alias("__idb"), "cid",
        F.col("__qv").alias("__qb"), F.col("__n2").alias("__n2b"),
    )
    dropped_batch = (
        a.join(b, "cid")
        .filter(F.col("__ida") < F.col("__idb"))
        .filter(
            cos(F.col("__qa"), F.col("__n2a"), F.col("__qb"), F.col("__n2b"))
            >= threshold
        )
        .select(F.col("__idb").alias(id_col))
    )
    dropped = (
        dropped_corpus.unionByName(dropped_batch)
        .distinct()
        .withColumn("__dup", F.lit(1))
    )
    return bm.join(dropped, id_col, "left").select(
        id_col,
        F.col("cid").alias("cluster"),
        F.when(F.col("__dup").isNull(), 1).otherwise(0).alias("kept"),
    )
