"""Fixed-iteration PageRank over an edge DataFrame — Pregel-lite as pure
relational algebra, with integer micro-unit arithmetic so every engine
computes bit-identical ranks.

Reference parity: the reference engine has no graph operator; this is
part of the beyond-reference large-pipeline surface (link-graph /
co-engagement centrality is the classic web-corpus quality prior — the
original PageRank use case was exactly ranking a crawl for downstream
consumption).

Determinism contract: floating-point PageRank is NOT reproducible across
engines (per-destination sums associate differently), so ranks here live
in integer "rank units" (``scale`` = 1e12 by default):

* initial rank   ``r0 = scale // N`` for every node,
* teleport base  ``base = (100 - damping_pct) * scale // (100 * N)``,
* edge contribution ``(r_src * damping_pct) div (100 * out_deg)`` —
  integer floor division; all values positive, so Spark's truncating
  ``div`` and an oracle engine's flooring ``//`` agree exactly,
* new rank       ``base + SUM(contributions)`` — a sum of BIGINTs, exact
  and order-independent in every engine.

Mass lost to integer floors and to dangling nodes (no out-edges) is
deliberately dropped, not redistributed: both choices are deterministic,
and redistribution would add a per-iteration global scalar for no gain
in a *ranking* signal.

Scale shape (100 TB): each iteration is one hash join of the rank table
(|V| rows) against the edge list keyed by ``src``, then one hash
aggregate keyed by ``dst`` — the standard Pregel message-pass as two
exchanges over the edge list. Pre-partitioning the edges by ``src``
(bucketed sink, ``repartition(n, src)`` before ``bucketBy`` so each
bucket is ONE file) eliminates the whole edge-side build shuffle —
``tools/graph_probe.py`` measures 27 → 7 Exchanges in the 3-iteration
lineage at 5M edges. That is a network-volume win, priced accordingly:
on single-node local[32], where an exchange is a memory copy, the
bucketed variant's frozen 32-task layout forfeits AQE runtime
re-planning and runs ~2x slower in wall time (min-of-3 interleaved:
6.6 s plain vs 13-16 s bucketed) — bucket the edge sink on clusters
where shuffle bytes cross a network, not on one box. Lineage is
truncated with ``localCheckpoint`` each iteration so plan depth stays
O(1) regardless of iteration count. The only driver-side value is the
node count (one scalar, the sanctioned bounded hop — same pattern as
the IVF probe-cell list).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: lineage-truncation cadence for the iterative operators: checkpoint the
#: per-round state every this many rounds instead of every round — each
#: ``DataFrame.localCheckpoint`` call (even lazy) runs a full Catalyst
#: planning pass (~0.5 s of driver work), so short fixed-round queries
#: skip it entirely while deep runs still truncate on cadence.
_CHECKPOINT_EVERY = 4


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    iterations: int = 3,
    damping_pct: int = 85,
    scale: int = 10**12,
    checkpoint: bool = True,
) -> DataFrame:
    """Rank nodes of the directed graph ``edges`` by fixed-iteration
    PageRank; returns ``(node, rank_u)`` with ``rank_u`` in integer rank
    units (``scale`` ≈ total mass 1.0).

    Duplicate edges are collapsed first (a repeated edge is one link).
    ``damping_pct`` is the damping factor in integer percent (85 = the
    classic 0.85) so the arithmetic stays integral end-to-end.
    """
    if iterations < 1:
        raise ValueError("pagerank: iterations must be >= 1")
    if not (0 < damping_pct < 100):
        raise ValueError("pagerank: damping_pct must be in (0, 100)")

    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    # One bounded driver scalar (node count) sizes the init/teleport
    # constants; everything else stays distributed.
    ed = e.join(deg, "src")
    # lazy checkpoints: lineage still truncates at first materialization,
    # but no extra blocking jobs are scheduled up front (~15% faster at
    # sf0.1; bit-identical results)
    if checkpoint:
        nodes = nodes.localCheckpoint(eager=False)
        ed = ed.localCheckpoint(eager=False)
    n_nodes = nodes.count()
    if n_nodes == 0:
        raise ValueError("pagerank: edge list is empty (no nodes)")
    init_u = scale // n_nodes
    base_u = (100 - damping_pct) * scale // (100 * n_nodes)

    ranks = nodes.select("node", F.lit(init_u).cast("long").alias("rank_u"))
    contrib_expr = F.expr(f"(rank_u * {damping_pct}) div (100 * out_deg)")
    for it in range(iterations):
        msgs = (
            ed.join(ranks, ed["src"] == ranks["node"])
            .select(F.col("dst").alias("node"), contrib_expr.alias("c_u"))
            .groupBy("node")
            .agg(F.sum("c_u").alias("in_u"))
        )
        ranks = nodes.join(msgs, "node", "left").select(
            "node",
            (F.lit(base_u) + F.coalesce(F.col("in_u"), F.lit(0)))
            .cast("long")
            .alias("rank_u"),
        )
        # truncate the growing lineage every few rounds, not every round:
        # each rank tree references its predecessor once and the persisted
        # invariants as leaves, so a handful of unrolled rounds keeps the
        # plan small while skipping most of the per-call planning cost;
        # deep runs still truncate on cadence (plan depth stays O(1)).
        if checkpoint and (it + 1) % _CHECKPOINT_EVERY == 0 and it + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def pagerank_topk(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    k: int = 20,
    iterations: int = 3,
    damping_pct: int = 85,
    scale: int = 10**12,
) -> DataFrame:
    """Top-``k`` nodes by fixed-iteration PageRank, deterministically
    tie-broken by node id — the query-shaped wrapper."""
    r = pagerank(
        edges,
        src,
        dst,
        iterations=iterations,
        damping_pct=damping_pct,
        scale=scale,
    )
    return r.orderBy(F.col("rank_u").desc(), F.col("node").asc()).limit(k)


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Count triangles in the undirected graph of ``edges`` (one row:
    ``n_triangles``). Self-loops are dropped and duplicate/reversed
    edges collapse before counting.

    Algorithm: degree-ordered orientation — every edge points from its
    lower-(degree, node) endpoint to the higher one, then triangles are
    wedges ``a→b, a→c`` (b before c in the same order) closed by an
    oriented edge ``b→c``. Each triangle is counted exactly once (its
    smallest-order vertex is the unique wedge apex), and the classic
    bound applies: every oriented out-neighborhood is O(√m), so the
    wedge join — the only quadratic step — is Σ out-deg² = O(m^1.5)
    regardless of raw degree skew (a celebrity node of degree 10⁶ gets
    out-degree ~√m, not 10⁶). All equi-joins on node keys; no cartesian,
    no driver-side state.

    The canonical edge list and the oriented edge list are lazily
    checkpointed: ``o`` feeds THREE join branches (both wedge sides and
    the closing probe), and without truncation Catalyst would inline its
    whole upstream pipeline into each branch — plan size (and any
    non-reused upstream work) triples.
    """
    u = F.least(F.col(src), F.col(dst)).alias("u")
    v = F.greatest(F.col(src), F.col(dst)).alias("v")
    e = (
        edges.select(u, v)
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    ed = e.join(du, "u").join(dv, "v")
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    o = ed.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(fwd, F.col("dv")).otherwise(F.col("du")).alias("degb"),
    ).localCheckpoint(eager=False)
    x = o.select(
        F.col("a"), F.col("b").alias("p"), F.col("degb").alias("dp")
    )
    y = o.select(
        F.col("a"), F.col("b").alias("q"), F.col("degb").alias("dq")
    )
    wedges = x.join(y, "a").filter(
        (F.col("dp") < F.col("dq"))
        | ((F.col("dp") == F.col("dq")) & (F.col("p") < F.col("q")))
    )
    closing = o.select(F.col("a").alias("p"), F.col("b").alias("q"))
    return (
        wedges.join(closing, ["p", "q"])
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )


def _undirected(edges: DataFrame, src: str, dst: str) -> DataFrame:
    u = F.least(F.col(src), F.col(dst)).alias("u")
    v = F.greatest(F.col(src), F.col(dst)).alias("v")
    return edges.select(u, v).filter(F.col("u") != F.col("v")).distinct()


def _degrees(e: DataFrame) -> DataFrame:
    return (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )


def k_core_peel(
    edges: DataFrame,
    k: int,
    *,
    rounds: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """``rounds`` peeling passes toward the k-core of the undirected
    graph: each pass drops every node of degree < k (and its edges),
    degrees are recomputed, repeat. Returns the surviving ``(node,
    deg)`` table — degrees measured in the peeled graph.

    Peeling is monotone (a pass only removes), so the fixed-round result
    is a superset of the true k-core that shrinks toward it; with
    ``rounds`` ≥ the peel depth it IS the k-core (see :func:`k_core` for
    the run-to-fixpoint form). The fixed-round variant exists because it
    is fully deterministic relational algebra — each pass is one degree
    aggregate + two semi-joins, exactly unrollable in SQL — and because
    at 100 TB a bounded number of passes with a measured survivor count
    is usually preferable to an unbounded loop.

    Shared edge relations are lazily checkpointed per pass (same
    plan-growth rationale as :func:`triangle_count`).
    """
    if k < 1:
        raise ValueError("k_core_peel: need k >= 1")
    if rounds < 1:
        raise ValueError("k_core_peel: need rounds >= 1")
    e = _undirected(edges, src, dst).localCheckpoint(eager=False)
    for _ in range(rounds):
        keep = _degrees(e).filter(F.col("deg") >= k).select("node")
        e = (
            e.join(keep.select(F.col("node").alias("u")), "u", "leftsemi")
            .join(keep.select(F.col("node").alias("v")), "v", "leftsemi")
            .select("u", "v")
            .localCheckpoint(eager=False)
        )
    return _degrees(e)


def k_core(
    edges: DataFrame,
    k: int,
    *,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 100,
) -> DataFrame:
    """The true k-core: peel until no node of degree < k remains (or
    ``max_rounds``, a runaway guard that raises rather than silently
    returning a non-core). One bounded driver scalar per pass (the
    violating-node count — the fixpoint test IS a driver decision);
    everything else stays distributed. Peel depth in practice is tiny
    (real graphs: tens of passes at most)."""
    if k < 1:
        raise ValueError("k_core: need k >= 1")
    e = _undirected(edges, src, dst).localCheckpoint(eager=False)
    for _ in range(max_rounds):
        deg = _degrees(e).localCheckpoint(eager=False)
        if deg.filter(F.col("deg") < k).limit(1).count() == 0:
            return deg
        keep = deg.filter(F.col("deg") >= k).select("node")
        e = (
            e.join(keep.select(F.col("node").alias("u")), "u", "leftsemi")
            .join(keep.select(F.col("node").alias("v")), "v", "leftsemi")
            .select("u", "v")
            .localCheckpoint(eager=False)
        )
    raise RuntimeError(f"k_core: no fixpoint within {max_rounds} rounds")


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    seed_col: str = "node",
    iterations: int = 3,
    damping_pct: int = 85,
    scale: int = 10**12,
) -> DataFrame:
    """Personalized PageRank: identical message-pass arithmetic to
    :func:`pagerank`, but ALL teleport mass returns to the ``seeds``
    set (split evenly, integer floor) instead of spreading uniformly —
    the similar-items / related-entities primitive (rank concentrates
    in the seeds' neighborhood; distant nodes decay geometrically).

    Initial rank: the whole unit mass on the seeds (``scale // n_seeds``
    each, non-seeds 0); per-iteration base: seeds get
    ``(100-damping_pct)·scale // (100·n_seeds)``, non-seeds 0. Same
    engine-exact integer contract as pagerank. Seeds not present in the
    graph still receive their teleport share (documented PPR semantics:
    the walk restarts there even if nothing links to them).
    """
    if iterations < 1:
        raise ValueError("personalized_pagerank: iterations must be >= 1")
    if not (0 < damping_pct < 100):
        raise ValueError("personalized_pagerank: damping_pct must be in (0, 100)")

    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    s = seeds.select(F.col(seed_col).alias("node")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .union(s.select("node"))
        .distinct()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    ed = e.join(deg, "src").localCheckpoint(eager=False)
    nodes = nodes.join(
        s.withColumn("__is_seed", F.lit(True)), "node", "left"
    ).select(
        "node", F.coalesce(F.col("__is_seed"), F.lit(False)).alias("is_seed")
    ).localCheckpoint(eager=False)
    n_seeds = nodes.filter("is_seed").count()
    if n_seeds == 0:
        raise ValueError("personalized_pagerank: seeds set is empty")
    init_u = scale // n_seeds
    base_u = (100 - damping_pct) * scale // (100 * n_seeds)

    seed_base = F.when(F.col("is_seed"), F.lit(base_u)).otherwise(F.lit(0))
    ranks = nodes.select(
        "node",
        F.when(F.col("is_seed"), F.lit(init_u))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("rank_u"),
    )
    contrib_expr = F.expr(f"(rank_u * {damping_pct}) div (100 * out_deg)")
    for it in range(iterations):
        msgs = (
            ed.join(ranks, ed["src"] == ranks["node"])
            .select(F.col("dst").alias("node"), contrib_expr.alias("c_u"))
            .groupBy("node")
            .agg(F.sum("c_u").alias("in_u"))
        )
        ranks = nodes.join(msgs, "node", "left").select(
            "node",
            (seed_base + F.coalesce(F.col("in_u"), F.lit(0)))
            .cast("long")
            .alias("rank_u"),
        )
        # cadenced truncation (see pagerank): each checkpoint call costs a
        # full planning pass; the rank tree references its predecessor
        # once, so a few unrolled rounds stay cheap to plan
        if (it + 1) % _CHECKPOINT_EVERY == 0 and it + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    iterations: int = 2,
) -> DataFrame:
    """Synchronous label-propagation community detection: every node
    starts labeled with its own id; each iteration it adopts the most
    frequent label among its neighbors (ties broken by SMALLEST label —
    fully deterministic, unlike the randomized textbook variant, so the
    result is reproducible across runs, engines, and cluster sizes and
    exactly unrollable in SQL). Edges are undirected (both directions
    unioned, self-loops dropped); isolated iterations keep a node's
    label when it has no neighbors (cannot happen after the union but
    guards malformed input).

    Output: ``(node, label)`` — nodes sharing a label after
    ``iterations`` rounds form the community.

    Scale shape: per iteration ONE src-keyed join (labels onto edges) +
    ONE (node, label) count aggregate + ONE per-node argmax window —
    all hash-partitioned by node, Pregel-lite like :func:`pagerank`;
    the labels relation is lazily checkpointed per round (lineage
    truncation, same policy as every iterative operator here).
    Synchronous + deterministic ties means fixed ``iterations`` give a
    well-defined result — this is the bounded-round contract the oracle
    can mirror (LPA's true fixpoint can oscillate; bounded rounds are
    the production form).
    """
    if iterations < 1:
        raise ValueError("label_propagation: iterations must be >= 1")
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    nodes = e.select(F.col("a").alias("node")).distinct().localCheckpoint(eager=False)
    labels = nodes.select("node", F.col("node").alias("label"))
    w = Window.partitionBy("node").orderBy(
        F.col("__c").desc(), F.col("label").asc()
    )
    for _ in range(iterations):
        msgs = e.join(labels, e["a"] == labels["node"]).select(
            F.col("b").alias("node"), "label"
        )
        best = (
            msgs.groupBy("node", "label")
            .agg(F.count(F.lit(1)).alias("__c"))
            .withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") == 1)
            .select("node", "label")
        )
        # per-round lazy checkpoint stays: the label frame feeds TWO
        # consumers next round (message join + keep-old fallback), so it
        # must be truncated for execution — and the persist() variant was
        # tried in r10 and measured slower (3.3 vs 2.9 s), same verdict
        # as hits' renorm chain
        labels = (
            nodes.join(best.withColumnRenamed("label", "__new"), "node", "left")
            .join(labels.withColumnRenamed("label", "__old"), "node", "left")
            .select("node", F.coalesce("__new", "__old").alias("label"))
            .localCheckpoint(eager=False)
        )
    return labels


def adamic_adar(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    max_degree: int | None = None,
    min_common: int = 1,
) -> DataFrame:
    """Adamic-Adar link-prediction scores over the undirected graph of
    ``edges``: for each node pair sharing at least ``min_common``
    neighbors, ``score = Σ_w 1/ln(deg(w))`` over common neighbors ``w``
    — the classic people-you-may-know / related-items signal where rare
    shared neighbors count more than ubiquitous ones (Adamic & Adar
    2003). Output ``(u, v, n_common, score)`` with ``u < v``; per-w
    contributions snap to integer micro-units before the SUM so Spark
    and any SQL oracle agree bit-for-bit regardless of addition order.
    A common neighbor has degree ≥ 2 by construction, so ``ln(deg)``
    never hits zero.

    Scale shape: the only quadratic step is the per-neighbor pair
    enumeration — adjacency self-joined on the common neighbor ``w``,
    Σ deg(w)² rows. ``max_degree`` is the hub guard: neighbors above the
    cap are excluded BEFORE the join (deterministic, not sampled), the
    same celebrity-node discipline as covisitation's capped relation —
    a hub's per-pair contribution ``1/ln(deg)`` is the smallest anyway,
    while its pair fan-out is the largest. Everything else is node-key
    equi-joins; the canonical edge relation feeds degrees + both join
    sides, so it is lineage-truncated once.
    """
    if min_common < 1:
        raise ValueError("adamic_adar: min_common must be >= 1")
    e = _undirected(edges, src, dst).localCheckpoint(eager=False)
    deg = _degrees(e)
    adj = e.select(F.col("u").alias("w"), F.col("v").alias("nbr")).unionAll(
        e.select(F.col("v").alias("w"), F.col("u").alias("nbr"))
    )
    # deg >= 2: a common neighbor has two distinct neighbors by
    # definition, and it keeps 1/ln(1) (infinity) out of the weight
    # column entirely — degree-1 rows could never join into a pair but
    # would still evaluate the division
    wd = adj.join(deg.withColumnRenamed("node", "w"), "w").filter(
        F.col("deg") >= 2
    )
    if max_degree is not None:
        wd = wd.filter(F.col("deg") <= F.lit(int(max_degree)))
    # micro-unit weight of one common neighbor: floor(1e6/ln(deg)+0.5)
    wd = wd.select(
        "w",
        "nbr",
        F.floor(F.lit(1000000.0) / F.log(F.col("deg").cast("double")) + F.lit(0.5))
        .cast("long")
        .alias("__w_u6"),
    ).localCheckpoint(eager=False)
    left = wd.select("w", F.col("nbr").alias("u"), "__w_u6")
    right = wd.select("w", F.col("nbr").alias("v"))
    pairs = left.join(right, "w").filter(F.col("u") < F.col("v"))
    return (
        pairs.groupBy("u", "v")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_common"),
            F.sum("__w_u6").cast("long").alias("__s_u6"),
        )
        .filter(F.col("n_common") >= F.lit(int(min_common)))
        .select(
            "u",
            "v",
            "n_common",
            (F.col("__s_u6").cast("double") / 1000000.0).alias("score"),
        )
    )


# Renorm safety envelope: a node's raw iteration score __s is bounded
# by the total mass n_nodes·scale, and the renorm multiplies it by the
# same n_nodes·scale target — so (n_nodes·scale)² must stay inside
# DECIMAL(38,0). With ANSI off the overflow would become NULL, which
# coalesce() silently turned into an all-zero score column (r9 advisor
# finding). _hits_effective_scale shrinks scale so the square always
# fits; pinned in tests/test_advice_r10.py.
_HITS_MAX_PRODUCT = 10**19 - 1


def _hits_effective_scale(n_nodes: int, scale: int) -> int:
    """Largest per-node scale ≤ ``scale`` with
    ``(n_nodes * scale)² < 10³⁸`` (DECIMAL(38,0)-safe renorm)."""
    safe = _HITS_MAX_PRODUCT // max(n_nodes, 1)
    if safe < 1:
        raise ValueError(
            f"hits: {n_nodes} nodes exceeds the DECIMAL(38,0) renorm "
            "envelope even at scale=1"
        )
    return min(scale, safe)


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    iterations: int = 3,
    scale: int = 10**12,
    checkpoint: bool = True,
) -> DataFrame:
    """Kleinberg's HITS (r9) over the directed graph ``edges`` —
    ``(node, hub_u, auth_u)`` in integer units after fixed
    ``iterations`` of the mutual-reinforcement loop: authorities are
    pointed at by good hubs, hubs point at good authorities. On a
    bipartite user→item graph the split is exactly the curation signal
    pair: hub = breadth of a user's engagement, authority = quality-
    weighted item popularity (PageRank's one score conflates them).

    Engine-exactness: the classic L2 normalization is replaced by SUM
    normalization to ``n_nodes × scale`` via truncating DECIMAL division
    against the 1-row iteration total (the Bradley-Terry renorm
    discipline) — rankings are identical (normalization is monotone)
    and every value is bit-reproducible in any engine, so the whole
    loop unrolls into a CTE oracle. Duplicate edges collapse first.

    Scale shape: per iteration, two equi-joins of the edge list against
    the node-sized score frame + two hash aggregates + a 1-row
    broadcast total — the Pregel-lite shape of :func:`pagerank`, same
    lazy lineage truncation per round. Overflow audit: Σ score ≤
    n·scale and the renorm computes raw × (n·scale) ≤ (n·scale)², so
    the effective scale is auto-shrunk via :func:`_hits_effective_scale`
    whenever ``n_nodes × scale`` would exceed 10¹⁹−1 — past the default
    scale's ~1e7-node ceiling the scores lose precision gracefully
    instead of NULLing into zeros (r9 advisor finding).
    """
    if iterations < 1:
        raise ValueError("hits: iterations must be >= 1")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    if checkpoint:
        e = e.localCheckpoint(eager=False)
        nodes = nodes.localCheckpoint(eager=False)
    n_nodes = nodes.count()  # bounded driver scalar, as in pagerank
    if n_nodes == 0:
        raise ValueError("hits: edge list is empty (no nodes)")
    scale = _hits_effective_scale(n_nodes, scale)
    target = n_nodes * scale
    dec = "decimal(38,0)"

    def renorm(raw: DataFrame, col: str) -> DataFrame:
        total = raw.agg(F.sum(F.col("__s").cast(dec)).alias("__t"))
        out = (
            nodes.join(raw, "node", "left")
            .crossJoin(F.broadcast(total))
            .select(
                "node",
                F.coalesce(
                    F.expr(
                        f"cast((cast(__s as {dec}) * {target}) div __t as bigint)"
                    ),
                    F.lit(0),
                ).alias(col),
            )
        )
        # lazy checkpoint per renorm: the persist() variant was tried in
        # r10 and measured ~2x SLOWER here (chained cache builds inside
        # the one final job beat the per-call planning cost they save —
        # unlike pagerank/LPA, every half-iteration both aggregates over
        # and joins the previous frame, so the cache chain is deep)
        return out.localCheckpoint(eager=False) if checkpoint else out

    hub = nodes.select("node", F.lit(scale).cast("long").alias("hub_u"))
    auth = None
    for it in range(iterations):
        a_raw = (
            e.join(hub, e["src"] == hub["node"])
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("hub_u").alias("__s"))
        )
        auth = renorm(a_raw, "auth_u")
        h_raw = (
            e.join(auth, e["dst"] == auth["node"])
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("auth_u").alias("__s"))
        )
        hub = renorm(h_raw, "hub_u")
        if checkpoint and (it + 1) % _CHECKPOINT_EVERY == 0 and it + 1 < iterations:
            hub = hub.localCheckpoint(eager=False)
    return nodes.join(hub, "node").join(auth, "node").select(
        "node", "hub_u", "auth_u"
    )
