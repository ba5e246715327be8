"""Distributed graph operators.

``connected_components`` implements the alternating large-star /
small-star algorithm (Kiveris et al., "Connected Components in MapReduce
and Beyond", SoCC'14): each round is two edge-set-sized shuffles
(a groupBy for per-node minima and a join to re-point edges), and the
number of rounds is O(log^2 n) REGARDLESS of component diameter — the
property plain min-label propagation lacks (propagation needs
diameter-many rounds, so a 10k-long chain of near-duplicate documents
takes 10k rounds; star contraction takes ~15).

All DataFrame ops; per-round ``localCheckpoint`` cuts the iterative
lineage so plans stay constant-size. No driver-side state — this is the
scale path behind :func:`onetl_spark.llm.dedup.dedup_survivors`.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

log = logging.getLogger(__name__)


def _canonical(edges: DataFrame) -> DataFrame:
    """Undirected edge set as distinct (max, min) pairs, self-loops dropped."""
    return (
        edges.select(
            F.greatest("src", "dst").alias("src"),
            F.least("src", "dst").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to u's minimum.

    Emits (v, m) for v in N(u), v > u, where m = min(N(u) + {u}).
    """
    nbrs = edges.unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")),
    )
    mins = nbrs.groupBy("src").agg(
        F.least(F.min("dst"), F.first("src")).alias("m"),
    )
    return (
        nbrs.join(mins, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Connect every smaller-or-equal neighbor of u (and u itself) to u's
    minimum smaller neighbor.

    With edges directed large→small, emits (v, m) for v in N(u) + {u},
    m = min(N(u)).
    """
    directed = _canonical(edges)  # src > dst
    mins = directed.groupBy("src").agg(F.min("dst").alias("m"))
    re_pointed = (
        directed.join(mins, "src")
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )
    self_edge = mins.select(F.col("src"), F.col("m").alias("dst"))
    return (
        re_pointed.unionAll(self_edge)
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Per-node triangle counts as ``(node, triangles)`` for an undirected
    edge set, via degree-ordered orientation (the MapReduce-standard
    algorithm, cf. Suri & Vassilvitskii, "Counting Triangles and the Curse
    of the Last Reducer", WWW'11).

    Each undirected edge is oriented from its lower-degree endpoint to the
    higher-degree one (ties by node id), which bounds every node's
    out-degree by O(sqrt(m)); the wedge join (out-edges ⋈ out-edges on
    their shared pivot) therefore generates O(m^1.5) candidates TOTAL no
    matter how skewed the degree distribution — a naive neighbor join on a
    web-scale graph with a celebrity node generates d(v)^2 ≈ 10^14 wedges
    from that one node alone. Three bounded shuffles: degree groupBy,
    wedge self-join, closing-edge join.

    The canonical edge set is ``localCheckpoint``-ed: it feeds the degree
    aggregate, the orientation join, and the closing-edge probe, and
    re-deriving the upstream (often an expensive pair-generation join)
    three times would triple the dominant cost.
    """
    canon = _canonical(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")),
    ).localCheckpoint(eager=False)
    both = canon.unionAll(
        canon.select(F.col("dst").alias("src"), F.col("src").alias("dst")),
    )
    deg = both.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).withColumnRenamed("src", "node")

    # orient lower(deg, id) → higher(deg, id); each unordered pair appears once
    d1 = deg.select(F.col("node").alias("src"), F.col("deg").alias("deg_src"))
    d2 = deg.select(F.col("node").alias("dst"), F.col("deg").alias("deg_dst"))
    with_deg = canon.join(d1, "src").join(d2, "dst")
    fwd = F.struct("deg_src", "src") < F.struct("deg_dst", "dst")
    oriented = with_deg.select(
        F.when(fwd, F.col("src")).otherwise(F.col("dst")).alias("lo"),
        F.when(fwd, F.col("dst")).otherwise(F.col("src")).alias("hi"),
    )

    # wedges around each pivot: pairs of out-neighbors, one per unordered pair
    o1 = oriented.select(F.col("lo").alias("pivot"), F.col("hi").alias("b"))
    o2 = oriented.select(F.col("lo").alias("pivot"), F.col("hi").alias("c"))
    wedges = o1.join(o2, "pivot").filter(F.col("b") < F.col("c"))

    # a triangle closes iff the (b, c) pair is itself an edge; the oriented
    # set holds each unordered pair exactly once under SOME orientation, so
    # probe the canonical (greater, lesser) key
    closing = canon.select(F.col("src").alias("cb"), F.col("dst").alias("cc"))
    tris = wedges.join(
        closing,
        (F.greatest("b", "c") == F.col("cb")) & (F.least("b", "c") == F.col("cc")),
    ).select("pivot", "b", "c")

    per_node = (
        tris.select(F.explode(F.array("pivot", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    # nodes in no triangle still appear, with 0
    return (
        deg.select("node")
        .join(per_node, "node", "left")
        .select("node", F.coalesce("triangles", F.lit(0)).alias("triangles"))
    )


def pagerank_fixed_point(
    edges: DataFrame,
    iterations: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 10**12,
    src: str = "src",
    dst: str = "dst",
    edge_weight: str | None = None,
) -> DataFrame:
    """PageRank over a directed edge set as ``(node, rank_fp)`` — ranks in
    FIXED-POINT integer arithmetic (units of 1/``scale``), so the result is
    bit-identical across engines, partition counts, and cluster sizes.

    Floating-point PageRank sums contributions in shuffle order, making the
    low bits run-dependent — a real lineage/reproducibility problem for a
    pipeline that feeds dedup or ranking decisions. Here every operation is
    integer (``div`` truncation, exact ``sum``), so a 1000-executor run and
    a laptop run agree exactly, and a DuckDB oracle can reproduce the
    numbers.

    **Multigraph semantics**: with ``edge_weight=None`` (default), parallel
    edges are collapsed to one (``.distinct()``) — SIMPLE-graph PageRank,
    where a node linking to the same target five times counts once. To make
    edge multiplicity matter, pass ``edge_weight``: an integer column whose
    values are summed per (src, dst); a node's mass then splits
    proportionally to summed weight (share = rank·w div Σw). Weights must
    be positive integers with ``max(rank_fp)·max(w) < 2^63`` (i.e. total
    per-source weight below ~9·10^6 at the default scale) — fixed-point
    exactness is preserved because every operation stays integer.

    Per iteration: one groupBy(dst) shuffle over the edge set for
    contributions, a node-sized join, and a scalar aggregate for dangling
    mass. ``localCheckpoint`` cuts lineage so plans stay constant-size.
    Total mass drifts by ≤ nodes×iterations units of 1/scale from
    truncation — documented, deterministic.
    """
    e = edges.select(
        F.col(src).alias("src"),
        F.col(dst).alias("dst"),
        (F.lit(1) if edge_weight is None else F.col(edge_weight)).cast("long").alias("w"),
    ).filter(F.col("src") != F.col("dst"))
    if edge_weight is None:
        e = e.distinct()
    else:
        # Enforce the documented positive-integer contract loudly: a NULL
        # weight would survive the per-(src,dst) sum and turn the node's
        # share NULL — rank mass silently vanishing breaks the conserved-
        # mass invariant; zero/negative weights corrupt shares the same
        # way. The probe evidence (min raw weight, null presence) rides
        # the SAME aggregate as the weight sum, so validating costs no
        # extra pass over the (often expensive) upstream edge generator.
        e = e.groupBy("src", "dst").agg(
            F.sum("w").alias("w"),
            F.min("w").alias("_wmin"),
            F.max(F.col("w").isNull().cast("int")).alias("_wnull"),
        )
    # every iteration joins the edge set; without materialization the
    # upstream (e.g. a pair-generation self-join) re-runs per iteration.
    # lazy: the weight-guard collect / node count below materializes the
    # checkpoint in its own job — eager paid a separate scheduling
    # round-trip first
    e = e.localCheckpoint(eager=False)
    if edge_weight is not None:
        # aggregate probe (one full-scan job that also materializes the
        # lazy checkpoint); the row lookup for the error message runs
        # only on the raise path, where cost is irrelevant
        any_bad = int(
            e.agg(
                F.coalesce(
                    F.max(
                        ((F.col("_wnull") == 1) | (F.col("_wmin") < 1)).cast("int")
                    ),
                    F.lit(0),
                ).alias("_b")
            ).first()["_b"]
        )
        if any_bad:
            bad = e.filter(
                (F.col("_wnull") == 1) | (F.col("_wmin") < 1)
            ).limit(1).collect()
            raise ValueError(
                f"edge_weight must be a positive integer; found min weight "
                f"{bad[0]['_wmin']!r} (null={bool(bad[0]['_wnull'])}) on edge "
                f"({bad[0]['src']!r}, {bad[0]['dst']!r})"
            )
        e = e.select("src", "dst", "w")
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()
    if n == 0:
        return nodes.select("node", F.lit(0).cast("long").alias("rank_fp"))

    # lazy: materialized inside iteration 1's dangling-broadcast job
    out_deg = (
        e.groupBy("src")
        .agg(F.sum("w").alias("out_deg"))
        .localCheckpoint(eager=False)
    )
    base = (damping_den - damping_num) * scale // (damping_den * n)

    ranks = nodes.select("node", F.lit(scale // n).cast("long").alias("rank_fp"))
    for _ in range(iterations):
        # checkpoint the degree-annotated ranks once per iteration: both
        # the dangling aggregate and the contribution pass read it, and
        # the former driver-side `collect()` of the dangling sum ran a
        # SECOND full job per iteration that re-executed this join before
        # the contribution pass rebuilt it again (guide §5: the driver
        # should do no data work; §2.4: don't compute the same join twice)
        with_deg = (
            ranks.join(out_deg, ranks["node"] == out_deg["src"], "left")
            .select("node", "rank_fp", "out_deg")
            # lazy: the dangling-broadcast build is the first consumer and
            # materializes it; the contribution pass reads the persisted copy
            .localCheckpoint(eager=False)
        )
        # dangling nodes spread their mass uniformly; the scalar rides a
        # 1-row broadcast instead of a collect — `div` truncation equals
        # the former Python `//` because the rank sum is non-negative
        dangling = with_deg.filter(F.col("out_deg").isNull()).agg(
            F.coalesce(F.sum("rank_fp"), F.lit(0)).alias("_dang")
        )
        contribs = (
            e.join(
                with_deg.filter(F.col("out_deg").isNotNull()),
                e["src"] == with_deg["node"],
            )
            .select("dst", F.expr("(rank_fp * w) div out_deg").alias("share"))
            .groupBy("dst")
            .agg(F.sum("share").alias("in_mass"))
        )
        ranks = (
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.coalesce(F.col("in_mass"), F.lit(0))
                    + F.expr(f"_dang div {n}")
                ).alias("in_total"),
            )
            .select(
                "node",
                F.expr(
                    f"CAST({base} + ({damping_num} * in_total) div {damping_den} AS LONG)"
                ).alias("rank_fp"),
            )
            # lazy: the next iteration's broadcast job (or the caller's
            # action, for the last round) materializes it
            .localCheckpoint(eager=False)
        )
    return ranks


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
) -> DataFrame:
    """Component label for every node appearing in ``edges``: the MIN node
    id of its connected component, as ``(node, rep)``.

    Each iteration runs large-star then small-star (two bounded shuffles
    over the *edge set*, never over any corpus the edges were derived
    from) and converges in O(log^2 n) iterations — on near-duplicate
    graphs, whose components are shallow, typically 2–4. Convergence is
    detected by edge-set fixpoint: each round's LAZY ``localCheckpoint``
    is materialized by a single probe aggregate computing (row count,
    order-independent xor-hash) in ONE job — the separate eager-
    checkpoint + count() pair cost two scheduling round-trips per round
    — and the authoritative ``exceptAll`` check runs only when both
    count and hash match (in practice exactly once, at the fixpoint;
    hash equality alone is never trusted for convergence).
    """

    def _probe(df: DataFrame) -> tuple[int, int]:
        row = df.agg(
            F.count(F.lit(1)).alias("_n"),
            # bit_xor over per-row xxhash64 is order/partitioning-
            # independent and overflow-free (no ANSI sum-overflow risk);
            # edge sets are distinct, so xor cancellation needs a true
            # hash collision — and exceptAll still confirms exactly
            F.coalesce(
                F.expr("bit_xor(xxhash64(src, dst))"), F.lit(0).cast("long")
            ).alias("_h"),
        ).first()
        return int(row["_n"]), int(row["_h"])

    cur = _canonical(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")),
    ).localCheckpoint(eager=False)
    cur_cnt, cur_hash = _probe(cur)

    for it in range(max_iter):
        nxt = _canonical(_small_star(_large_star(cur))).localCheckpoint(eager=False)
        nxt_cnt, nxt_hash = _probe(nxt)
        if (
            nxt_cnt == cur_cnt
            and nxt_hash == cur_hash
            and nxt.exceptAll(cur).limit(1).count() == 0
        ):
            cur = nxt
            log.info("connected_components converged after %d iteration(s)", it + 1)
            break
        cur, cur_cnt, cur_hash = nxt, nxt_cnt, nxt_hash
    else:
        log.warning(
            "connected_components stopped at max_iter=%d without a fixpoint",
            max_iter,
        )

    # At the fixpoint every edge is (node, component_min); component minima
    # themselves appear only on the dst side and represent themselves.
    non_roots = cur.groupBy("src").agg(F.min("dst").alias("rep")).select(
        F.col("src").alias("node"), "rep",
    )
    roots = (
        cur.select(F.col("dst").alias("node"))
        .distinct()
        .join(non_roots.select("node"), "node", "left_anti")
        .select("node", F.col("node").alias("rep"))
    )
    return non_roots.unionAll(roots)


def bfs_hops(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int = 6,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
) -> DataFrame:
    """Multi-source breadth-first hop distance over an undirected graph:
    ``(node, hops)`` for every node within ``max_hops`` of any source
    (sources themselves at hop 0); unreachable nodes are absent.

    Frontier expansion, the textbook distributed BFS: hop ``h`` joins the
    hop-``h-1`` frontier with the adjacency list (one edge-set-sized
    shuffle), anti-joins the visited set, and stops early when a frontier
    empties. Per-hop ``localCheckpoint`` keeps the plan constant-size and
    the emptiness probe is a bounded driver scalar (one per hop, at most
    ``max_hops`` of them). Work per hop is O(edges incident to the
    frontier); the visited set only grows, so total shuffled volume is
    O(max_hops x |edges|) worst-case — never quadratic in nodes. Unlike
    :func:`connected_components` (which only needs membership and so can
    use O(log^2 n) star contraction), hop DISTANCE is order-sensitive and
    needs the level-synchronous rounds.
    """
    nbrs = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nbrs = (
        nbrs.unionAll(nbrs.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    visited = (
        sources.select(F.col(node).alias("node"))
        .distinct()
        .withColumn("hops", F.lit(0).cast("long"))
        .localCheckpoint(eager=False)
    )
    frontier = visited
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(nbrs, frontier["node"] == nbrs["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("hops", F.lit(h).cast("long"))
            .localCheckpoint(eager=False)
        )
        # FULL count, not limit(1): every partition must materialize for
        # the next hop anyway, and a limit probe over a lazy checkpoint
        # executes in escalating partition waves that compute (not read)
        # the frontier when it is empty — the convergence case
        if not nxt.count():
            log.info("bfs_hops frontier empty after %d hop(s)", h - 1)
            break
        # every frontier is already checkpointed — the visited set stays a
        # LAZY union of those materialized RDDs (≤ max_hops parts, nothing
        # to recompute). Re-checkpointing the union copied the whole
        # visited set again every hop: O(V·hops) extra materialized rows
        # plus one extra blocking job per hop, for zero information.
        visited = visited.unionAll(nxt)
        frontier = nxt
    return visited


def random_walks(
    edges: DataFrame,
    seeds: DataFrame,
    walk_len: int = 4,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
    edge_weight: str | None = None,
) -> DataFrame:
    """Deterministic random walks over an undirected graph (the corpus
    generator for DeepWalk/node2vec-style graph embeddings): one walk per
    seed, ``walk_len`` steps, as ``(walk_id, step, node)`` rows with
    step 0 = the seed. A walk that reaches an isolated node stops early.

    The next hop is HASH-chosen, not RNG-chosen: neighbor index =
    ``md5(walk_id:step:node) % degree`` over the rank-ordered adjacency —
    re-running, re-sharding, or re-planning reproduces identical walks
    (the property RNG-based samplers lose on task retry, and what lets a
    DuckDB recursive CTE verify the walks bit-for-bit).

    With ``edge_weight`` (positive integers; NULL/non-positive raise like
    :func:`pagerank_fixed_point`), transition probability is
    weight-proportional: the hash draws ``r ∈ [0, Σw)`` and the neighbor
    owning the cumulative-weight slot ``lo ≤ r < lo+w`` takes the hop —
    still bit-deterministic, parallel edges summing their weights.

    Scale shape: the adjacency is ranked ONCE (row_number / cumulative
    weight per source, neighbors sorted — an edge-set window partitioned
    by node); each step is two hash joins keyed by node — (frontier ⋈
    degree) to pick the index, then ⋈ ranked adjacency on the rank (or
    the weight-slot range) — never a neighbor-ARRAY build, so a
    10^8-degree hub costs nothing beyond its edge rows. Per-step
    localCheckpoint keeps the plan constant-size.
    """
    from onetl_spark.llm.text import md5_long
    from pyspark.sql.window import Window as W

    cols = [F.col(src).alias("src"), F.col(dst).alias("dst")]
    if edge_weight:
        cols.append(F.col(edge_weight).cast("long").alias("_w"))
    nbrs = edges.select(*cols)
    rev = [F.col("dst").alias("src"), F.col("src").alias("dst")] + (
        [F.col("_w")] if edge_weight else []
    )
    nbrs = nbrs.unionAll(nbrs.select(*rev)).filter(F.col("src") != F.col("dst"))
    if edge_weight:
        if nbrs.filter(F.col("_w").isNull() | (F.col("_w") < 1)).limit(1).count():
            raise ValueError(
                f"random_walks: edge_weight '{edge_weight}' must be a positive "
                "integer on every edge (NULL/zero/negative found)"
            )
        agg = nbrs.groupBy("src", "dst").agg(F.sum("_w").alias("_w"))
        ranked = agg.withColumn(
            "_lo",
            F.coalesce(
                F.sum("_w").over(
                    W.partitionBy("src").orderBy("dst").rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        ).localCheckpoint(eager=False)
        degrees = ranked.groupBy("src").agg(F.sum("_w").alias("deg"))
        hop_cond = lambda pick: (
            (pick["_at"] == ranked["src"])
            & (pick["_r"] >= ranked["_lo"])
            & (pick["_r"] < ranked["_lo"] + ranked["_w"])
        )
    else:
        ranked = (
            nbrs.distinct()
            .withColumn("rank", F.row_number().over(W.partitionBy("src").orderBy("dst")) - 1)
            .localCheckpoint(eager=False)
        )
        degrees = ranked.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        hop_cond = lambda pick: (pick["_at"] == ranked["src"]) & (
            pick["_r"] == ranked["rank"]
        )

    cur = seeds.select(
        F.col(node).alias("walk_id"),
        F.lit(0).cast("long").alias("step"),
        F.col(node).alias("node"),
    ).localCheckpoint(eager=False)
    out = cur
    for step in range(1, walk_len + 1):
        pick = cur.join(degrees, cur["node"] == degrees["src"]).select(
            "walk_id",
            F.col("node").alias("_at"),
            F.pmod(
                md5_long(
                    F.concat_ws(
                        ":",
                        F.col("walk_id").cast("string"),
                        F.lit(str(step)),
                        F.col("node").cast("string"),
                    ),
                ),
                F.col("deg"),
            ).alias("_r"),
        )
        cur = (
            pick.join(ranked, hop_cond(pick))
            .select(
                "walk_id",
                F.lit(step).cast("long").alias("step"),
                F.col("dst").alias("node"),
            )
            .localCheckpoint(eager=False)
        )
        out = out.unionAll(cur)
    return out


def label_propagation(
    edges: DataFrame,
    rounds: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et al.
    2007) over an undirected edge set, made fully deterministic:
    ``rounds`` synchronous sweeps where every node simultaneously adopts
    the most frequent label among its NEIGHBORS, ties broken by the
    smallest label. Classic LPA breaks ties randomly and sweeps
    asynchronously — irreproducible across runs and engines; the
    synchronous + (max count, min label) rule makes the result a pure
    function of the edge set, so a SQL engine can replay it round by
    round and a re-run on 1000 executors agrees bit-for-bit.

    Returns ``(node, community)`` — community = the node's label after
    the final sweep (labels start as node ids). Every endpoint of the
    input appears in the output: a node whose only edges are self-loops
    has no neighbors to vote, so it keeps its own label — a singleton
    community, not a silently dropped row. Fixed small ``rounds``
    (default 3) rather than convergence detection: synchronous LPA can
    oscillate on bipartite structures, and in curation pipelines the
    bounded-round variant is what runs anyway (each round is one
    edge-shuffle; the cost model must be knowable up front).

    Scale shape per round: one (node,label)-keyed vote aggregate over
    the adjacency (map-side combined) and one ``max_by``-style argmax —
    no windows, no driver-side data. ``localCheckpoint`` cuts lineage so
    the plan stays constant-size across rounds, same as
    :func:`pagerank_fixed_point`.
    """
    # checkpoint the PROJECTED edge list first: both `adj` and the
    # singleton anti-join below consume it, and without the cut the
    # (potentially expensive) upstream edge-build lineage would execute
    # twice — once for the adjacency, once again for the final
    # singleton union (measured 2× the whole-query edge-build cost on
    # the supplier co-occurrence bench query)
    raw = edges.select(
        F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
    ).localCheckpoint(eager=False)
    e = raw.filter(
        F.col("u").isNotNull() & F.col("v").isNotNull() & (F.col("u") != F.col("v"))
    )
    adj = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    adj = adj.localCheckpoint(eager=False)

    # EVERY non-NULL endpoint of the input gets a label — including the
    # surviving side of an edge whose partner is NULL. Nodes whose
    # only edges are self-loops never receive votes, so their label is
    # their own id in every round — a STATIC singleton set computed once
    # and unioned at the end, not a per-round join: every node in adj
    # has >= 1 labeled neighbor each round, so the vote argmax already
    # covers the entire adj node set.
    adj_nodes = adj.select(F.col("u").alias("node")).distinct().localCheckpoint(eager=False)
    singletons = (
        raw.select(F.col("u").alias("node"))
        .unionAll(raw.select(F.col("v").alias("node")))
        .filter(F.col("node").isNotNull())
        .distinct()
        .join(adj_nodes, "node", "left_anti")
        .select("node", F.col("node").alias("community"))
    )

    labels = adj_nodes.select("node", F.col("node").alias("community"))
    for _ in range(rounds):
        votes = (
            adj.join(labels, adj["v"] == labels["node"])
            .groupBy(F.col("u").alias("node"), F.col("community").alias("lbl"))
            .agg(F.count(F.lit(1)).alias("c"))
        )
        # argmax by (count desc, label asc): maximize struct(c, -lbl)
        labels = (
            votes.groupBy("node")
            .agg(
                F.max(F.struct(F.col("c"), (-F.col("lbl")).alias("nl"))).alias("m")
            )
            .select("node", (-F.col("m.nl")).alias("community"))
            .localCheckpoint(eager=False)
        )
    return labels.unionAll(singletons)


def degree_assortativity(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Degree assortativity coefficient (Newman 2002): the Pearson
    correlation between the degrees at the two ends of every undirected
    edge — positive means hubs link to hubs (social nets), negative
    means hubs link to leaves (the internet, supply chains). THE
    one-number topology summary next to triangle count.

    Exactness: over both edge orientations the degree products and sums
    are INTEGER moments, so the correlation evaluates in one fixed
    double parenthesization any engine reproduces bit-for-bit; a
    degree-regular graph (zero variance) yields NULL (NULLIF'd
    denominator), matching the convention of the Pearson family in this
    repo. Cost: one degree aggregate + one broadcast-friendly
    degree-join per endpoint + a 1-row moment aggregate — no windows,
    no driver loops.
    """
    # materialize the symmetrized edge list once: it feeds the degree
    # aggregate AND the moment join, and callers commonly pass an edge
    # relation hiding an expensive pair-generation self-join — without a
    # checkpoint that upstream re-ran for every reference (the before-plan
    # scanned the base tables 24x). deg (node-sized) fans out to both
    # endpoints, so it is materialized too.
    both = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .localCheckpoint(eager=False)
    )
    deg = (
        both.groupBy("u")
        .agg(F.count(F.lit(1)).alias("d"))
        .select(F.col("u").alias("node"), "d")
        .localCheckpoint(eager=False)
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("dx"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dy"))
    j = both.join(du, "u").join(dv, "v")
    m = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dx").cast("double").alias("sx"),
        F.sum("dy").cast("double").alias("sy"),
        F.sum(F.col("dx") * F.col("dy")).cast("double").alias("sxy"),
        F.sum(F.col("dx") * F.col("dx")).cast("double").alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).cast("double").alias("syy"),
    )
    from onetl_spark.operators.stats import pearson_from_moments

    return pearson_from_moments(m, n_col="n").select(
        (F.col("n") / 2).cast("long").alias("n_edges"),
        F.col("pearson_r").alias("assortativity"),
    )


#: Default peel-round cap — a hard runaway stop, not an expected exit
#: (the `strategy/batch.py` MAX_ITERATIONS posture). The peel removes at
#: least one node per non-converged round, so 100 rounds cover any graph
#: whose tendrils are < 100 peel-layers deep — far past real-world depth.
KCORE_MAX_ITERATIONS = 100


def kcore_nodes(
    edges: DataFrame,
    k: int = 2,
    max_iter: int = KCORE_MAX_ITERATIONS,
    src: str = "src",
    dst: str = "dst",
    strict: bool = True,
) -> DataFrame:
    """The k-core of an undirected graph: the maximal subgraph where
    every node keeps degree ≥ k — the standard "dense backbone" filter
    (spam rings, core communities, influential-supplier clusters live in
    high cores; degree-1 tendrils don't).

    Classic synchronous peeling: each round drops every node whose
    CURRENT degree is below ``k`` and re-filters the edge list; the
    fixpoint is the k-core. Per round: one degree aggregate + two
    semi-joins keyed by node, with a ``localCheckpoint`` keeping the
    plan constant-size (the PageRank/LPA iteration shape). Early exit
    on convergence is detected from the per-round edge count the
    checkpoint already materializes — extra rounds past the fixpoint
    are no-ops, so a fixed-round replay (the oracle) matches whenever
    the peel converges within ``max_iter``.

    ``max_iter`` is a runaway CAP, not a result knob: if it is hit
    without a fixpoint the returned set is NOT the k-core, so under
    ``strict=True`` (default) that raises ``RuntimeError`` instead of
    shipping wrong density analytics; ``strict=False`` downgrades to
    the old logged warning for exploratory use. Returns surviving
    ``(node, degree)``.
    """
    if k < 1:
        raise ValueError(f"kcore_nodes: k must be >= 1, got {k}")
    cur = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .localCheckpoint(eager=False)
    )
    n_edges = cur.count()
    for it in range(max_iter):
        deg = cur.groupBy("u").agg(F.count(F.lit(1)).alias("_d"))
        keep = deg.filter(F.col("_d") >= k).select("u")
        nxt = (
            cur.join(keep, "u", "left_semi")
            .join(keep.select(F.col("u").alias("v")), "v", "left_semi")
            .localCheckpoint(eager=False)
        )
        n_next = nxt.count()
        cur = nxt
        if n_next == n_edges:
            log.info("kcore_nodes: converged after %d round(s)", it + 1)
            break
        n_edges = n_next
    else:
        if strict:
            raise RuntimeError(
                f"kcore_nodes: no fixpoint after max_iter={max_iter} rounds "
                f"— the surviving set is NOT the {k}-core; raise max_iter "
                "(or pass strict=False to accept the partial peel)"
            )
        log.warning(
            "kcore_nodes: stopped at max_iter=%d without a fixpoint", max_iter
        )
    return cur.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).alias("degree")
    )


def _edge_support(canon: DataFrame) -> DataFrame:
    """Triangle support per canonical edge (u < v): for every triangle
    x < y < z found by the degree-free two-join enumeration, each of its
    three edges gains one support. One self-join keyed by the shared
    endpoint + one edge-existence join — the same bounded shape as
    :func:`triangle_count`, O(sum of deg^2) wedges, never node-quadratic.
    Edges on no triangle are absent (support 0)."""
    a, b, c = canon.alias("a"), canon.alias("b"), canon.alias("c")
    tri = (
        a.join(b, on=[F.col("a.u") == F.col("b.u"), F.col("a.v") < F.col("b.v")])
        .join(
            c,
            on=[F.col("c.u") == F.col("a.v"), F.col("c.v") == F.col("b.v")],
            how="left_semi",
        )
        .select(
            F.col("a.u").alias("x"), F.col("a.v").alias("y"), F.col("b.v").alias("z")
        )
    )
    sides = (
        tri.select(F.col("x").alias("u"), F.col("y").alias("v"))
        .unionAll(tri.select(F.col("x").alias("u"), F.col("z").alias("v")))
        .unionAll(tri.select(F.col("y").alias("u"), F.col("z").alias("v")))
    )
    return sides.groupBy("u", "v").agg(F.count(F.lit(1)).alias("support"))


def ktruss_edges(
    edges: DataFrame,
    k: int = 3,
    max_iter: int = KCORE_MAX_ITERATIONS,
    src: str = "src",
    dst: str = "dst",
    strict: bool = True,
) -> DataFrame:
    """The k-truss of an undirected graph: the maximal subgraph where
    every EDGE lies on >= k-2 triangles — a strictly denser backbone
    than the k-core (a k-truss is always inside the (k-1)-core), the
    standard cohesion filter when degree alone over-admits (hub-and-
    spoke stars have high degree but zero triangles).

    Reference parity: onetl has no graph engine; the spec is the
    classic truss decomposition (Cohen 2008) re-expressed as the
    synchronous DataFrame peel of :func:`kcore_nodes` with triangle
    SUPPORT in place of degree: each round recomputes per-edge support
    (one wedge self-join + one existence semi-join, see
    :func:`_edge_support`) and drops edges below ``k - 2``; the
    fixpoint is the k-truss. ``localCheckpoint`` per round keeps the
    plan constant-size; convergence is read off the edge count the
    checkpoint already materializes. ``max_iter`` is a runaway CAP —
    hitting it without a fixpoint raises under ``strict=True``
    (the ``kcore_nodes`` posture), because the survivors would NOT be
    the k-truss. Returns canonical surviving edges
    ``(src, dst, support)`` with their fixpoint support.

    100-TB shape: per round the wedge join is keyed by the shared
    endpoint (skew-bounded by the max degree of the CURRENT survivor
    set, which peeling only shrinks) and every shuffle is edge-set-
    sized; rounds are O(peel depth), the same iterative-graph cost
    class as k-core/LPA — no node-quadratic stage anywhere.
    """
    if k < 2:
        raise ValueError(f"ktruss_edges: k must be >= 2, got {k}")
    need = k - 2
    cur = (
        edges.select(
            F.least(src, dst).alias("u"), F.greatest(src, dst).alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        # lazy: the count() below materializes the checkpoint in the
        # same job (eager + count paid two scheduling round-trips
        # per peel round — the fixed cost that dominates this loop)
        .localCheckpoint(eager=False)
    )
    n_edges = cur.count()
    for it in range(max_iter):
        sup = _edge_support(cur)
        nxt = (
            cur.join(sup.filter(F.col("support") >= need), ["u", "v"], "left_semi")
            .localCheckpoint(eager=False)
            if need > 0
            else cur
        )
        n_next = nxt.count()
        cur = nxt
        if n_next == n_edges:
            log.info("ktruss_edges: converged after %d round(s)", it + 1)
            break
        n_edges = n_next
    else:
        if strict:
            raise RuntimeError(
                f"ktruss_edges: no fixpoint after max_iter={max_iter} rounds "
                f"— the surviving edges are NOT the {k}-truss; raise "
                "max_iter (or pass strict=False to accept the partial peel)"
            )
        log.warning(
            "ktruss_edges: stopped at max_iter=%d without a fixpoint", max_iter
        )
    final_sup = _edge_support(cur)
    return (
        cur.join(final_sup, ["u", "v"], "left")
        .select(
            F.col("u").alias("src"),
            F.col("v").alias("dst"),
            F.coalesce("support", F.lit(0)).cast("long").alias("support"),
        )
    )


def multi_source_distances(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 4,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
) -> DataFrame:
    """Per-seed BFS distances ``(seed, node, dist)`` over an undirected
    graph — :func:`bfs_hops` generalized to keep each seed's OWN
    distance instead of collapsing to the minimum, the primitive behind
    landmark-based centrality/embedding (seeds are a small chosen set,
    typically 16–64 landmarks, so state is |seeds| x reachable nodes —
    bounded by construction, and every frontier shuffle is keyed by the
    graph node, not the seed, so landmark count adds no skew).

    Level-synchronous frontier expansion with a per-round
    ``localCheckpoint`` and an early exit on an empty frontier; pairs
    beyond ``max_hops`` are absent (callers treat them as unreachable).
    """
    nbrs = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nbrs = (
        nbrs.unionAll(nbrs.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    visited = (
        seeds.select(F.col(node).alias("seed"))
        .distinct()
        .select("seed", F.col("seed").alias("node"), F.lit(0).cast("long").alias("dist"))
        .localCheckpoint(eager=False)
    )
    frontier = visited
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(nbrs, frontier["node"] == nbrs["src"])
            .select("seed", F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("seed", "node"), ["seed", "node"], "left_anti")
            .withColumn("dist", F.lit(h).cast("long"))
            .localCheckpoint(eager=False)
        )
        # FULL count — same rationale as bfs_hops: one materializing job,
        # no limit-probe partition waves on the lazy checkpoint
        if not nxt.count():
            log.info("multi_source_distances: frontiers empty after %d hop(s)", h - 1)
            break
        # same as bfs_hops: frontiers are checkpointed, the visited union
        # stays lazy — no per-hop re-materialization of the whole set
        visited = visited.unionAll(nxt)
        frontier = nxt
    return visited


def harmonic_centrality(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 4,
    scale: int = 10**12,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
) -> DataFrame:
    """Landmark-approximated harmonic centrality: for every node,
    ``sum over landmarks l of 1/d(l, node)`` (d > 0, pairs beyond
    ``max_hops`` contribute 0) — the standard sampled estimator for
    closeness-style centrality at scale, where exact all-pairs BFS is
    off the table. Emitted as integer fixed-point ``scale // d`` sums
    (``harmonic_fp``) so the result is bit-exact reproducible and
    oracle-checkable — the float formulation would be order-sensitive.
    Also returns ``n_reached`` (landmarks within range). Rides
    :func:`multi_source_distances`; one integer aggregate on top.
    """
    dists = multi_source_distances(
        edges, seeds, max_hops=max_hops, src=src, dst=dst, node=node
    )
    return (
        dists.filter(F.col("dist") > 0)
        .groupBy("node")
        .agg(
            F.sum(F.expr(f"{scale} div dist")).cast("long").alias("harmonic_fp"),
            F.count(F.lit(1)).cast("long").alias("n_reached"),
        )
    )


def weighted_sssp(
    edges: DataFrame,
    sources: DataFrame,
    max_iter: int = 20,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    node: str = "node",
    strict: bool = True,
) -> DataFrame:
    """Multi-source weighted shortest-path distances over a DIRECTED
    edge set (callers symmetrize for undirected graphs) — distributed
    Bellman–Ford by synchronous relaxation rounds, the weighted
    companion to :func:`bfs_hops` (hop counts ignore edge cost; supply
    networks, latency graphs, and similarity graphs don't). Returns
    ``(node, dist)`` for every node reachable from any source, with
    ``dist`` the exact integer minimum path cost.

    Each round relaxes every edge out of the current distance set and
    takes the per-node minimum of (old ∪ relaxed) — after round r the
    distances are exactly "min cost over paths of <= r edges", so a
    fixed-round declarative replay (the oracle) matches whenever the
    fixpoint is reached within ``max_iter``. Convergence is detected by
    an improvement count (any node whose distance shrank or appeared);
    hitting ``max_iter`` without the fixpoint raises under
    ``strict=True`` — partial distances are upper bounds, not answers
    (the ``kcore_nodes`` posture). Weights must be non-negative
    integers: negative weights would need n-1 guaranteed rounds, and
    float costs would make the min shuffle-order-dependent.

    100-TB shape: per round one edge-sized join keyed by the frontier
    node + one node-keyed min aggregate, ``localCheckpoint`` keeping
    the plan constant-size; rounds are bounded by the weighted-graph
    diameter — the iterative-graph cost class of BFS/LPA/k-core.
    """
    w_col = F.col(weight).cast("long")
    ed = edges.select(
        F.col(src).alias("_s"), F.col(dst).alias("_d"), w_col.alias("_w")
    )
    # checkpoint FIRST (lazy), then probe: the probe's job materializes
    # the checkpoint, so the (often expensive) upstream edge build runs
    # once — probing the raw relation before an eager checkpoint paid the
    # full upstream twice (once for the probe, once to materialize)
    ed = ed.localCheckpoint(eager=False)
    # aggregate probe, not filter+limit: one full-scan job materializes
    # the checkpoint AND yields the guard flag (a near-empty limit probe
    # on a lazy checkpoint pays escalating compute waves)
    neg = (
        ed.agg(
            F.coalesce(F.max((F.col("_w") < 0).cast("int")), F.lit(0)).alias("_neg")
        ).first()["_neg"]
    )
    if neg:
        raise ValueError("weighted_sssp: negative edge weights are not supported")
    dist = (
        sources.select(F.col(node).alias("node"))
        .distinct()
        .withColumn("dist", F.lit(0).cast("long"))
        .localCheckpoint(eager=False)
    )
    for it in range(max_iter):
        relaxed = (
            dist.join(ed, dist["node"] == ed["_s"])
            .select(F.col("_d").alias("node"), (F.col("dist") + F.col("_w")).alias("dist"))
        )
        # convergence detection rides the SAME min-aggregation: old rows
        # are tagged, so each node's prior distance falls out as
        # min(dist WHERE old) — a node improved iff it is new (_od NULL)
        # or its min dropped. The previous separate nxt⋈dist probe was a
        # second node-keyed shuffle per round; the filter below scans the
        # just-checkpointed partitions with no exchange at all.
        nxt = (
            dist.select("node", "dist", F.lit(True).alias("_old"))
            .unionAll(relaxed.select("node", "dist", F.lit(False).alias("_old")))
            .groupBy("node")
            .agg(
                F.min("dist").alias("dist"),
                F.min(F.when(F.col("_old"), F.col("dist"))).alias("_od"),
            )
            .localCheckpoint(eager=False)
        )
        # ONE full-scan aggregate materializes the lazy checkpoint AND
        # yields the convergence flag. A limit(1) probe here is a trap on
        # a lazy checkpoint: CollectLimit executes in escalating partition
        # waves (1, 4, 16, ...), and when the filter is near-empty (every
        # converging round) each wave COMPUTES fresh partitions instead of
        # reading cached ones — measured 1.4-1.9x on the sssp/harmonic
        # bench queries vs this single-job probe.
        improved = int(
            nxt.agg(
                F.coalesce(
                    F.max(
                        (
                            F.col("_od").isNull() | (F.col("dist") < F.col("_od"))
                        ).cast("int")
                    ),
                    F.lit(0),
                ).alias("_i")
            ).first()["_i"]
        )
        dist = nxt.select("node", "dist")
        if not improved:
            log.info("weighted_sssp: converged after %d round(s)", it + 1)
            break
    else:
        if strict:
            raise RuntimeError(
                f"weighted_sssp: no fixpoint after max_iter={max_iter} rounds "
                "— distances are only <=max_iter-edge upper bounds; raise "
                "max_iter (or pass strict=False to accept them)"
            )
        log.warning(
            "weighted_sssp: stopped at max_iter=%d without a fixpoint", max_iter
        )
    return dist


def hits_fixed_point(
    edges: DataFrame,
    iterations: int = 3,
    scale: int = 10**9,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg, "Authoritative Sources in a
    Hyperlinked Environment", JACM 1999) over a directed edge set, as
    ``(node, hub_fp, auth_fp)`` in FIXED-POINT integer units of
    1/``scale`` — bit-identical across engines and cluster sizes, like
    :func:`pagerank_fixed_point` (reference spec: onetl has no graph
    operators; this extends the analytics surface the same way).

    Per iteration: ``auth_raw(v) = sum of hub(u) over edges u->v`` then
    L1-normalize to total mass ``scale``; ``hub_raw(u) = sum of
    normalized auth(v) over edges u->v`` then L1-normalize. Mutual
    reinforcement with truncating integer division only.

    Overflow contract: after each L1 normalization every score and every
    raw sum is ``<= scale``, so the ``raw * scale`` rescale product is
    ``<= scale**2`` — with the default ``scale=10**9`` that is ``10**18
    < 2**63``, all-BIGINT safe. Raising ``scale`` above ``3*10**9``
    breaks the bound; raise it only alongside a DECIMAL rescale.

    Scale shape: each half-iteration is one edge-keyed join + one
    groupBy shuffle over the edge set, a 1-row total broadcast for the
    normalizer, and a node-sized join — no windows, no driver-side
    loops over data. ``localCheckpoint`` cuts lineage per iteration so
    the plan stays constant-size.
    """
    if iterations < 1:
        raise ValueError("hits_fixed_point: iterations must be >= 1")
    if scale < 1 or scale > 3 * 10**9:
        raise ValueError(
            "hits_fixed_point: scale must be in [1, 3e9] (see overflow contract)"
        )
    # lazy checkpoints: the count() below materializes BOTH (edge set,
    # node set) in one job — eager+eager+count was three sequential jobs
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()
    if n == 0:
        return nodes.select(
            "node",
            F.lit(0).cast("long").alias("hub_fp"),
            F.lit(0).cast("long").alias("auth_fp"),
        )

    def _half_step(score: DataFrame, key: str, out_key: str, out_col: str) -> DataFrame:
        """One reinforcement half-step: sum `score` over edges grouped by
        `out_key`, then L1-normalize the sums back to total mass `scale`.
        The raw sums are checkpointed BEFORE fan-out — both the 1-row
        normalizer and the node re-join read them, and the checkpoint also
        keeps the iteration-to-iteration plan constant-size (one edge-join
        job per half-step instead of two)."""
        raw = (
            e.join(score, e[key] == score["node"])
            .groupBy(F.col(out_key).alias("node"))
            .agg(F.sum("s").alias("_raw"))
            .localCheckpoint(eager=False)
        )
        total = raw.agg(F.coalesce(F.sum("_raw"), F.lit(0)).alias("_t"))
        return (
            nodes.join(raw, "node", "left")
            .crossJoin(F.broadcast(total))
            .select(
                "node",
                F.expr(
                    f"CAST(CASE WHEN _t = 0 THEN 0 "
                    f"ELSE (coalesce(_raw, 0) * {scale}) div _t END AS LONG)"
                ).alias(out_col),
            )
        )

    hubs = nodes.select("node", F.lit(scale // n).cast("long").alias("s"))
    auths = None
    for _ in range(iterations):
        auths = _half_step(hubs, "src", "dst", "s")
        hubs = _half_step(auths, "dst", "src", "s")
    return (
        nodes.join(hubs.select("node", F.col("s").alias("_h")), "node", "left")
        .join(auths.select("node", F.col("s").alias("_a")), "node", "left")
        .select(
            "node",
            F.coalesce("_h", F.lit(0)).cast("long").alias("hub_fp"),
            F.coalesce("_a", F.lit(0)).cast("long").alias("auth_fp"),
        )
    )


def adamic_adar(edges: DataFrame, top_k: int = 20) -> DataFrame:
    """Adamic–Adar link prediction over an undirected edge list
    ``(src, dst)`` (unique pairs, ``src < dst``): score candidate NEW
    edges by ``Σ_{n ∈ N(a)∩N(b)} 1/ln(deg(n))`` — the
    rare-neighbor-weighted refinement of the neighborhood-Jaccard
    baseline (a shared 2-degree broker is strong evidence; a shared
    3000-degree hub is none). Reference semantics: Adamic & Adar,
    "Friends and neighbors on the Web" (2003).

    Scale shape: candidates come from the WEDGE join (pairs sharing a
    neighbor), never an all-pairs scan; each wedge row contributes a
    round-9 ``1/ln(deg)`` term re-accumulated as a decimal so the
    per-pair sum is order-independent; existing edges drop via
    anti-join; the global top-k has a deterministic tie-break (score
    desc, pair asc). A shared neighbor has degree ≥ 2 by construction,
    so ``ln(deg)`` is never 0.
    """
    e = edges.select("src", "dst").localCheckpoint(eager=False)
    both = e.unionAll(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = both.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    w1 = both.select(F.col("dst").alias("n"), F.col("src").alias("a"))
    w2 = both.select(F.col("dst").alias("n"), F.col("src").alias("b"))
    wedge = w1.join(w2, "n").filter(F.col("a") < F.col("b"))
    term = F.round(
        F.lit(1.0) / F.log(F.col("deg").cast("double")), 9
    ).cast("decimal(38,9)")
    cand = (
        wedge.join(deg.select(F.col("src").alias("n"), "deg"), "n")
        .groupBy("a", "b")
        .agg(
            F.count(F.lit(1)).alias("common_neighbors"),
            F.sum(term).cast("double").alias("_aa"),
        )
        .join(
            e.select(F.col("src").alias("a"), F.col("dst").alias("b")),
            ["a", "b"],
            "left_anti",
        )
    )
    return (
        cand.select(
            F.col("a").alias("src"),
            F.col("b").alias("dst"),
            F.col("common_neighbors").cast("long").alias("common_neighbors"),
            F.round(F.col("_aa"), 9).alias("adamic_adar"),
        )
        .orderBy(F.col("adamic_adar").desc(), F.col("src").asc(), F.col("dst").asc())
        .limit(top_k)
    )


def partition_modularity(
    edges: DataFrame, labels: DataFrame, label_col: str = "community"
) -> DataFrame:
    """Newman modularity contribution of each community of a GIVEN node
    partition over an undirected edge list ``(src, dst)`` — "does this
    attribute partition (nation, region, detected community) actually
    concentrate edges?": ``q_c = e_c/m − (d_c/2m)²`` per community,
    summing to Q. ``labels`` maps ``node →`` *label_col*; nodes absent
    from the graph contribute nothing, unlabeled graph nodes are
    dropped (document the coverage separately). Returns one row per
    community ``(community, n_nodes, internal_edges, degree_sum,
    q_contrib)``, ordered, with exact integer counts and one pinned
    double expression per row.

    Scale shape: two broadcast-label joins on the edge list + one
    degree aggregate — no wedge/pair blowup, community count is
    attribute-bounded.
    """
    # lazy: the count() materializes the checkpoint in the same job
    e = edges.select("src", "dst").localCheckpoint(eager=False)
    lab = labels.select(
        F.col(labels.columns[0]).alias("_id"), F.col(label_col).alias("_c")
    )
    m_edges = e.count()
    if m_edges == 0:
        raise ValueError("partition_modularity: edge list is empty")
    both = e.unionAll(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = both.groupBy("src").agg(F.count(F.lit(1)).alias("_deg"))
    node_c = deg.join(
        F.broadcast(lab), deg["src"] == lab["_id"]
    ).select("src", "_deg", "_c")
    per_c = node_c.groupBy("_c").agg(
        F.count(F.lit(1)).alias("n_nodes"), F.sum("_deg").alias("degree_sum")
    )
    la = lab.select(F.col("_id").alias("src"), F.col("_c").alias("_ca"))
    lb = lab.select(F.col("_id").alias("dst"), F.col("_c").alias("_cb"))
    internal = (
        e.join(F.broadcast(la), "src")
        .join(F.broadcast(lb), "dst")
        .filter(F.col("_ca") == F.col("_cb"))
        .groupBy(F.col("_ca").alias("_c"))
        .agg(F.count(F.lit(1)).alias("internal_edges"))
    )
    j = per_c.join(internal, "_c", "left").select(
        F.col("_c").alias(label_col),
        F.col("n_nodes").cast("long").alias("n_nodes"),
        F.coalesce("internal_edges", F.lit(0)).cast("long").alias("internal_edges"),
        F.col("degree_sum").cast("long").alias("degree_sum"),
    )
    md = float(m_edges)
    q = (
        F.col("internal_edges").cast("double") / F.lit(md)
        - (F.col("degree_sum").cast("double") / F.lit(2.0 * md))
        * (F.col("degree_sum").cast("double") / F.lit(2.0 * md))
    )
    return j.withColumn("q_contrib", F.round(q, 9)).orderBy(label_col)


def personalized_pagerank_fixed_point(
    edges: DataFrame,
    seeds: DataFrame,
    iterations: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 10**12,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Personalized PageRank (restart at a SEED set) in the same
    bit-exact fixed-point integer arithmetic as
    :func:`pagerank_fixed_point`: the teleport mass — and every
    dangling node's mass — returns to the seeds instead of the whole
    graph, so ranks measure proximity TO THE SEEDS (the seed-based
    relevance/recommendation primitive). ``seeds`` is a one-column
    (``node``) DataFrame; seed rows not present in the graph are
    ignored. Per iteration: one groupBy(dst) shuffle + a node-sized
    join + a scalar dangling aggregate — identical cost shape to
    global PageRank. Returns ``(node, rank_fp)``.
    """
    # lazy checkpoints: the seed count below materializes the whole
    # (edge set, node set, seed set) chain in ONE job — three eager
    # checkpoints + count paid four sequential scheduling round-trips
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    seed_nodes = (
        nodes.join(seeds.select(F.col("node")).distinct(), "node")
        .localCheckpoint(eager=False)
    )
    n_seeds = seed_nodes.count()
    if n_seeds == 0:
        raise ValueError(
            "personalized_pagerank_fixed_point: no seed appears in the graph"
        )
    out_deg = (
        e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
        .localCheckpoint(eager=False)
    )
    base = (damping_den - damping_num) * scale // (damping_den * n_seeds)
    marked = nodes.join(
        seed_nodes.select(F.col("node"), F.lit(1).alias("_seed")), "node", "left"
    ).select("node", F.coalesce("_seed", F.lit(0)).alias("_seed"))
    ranks = marked.select(
        "node",
        F.when(F.col("_seed") == 1, F.lit(scale // n_seeds))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("rank_fp"),
    )
    for _ in range(iterations):
        # same collect-free dangling pattern as pagerank_fixed_point: one
        # checkpointed degree join feeds both consumers, the scalar rides
        # a 1-row broadcast (`div` == `//` on the non-negative sum)
        with_deg = (
            ranks.join(out_deg, ranks["node"] == out_deg["src"], "left")
            .select("node", "rank_fp", "out_deg")
            # lazy: the dangling-broadcast build is the first consumer and
            # materializes it; the contribution pass reads the persisted copy
            .localCheckpoint(eager=False)
        )
        dangling = with_deg.filter(F.col("out_deg").isNull()).agg(
            F.coalesce(F.sum("rank_fp"), F.lit(0)).alias("_dang")
        )
        contribs = (
            e.join(
                with_deg.filter(F.col("out_deg").isNotNull()),
                e["src"] == with_deg["node"],
            )
            .select("dst", F.expr("rank_fp div out_deg").alias("share"))
            .groupBy("dst")
            .agg(F.sum("share").alias("in_mass"))
        )
        ranks = (
            marked.join(contribs, marked["node"] == contribs["dst"], "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                "_seed",
                (
                    F.coalesce(F.col("in_mass"), F.lit(0))
                    + F.when(
                        F.col("_seed") == 1, F.expr(f"_dang div {n_seeds}")
                    ).otherwise(F.lit(0))
                ).alias("in_total"),
            )
            .select(
                "node",
                (
                    F.when(F.col("_seed") == 1, F.lit(base)).otherwise(F.lit(0))
                    + F.expr(
                        f"({damping_num} * in_total) div {damping_den}"
                    )
                )
                .cast("long")
                .alias("rank_fp"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks
