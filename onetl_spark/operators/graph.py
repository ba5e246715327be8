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
    detected by edge-set fixpoint (an ``exceptAll`` probe, edge-set-sized).
    Rounds are ``localCheckpoint``-ed so the plan does not grow with the
    iteration count.
    """
    cur = _canonical(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")),
    ).localCheckpoint(eager=True)
    cur_cnt = cur.count()

    for it in range(max_iter):
        nxt = _canonical(_small_star(_large_star(cur))).localCheckpoint(eager=True)
        nxt_cnt = nxt.count()
        if nxt_cnt == cur_cnt and nxt.exceptAll(cur).limit(1).count() == 0:
            cur = nxt
            log.info("connected_components converged after %d iteration(s)", it + 1)
            break
        cur, cur_cnt = nxt, nxt_cnt
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
