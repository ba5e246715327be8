"""Global ranking without a single-partition sort (operators/ranking.py).

Value tests prove the bucket-window + prefix-offset decomposition equals
the partition-less window definition (including duplicate leading keys
straddling bucket boundaries); the plan test proves the reason the
module exists — no ``Exchange SinglePartition`` in the executed plan.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from onetl_spark.operators.ranking import exact_ntile, global_row_index


@pytest.fixture(scope="module")
def skewed(spark):
    # heavy duplication in the order key: ~50 distinct values over 5000
    # rows guarantees equal keys cross any 8-bucket boundary placement
    return spark.range(5000).select(
        F.col("id").alias("rid"),
        (F.pmod(F.col("id") * 2654435761, F.lit(50))).alias("k"),
    ).cache()


def test_global_row_index_matches_window_definition(spark, skewed):
    got = global_row_index(skewed, "k", ("rid",), buckets=8)
    ref = skewed.withColumn(
        "row_idx", F.row_number().over(W.orderBy(F.col("k").asc(), F.col("rid").asc()))
    )
    assert got.join(ref, ["rid", "k", "row_idx"]).count() == 5000


def test_global_row_index_is_contiguous_and_unique(spark, skewed):
    got = global_row_index(skewed, "k", ("rid",), buckets=8)
    stats = got.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("row_idx").alias("d"),
        F.min("row_idx").alias("lo"),
        F.max("row_idx").alias("hi"),
    ).first()
    assert (stats["n"], stats["d"], stats["lo"], stats["hi"]) == (5000, 5000, 1, 5000)


def test_global_row_index_rejects_null_order_keys(spark):
    df = spark.createDataFrame([(1, 1.0), (2, None)], "rid long, k double")
    with pytest.raises(ValueError, match="NULL"):
        global_row_index(df, "k", ("rid",))


def test_global_row_index_timestamp_and_date_keys(spark):
    df = spark.createDataFrame(
        [(i, f"2024-01-{(i % 27) + 1:02d}") for i in range(200)], "rid long, d string"
    ).select("rid", F.col("d").cast("date").alias("d"))
    got = global_row_index(df, "d", ("rid",), buckets=4)
    ref = df.withColumn(
        "row_idx", F.row_number().over(W.orderBy(F.col("d").asc(), F.col("rid").asc()))
    )
    assert got.join(ref, ["rid", "d", "row_idx"]).count() == 200


@pytest.mark.parametrize("n,rows", [(10, 5000), (7, 5000), (13, 11), (4, 3)])
def test_exact_ntile_matches_builtin(spark, n, rows):
    df = spark.range(rows).select(
        F.col("id").alias("rid"),
        F.pmod(F.col("id") * 48271, F.lit(97)).cast("double").alias("v"),
    )
    got = exact_ntile(df, n, "v", ("rid",), tile_col="tile", buckets=8)
    ref = df.withColumn(
        "tile", F.ntile(n).over(W.orderBy(F.col("v").asc(), F.col("rid").asc()))
    )
    assert got.join(ref, ["rid", "v", "tile"]).count() == rows


def test_exact_ntile_rejects_nonpositive_n(spark, skewed):
    with pytest.raises(ValueError, match="positive"):
        exact_ntile(skewed, 0, "k", ("rid",))


def test_no_single_partition_exchange(spark, skewed):
    from tests.test_plans import executed_plan

    got = global_row_index(skewed, "k", ("rid",), buckets=8)
    plan = executed_plan(got)
    assert "Exchange SinglePartition" not in plan
    # the reference window form DOES plan one — prove the contrast holds
    ref = skewed.withColumn(
        "row_idx", F.row_number().over(W.orderBy(F.col("k").asc(), F.col("rid").asc()))
    )
    assert "Exchange SinglePartition" in executed_plan(ref)


def test_exact_percent_rank_and_cume_dist_match_builtins(spark, skewed):
    from onetl_spark.operators.ranking import exact_cume_dist, exact_percent_rank

    order = W.orderBy(F.col("k").asc(), F.col("rid").asc())
    ref = skewed.withColumn("pct_rank", F.percent_rank().over(order)).withColumn(
        "cume_dist", F.cume_dist().over(order)
    )
    got_pr = exact_percent_rank(skewed, "k", ("rid",), buckets=8)
    assert got_pr.join(ref.select("rid", "pct_rank"), ["rid", "pct_rank"]).count() == 5000
    # cume_dist ref counts peers by (k, rid) — unique key, so row_number/total
    got_cd = exact_cume_dist(skewed, "k", ("rid",), buckets=8)
    assert got_cd.join(ref.select("rid", "cume_dist"), ["rid", "cume_dist"]).count() == 5000


def test_exact_percent_rank_single_row(spark):
    from onetl_spark.operators.ranking import exact_percent_rank

    df = spark.createDataFrame([(1, 5.0)], "rid long, k double")
    assert exact_percent_rank(df, "k", ("rid",)).first()["pct_rank"] == 0.0


def test_empty_inputs_yield_empty_outputs(spark):
    from onetl_spark.operators.ranking import exact_ntile, global_row_index

    empty = spark.createDataFrame([], "rid long, k double")
    assert global_row_index(empty, "k", ("rid",)).count() == 0
    assert exact_ntile(empty, 4, "k", ("rid",)).count() == 0


def test_global_row_index_rejects_string_order_col(spark):
    from onetl_spark.operators.ranking import global_row_index

    df = spark.createDataFrame([(1, "9"), (2, "10")], "rid long, k string")
    with pytest.raises(ValueError, match="numeric, date, or timestamp"):
        global_row_index(df, "k", ("rid",))


def test_global_row_index_rejects_reserved_columns(spark):
    from onetl_spark.operators.ranking import global_row_index

    df = spark.createDataFrame([(1, 1.0, 9)], "rid long, k double, _bucket int")
    with pytest.raises(ValueError, match="reserved"):
        global_row_index(df, "k", ("rid",))


def test_global_row_index_ntz_is_dst_safe(spark):
    from onetl_spark.operators.ranking import global_row_index

    old_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        # wall-clock times straddling the 2024-03-10 spring-forward gap:
        # an NTZ->TIMESTAMP cast maps 02:30 AFTER 03:00; the field-composed
        # image must keep wall-clock order
        rows = [(i, f"2024-03-10 0{h}:{m:02d}:00") for i, (h, m) in
                enumerate([(1, 30), (2, 15), (2, 30), (2, 45), (3, 0), (3, 30)])]
        df = spark.createDataFrame(rows, "rid long, t string").select(
            "rid", F.col("t").cast("timestamp_ntz").alias("t")
        )
        got = {r["rid"]: r["row_idx"]
               for r in global_row_index(df, "t", ("rid",), buckets=3).collect()}
        assert got == {i: i + 1 for i in range(6)}
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)


def test_gini_known_value_and_validation(spark):
    from onetl_spark.operators.ranking import gini_coefficient

    df = spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, 3.0), (4, 4.0)], "id long, v double"
    )
    row = gini_coefficient(df, "v", ("id",)).collect()[0]
    # G = (2*(1*1+2*2+3*3+4*4))/(4*10) - 5/4 = 0.25
    assert row["n"] == 4 and row["gini"] == 0.25
    # perfectly equal distribution -> G = (2*sum(i)*x)/(n*n*x) - (n+1)/n
    eq = spark.createDataFrame([(i, 5.0) for i in range(1, 6)], "id long, v double")
    g = gini_coefficient(eq, "v", ("id",)).collect()[0]["gini"]
    assert g == 0.0
    import pytest as _pt

    neg = spark.createDataFrame([(1, -1.0)], "id long, v double")
    with _pt.raises(Exception, match="non-negative"):
        gini_coefficient(neg, "v", ("id",)).collect()


def test_stitched_cumsums_zipf_skew_no_degenerate_bucket(spark):
    """Skew-stress the shared rank scaffold (VERDICT r6 item 8): a
    Zipf-weighted, cluster-spaced distinct-value relation must (a) keep
    every quantile bucket's row count near n/buckets — weight skew and
    value clustering must NOT concentrate rows into one window
    partition — (b) produce exact global cumsums, and (c) plan without
    any single-partition exchange."""
    from onetl_spark.operators.ranking import (
        ascending_bucket,
        stitched_cumsums,
    )

    # 4000 distinct values: v = 1/i clusters 90% of the mass near 0;
    # Zipf weights put ~27% of the total weight on ONE value
    n, buckets = 4000, 16
    rows = [(1.0 / i, float(n // i)) for i in range(1, n + 1)]
    counts = spark.createDataFrame(rows, "v double, w double").localCheckpoint()

    out, totals = stitched_cumsums(counts, "v", ("w",), buckets=buckets)
    got = {r["v"]: r["_cum_w"] for r in out.collect()}

    # exact inclusive cumsum in value order, despite skew
    acc = 0.0
    for v, w in sorted(rows):
        acc += w
        assert got[v] == acc
    assert totals["w"] == sum(w for _, w in rows)

    # bucket balance: replay the scaffold's own bucketing and assert no
    # bucket degenerates toward a driver-sized window partition
    qs = [i / buckets for i in range(1, buckets)]
    bounds = sorted(set(counts.stat.approxQuantile("v", qs, 0.001)))
    sizes = (
        counts.withColumn("_bkt", ascending_bucket(bounds, F.col("v")))
        .groupBy("_bkt").count().collect()
    )
    assert len(sizes) >= buckets - 1  # clustering didn't collapse the bounds
    assert max(r["count"] for r in sizes) <= 3 * n / buckets

    # plan guard: stitching never plans a single-partition exchange
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan


def test_stitched_cumsums_fewer_distinct_than_buckets(spark):
    """Degenerate cardinality: with fewer distinct values than buckets
    the bound set dedupes and the scaffold must stay exact."""
    from onetl_spark.operators.ranking import stitched_cumsums

    counts = spark.createDataFrame(
        [(1.0, 5.0), (2.0, 1.0), (3.0, 10.0)], "v double, w double"
    ).localCheckpoint()
    out, totals = stitched_cumsums(counts, "v", ("w",), buckets=32)
    got = {r["v"]: r["_cum_w"] for r in out.collect()}
    assert got == {1.0: 5.0, 2.0: 6.0, 3.0: 16.0}
    assert totals["w"] == 16.0


def test_skyline_2d_brute_force(spark):
    import random

    from onetl_spark.operators.ranking import skyline_2d

    rng = random.Random(23)
    pts = [(round(rng.uniform(0, 100), 2), rng.randint(0, 1000)) for _ in range(300)]
    df = spark.createDataFrame(pts, "p double, d long")
    got = sorted(
        (r["p"], r["d"]) for r in skyline_2d(df, "p", "d", buckets=5).collect()
    )

    def dominated(q):
        return any(
            (p[0] <= q[0] and p[1] >= q[1]) and (p[0] < q[0] or p[1] > q[1])
            for p in pts
        )

    ref = sorted(set(q for q in pts if not dominated(q)))
    assert got == ref


def test_skyline_2d_single_point_and_ties(spark):
    from onetl_spark.operators.ranking import skyline_2d

    df = spark.createDataFrame(
        [(1.0, 5), (1.0, 9), (2.0, 9), (3.0, 1)], "p double, d long"
    )
    got = sorted((r["p"], r["d"]) for r in skyline_2d(df, "p", "d").collect())
    # (1.0, 9) dominates everything else: same-price 5, equal-d pricier 2.0,
    # and strictly-worse (3.0, 1)
    assert got == [(1.0, 9)]
