"""Scale-toolkit tests: results match the naive formulation AND the physical
plan has the intended shape (no shuffle where bucketing should remove it,
broadcast where the dim is small, pruning where the data is partitioned)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dumpr_spark.operators.scale import (
    explain_str,
    repartition_for_explode,
    salted_join,
    write_bucketed,
    write_partitioned,
)
from dumpr_spark.sources.files import load_table


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    r = o.withColumnRenamed("o_orderkey", "l_orderkey")

    plain = li.join(r, "l_orderkey").groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("q")
    )
    salted = salted_join(li, r, "l_orderkey", salt=8).groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("q")
    )
    assert plain.collect() == salted.collect()


def test_salted_join_left_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b"), (99, "z")], "k INT, v STRING")
    right = spark.createDataFrame([(1, "x"), (2, "y")], "k INT, w STRING")
    out = salted_join(left, right, "k", salt=4, how="left")
    rows = {r["k"]: r["w"] for r in out.collect()}
    assert rows == {1: "x", 2: "y", 99: None}


def test_salted_join_rejects_outer():
    with pytest.raises(ValueError):
        salted_join(None, None, "k", how="full")


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    import shutil
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for tbl in ("li_b", "o_b"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        shutil.rmtree(f"{wh}/{tbl}", ignore_errors=True)

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    # at test scale Catalyst would just broadcast the small side; force the
    # sort-merge path to show bucketing removes the shuffle
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        write_bucketed(li, "li_b", "l_orderkey", num_buckets=8)
        write_bucketed(
            o.withColumnRenamed("o_orderkey", "l_orderkey"), "o_b", "l_orderkey", num_buckets=8
        )
        joined = spark.table("li_b").join(spark.table("o_b"), "l_orderkey")
        # co-bucketed join: SortMergeJoin reading bucketed scans, ZERO shuffles
        plan = explain_str(joined, "simple")
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan
        assert "Bucketed: true" in plan, plan
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        for tbl in ("li_b", "o_b"):
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")
            shutil.rmtree(f"{wh}/{tbl}", ignore_errors=True)


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    path = str(tmp_path / "orders_part")
    write_partitioned(o, path, ["o_orderstatus"])
    back = spark.read.parquet(path).where(F.col("o_orderstatus") == "F")
    plan = explain_str(back, "formatted")
    # partition filter reaches the scan: only the o_orderstatus=F directory read
    assert "PartitionFilters" in plan and "o_orderstatus" in plan.split("PartitionFilters")[1].split("\n")[0]
    expected = o.where(F.col("o_orderstatus") == "F").count()
    assert back.count() == expected


def test_repartition_for_explode_spreads_rows(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(64)
    fanned = repartition_for_explode(d)
    assert fanned.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    keyed = repartition_for_explode(d, ["lang"])
    assert keyed.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
