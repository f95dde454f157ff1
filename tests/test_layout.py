"""Physical layout: bucketed joins plan with no shuffle; date-partitioned
tables prune partitions at scan time."""

from __future__ import annotations

from pyspark.sql import functions as F

from log_agent_spark.sources.layout import (
    bucketed_join,
    write_bucketed,
    write_date_partitioned,
)
from log_agent_spark.sources.tables import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderdate"
    )
    write_bucketed(l, "t_lineitem_b", ["l_orderkey"], num_buckets=4)
    write_bucketed(o, "t_orders_b", ["l_orderkey"], num_buckets=4)
    try:
        # bucketed-bucketed: the join key alignment is in the catalog, so
        # the planner skips both exchanges (shuffle paid once, at write)
        joined = bucketed_join(spark, "t_lineitem_b", "t_orders_b", ["l_orderkey"])
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        # sanity: equivalent to the plain join
        plain = l.join(o, "l_orderkey").count()
        assert joined.count() == plain
    finally:
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")
        spark.sql("DROP TABLE IF EXISTS t_orders_b")


def test_compact_parquet_reduces_files(spark, tmp_path):
    import glob

    from log_agent_spark.sources.layout import compact_parquet

    path = str(tmp_path / "smallfiles")
    # simulate micro-batch accretion: 16 tiny files
    spark.range(10_000).repartition(16).write.parquet(path)
    before = len(glob.glob(f"{path}/**/*.parquet", recursive=True))
    assert before >= 16
    after = compact_parquet(spark, path, target_file_bytes=10 * 1024 * 1024)
    assert after == 1
    assert spark.read.parquet(path).count() == 10_000


def test_date_partition_pruning(spark, sf_dir, tmp_path):
    path = str(tmp_path / "logfile_by_date")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("file_date")
    )
    write_date_partitioned(o, path)
    scan = spark.read.parquet(path).filter(F.col("file_date") == "1996-03-15")
    plan = _plan(scan)
    # the date predicate must prune at listing time, not row-filter time
    assert "PartitionFilters" in plan
    assert scan.count() == o.filter(F.col("file_date") == "1996-03-15").count()
