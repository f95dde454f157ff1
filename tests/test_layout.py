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


def test_write_sorted_gives_disjoint_minmax_bands(spark, sf_dir, tmp_path):
    """Range-sorted layout: every output file must carry a narrow, disjoint
    [min, max] band on the sort key (parquet footer stats) — the property
    that lets a point/range predicate skip whole files and row groups. An
    unsorted shuffle of the same data has every file spanning ~the whole
    key range."""
    import glob

    import pyarrow.parquet as pq

    from log_agent_spark.sources.layout import write_sorted

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    sorted_path = str(tmp_path / "orders_sorted")
    write_sorted(o, sorted_path, ["o_orderkey"], num_files=4)
    shuffled_path = str(tmp_path / "orders_shuffled")
    o.repartition(4).write.parquet(shuffled_path)

    def bands(path):
        out = []
        for f in sorted(glob.glob(f"{path}/*.parquet")):
            md = pq.ParquetFile(f).metadata
            col = next(
                i for i in range(md.num_columns)
                if md.row_group(0).column(i).path_in_schema == "o_orderkey"
            )
            stats = [md.row_group(g).column(col).statistics for g in range(md.num_row_groups)]
            out.append((min(s.min for s in stats), max(s.max for s in stats)))
        return sorted(out)

    sorted_bands = bands(sorted_path)
    assert len(sorted_bands) == 4
    for (lo1, hi1), (lo2, hi2) in zip(sorted_bands, sorted_bands[1:]):
        assert hi1 < lo2, sorted_bands  # disjoint ranges across files

    # unsorted control: every file spans (nearly) the full key range
    total_min = min(lo for lo, _ in sorted_bands)
    total_max = max(hi for _, hi in sorted_bands)
    wide = [
        (lo, hi)
        for lo, hi in bands(shuffled_path)
        if (hi - lo) > 0.9 * (total_max - total_min)
    ]
    assert len(wide) >= 3, wide

    # and the data survives intact
    assert spark.read.parquet(sorted_path).count() == o.count()


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


def test_retention_prune_drops_old_partitions(spark, tmp_path):
    from log_agent_spark.sources.layout import retention_prune

    path = str(tmp_path / "logfile")
    spark.createDataFrame(
        [("2024-01-0%d" % d, i) for d in range(1, 6) for i in range(3)],
        "file_date string, v int",
    ).write.partitionBy("file_date").parquet(path)

    dropped = retention_prune(spark, path, "file_date", cutoff="2024-01-03")
    assert dropped == ["2024-01-01", "2024-01-02"]
    left = spark.read.parquet(path)
    assert {str(r.file_date) for r in left.select("file_date").distinct().collect()} == {
        "2024-01-03", "2024-01-04", "2024-01-05"
    }
    assert left.count() == 9
    # idempotent: nothing left below the cutoff
    assert retention_prune(spark, path, "file_date", cutoff="2024-01-03") == []


def test_write_zordered_bounds_both_dimensions(spark, sf_dir, tmp_path):
    """Z-ordered layout: every output file carries a SUB-RANGE band in
    BOTH bucket dimensions (footer min/max), so predicates on either
    column skip files. Control: a single-key sort leaves the other
    dimension spanning ~the full range in every file."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from log_agent_spark.sources.layout import write_sorted, write_zordered

    o = load_table(spark, sf_dir, "orders").select(
        (F.col("o_custkey") % 256).cast("long").alias("xb"),
        F.least(
            F.lit(255),
            F.floor(
                F.datediff(
                    F.col("o_orderdate").cast("date"),
                    F.lit("1992-01-01").cast("date"),
                )
                / 10
            ),
        ).cast("long").alias("yb"),
    )
    z_path = str(tmp_path / "orders_z")
    write_zordered(o, z_path, "xb", "yb", num_files=8)
    x_path = str(tmp_path / "orders_xsorted")
    write_sorted(o, x_path, ["xb"], num_files=8)

    def spans(path, col_name):
        out = []
        for f in sorted(glob.glob(f"{path}/*.parquet")):
            md = pq.ParquetFile(f).metadata
            col = next(
                i for i in range(md.num_columns)
                if md.row_group(0).column(i).path_in_schema == col_name
            )
            st = [md.row_group(g).column(col).statistics for g in range(md.num_row_groups)]
            out.append(max(s.max for s in st) - min(s.min for s in st))
        return out

    full_x = 255
    full_y = max(spans(z_path, "yb") + spans(x_path, "yb")) or 1
    # z-order: most files bounded in BOTH dims (8 files = 3 z-bits:
    # y quartered, x halved; repartitionByRange boundaries add slack)
    zx, zy = spans(z_path, "xb"), spans(z_path, "yb")
    assert sum(1 for s in zx if s <= 0.8 * full_x) >= 6, zx
    assert sum(1 for s in zy if s <= 0.8 * full_y) >= 6, zy
    # single-key control: x tight but y spans ~full range in every file
    cy = spans(x_path, "yb")
    assert sum(1 for s in cy if s >= 0.9 * full_y) >= 6, cy
    assert spark.read.parquet(z_path).count() == o.count()
