"""Fixture-table loading (TESTDATA.md parquet star schema).

Pure ``spark.read.parquet`` — Catalyst gets full pushdown/pruning on these
scans. Two portability shims are applied at load time (not left to session
construction, since the driver may pass its own SparkSession):

- ``inferTimestampNTZ=false``: the fixtures carry isAdjustedToUTC=false
  timestamps; we read them as TIMESTAMP under a UTC session so epoch math
  matches the DuckDB oracle.
- ``nanosAsLong=true`` + explicit conversion: ``events.ts`` is
  TIMESTAMP(NANOS), which Spark's parquet reader rejects natively; we read
  the raw int64 nanos and convert to TIMESTAMP via timestamp_micros(ns/1000)
  — lossless for the fixture's µs-precision data, truncation semantics
  identical to DuckDB's ns→µs cast.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from log_agent_spark.schemas import FIXTURE_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_READER_CONFS = {
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
}


def _ensure_confs(spark: SparkSession) -> None:
    for k, v in _READER_CONFS.items():
        try:
            if spark.conf.get(k, None) != v:
                spark.conf.set(k, v)
        except Exception:
            spark.conf.set(k, v)


# Analyzed-DataFrame cache, keyed by (session, sf_dir, table) — the
# engine's (static) catalog. spark.read.parquet re-lists files and re-reads
# footers for the schema on every call; across a many-query workload that
# is pure planner overhead. Fixture tables are immutable, so the cached
# logical plan is always current. Scale note: this caches PLANS (KB-sized),
# not data — nothing is pinned in executor memory.
_TABLE_CACHE: dict[tuple[int, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    key = (id(spark), os.path.abspath(sf_dir), name)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    _ensure_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # nanos-as-long columns → TIMESTAMP (µs), e.g. events.ts
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # integer div — double division would lose ulp precision at ns scale
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    _TABLE_CACHE[key] = df
    return df


def register_tables(
    spark: SparkSession, sf_dir: str, tables: list[str] | None = None
) -> dict[str, DataFrame]:
    """Load the fixture tables and register each as a temp view."""
    out: dict[str, DataFrame] = {}
    for name in tables or FIXTURE_TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


# ---------------------------------------------------------------------------
# Parquet-footer statistics (r10, guide §1.2/§6): several queries need a
# cheap scalar about a base table BEFORE building their plan — a row-count
# upper bound for a broadcast guard (graph BFS), or a column max for an
# adaptive width/structure precheck (triangle counting's int32 ladder, the
# PageRank id-space disjointness guard). Running a Spark aggregate for
# these costs a full column scan job; the parquet footers already carry
# exact row counts and per-row-group min/max statistics. Reading them
# driver-side is metadata-only work (same class as merge_rollup's glob),
# linear in the FILE count, not the data — at warehouse scale the same
# answers come from the table format's manifest (Iceberg/Delta stats).
# ---------------------------------------------------------------------------
def _parquet_files(sf_dir: str, name: str) -> list[str]:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if os.path.isfile(path):
        return [path]
    out = []
    for root, _, files in os.walk(path):
        out += [
            os.path.join(root, f) for f in files if f.endswith(".parquet")
        ]
    return sorted(out)


def footer_row_count(sf_dir: str, name: str) -> int:
    """Exact row count of a fixture table from parquet footers (no job)."""
    import pyarrow.parquet as pq

    return sum(
        pq.ParquetFile(f).metadata.num_rows
        for f in _parquet_files(sf_dir, name)
    )


def footer_column_max(sf_dir: str, name: str, column: str):
    """Exact max of ``column`` from parquet row-group statistics, or None
    when any row group lacks min/max stats (callers must fall back to a
    Spark aggregate — statistics are optional in the format)."""
    import pyarrow.parquet as pq

    mx = None
    for f in _parquet_files(sf_dir, name):
        md = pq.ParquetFile(f).metadata
        try:
            idx = md.schema.names.index(column)
        except ValueError:
            return None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                return None
            mx = st.max if mx is None else max(mx, st.max)
    return mx
