"""Format round-trips: the engine reads/writes csv, json, and orc with
identical results to its native parquet scans (§2.7 scans row). The checksum
is an order-insensitive aggregate so partitioning/ordering differences
between formats can't mask or cause a failure."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from log_agent_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _fingerprint(df):
    # order-insensitive: sum of per-row hashes over stringified columns
    cols = [F.coalesce(F.col(c).cast("string"), F.lit("∅")) for c in df.columns]
    return (
        df.select(F.xxhash64(*cols).cast("decimal(38,0)").alias("h"))
        .agg(F.sum("h").alias("s"), F.count("*").alias("n"))
        .first()
    )


@pytest.mark.parametrize("fmt", ["csv", "json", "orc"])
def test_orders_roundtrip(spark, tmp_path, fmt):
    src = load_table(spark, SF_DIR, "orders")
    # csv/json have no native date/timestamp fidelity guarantees across
    # writers — normalize temporal cols to ISO strings before the trip
    norm = src.withColumn(
        "o_orderdate", F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss")
    )
    out = str(tmp_path / f"orders_{fmt}")
    writer = norm.write.mode("overwrite")
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.format(fmt).save(out)

    reader = spark.read.format(fmt)
    if fmt == "csv":
        reader = reader.option("header", "true").schema(norm.schema)
    elif fmt == "json":
        reader = reader.schema(norm.schema)
    back = reader.load(out)

    assert back.columns == norm.columns
    assert _fingerprint(back) == _fingerprint(norm)


def test_orders_roundtrip_xml(spark, tmp_path):
    """Built-in XML source (Spark 4): the natural wire format for factory
    test logs (the reference's ICT/BSI domain, conf/logagent.ini:11-117).
    Options differ from the tabular formats (rowTag is mandatory), so the
    trip is its own test rather than a parametrize case."""
    src = load_table(spark, SF_DIR, "orders")
    norm = src.withColumn(
        "o_orderdate", F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss")
    )
    out = str(tmp_path / "orders_xml")
    norm.write.mode("overwrite").format("xml").option("rowTag", "order").save(out)
    back = (
        spark.read.format("xml")
        .option("rowTag", "order")
        .schema(norm.schema)
        .load(out)
    )
    assert back.columns == norm.columns
    assert _fingerprint(back) == _fingerprint(norm)


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """A long-lived logfile table grows columns over time; mergeSchema
    reads old + new files as one table with NULLs where the column did not
    exist yet — no rewrite of historical partitions."""
    path = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, name string").write.parquet(
        path + "/p=1"
    )
    spark.createDataFrame(
        [(2, "b", "h1")], "id long, name string, host string"
    ).write.parquet(path + "/p=2")

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) >= {"id", "name", "host"}
    rows = {r.id: r.host for r in merged.collect()}
    assert rows == {1: None, 2: "h1"}


def test_json_corrupt_record_quarantine(spark, tmp_path):
    """PERMISSIVE parse with a _corrupt_record column: malformed lines land
    in the dead-letter column instead of failing the job — the F7/404
    quarantine branch for wire formats."""
    p = tmp_path / "in.jsonl"
    p.write_text('{"k": 1, "v": "ok"}\n{not json at all}\n{"k": 2, "v": "ok2"}\n')

    df = (
        spark.read.schema("k long, v string, _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(str(p))
        .cache()  # SPARK-21610: corrupt-record column requires materialization
    )
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert {r.k for r in good.collect()} == {1, 2}
    assert bad.count() == 1
    assert "{not json" in bad.first()._corrupt_record
