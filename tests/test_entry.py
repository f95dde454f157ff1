"""Driver-contract tests: entry()/queries()/oracle_sql() shape and smoke."""

from __future__ import annotations

import __spark_entry__ as entrymod

# Since round 2 every query has an oracle: the three non-SQL-expressible
# entries (ingest_logfile_tree, kafka_envelope, events_approx_sketches)
# hash-check against frozen golden parquet (tools/make_goldens.py).
ROWS_ONLY: set[str] = set()


def test_entry_flagship(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) == 10
    assert df.columns == ["l_orderkey", "revenue", "o_orderdate_ms"]


def test_queries_oracles_aligned():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    missing = set(qs) - set(oracles)
    assert missing == ROWS_ONLY, f"unexpected rows-only queries: {missing - ROWS_ONLY}"


def test_all_queries_run_smoke(spark, sf_dir):
    """Every declared query must at least plan + execute at sf0.001."""
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        n = df.limit(5).count()
        assert n >= 0, name
