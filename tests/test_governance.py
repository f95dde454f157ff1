"""Semantic tests for the governance family — the oracle gate proves
cross-engine equality; these pin what the audits MEAN on constructed
micro-data (known group structure, known digits, known cascade)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_kanonymity_histogram_semantics(spark):
    """Fixture invariants: the k histogram partitions the customer table
    exactly once (Σ n_rows == |customer|, n_rows == k·n_groups per row),
    the re-identifiable flag is k < 5, and the percentages sum to 100."""
    from log_agent_spark.operators.governance import q_privacy_kanonymity

    rows = {r["k"]: r for r in q_privacy_kanonymity(spark, SF).collect()}
    # invariants on real data: rows partition the table exactly once
    import duckdb

    n_cust = duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF}/customer.parquet'"
    ).fetchone()[0]
    assert sum(r["n_rows"] for r in rows.values()) == n_cust
    for r in rows.values():
        assert r["n_rows"] == r["k"] * r["n_groups"]
        assert r["reidentifiable"] == (r["k"] < 5)
    assert abs(sum(r["pct_rows"] for r in rows.values()) - 100.0) < 1e-3


def test_ldiversity_l_bounded_and_non_degenerate(spark):
    """l is bounded by the sensitive-attribute cardinality (5 mktsegments)
    and the histogram's row weight equals the table size; the audit must
    also be NON-degenerate — l must actually vary across groups (round-6
    review: with a per-customer-unique sensitive column, l_div ≡ grp_sz
    and the l histogram was byte-identical to the k histogram)."""
    from log_agent_spark.operators.governance import q_privacy_ldiversity
    from log_agent_spark.sources.tables import load_table

    hist = q_privacy_ldiversity(spark, SF).collect()
    ls = [r["l"] for r in hist]
    assert all(1 <= l <= 5 for l in ls)
    # non-degenerate: more than one distinct l observed
    assert len(set(ls)) > 1
    n_customers = load_table(spark, SF, "customer").count()
    assert sum(r["n_rows"] for r in hist) == n_customers


def test_benford_expected_shares_and_digit_extraction(spark):
    from log_agent_spark.operators.governance import (
        _BENFORD_PCT,
        q_dq_benford,
    )

    # the pasted literals really are Benford's law
    for d in range(1, 10):
        assert abs(
            _BENFORD_PCT[d] - 100.0 * math.log10(1 + 1 / d)
        ) < 1e-6
    assert abs(sum(_BENFORD_PCT.values()) - 100.0) < 1e-4

    out = q_dq_benford(spark, SF).collect()
    digits = [r["digit"] for r in out]
    assert digits == sorted(digits) and set(digits) <= set(range(1, 10))
    # observed shares sum to 100 and deviations to ~0
    assert abs(sum(r["obs_pct"] for r in out) - 100.0) < 1e-3
    assert abs(sum(r["dev_pct"] for r in out)) < 1e-3
    # spot-check extraction against python on the raw column
    import duckdb

    expect = dict(
        duckdb.sql(
            f"""SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT)
                 AS VARCHAR), 1, 1) AS BIGINT) d, COUNT(*)
                 FROM '{SF}/orders.parquet' GROUP BY 1"""
        ).fetchall()
    )
    assert {r["digit"]: r["n"] for r in out} == expect


def test_gdpr_cascade_counts_match_manual_joins(spark):
    from log_agent_spark.operators.governance import q_gdpr_cascade
    import duckdb

    out = {r["tbl"]: r for r in q_gdpr_cascade(spark, SF).collect()}
    assert set(out) == {"customer", "orders", "lineitem"}
    con = duckdb.connect()
    con.execute(
        f"""CREATE VIEW cohort AS
            SELECT c_custkey FROM '{SF}/customer.parquet'
            WHERE (('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8))
                   ::BIGINT % 100) = 0"""
    )
    n_cohort = con.execute("SELECT COUNT(*) FROM cohort").fetchone()[0]
    assert out["customer"]["n_affected"] == n_cohort and n_cohort > 0
    n_ord = con.execute(
        f"""SELECT COUNT(*) FROM '{SF}/orders.parquet'
            WHERE o_custkey IN (SELECT c_custkey FROM cohort)"""
    ).fetchone()[0]
    assert out["orders"]["n_affected"] == n_ord
    # the affected share is monotone down the cascade only in expectation;
    # what must hold exactly: affected <= total at every hop
    for r in out.values():
        assert 0 <= r["n_affected"] <= r["n_total"]
