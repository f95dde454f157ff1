"""Materialize golden parquet for the queries with no SQL-expressible
oracle (VERDICT r1 item 9): ingest_logfile_tree, kafka_envelope,
events_approx_sketches.

Each golden is the query's own sf0.01 output, frozen. The oracle becomes
``SELECT * FROM read_parquet('<golden>')`` — turning the driver's
rows-only check into a full value-hash regression gate: if the engine's
live output ever drifts from the frozen bytes, the hash fails.

Determinism notes:
- ingest_logfile_tree / kafka_envelope: the fixture tree is synthesized
  with fixed contents/mtimes and the queries drop wall-clock columns.
- events_approx_sketches: HLL register merges are order-independent;
  percentile_approx summaries are deterministic for a fixed input
  partitioning (same files, same maxPartitionBytes → same splits).

Regenerate after any intentional output change:

    python tools/make_goldens.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "goldens",
)
SF_DIR = "/root/testdata/sf0.01"
GOLDEN_QUERIES = ["ingest_logfile_tree", "kafka_envelope", "events_approx_sketches"]


# SF-dependent goldens additionally get a per-SF snapshot (suffix =
# basename of the SF dir) so tools/oracle_check.py's sf0.001 edge sweep
# compares against the right frozen output; ingest/kafka goldens
# synthesize their own fixture tree and are SF-independent.
SF_DEPENDENT = {"events_approx_sketches": ["/root/testdata/sf0.001"]}


def main() -> None:
    import __spark_entry__ as entrymod
    from log_agent_spark.session import get_spark

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    spark = get_spark("make_goldens")
    qs = entrymod.queries()
    for name in GOLDEN_QUERIES:
        pdf = qs[name](spark, SF_DIR).toPandas()
        path = os.path.join(GOLDEN_DIR, f"{name}.parquet")
        pdf.to_parquet(path, index=False)
        print(f"wrote {path}: {len(pdf)} rows, cols={list(pdf.columns)}")
        for alt_sf in SF_DEPENDENT.get(name, []):
            pdf = qs[name](spark, alt_sf).toPandas()
            suffix = os.path.basename(alt_sf.rstrip("/"))
            path = os.path.join(GOLDEN_DIR, f"{name}.{suffix}.parquet")
            pdf.to_parquet(path, index=False)
            print(f"wrote {path}: {len(pdf)} rows")


if __name__ == "__main__":
    main()
