"""Dump explain('formatted') for named queries into per-query text files.

Round-10 deliverable helper: the optimization judge checks plan-shape
claims against committed ``plans/r10/<query>_{before,after}.txt`` files.
Run from any checkout (worktrees of older commits give the *_before
snapshots)::

    python tools/dump_plans.py OUTDIR SUFFIX query [query ...]

Writes ``OUTDIR/<query>_<SUFFIX>.txt`` with the formatted physical plan at
sf0.01 (the oracle-gate SF — small enough to plan instantly, same plan
shape as the bench SF).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


def main() -> None:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    import __spark_entry__ as entrymod
    from log_agent_spark.session import get_spark

    spark = get_spark("dump_plans")
    qs = entrymod.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    for name in names:
        # pinned_query wrappers execute the body and return a scratch-
        # parquet readback scan — dump the BODY's plan (the thing the
        # optimization claims are about), same as tools/shuffle_ledger.py
        fn = getattr(qs[name], "__wrapped__", qs[name])
        df = fn(spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — explain('formatted') at {SF_DIR}\n\n")
            f.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
