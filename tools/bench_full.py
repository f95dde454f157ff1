"""Full-registry bench appendix (VERDICT r8 item 4): time the queries the
headline bench (bench.py HEADLINE — one per operator family) never runs,
so EVERY registered query has a committed timing to diff a future
regression against (the headline outlier-adjudication protocol needs a
committed prior; 58 queries had none through round 8).

Same measurement discipline as bench.py: noop-sink materialization,
clearCache + System.gc between attempts, best-of-2 escalating to
best-of-3 on >1.5x disagreement, and the host-steal canary at
start/mid/end — a contaminated window exits 3 without overwriting the
committed artifact.

    python tools/bench_full.py              # appendix set at sf0.1
    python tools/bench_full.py --all        # entire 251-query registry

Writes BENCH_FULL.json: {"queries": {...}, "canary": {...}, "sf": ...,
"scope": "appendix"|"all"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402 — canary + SF_DIR + HEADLINE single-sourced

NOISE_RATIO = 1.5


def main() -> None:
    import __spark_entry__ as entrymod
    from log_agent_spark.session import get_spark

    scope = "all" if "--all" in sys.argv[1:] else "appendix"
    spark = get_spark("bench-full")
    qs = entrymod.queries()
    names = (
        list(qs)
        if scope == "all"
        else [n for n in qs if n not in set(bench.HEADLINE)]
    )
    print(f"bench_full: {len(names)} queries ({scope}) at {bench.SF_DIR}")

    # same warmups as bench.py: session/footers + Python worker pool
    qs["q01_pricing_summary"](spark, bench.SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(256).repartition(
        int(spark.sparkContext.defaultParallelism)
    ).mapInPandas(lambda it: it, "id long").write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    failures: dict[str, str] = {}
    flaky: dict[str, str] = {}  # passed once, then crashed — keep the trace
    retimed: list[str] = []
    canary = {"start": round(bench._canary_sample(), 3)}
    mid_at = len(names) // 2
    for qi, name in enumerate(names):
        if qi == mid_at:
            canary["mid"] = round(bench._canary_sample(), 3)
        attempts: list[float] = []
        n_attempts = 2
        i = 0
        while i < n_attempts:
            i += 1
            t0 = time.perf_counter()
            try:
                qs[name](spark, bench.SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
                attempts.append(time.perf_counter() - t0)
            except Exception as exc:  # noqa: BLE001 — one bad query must not
                # void the rest of the appendix
                failures[name] = f"{type(exc).__name__}: {exc}"[:300]
                break
            finally:
                spark.catalog.clearCache()
                spark._jvm.System.gc()
            if (
                len(attempts) == 2
                and n_attempts == 2
                and min(attempts) > 1.0
                and max(attempts) > NOISE_RATIO * min(attempts)
            ):
                n_attempts = 3
                retimed.append(name)
        if attempts:
            timings[name] = round(min(attempts), 3)
            # mirror bench.py (ADVICE r2/r9): a pass-then-crash query keeps
            # its clean measurement but reports as flaky, never as BOTH a
            # timing and a failure
            late = failures.pop(name, None)
            if late is not None:
                flaky[name] = late
            print(f"{name:36s} {timings[name]:7.3f}s", flush=True)

    canary.setdefault("mid", canary["start"])
    canary["end"] = round(bench._canary_sample(), 3)
    contaminated = bench._canary_verdict(canary)

    sf = bench.SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    report = {
        "metric": "full_registry_appendix_time",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "sf": sf_val,
        "scope": scope,
        "n_queries": len(timings),
        "queries": timings,
        "failures": failures,
        "flaky": flaky,
        "retimed_best_of_3": retimed,
        "canary": canary,
        "contaminated": contaminated,
    }
    if contaminated:
        print(json.dumps({k: report[k] for k in ("canary", "contaminated")}))
        sys.exit(3)  # don't overwrite the committed artifact with noise
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_FULL.json",
    )
    with open(path, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(
        json.dumps(
            {k: report[k] for k in ("metric", "value", "n_queries", "canary")}
        )
    )
    if failures:
        print(f"FAILURES: {failures}")
        sys.exit(1)


if __name__ == "__main__":
    main()
