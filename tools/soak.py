"""Composed end-to-end streaming soak (VERDICT r8 stretch 7): the full hot
path — file-event source → debounce (T1) → keep-latest dedup (T3) →
enrich to logfile shape (M1-M12) → multi-sink fan-out (K6) with the keyed
parquet UPSERT (K2) and the broker-free Kafka-RECORD sink (K1 envelope) —
run for ~100+ micro-batches under the supervisor (S4), with the
BatchMetricsListener (watchdog.go:309 parity) capturing per-batch latency
and state-store size.

What a soak proves that the e2e tests cannot: the STANDING-query
properties — state-store size stays bounded by the live key set (a
debounce-state leak grows it monotonically), per-batch latency stays flat
(a pinned-block / heap leak shows up as drift), and the upsert table ends
idempotent (exactly one row per path, replays absorbed).

Failure leg (VERDICT r9 item 5): the soak INJECTS two mid-run sink
crashes (the tests/test_supervisor.py fault pattern — the K2 upsert sink
raises once, failing that micro-batch) at ~30% and ~60% of the wave
budget. Each must surface as exactly one supervisor restart that resumes
from the checkpoint DURING the soak: the restart gate then requires
restarts >= injected faults, and the idempotence/state gates prove the
replayed batches produced no duplicate upserts and no state growth. The
MultiSink is fail-fast, HIGHER priority first (watchdog.go:98 parity), so
the kafka-record append sink (priority 10) has already written when the
upsert (priority 5) crashes — the replay therefore DUPLICATES that
batch's records, which is exactly Kafka-without-transactions
at-least-once semantics. The soak measures it honestly: duplicate
records must be bounded by the replayed batches, and the DISTINCT record
set must equal the idempotent upsert's row set (cross-sink consistency).

    python tools/soak.py            # ~3-6 min, writes SOAK.md
    python tools/soak.py --waves 40 # shorter smoke

Exit non-zero if any gate fails; SOAK.md records the evidence.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import statistics
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_WAVES = 110          # files; maxFilesPerTrigger=1 → ≥ N_WAVES data batches
PATHS_PER_WAVE = 8     # events per wave, rotating over a fixed key set
N_PATHS = 24           # live key population (debounce state upper bound)
DEBOUNCE_MS = 400
LATENCY_DRIFT_LIMIT = 2.0  # late-window median vs early-window median
FAULT_FRACTIONS = (0.3, 0.6)  # inject a sink crash at these wave fractions


def _gen_waves(src: str) -> int:
    """Pre-generate the burst as N_WAVES small parquet files via pyarrow
    (no Spark jobs — the stream must not race the generator)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t0 = dt.datetime(2024, 1, 1)
    total = 0
    for w in range(N_WAVES):
        rows = []
        for i in range(PATHS_PER_WAVE):
            p = f"/soak/dir{(w + i) % 3}/f{(w * PATHS_PER_WAVE + i) % N_PATHS:02d}.log"
            ts = t0 + dt.timedelta(seconds=w, milliseconds=37 * i)
            rows.append((p, "WRITE" if w % 4 else "CREATE", "BSI", "/soak", ts, ts, False))
        total += len(rows)
        cols = list(zip(*rows))
        table = pa.table(
            {
                "path": pa.array(cols[0], pa.string()),
                "op": pa.array(cols[1], pa.string()),
                "biz": pa.array(cols[2], pa.string()),
                "root_path": pa.array(cols[3], pa.string()),
                "ts": pa.array(cols[4], pa.timestamp("us")),
                "mod_time": pa.array(cols[5], pa.timestamp("us")),
                "is_dir": pa.array(cols[6], pa.bool_()),
            }
        )
        pq.write_table(table, os.path.join(src, f"wave{w:04d}.parquet"))
    return total


def _enrich(df):
    """Raw event → 13-column logfile row (the M1-M10 projection, minimal)."""
    from pyspark.sql import functions as F

    raw = F.encode("path", "UTF-8")
    return df.select(
        F.to_date("ts").alias("file_date"),
        F.date_trunc("second", "ts").alias("file_time"),
        F.regexp_extract("path", r"^(.*)/[^/]+$", 1).alias("folder"),
        F.lit("").alias("pack"),
        F.regexp_extract("path", r"([^/]+)$", 1).alias("name"),
        F.length("path").cast("long").alias("size"),
        F.col("mod_time").alias("modify_time"),
        raw.alias("content"),
        F.lit(False).alias("compress"),
        F.length("path").cast("long").alias("compress_size"),
        F.md5(raw).alias("checksum"),
        F.lit("soak-host").alias("host"),
        F.col("ts").alias("folder_time"),
    )


def main() -> int:
    waves = N_WAVES
    if "--waves" in sys.argv[1:]:
        waves = int(sys.argv[sys.argv.index("--waves") + 1])
        globals()["N_WAVES"] = waves

    from pyspark.sql import functions as F

    import __spark_entry__  # noqa: F401 — path setup parity with the tools
    from log_agent_spark.functions.envelope import to_kafka_records
    from log_agent_spark.schemas import EVENT_SCHEMA
    from log_agent_spark.session import get_spark
    from log_agent_spark.sinks.multi import MultiSink, Sink
    from log_agent_spark.sinks.upsert import upsert_parquet
    from log_agent_spark.streaming.metrics import BatchMetricsListener
    from log_agent_spark.streaming.pipeline import run_event_pipeline
    from log_agent_spark.streaming.supervisor import supervise

    spark = get_spark("soak", **{"spark.sql.shuffle.partitions": "8"})
    root = tempfile.mkdtemp(prefix="log_agent_soak_")
    src = os.path.join(root, "src")
    table_dir = os.path.join(root, "upsert_table")
    records_dir = os.path.join(root, "kafka_records")
    ckpt = os.path.join(root, "ckpt")
    os.makedirs(src)

    n_events = _gen_waves(src)
    print(f"soak: {N_WAVES} waves / {n_events} events staged at {src}")

    # Failure injection: when armed, the NEXT upsert write raises before
    # touching storage — the micro-batch fails, the query dies, and the
    # supervisor must restart it from the checkpoint mid-soak.
    fault_armed = threading.Event()
    faults_fired: list[int] = []  # data-batch count at each injected crash

    def upsert_write(df):
        if fault_armed.is_set():
            fault_armed.clear()
            faults_fired.append(
                sum(1 for b in listener.batches if b.num_input_rows > 0)
            )
            raise RuntimeError("injected mid-soak fault (K2 sink crash)")
        upsert_parquet(spark, _enrich(df), table_dir)

    def records_write(df):
        to_kafka_records(_enrich(df)).write.mode("append").parquet(records_dir)

    chain = MultiSink(
        [
            Sink(name="upsert", write=upsert_write, priority=5),
            Sink(name="kafka-records", write=records_write, priority=10),
        ]
    )
    listener = BatchMetricsListener()
    spark.streams.addListener(listener)

    queries: list = []
    stop_flag = threading.Event()

    def start_query():
        stream = (
            spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = run_event_pipeline(
            stream,
            chain,
            debounce_ms=DEBOUNCE_MS,
            checkpoint_dir=ckpt,
            trigger="200 milliseconds",
        )
        queries.append(q)
        return q

    restarts_seen: list[int] = []
    sup_exc: list[BaseException] = []

    def run_supervised():
        try:
            _, n = supervise(
                start_query,
                max_restarts=5,
                backoff_s=0.5,
                on_restart=lambda n, exc: print(f"soak: restart {n}: {exc}"),
                should_stop=stop_flag.is_set,
            )
            restarts_seen.append(n)
        except BaseException as exc:  # noqa: BLE001 — surfaced in the verdict
            sup_exc.append(exc)

    t = threading.Thread(target=run_supervised, daemon=True)
    t.start()

    # Drain: every staged file consumed AND the debounce quiesce flushed.
    # Fault schedule: arm one sink crash as each wave fraction is crossed.
    fault_at = sorted({max(2, int(N_WAVES * f)) for f in FAULT_FRACTIONS})
    deadline = time.time() + 600
    emitted = 0
    try:
        while time.time() < deadline:
            time.sleep(2)
            if sup_exc:
                break
            if os.path.isdir(records_dir):
                try:
                    emitted = spark.read.parquet(records_dir).count()
                except Exception:  # noqa: BLE001 — dir mid-write
                    emitted = 0
            data_batches = sum(
                1 for b in listener.batches if b.num_input_rows > 0
            )
            if (
                fault_at
                and data_batches >= fault_at[0]
                and not fault_armed.is_set()
            ):
                fault_at.pop(0)
                fault_armed.set()
                print(f"soak: armed fault injection at batch {data_batches}")
            if data_batches >= N_WAVES and emitted >= N_PATHS:
                # all waves ingested; give the debounce one quiesce window
                time.sleep(max(2.0, DEBOUNCE_MS / 1000 * 3))
                break
    finally:
        stop_flag.set()
        for q in queries:
            try:
                q.stop()
            except Exception:  # noqa: BLE001
                pass
        t.join(timeout=60)
        spark.streams.removeListener(listener)

    if sup_exc:
        print(f"soak: supervisor exhausted restarts: {sup_exc[0]}")
        return 2

    batches = [b for b in listener.batches if b.num_input_rows > 0]
    durs = [b.duration_ms for b in batches if b.duration_ms]
    states = [b.state_rows for b in batches if b.state_rows is not None]
    n = len(durs)
    if n < 2:
        # too few data batches to compute a drift (source never started /
        # deadline hit early): zero the latency figures and let the
        # 'latency flat' and batch-count gates fail WITH the report intact
        # instead of dying on statistics.median of an empty slice (ADVICE r9)
        early = late = drift = 0.0
    else:
        early = statistics.median(durs[max(1, n // 10) : max(2, n // 2)])
        late = statistics.median(durs[n // 2 :])
        drift = late / early if early else 0.0
    upsert_rows = spark.read.parquet(table_dir).count()
    upsert_keys = (
        spark.read.parquet(table_dir)
        .select("file_date", "file_time", "folder", "pack", "name")
        .distinct()
        .count()
    )
    emitted = spark.read.parquet(records_dir).count()
    distinct_records = spark.read.parquet(records_dir).distinct().count()

    n_faults = len(faults_fired)
    gates = {
        # one standing query, bounded restarts; the supervisor thread must
        # have RETURNED (supervise reports its restart count on clean
        # shutdown) — a still-wedged thread or a missing report is a
        # failure, not a pass. Every INJECTED crash must have surfaced as
        # a restart (>= n_faults proves recovery happened DURING the soak,
        # not that the faults were somehow swallowed); the ceiling keeps
        # tolerance for at most a couple of ambient restarts on top.
        f"{n_faults} injected faults all restarted, restarts<=5": (
            bool(restarts_seen) and n_faults <= restarts_seen[0] <= 5
        ),
        "both scheduled faults fired": n_faults == len(FAULT_FRACTIONS),
        f">=~{N_WAVES} data micro-batches": len(batches) >= int(N_WAVES * 0.9),
        "state_rows bounded by live keys": bool(states) and max(states) <= N_PATHS * 2,
        f"latency flat (late/early <= {LATENCY_DRIFT_LIMIT})": 0 < drift <= LATENCY_DRIFT_LIMIT,
        "upsert idempotent (rows == keys)": upsert_rows == upsert_keys > 0,
        "records emitted": emitted > 0,
        # at-least-once contract of the append sink: replay duplicates are
        # real but bounded by what the replayed micro-batches could emit
        # (each replays one debounce emission, <= the live key set)
        "record dups bounded by replays": (
            0 <= emitted - distinct_records <= n_faults * N_PATHS
        ),
        # cross-sink consistency: deduped record stream == upserted table
        "distinct records == upsert rows": distinct_records == upsert_rows,
    }
    report = {
        "waves": N_WAVES,
        "events_staged": n_events,
        "data_batches": len(batches),
        "restarts": restarts_seen[0] if restarts_seen else None,
        "injected_faults_at_batch": faults_fired,
        "latency_ms": {
            "early_median": early,
            "late_median": late,
            "drift": round(drift, 3),
            "max": max(durs) if durs else None,
        },
        "state_rows": {"max": max(states) if states else None,
                       "last": states[-1] if states else None},
        "upsert_rows": upsert_rows,
        "kafka_records": emitted,
        "kafka_records_distinct": distinct_records,
        "gates": gates,
    }
    print(json.dumps(report, indent=1))

    lines = [
        "# SOAK — standing-pipeline endurance (tools/soak.py)",
        "",
        "Full hot path (source → debounce T1 → keep-latest T3 → enrich →",
        "MultiSink K6 with the K2 parquet upsert and the K1 broker-free",
        "kafka-record sink) under the S4 supervisor, "
        f"{N_WAVES} single-file micro-batches.",
        "",
        "| gate | value | verdict |",
        "|---|---|---|",
        f"| data micro-batches | {len(batches)} | {'ok' if gates[f'>=~{N_WAVES} data micro-batches'] else 'FAIL'} |",
        f"| injected sink crashes (at batch) | {n_faults} {faults_fired} | {'ok' if gates['both scheduled faults fired'] else 'FAIL'} |",
        f"| supervisor restarts (>= faults, <= 5) | {report['restarts']} | {'ok' if gates[f'{n_faults} injected faults all restarted, restarts<=5'] else 'FAIL'} |",
        f"| state rows max (cap {N_PATHS * 2}) | {report['state_rows']['max']} | {'ok' if gates['state_rows bounded by live keys'] else 'FAIL'} |",
        f"| latency drift late/early | {report['latency_ms']['drift']} | {'ok' if gates[f'latency flat (late/early <= {LATENCY_DRIFT_LIMIT})'] else 'FAIL'} |",
        f"| upsert rows == keys | {upsert_rows} == {upsert_keys} | {'ok' if gates['upsert idempotent (rows == keys)'] else 'FAIL'} |",
        f"| kafka records emitted | {emitted} | {'ok' if gates['records emitted'] else 'FAIL'} |",
        f"| record replay dups (at-least-once, cap {n_faults * N_PATHS}) | {emitted - distinct_records} | {'ok' if gates['record dups bounded by replays'] else 'FAIL'} |",
        f"| distinct records == upsert rows | {distinct_records} == {upsert_rows} | {'ok' if gates['distinct records == upsert rows'] else 'FAIL'} |",
        "",
        f"Early-window median batch {early} ms, late-window {late} ms, max "
        f"{report['latency_ms']['max']} ms. A debounce-state leak would grow "
        f"state_rows past the {N_PATHS}-key live set; a pinned-block/heap "
        "leak would drift the late-window median. The injected K2 sink "
        "crashes (the test_supervisor.py fault pattern) each failed one "
        "micro-batch mid-soak; the supervisor restarted from the "
        "checkpoint and the replays left rows == keys (no duplicate "
        "upserts) with state still bounded — restart IS recovery when "
        "the sink is idempotent. The higher-priority append sink had "
        "already written when the crash hit, so its replay duplicates "
        "are the honest at-least-once residue: bounded by the replayed "
        "batches and erased by a distinct() — which matches the upsert "
        "table exactly. Raw JSON below.",
        "",
        "```json",
        json.dumps(report, indent=1),
        "```",
        "",
    ]
    # a --waves smoke run is a spot-check: print, never clobber the
    # committed full-length artifact (the skew_probe subset discipline)
    if waves >= 110:
        with open("/root/repo/SOAK.md", "w") as f:
            f.write("\n".join(lines))
    else:
        print(f"smoke run ({waves} waves) — SOAK.md NOT rewritten")
    shutil.rmtree(root, ignore_errors=True)
    ok = all(gates.values())
    print("SOAK", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
