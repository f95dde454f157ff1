"""Driver-runnable demos of the agent-specific (non-SQL-oracle-able)
operators: whole-file binary ingest, zip explode, gzip gate, GBK transcode,
Kafka envelope. Inputs are synthesized deterministically (fixed bytes, fixed
mtimes) so row counts and values are stable across runs; the byte-level
golden assertions live in tests/.

These run as ``queries()`` entries WITHOUT oracle SQL — the driver records
the weaker rows-only check (DuckDB cannot unzip or gzip).
"""

from __future__ import annotations

import datetime as dt
import io
import os
import tempfile
import zipfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from log_agent_spark.functions.envelope import to_kafka_records
from log_agent_spark.plans.ingest import ingest_tree

_EPOCH = dt.datetime(2017, 6, 7, 16, 15, 42, tzinfo=dt.timezone.utc)


class _RawNameInfo(zipfile.ZipInfo):
    """ZipInfo that stores the name's raw bytes WITHOUT the UTF-8 flag —
    how legacy Windows archivers wrote GBK names (the case handler.go:48-56
    transcodes). The filename is carried as its cp437 decoding."""

    def _encodeFilenameFlags(self):  # noqa: D401 (CPython private hook)
        return self.filename.encode("cp437"), 0


def _make_zip(entries: dict[str, bytes], gbk_name: str | None = None) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr("nested/", b"")  # dir entry — must be skipped
        for name, content in entries.items():
            zf.writestr(name, content)
        if gbk_name:
            raw = gbk_name.encode("gbk")
            info = _RawNameInfo(raw.decode("cp437"))
            zf.writestr(info, b"gbk named content")
    return buf.getvalue()


def build_fixture_tree(base: str) -> None:
    """Deterministic BSI-style directory tree (FIXTURES.md B3/B4/B5)."""
    bsi_dir = os.path.join(
        base,
        "LOUP/1395T2936101/2017-06-07/MBBIVS171700094_1W_1_2017-06-07_16_15_42_797",
    )
    os.makedirs(bsi_dir, exist_ok=True)
    flat_dir = os.path.join(base, "flat")
    os.makedirs(flat_dir, exist_ok=True)

    files: dict[str, bytes] = {
        # compression-gate matrix (B5): small text (no gzip), big text
        # (gzip), big "jpg" (never-compress ext)
        os.path.join(bsi_dir, "small.log"): b"tiny log line",
        os.path.join(bsi_dir, "big.log"): b"spark " * 400,  # 2400 B > 1024
        os.path.join(flat_dir, "photo.jpg"): b"\xff\xd8" + b"j" * 2000,
        os.path.join(flat_dir, "empty.dat"): b"",
        # zip with nested dir (skipped), GBK-named member, empty member
        os.path.join(bsi_dir, "FLOWLOG.zip"): _make_zip(
            {"inner/result.txt": b"pass", "empty.txt": b""}, gbk_name="中文名.txt"
        ),
        # zero-byte zip — dropped with zero rows (kafka.go:210-216)
        os.path.join(flat_dir, "broken.zip"): b"",
    }
    for path, content in files.items():
        with open(path, "wb") as f:
            f.write(content)
        ts = _EPOCH.timestamp()
        os.utime(path, (ts, ts))


def _fixture_root() -> str:
    """Create (once per process) the fixture tree under a stable tmp dir."""
    base = os.path.join(tempfile.gettempdir(), "log_agent_spark_fixture_v1")
    marker = os.path.join(base, ".complete")
    if not os.path.exists(marker):
        build_fixture_tree(base)
        with open(marker, "w") as f:
            f.write("ok")
    return base


def q_ingest_logfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full Phase-1 ingest over the fixture tree → logfile rows.

    Exercises S3 listing, F1/F2 filters, M1 enrichment, M2-M4 BSI parse,
    M5-M6 zip explode + GBK, M7 checksum, M8 gzip gate, M10 projections.
    (sf_dir unused — input is the synthesized tree.)
    """
    root = _fixture_root()
    df = ingest_tree(spark, root, host="fixturehost")
    # drop wall-clock upload_time and raw content for a stable, compact result
    return df.select(
        "folder",
        "pack",
        "name",
        "size",
        "compress",
        "compress_size",
        "checksum",
        F.date_format("file_time", "yyyy-MM-dd HH:mm:ss").alias("file_time_str"),
    ).orderBy("folder", "pack", "name")


def q_kafka_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Envelope + key construction (M9-M12) over the ingested rows."""
    root = _fixture_root()
    df = ingest_tree(spark, root, host="fixturehost").withColumn(
        "upload_time", F.to_timestamp(F.lit("2017-06-08 00:00:00"))
    )
    return to_kafka_records(df).orderBy("key")


def q_ingest_text_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The non-archive text subset of the ingest — the slice whose every
    projection (folder parse, BSI time override, size, md5, gzip GATE
    decision) is reproducible in ANSI SQL over the same raw files, giving
    this part of the pipeline a full value-hash oracle (read_blob) instead
    of the rows-only check. Zip members and compressed/binary payloads stay
    golden-tested (DuckDB cannot unzip/gzip, and its md5 is VARCHAR-only)."""
    root = _fixture_root()
    df = ingest_tree(spark, root, host="fixturehost")
    return df.filter(
        (F.col("pack") == "") & ~F.col("name").rlike(r"\.(jpg|jpeg|gif|png)$")
    ).select(
        "folder",
        "name",
        "size",
        "compress",
        "checksum",
        F.date_format("file_time", "yyyy-MM-dd HH:mm:ss").alias("file_time_str"),
    )


def q_kafka_wire_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode to the Kafka wire, decode back, project the same slice as
    ingest_text_files — and check against the SAME read_blob oracle. A
    value-hash match proves the wire format is lossless end-to-end
    (envelope JSON, epoch-millis times, '0x' hex blobs) on top of the
    ingest itself being right."""
    from log_agent_spark.sources.kafka_source import from_kafka_records

    root = _fixture_root()
    df = ingest_tree(spark, root, host="fixturehost")
    decoded = from_kafka_records(to_kafka_records(df))
    return decoded.filter(
        (F.col("pack") == "") & ~F.col("name").rlike(r"\.(jpg|jpeg|gif|png)$")
    ).select(
        "folder",
        "name",
        "size",
        "compress",
        "checksum",
        F.date_format("file_time", "yyyy-MM-dd HH:mm:ss").alias("file_time_str"),
    )


def q_ingest_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro OCF sink→source round trip over the documents table: write
    through the pure-Python Object Container File writer (deflate codec,
    one file per partition, executor-side), read back through the matching
    reader, and aggregate per lang. The oracle runs the same aggregate on
    the ORIGINAL parquet — a value-hash match proves encode∘decode is the
    identity through the full OCF wire format (header map, zigzag varints,
    deflate blocks, sync markers). Completes the §2.7 format inventory
    without the spark-avro jar."""
    from log_agent_spark.sources.avro_ocf import register
    from log_agent_spark.sources.tables import load_table

    register(spark)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    outdir = os.path.join(
        tempfile.gettempdir(),
        "log_agent_spark_avro",
        os.path.basename(os.path.abspath(sf_dir)),
    )
    docs.write.format("avro_ocf").mode("overwrite").option(
        "codec", "deflate"
    ).save(outdir)
    back = spark.read.format("avro_ocf").schema(docs.schema).load(outdir)
    return (
        back.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.sum("doc_id").alias("sum_ids"),
            F.count_distinct("source").alias("n_sources"),
        )
        .orderBy("lang")
    )


_ORACLE_AVRO_ROUNDTRIP = """
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
FROM documents GROUP BY lang ORDER BY lang
"""


_BSI_TS_RE = r"(\d{4}-\d{2}-\d{2}_\d{2}_\d{2}_\d{2}_\d{3})$"

# NOTE: the oracle reads the SAME raw fixture files DuckDB-side; the tree is
# (re)built when ORACLES is accessed (module __getattr__ below), so the SQL
# is valid regardless of whether Spark or DuckDB runs first.
_ORACLE_INGEST_TEXT_FILES = f"""
WITH raw AS (
  SELECT replace(filename, '{{root}}/', '') AS rel, content, size, last_modified
  FROM read_blob('{{root}}/**')
  WHERE filename NOT LIKE '%.zip' AND filename NOT LIKE '%.complete'
    AND regexp_matches(filename, '\\.(jpg|jpeg|gif|png)$') = false
), parsed AS (
  SELECT rel,
         regexp_extract(rel, '([^/]*)$', 1) AS name,
         CASE WHEN rel LIKE '%/%' THEN regexp_replace(rel, '/[^/]*$', '') ELSE '' END AS folder,
         string_split(rel, '/') AS segs,
         content, size, last_modified
  FROM raw
), timed AS (
  -- rel INCLUDES the filename, so the reference's 4-5 DIRECTORY-segment
  -- window (BSI.go:46-49 over FileMeta.SubDir) is 5-6 segments of rel,
  -- and testID = the LAST directory segment = rel's second-to-last
  -- (mirrors functions/paths.py bsi_parse, fixed in round 6)
  SELECT *,
         CASE WHEN len(segs) BETWEEN 5 AND 6
              AND regexp_extract(segs[len(segs) - 1], '{_BSI_TS_RE}', 1) <> ''
              THEN strptime(regexp_extract(segs[len(segs) - 1], '{_BSI_TS_RE}', 1),
                            '%Y-%m-%d_%H_%M_%S_%g')
         END AS folder_time
  FROM parsed
)
SELECT folder, name, size,
       size > 1024 AND regexp_matches(lower(name), '\\.(jpg|jpeg|gif|png|wmv|flv|zip|gz)$') = false
         AS compress,
       md5(content::VARCHAR) AS checksum,
       strftime(COALESCE(folder_time, last_modified), '%Y-%m-%d %H:%M:%S') AS file_time_str
FROM timed
"""


QUERIES = {
    "ingest_logfile_tree": q_ingest_logfile,
    "ingest_text_files": q_ingest_text_files,
    "kafka_envelope": q_kafka_envelope,
    "kafka_wire_roundtrip": q_kafka_wire_roundtrip,
    "ingest_avro_roundtrip": q_ingest_avro_roundtrip,
}

# ingest_logfile_tree / kafka_envelope: DuckDB cannot unzip or gzip, so
# their oracles read the frozen golden parquet (tools/make_goldens.py) —
# the live Spark output is hash-checked against its own frozen bytes,
# upgrading the old rows-only check to a full value regression gate.
# ingest_text_files carries a real read_blob oracle, materialized lazily
# so the fixture tree exists whichever side executes first.
_GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tests",
    "goldens",
)
_STATIC_ORACLES: dict[str, str] = {
    name: f"SELECT * FROM read_parquet('{_GOLDEN_DIR}/{name}.parquet')"
    for name in ("ingest_logfile_tree", "kafka_envelope")
}


def __getattr__(name: str):
    if name == "ORACLES":
        root = _fixture_root()
        return {
            **_STATIC_ORACLES,
            "ingest_avro_roundtrip": _ORACLE_AVRO_ROUNDTRIP,
            "ingest_text_files": _ORACLE_INGEST_TEXT_FILES.replace("{root}", root),
            # same truth: the wire round trip must be the identity
            "kafka_wire_roundtrip": _ORACLE_INGEST_TEXT_FILES.replace("{root}", root),
        }
    raise AttributeError(name)
