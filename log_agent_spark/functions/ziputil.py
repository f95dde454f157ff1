"""Zip explode — one archive record → N member records (SURVEY.md §2.4 M5-M6).

Reference behavior (watchdog/handler/kafka.go:209-274, duplicated in
cassandra.go:102-167):
- directory entries skipped               (kafka.go:230-232)
- entry names that aren't valid UTF-8 decoded as GBK (kafka.go:234-241)
- empty/invalid zip → zero rows, logged   (kafka.go:210-216)
- child record: pack = archive filename, name = entry path, size/content =
  entry's; parent times inherited         (kafka.go:243-255)

Spark-first shape: a scalar expression can't return N rows, so this is the
one legitimate ``mapInPandas`` operator — Arrow-batched, streaming one input
batch at a time, never materializing more than a batch of archives in
memory. The 16 MiB source-size cap (F6) bounds per-row memory.
"""

from __future__ import annotations

import io
import zipfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _decode_name(info: zipfile.ZipInfo) -> str:
    """zipfile decodes non-UTF8-flagged names as cp437; the reference's
    convention (handler.go:48-56) is GBK for anything that isn't UTF-8."""
    if info.flag_bits & 0x800:  # UTF-8 flag set by the archiver
        return info.filename
    raw = info.filename.encode("cp437")
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        return raw.decode("gbk", errors="replace")


def explode_zip_entries(
    df: DataFrame,
    content_col: str = "content",
    pack_col: str = "filename",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Explode zip blobs into member rows.

    Output schema = keep_cols + (pack, entry_name, entry_size, entry_content).
    Non-zip / unreadable blobs produce zero rows (reference drops them with
    an error log, kafka.go:210-216).
    """
    keep_cols = keep_cols or []
    in_cols = list(dict.fromkeys(keep_cols + [pack_col, content_col]))
    src = df.select(*in_cols)

    keep_fields = [
        f"{f.name} {f.dataType.simpleString()}"
        for f in src.schema.fields
        if f.name in keep_cols
    ]
    out_schema = ", ".join(
        keep_fields
        + ["pack string", "entry_name string", "entry_size long", "entry_content binary"]
    )

    def _explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for _, row in pdf.iterrows():
                blob = row[content_col]
                if blob is None:
                    continue
                try:
                    zf = zipfile.ZipFile(io.BytesIO(bytes(blob)))
                    infos = zf.infolist()
                except zipfile.BadZipFile:
                    continue  # kafka.go:210-216: invalid/empty zip → dropped
                for info in infos:
                    if info.is_dir():  # kafka.go:230-232
                        continue
                    rec = {k: row[k] for k in keep_cols}
                    rec["pack"] = row[pack_col]
                    rec["entry_name"] = _decode_name(info)
                    rec["entry_size"] = info.file_size
                    rec["entry_content"] = zf.read(info)
                    rows.append(rec)
            cols = keep_cols + ["pack", "entry_name", "entry_size", "entry_content"]
            yield pd.DataFrame(rows, columns=cols)

    return src.mapInPandas(_explode, schema=out_schema)


def with_zip_members(df: DataFrame) -> DataFrame:
    """Union: non-zip rows pass through (pack=''), zip rows are replaced by
    their exploded members — the reference's dispatch shape (kafka.go:170-185).

    Expects FileMeta-like columns: filepath, filename, ext, size, content.
    """
    is_zip = F.col("ext") == "zip"
    passthrough = df.filter(~is_zip).withColumn("pack", F.lit(""))
    members = (
        explode_zip_entries(
            df.filter(is_zip),
            keep_cols=[c for c in df.columns if c not in ("content", "pack")],
        )
        .withColumn("filename", F.col("entry_name"))
        .withColumn("size", F.col("entry_size"))
        .withColumn("content", F.col("entry_content"))
        .drop("entry_name", "entry_size", "entry_content")
    )
    return passthrough.unionByName(members, allowMissingColumns=False).select(
        *passthrough.columns
    )
