"""File-copy sink as a Spark 4 Python DataSource writer (K3, distributed).

The reference's file handler copies each record's content to
``DestRoot/SubDir/Filename`` and restores the source mtime on the copy
(watchdog/handler/file.go:44-88). sinks/filecopy.py ports that as a
driver-side micro-batch loop; THIS module is the cluster-scale form — a
registered write format, so the copies run **per partition on the
executors** and the driver only sees commit messages:

    spark.dataSource.register(FileCopyDataSource)
    df.write.format("filecopy").option("dest_root", "/data/out").save()

Semantics preserved from the reference:
- path = dest_root/sub_dir/filename; empty filename ⇒ row skipped
  (file.go:49-54 custom-path skip contract)
- mtime restored on the copy when a modify_time column is present
  (Chtimes, file.go:79-88)
- per-partition counts roll up to one driver-side summary at commit — the
  "Finish N tasks" observability line (watchdog.go:309)

Scale: each executor writes only its partition's rows (shared filesystem
fan-out); no shuffle is introduced and content bytes never visit the
driver. Task retries re-write the same destination paths — idempotent, the
same replay-safety argument as the upsert sink (K7 note, SURVEY.md §2.5).
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceWriter, WriterCommitMessage
from pyspark.sql.types import StructType

logger = logging.getLogger(__name__)


@dataclass
class FileCopyCommit(WriterCommitMessage):
    n_written: int = 0
    n_skipped: int = 0


class FileCopyWriter(DataSourceWriter):
    def __init__(self, options: dict):
        dest = options.get("dest_root")
        if not dest:
            raise ValueError("filecopy writer requires option 'dest_root'")
        self._dest_root = dest
        self._preserve_mtime = str(options.get("preserve_mtime", "true")).lower() == "true"

    def write(self, iterator) -> FileCopyCommit:  # executor-side, per partition
        written = skipped = 0
        for row in iterator:
            d = row.asDict()
            filename = d.get("filename")
            if not filename:  # empty path ⇒ skip (file.go:49-54)
                skipped += 1
                continue
            # explicit `folder` (directory part, reference SubDir semantics)
            # wins over sub_dir — same producer-side disambiguation as
            # sinks/filecopy.py default_path
            sub = d.get("folder")
            if sub is None:
                sub = d.get("sub_dir") or ""
            dest = os.path.join(self._dest_root, sub, filename)
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            with open(dest, "wb") as f:
                f.write(bytes(d.get("content") or b""))
            mt = d.get("modify_time")
            if self._preserve_mtime and mt is not None:
                ts = mt.timestamp()
                os.utime(dest, (ts, ts))  # Chtimes parity (file.go:79-88)
            written += 1
        return FileCopyCommit(n_written=written, n_skipped=skipped)

    def commit(self, messages) -> None:  # driver-side barrier
        total = sum(m.n_written for m in messages if m is not None)
        skipped = sum(m.n_skipped for m in messages if m is not None)
        # per-batch latency/size observability (watchdog.go:309)
        logger.info("filecopy sink: wrote %d files (%d skipped)", total, skipped)

    def abort(self, messages) -> None:
        # partial writes are overwritten on replay (idempotent destinations)
        logger.warning("filecopy sink aborted; replay will overwrite")


class FileCopyDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "filecopy"

    def schema(self) -> str:
        # write-only source; reads are not supported
        return "filename string"

    def writer(self, schema: StructType, overwrite: bool) -> FileCopyWriter:
        return FileCopyWriter(dict(self.options))
