"""Kafka wire format — Connect-style JSON envelope + message key
(SURVEY.md §2.4 M9-M12).

Byte-compatibility targets (watchdog/handler/kafka.go):
- envelope = {"schema": <static literal>, "payload": {...}}   kafka.go:418-421
- payload field set/order                                     kafka.go:424-438
- file_date  as 'yyyy-MM-dd'                                  kafka.go:331
- file_time / modify_time / folder_time as epoch millis       kafka.go:332-342
- content as '0x' + lowercase hex, empty → '0x'               kafka.go:323-325
- key = folder/[pack/]name (pack skipped when empty)          kafka.go:359-365

All built-in expressions (to_json over a struct) — JVM-side, codegen'd.
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from log_agent_spark.functions.content import hex_blob
from log_agent_spark.schemas import KAFKA_CONNECT_FIELD_TYPES, KAFKA_PAYLOAD_FIELDS

# The static Connect schema half of the envelope (kafka.go:34-93): emitted
# verbatim on every message, so it is a constant string, not a computed column.
CONNECT_SCHEMA: dict = {
    "type": "struct",
    "fields": [
        {"type": t, "optional": False, "field": name}
        for name, t in KAFKA_CONNECT_FIELD_TYPES.items()
    ],
    "optional": False,
    "name": "logfile",
}

CONNECT_SCHEMA_JSON = json.dumps(CONNECT_SCHEMA, separators=(",", ":"))


def kafka_key(folder: Column, pack: Column, name: Column) -> Column:
    """folder/[pack/]name — concat_ws skips NULL, so empty pack is mapped to
    NULL first (kafka.go:360-365 uniqueness fix for archive members)."""
    return F.concat_ws("/", folder, F.nullif(pack, F.lit("")), name)


def payload_struct(df_cols: dict[str, Column] | None = None) -> Column:
    """The 13-field payload struct with the reference's wire projections."""
    c = df_cols or {name: F.col(name) for name in (
        "file_date", "file_time", "folder", "pack", "name", "size",
        "modify_time", "content", "compress", "compress_size", "checksum",
        "host", "folder_time",
    )}
    wire = {
        "file_date": F.date_format(c["file_date"], "yyyy-MM-dd"),
        "file_time": F.unix_millis(c["file_time"]),
        "folder": c["folder"],
        "pack": c["pack"],
        "name": c["name"],
        "size": c["size"],
        "modify_time": F.unix_millis(c["modify_time"]),
        "content": hex_blob(c["content"]),
        "compress": c["compress"],
        "compress_size": c["compress_size"],
        "checksum": c["checksum"],
        "host": c["host"],
        "folder_time": F.unix_millis(c["folder_time"]),
    }
    return F.struct(*[wire[f].alias(f) for f in KAFKA_PAYLOAD_FIELDS])


def to_kafka_records(df: DataFrame) -> DataFrame:
    """(key, value) rows ready for the Kafka sink.

    value = '{"schema":<literal>,"payload":' + to_json(payload) + '}' —
    splicing the constant schema as a string keeps the whole row codegen'd
    and guarantees the schema half is byte-identical on every record.
    """
    payload_json = F.to_json(payload_struct())
    value = F.concat(
        F.lit('{"schema":' + CONNECT_SCHEMA_JSON + ',"payload":'),
        payload_json,
        F.lit("}"),
    )
    key = kafka_key(F.col("folder"), F.col("pack"), F.col("name"))
    return df.select(key.alias("key"), value.alias("value"))


def to_kafka_records_avro(df: DataFrame, schema_id: int) -> DataFrame:
    """(key, value) rows with the Confluent-framed AVRO body — the
    reference's dormant schema-registry path completed (kafka.go:373-406):
    value = 0x00 + BE32(schema_id) + avro_binary(payload), key unchanged.

    The payload struct carries the same wire projections as the JSON
    envelope (date string, epoch millis, '0x' hex content); the Avro body
    serializes them in the record-schema field order (functions/avro.py).
    """
    from log_agent_spark.functions.avro import AVRO_FIELDS, avro_value

    wire = payload_struct()
    # Avro field order differs from the Connect payload order (content
    # sits earlier) — reproject the struct to schema order for encoding.
    ordered = F.struct(
        *[wire.getField(name).alias(name) for name, _ in AVRO_FIELDS]
    )
    value = confluent_frame(schema_id, avro_value(ordered))
    key = kafka_key(F.col("folder"), F.col("pack"), F.col("name"))
    return df.select(key.alias("key"), value.alias("value"))


def confluent_frame(schema_id: int, body: Column) -> Column:
    """Confluent Schema-Registry wire framing: magic byte 0x00 + 4-byte
    big-endian schema ID + serialized body (the encoder the reference keeps
    live even though its Avro wiring is dormant, kafka.go:449-473: magic 0
    at :457-459, binary.BigEndian 4-byte ID at :461-464, body appended).

    Pure built-ins — unhex(lpad(hex(id), 8, '0')) materializes the 4-byte
    big-endian integer — so the frame stays codegen'd; the body stays
    format-agnostic (Avro, JSON bytes, ...), exactly like the reference's
    ``[]byte`` append."""
    if not 0 <= schema_id <= 0xFFFFFFFF:
        raise ValueError(f"schema_id out of uint32 range: {schema_id}")
    return F.concat(
        F.lit(bytes([0])),
        F.unhex(F.lpad(F.hex(F.lit(schema_id)), 8, "0")),
        body.cast("binary"),
    )
