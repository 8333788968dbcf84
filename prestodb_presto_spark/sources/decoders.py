"""Record decoders for message-bus payloads (presto-record-decoder).

The reference decodes Kafka/Redis message bytes into typed columns with
pluggable row decoders (presto-record-decoder/src/main/java/com/facebook/
presto/decoder/: json, csv, raw, avro).  Spark-first each decoder is a
column expression over the `value: binary` column that
spark.read.format("kafka") (or readStream) produces — fully native, so
decode happens inside the scan stage at any throughput.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def decode_json(value: Column | str, schema: str) -> Column:
    """JSON decoder (decoder/json/): bytes → struct via from_json.

    >>> df.select(decode_json("value", "id BIGINT, ts TIMESTAMP, v DOUBLE").alias("m")).select("m.*")
    """
    col = F.col(value) if isinstance(value, str) else value
    return F.from_json(col.cast("string"), schema)


def decode_csv(value: Column | str, schema: str, sep: str = ",") -> Column:
    """CSV decoder (decoder/csv/): bytes → struct via from_csv."""
    col = F.col(value) if isinstance(value, str) else value
    return F.from_csv(col.cast("string"), schema, {"sep": sep})


def decode_raw(value: Column | str, as_type: str = "string") -> Column:
    """Raw decoder (decoder/raw/): reinterpret the bytes as one value."""
    col = F.col(value) if isinstance(value, str) else value
    if as_type == "string":
        return col.cast("string")
    if as_type == "bigint":
        # 8-byte big-endian, the reference raw decoder's LONG layout
        return F.conv(F.hex(col), 16, 10).cast("bigint")
    return col.cast(as_type)


def decoded_stream(messages: DataFrame, decoder: str, schema: str | None = None) -> DataFrame:
    """Apply a decoder to a kafka-shaped frame (key/value binary + metadata),
    keeping the message metadata columns the reference exposes as hidden
    columns (_partition_id, _partition_offset ≈ partition, offset)."""
    meta = [c for c in ("topic", "partition", "offset", "timestamp") if c in messages.columns]
    if decoder == "json":
        out = messages.select(*meta, decode_json("value", schema).alias("m"))
    elif decoder == "csv":
        out = messages.select(*meta, decode_csv("value", schema).alias("m"))
    elif decoder == "raw":
        return messages.select(*meta, decode_raw("value").alias("value"))
    else:
        raise ValueError(f"unknown decoder {decoder!r} (json/csv/raw)")
    return out.select(*meta, "m.*")
