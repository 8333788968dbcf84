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
    """Raw decoder (decoder/raw/RawRowDecoder.java): reinterpret the
    bytes as one value.  Integer layouts are big-endian fixed-width
    (the reference's BYTE/SHORT/INT/LONG FieldTypes)."""
    col = F.col(value) if isinstance(value, str) else value
    if as_type == "string":
        return col.cast("string")
    if as_type in ("tinyint", "smallint", "int", "bigint"):
        width = {"tinyint": 1, "smallint": 2, "int": 4, "bigint": 8}[as_type]
        # big-endian two's complement: parse the hex as unsigned, then
        # wrap values above the signed midpoint
        unsigned = F.conv(F.hex(F.substring(col, 1, width)), 16, 10).cast("decimal(38,0)")
        # literals via string → decimal: 2^63/2^64 overflow a JVM long lit
        midpoint = F.lit(str(1 << (8 * width - 1))).cast("decimal(38,0)")
        full = F.lit(str(1 << (8 * width))).cast("decimal(38,0)")
        return (
            F.when(unsigned >= midpoint, unsigned - full).otherwise(unsigned)
        ).cast("bigint")
    if as_type == "boolean":
        return (F.conv(F.hex(F.substring(col, 1, 1)), 16, 10) != 0).cast("boolean")
    return col.cast(as_type)


# --- JSON timestamp field decoders (decoder/json/*.java) -----------------
# The reference registers per-field dataFormat decoders for temporal
# columns; each maps to one native Spark expression over the parsed
# JSON string/number field.


def decode_ts_iso8601(field: Column) -> Column:
    """ISO8601JsonFieldDecoder.java:44 (ISODateTimeFormat.dateTimeParser,
    UTC): Spark's to_timestamp parses ISO-8601 natively."""
    return F.to_timestamp(field)


def decode_ts_rfc2822(field: Column) -> Column:
    """RFC2822JsonFieldDecoder.java:45 — joda pattern
    'EEE MMM dd HH:mm:ss Z yyyy', English locale, UTC (the Twitter
    created_at shape, e.g. 'Thu Jan 01 00:00:00 +0000 1970').  Spark's
    post-3.0 parser refuses day-of-week tokens on the PARSE side
    (DATETIME_PATTERN_RECOGNITION), and the token is redundant for the
    instant anyway — strip it and parse the remaining five fields."""
    return F.to_timestamp(
        F.substring_index(field, " ", -5), "MMM dd HH:mm:ss Z yyyy"
    )


def decode_ts_millis(field: Column) -> Column:
    """MillisecondsSinceEpochJsonFieldDecoder.java: numeric field is
    epoch millis."""
    return F.timestamp_millis(field.cast("bigint"))


def decode_ts_seconds(field: Column) -> Column:
    """SecondsSinceEpochJsonFieldDecoder.java: numeric field is epoch
    seconds."""
    return F.timestamp_seconds(field.cast("bigint"))


def decode_ts_custom(field: Column, format_hint: str) -> Column:
    """CustomDateTimeJsonFieldDecoder.java:82 — formatHint is a
    Joda/java.time pattern; Spark's to_timestamp takes the same
    DateTimeFormatter pattern language."""
    return F.to_timestamp(field, format_hint)


_TS_DECODERS = {
    "iso8601": decode_ts_iso8601,
    "rfc2822": decode_ts_rfc2822,
    "milliseconds-since-epoch": decode_ts_millis,
    "seconds-since-epoch": decode_ts_seconds,
}


def decode_ts_field(field: Column | str, data_format: str) -> Column:
    """Dispatch on the reference's dataFormat names
    (JsonDecoderModule.java registrations); any other string is a
    custom-date-time formatHint."""
    col = F.col(field) if isinstance(field, str) else field
    fn = _TS_DECODERS.get(data_format)
    return fn(col) if fn else decode_ts_custom(col, data_format)


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
