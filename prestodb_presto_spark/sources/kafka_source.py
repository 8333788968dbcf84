"""presto-kafka — topics as scannable tables, as a REAL pure-Python
DataSource V2 speaking the public Kafka wire protocol (kafka.apache.org
/protocol): Metadata v0 for topic layout, Fetch v0 with the legacy
message-set format (magic 0) for records — no jar, no client library.

This closes the §2.2 kafka seam the jar-backed path couldn't: the
production route stays ``sources/io.kafka_batch`` (Spark's native kafka
source, needs the spark-sql-kafka package), while this reader exercises
the same table model end-to-end with zero dependencies.

Reference mapping (presto-kafka/src/main/java/...):

  - KafkaSplit.java:34 — ONE SPLIT PER TOPIC-PARTITION with leader host
    and offset range; partitions() below does exactly that from the
    Metadata response;
  - KafkaRecordSet — sequential fetch of a partition's messages from
    start to high-watermark, surfacing (partition, offset, key, value)
    rows; typed field decoding is presto-record-decoder's job — here
    too (sources/decoders.py on the value column);
  - legacy message format: the reference (Presto 0.206 era, kafka 0.8
    SimpleConsumer) consumed exactly this magic-0 layout.

Usage:
    spark.dataSource.register(KafkaPyDataSource)
    df = (spark.read.format("kafka_py")
          .option("bootstrap", "localhost:9092")
          .option("topic", "events").load())
    typed = df.select(decode_json(df.value.cast("string"), "x int").alias("v"))

Scale posture: splits = topic partitions (the unit of Kafka
parallelism); each fetch round-trip is bounded by ``max_bytes``; the
loop advances by returned offsets so a partition streams in chunks.
"""

from __future__ import annotations

import socket
import struct
import zlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_API_FETCH, _API_METADATA = 1, 3

KAFKA_SCHEMA = StructType(
    [
        StructField("key", BinaryType()),
        StructField("value", BinaryType()),
        StructField("topic", StringType()),
        StructField("partition", IntegerType()),
        StructField("offset", LongType()),
    ]
)


def _kstr(s: str | None) -> bytes:
    if s is None:
        return struct.pack(">h", -1)
    b = s.encode()
    return struct.pack(">h", len(b)) + b


class KafkaWire:
    """Minimal Kafka protocol client (Metadata v0 + Fetch v0)."""

    def __init__(self, host: str, port: int, timeout: float = 10.0):
        self._sock = socket.create_connection((host, port), timeout=timeout)
        self._corr = 0

    def close(self) -> None:
        try:
            self._sock.close()
        except OSError:
            pass

    def _request(self, api: int, body: bytes) -> bytes:
        self._corr += 1
        payload = (
            struct.pack(">hhi", api, 0, self._corr) + _kstr("prestodb-presto-spark") + body
        )
        self._sock.sendall(struct.pack(">i", len(payload)) + payload)
        size = struct.unpack(">i", self._read_exact(4))[0]
        reply = self._read_exact(size)
        corr = struct.unpack_from(">i", reply)[0]
        if corr != self._corr:
            raise RuntimeError(f"correlation id mismatch: {corr} != {self._corr}")
        return reply[4:]

    def _read_exact(self, n: int) -> bytes:
        chunks = []
        while n:
            c = self._sock.recv(n)
            if not c:
                raise ConnectionError("kafka connection closed mid-reply")
            chunks.append(c)
            n -= len(c)
        return b"".join(chunks)

    def metadata(self, topic: str):
        """Metadata v0 → [(partition_id, leader_host, leader_port)]."""
        body = struct.pack(">i", 1) + _kstr(topic)
        r = self._request(_API_METADATA, body)
        pos = 0
        n_brokers = struct.unpack_from(">i", r, pos)[0]
        pos += 4
        brokers = {}
        for _ in range(n_brokers):
            node = struct.unpack_from(">i", r, pos)[0]
            pos += 4
            hn = struct.unpack_from(">h", r, pos)[0]
            host = r[pos + 2 : pos + 2 + hn].decode()
            pos += 2 + hn
            port = struct.unpack_from(">i", r, pos)[0]
            pos += 4
            brokers[node] = (host, port)
        n_topics = struct.unpack_from(">i", r, pos)[0]
        pos += 4
        parts = []
        for _ in range(n_topics):
            terr = struct.unpack_from(">h", r, pos)[0]
            pos += 2
            tn = struct.unpack_from(">h", r, pos)[0]
            tname = r[pos + 2 : pos + 2 + tn].decode()
            pos += 2 + tn
            n_parts = struct.unpack_from(">i", r, pos)[0]
            pos += 4
            for _ in range(n_parts):
                _perr, pid, leader = struct.unpack_from(">hii", r, pos)
                pos += 10
                for _arr in range(2):  # replicas + isr int32 arrays
                    cnt = struct.unpack_from(">i", r, pos)[0]
                    pos += 4 + 4 * cnt
                if terr == 0 and tname == topic:
                    host, port = brokers[leader]
                    parts.append((pid, host, port))
        return parts

    def fetch(self, topic: str, partition: int, offset: int, max_bytes: int):
        """Fetch v0 → (records [(offset, key, value)], high_watermark)."""
        body = (
            struct.pack(">iii", -1, 500, 1)  # replica_id, max_wait_ms, min_bytes
            + struct.pack(">i", 1)
            + _kstr(topic)
            + struct.pack(">i", 1)
            + struct.pack(">iqi", partition, offset, max_bytes)
        )
        r = self._request(_API_FETCH, body)
        pos = 4  # topics array count (always 1 here)
        tn = struct.unpack_from(">h", r, pos)[0]
        pos += 2 + tn
        pos += 4  # partitions array count (1)
        _pid, err, hw, ms_size = struct.unpack_from(">ihqi", r, pos)
        pos += 18
        if err != 0:
            raise RuntimeError(f"kafka fetch error code {err}")
        records = []
        end = pos + ms_size
        while pos + 12 <= end:
            off, size = struct.unpack_from(">qi", r, pos)
            pos += 12
            if pos + size > end:
                break  # partial trailing message — next fetch re-reads it
            msg = r[pos : pos + size]
            pos += size
            crc = struct.unpack_from(">I", msg)[0]
            if crc != zlib.crc32(msg[4:]) & 0xFFFFFFFF:
                raise ValueError(f"kafka message CRC mismatch at offset {off}")
            magic = msg[4]
            if magic != 0:
                raise NotImplementedError(
                    "only legacy magic-0 message sets supported (the"
                    " reference's kafka-0.8 consumer era)"
                )
            p = 6  # crc(4) + magic(1) + attributes(1)
            klen = struct.unpack_from(">i", msg, p)[0]
            p += 4
            key = None if klen == -1 else msg[p : p + klen]
            p += max(klen, 0)
            vlen = struct.unpack_from(">i", msg, p)[0]
            p += 4
            value = None if vlen == -1 else msg[p : p + vlen]
            records.append((off, key, value))
        return records, hw


class _TopicPartitionSplit(InputPartition):
    def __init__(self, topic, partition, host, port):
        self.topic, self.partition = topic, partition
        self.host, self.port = host, port


class KafkaPyReader(DataSourceReader):
    def __init__(self, bootstrap, topic, max_bytes):
        self._bootstrap = bootstrap
        self._topic = topic
        self._max_bytes = max_bytes

    def partitions(self):
        host, _, port = self._bootstrap.rpartition(":")
        wire = KafkaWire(host or "localhost", int(port))
        try:
            parts = wire.metadata(self._topic)
        finally:
            wire.close()
        if not parts:
            raise ValueError(f"kafka topic not found: {self._topic}")
        # KafkaSplit.java:34 — one split per topic-partition, pinned to
        # its leader
        return [
            _TopicPartitionSplit(self._topic, pid, host, port)
            for pid, host, port in parts
        ]

    def read(self, split):
        wire = KafkaWire(split.host, split.port)
        try:
            offset = 0
            while True:
                records, hw = wire.fetch(
                    split.topic, split.partition, offset, self._max_bytes
                )
                for off, key, value in records:
                    yield (key, value, split.topic, split.partition, off)
                    offset = off + 1
                if offset >= hw or not records:
                    break
        finally:
            wire.close()


class KafkaPyDataSource(DataSource):
    """format("kafka_py"): options bootstrap ("host:port"), topic,
    max_bytes.  Output schema matches Spark's native kafka source
    (key/value binary + topic/partition/offset) so the record-decoder
    tier composes identically."""

    @classmethod
    def name(cls) -> str:
        return "kafka_py"

    def schema(self) -> StructType:
        return KAFKA_SCHEMA

    def _opts(self):
        bootstrap = self.options.get("bootstrap")
        topic = self.options.get("topic")
        if not bootstrap or not topic:
            raise ValueError("kafka_py requires options 'bootstrap' and 'topic'")
        return bootstrap, topic, int(self.options.get("max_bytes", str(1 << 20)))

    def reader(self, schema: StructType) -> KafkaPyReader:
        return KafkaPyReader(*self._opts())

    def streamReader(self, schema: StructType) -> "KafkaPyStreamReader":
        return KafkaPyStreamReader(*self._opts())


def register_kafka_py(spark) -> None:
    """Idempotent registration of the kafka_py format."""
    spark.dataSource.register(KafkaPyDataSource)


class KafkaPyStreamReader(DataSourceStreamReader):
    """Streaming tier of the kafka_py source — the structured-streaming
    twin of presto-kafka's continuous consumption: offsets are
    {partition: next_offset} dicts; each micro-batch plans one
    InputPartition per topic-partition covering [start, latest) and
    executors fetch their ranges independently.  Exactly-once comes
    from Spark's offset log: a replayed batch re-fetches the same
    offset range (Kafka reads are idempotent by offset)."""

    def __init__(self, bootstrap, topic, max_bytes):
        self._bootstrap = bootstrap
        self._topic = topic
        self._max_bytes = max_bytes

    def _wire(self):
        host, _, port = self._bootstrap.rpartition(":")
        return KafkaWire(host or "localhost", int(port))

    def _layout(self):
        wire = self._wire()
        try:
            return wire.metadata(self._topic)
        finally:
            wire.close()

    def initialOffset(self) -> dict:
        return {str(pid): 0 for pid, _h, _p in self._layout()}

    def latestOffset(self) -> dict:
        out = {}
        for pid, host, port in self._layout():
            wire = KafkaWire(host, port)
            try:
                _records, hw = wire.fetch(self._topic, pid, 0, 1)
                out[str(pid)] = hw
            finally:
                wire.close()
        return out

    def partitions(self, start: dict, end: dict):
        layout = {pid: (h, p) for pid, h, p in self._layout()}
        splits = []
        for pid_s, end_off in end.items():
            pid = int(pid_s)
            start_off = int(start.get(pid_s, 0))
            if end_off > start_off and pid in layout:
                host, port = layout[pid]
                splits.append(
                    _TopicPartitionRange(
                        self._topic, pid, host, port, start_off, int(end_off)
                    )
                )
        return splits or [
            # Spark requires >= 1 partition per batch; an empty range
            # yields no rows
            _TopicPartitionRange(self._topic, pid, h, p, 0, 0)
            for pid, h, p in self._layout()[:1]
        ]

    def read(self, split):
        if split.end <= split.start:
            return
        wire = KafkaWire(split.host, split.port)
        try:
            offset = split.start
            while offset < split.end:
                records, _hw = wire.fetch(
                    split.topic, split.partition, offset, self._max_bytes
                )
                if not records:
                    break
                for off, key, value in records:
                    if off >= split.end:
                        return
                    yield (key, value, split.topic, split.partition, off)
                    offset = off + 1
        finally:
            wire.close()

    def commit(self, end: dict) -> None:
        # Kafka offsets are the source of truth; Spark's offset log owns
        # progress — nothing to acknowledge broker-side for plain fetch
        pass


class _TopicPartitionRange(InputPartition):
    def __init__(self, topic, partition, host, port, start, end):
        self.topic, self.partition = topic, partition
        self.host, self.port = host, port
        self.start, self.end = start, end
