"""presto-redis — keys/values of a Redis server as a scannable table,
as a REAL pure-Python DataSource V2 (no jar, no client library: the
RESP wire protocol is ~40 lines of stdlib sockets).

Reference mapping (presto-redis/src/main/java/...):

  - RedisSplitManager.java:93 — one RedisSplit per server node; here
    one InputPartition per entry in the ``nodes`` option, each executor
    scanning its node independently;
  - RedisRecordCursor.java:304 — SCAN-cursor iteration over string keys
    (MATCH pattern, COUNT batch) with values fetched in MGET batches
    (the cursor class pipelines GETs the same way);
  - RedisRecordCursor.java:342 — a key deleted mid-scan yields a null
    value row, not a failure (same warning semantics);
  - value/key DECODING is the presto-record-decoder tier, which this
    engine already ships (sources/decoders.py: decode_json/decode_csv/
    decode_raw + the timestamp field decoders) — apply it to the
    returned `value` column, exactly like the kafka path.

Usage:
    spark.dataSource.register(RedisDataSource)
    df = (spark.read.format("redis_kv")
          .option("nodes", "localhost:6379")
          .option("pattern", "dict:*").load())
    typed = df.select("key", decode_json("value", "x int, y string").alias("v"))

Scale posture: partitions = redis nodes (a cluster fans out one scan
per shard); SCAN is cursor-paged so executor memory is bounded by
``scan_count``; MGET batches amortize round-trips.
"""

from __future__ import annotations

import socket

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StringType, StructField, StructType


class RespClient:
    """Minimal RESP (REdis Serialization Protocol) client — stdlib only.

    Speaks the subset the scan path needs: command arrays out, simple
    strings / errors / integers / bulk strings / arrays in."""

    def __init__(self, host: str, port: int, timeout: float = 10.0):
        self._sock = socket.create_connection((host, port), timeout=timeout)
        self._buf = b""

    def close(self) -> None:
        try:
            self._sock.close()
        except OSError:
            pass

    def command(self, *args: str):
        out = [f"*{len(args)}\r\n".encode()]
        for a in args:
            b = a.encode() if isinstance(a, str) else a
            out.append(f"${len(b)}\r\n".encode() + b + b"\r\n")
        self._sock.sendall(b"".join(out))
        return self._read_reply()

    # --- RESP parsing -----------------------------------------------------

    def _read_line(self) -> bytes:
        while b"\r\n" not in self._buf:
            chunk = self._sock.recv(65536)
            if not chunk:
                raise ConnectionError("redis connection closed mid-reply")
            self._buf += chunk
        line, self._buf = self._buf.split(b"\r\n", 1)
        return line

    def _read_exact(self, n: int) -> bytes:
        while len(self._buf) < n + 2:
            chunk = self._sock.recv(65536)
            if not chunk:
                raise ConnectionError("redis connection closed mid-bulk")
            self._buf += chunk
        data, self._buf = self._buf[:n], self._buf[n + 2 :]
        return data

    def _read_reply(self):
        line = self._read_line()
        kind, rest = line[:1], line[1:]
        if kind == b"+":
            return rest.decode()
        if kind == b"-":
            raise RuntimeError(f"redis error: {rest.decode()}")
        if kind == b":":
            return int(rest)
        if kind == b"$":
            n = int(rest)
            return None if n == -1 else self._read_exact(n).decode()
        if kind == b"*":
            n = int(rest)
            return None if n == -1 else [self._read_reply() for _ in range(n)]
        raise RuntimeError(f"unexpected RESP type byte: {line[:20]!r}")


class _NodeSplit(InputPartition):
    def __init__(self, host: str, port: int):
        self.host, self.port = host, port


class RedisReader(DataSourceReader):
    def __init__(self, nodes, pattern: str, scan_count: int, mget_batch: int):
        self._nodes = nodes
        self._pattern = pattern
        self._scan_count = scan_count
        self._mget_batch = mget_batch

    def partitions(self):
        # RedisSplitManager.java:93 — one split per node
        return [_NodeSplit(h, p) for h, p in self._nodes]

    def read(self, partition):
        client = RespClient(partition.host, partition.port)
        try:
            cursor = "0"
            while True:
                cursor, keys = client.command(
                    "SCAN", cursor, "MATCH", self._pattern,
                    "COUNT", str(self._scan_count),
                )
                for i in range(0, len(keys), self._mget_batch):
                    batch = keys[i : i + self._mget_batch]
                    values = client.command("MGET", *batch)
                    # a key deleted mid-scan returns null value
                    # (RedisRecordCursor.java:342 semantics)
                    yield from zip(batch, values)
                if cursor == "0":
                    break
        finally:
            client.close()


class RedisDataSource(DataSource):
    """format("redis_kv"): options nodes ("h1:p1,h2:p2"), pattern
    (default "*"), scan_count, mget_batch.  Output schema is
    (key string, value string); typed decoding is the record-decoder
    tier's job (sources/decoders.py), matching the reference split of
    RedisSplit/RecordCursor vs presto-record-decoder."""

    @classmethod
    def name(cls) -> str:
        return "redis_kv"

    def _nodes(self):
        raw = self.options.get("nodes")
        if not raw:
            raise ValueError("redis_kv requires option 'nodes' (host:port[,host:port...])")
        nodes = []
        for part in raw.split(","):
            host, _, port = part.strip().rpartition(":")
            nodes.append((host or "localhost", int(port)))
        return nodes

    def schema(self) -> StructType:
        return StructType(
            [StructField("key", StringType()), StructField("value", StringType())]
        )

    def reader(self, schema: StructType) -> RedisReader:
        return RedisReader(
            self._nodes(),
            self.options.get("pattern", "*"),
            int(self.options.get("scan_count", "1000")),
            int(self.options.get("mget_batch", "500")),
        )


def register_redis(spark) -> None:
    """Idempotent registration of the redis_kv format."""
    spark.dataSource.register(RedisDataSource)
