"""presto-mongodb — collections as scannable tables, as a REAL
pure-Python DataSource V2 speaking the MongoDB wire protocol (OP_MSG,
public spec) with a hand-rolled BSON subset — no jar, no client
library, same posture as sources/redis_source.py.

Reference mapping (presto-mongodb/src/main/java/...):

  - MongoSplit.java:29 — a split carries (table, host addresses); here
    one InputPartition per entry in ``nodes`` (a sharded cluster fans
    out one find per mongos);
  - MongoPageSource — batched cursor iteration: the ``find`` command
    returns cursor.firstBatch, drained with ``getMore`` until cursor id
    0 (exactly this loop);
  - MongoColumnHandle / MongoMetadata — declared column types drive the
    row layout; this source takes the declared schema via the
    ``schema`` option (the reference stores it in its _schema
    collection) and projects exactly those fields server-side;
  - type bridge: BSON double/string/document/array/bool/null/
    int32/int64 — the scalar subset MongoMetadata maps to Presto types.

Usage:
    spark.dataSource.register(MongoDataSource)
    df = (spark.read.format("mongo_kv")
          .option("nodes", "localhost:27017")
          .option("database", "db").option("collection", "events")
          .option("schema", "x bigint, name string, score double")
          .load())

Scale posture: partitions = mongos endpoints; cursor paging bounds
executor memory by ``batch_size``; the projection document keeps
untouched fields server-side (column pruning at the source).
"""

from __future__ import annotations

import socket
import struct

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

# ---------------------------------------------------------------------------
# BSON subset (spec: bsonspec.org) — the scalar types the reference's
# MongoMetadata maps to Presto types, plus documents/arrays
# ---------------------------------------------------------------------------


def bson_encode(doc: dict) -> bytes:
    out = bytearray()
    for k, v in doc.items():
        key = k.encode() + b"\x00"
        if isinstance(v, bool):  # before int (bool is int subclass)
            out += b"\x08" + key + (b"\x01" if v else b"\x00")
        elif isinstance(v, float):
            out += b"\x01" + key + struct.pack("<d", v)
        elif isinstance(v, str):
            b = v.encode()
            out += b"\x02" + key + struct.pack("<i", len(b) + 1) + b + b"\x00"
        elif isinstance(v, dict):
            out += b"\x03" + key + bson_encode(v)
        elif isinstance(v, list):
            out += b"\x04" + key + bson_encode({str(i): x for i, x in enumerate(v)})
        elif v is None:
            out += b"\x0a" + key
        elif isinstance(v, int):
            if -(1 << 31) <= v < (1 << 31):
                out += b"\x10" + key + struct.pack("<i", v)
            else:
                out += b"\x12" + key + struct.pack("<q", v)
        else:
            raise TypeError(f"unsupported BSON value type: {type(v)}")
    return struct.pack("<i", len(out) + 5) + bytes(out) + b"\x00"


def bson_decode(buf: bytes, offset: int = 0) -> tuple[dict, int]:
    """Decode one document starting at ``offset`` → (dict, next_offset)."""
    size = struct.unpack_from("<i", buf, offset)[0]
    end = offset + size - 1  # position of the trailing \x00
    pos = offset + 4
    doc: dict = {}
    while pos < end:
        t = buf[pos]
        pos += 1
        zero = buf.index(b"\x00", pos)
        key = buf[pos:zero].decode()
        pos = zero + 1
        if t == 0x01:
            doc[key] = struct.unpack_from("<d", buf, pos)[0]
            pos += 8
        elif t == 0x02:
            n = struct.unpack_from("<i", buf, pos)[0]
            doc[key] = buf[pos + 4 : pos + 4 + n - 1].decode()
            pos += 4 + n
        elif t in (0x03, 0x04):
            sub, pos = bson_decode(buf, pos)
            doc[key] = (
                [sub[str(i)] for i in range(len(sub))] if t == 0x04 else sub
            )
        elif t == 0x08:
            doc[key] = buf[pos] == 1
            pos += 1
        elif t == 0x0A:
            doc[key] = None
        elif t == 0x10:
            doc[key] = struct.unpack_from("<i", buf, pos)[0]
            pos += 4
        elif t == 0x12:
            doc[key] = struct.unpack_from("<q", buf, pos)[0]
            pos += 8
        else:
            raise ValueError(f"unsupported BSON type byte 0x{t:02x} for key {key!r}")
    return doc, end + 1


# ---------------------------------------------------------------------------
# OP_MSG transport (MongoDB wire protocol; opCode 2013, kind-0 section)
# ---------------------------------------------------------------------------

_OP_MSG = 2013


class MongoWire:
    def __init__(self, host: str, port: int, timeout: float = 10.0):
        self._sock = socket.create_connection((host, port), timeout=timeout)
        self._req = 0

    def close(self) -> None:
        try:
            self._sock.close()
        except OSError:
            pass

    def command(self, doc: dict) -> dict:
        self._req += 1
        body = struct.pack("<i", 0) + b"\x00" + bson_encode(doc)
        msg = struct.pack("<iiii", 16 + len(body), self._req, 0, _OP_MSG) + body
        self._sock.sendall(msg)
        return self._read_msg()

    def _read_exact(self, n: int) -> bytes:
        chunks = []
        while n:
            c = self._sock.recv(n)
            if not c:
                raise ConnectionError("mongo connection closed mid-reply")
            chunks.append(c)
            n -= len(c)
        return b"".join(chunks)

    def _read_msg(self) -> dict:
        length, _req, _resp, opcode = struct.unpack("<iiii", self._read_exact(16))
        payload = self._read_exact(length - 16)
        if opcode != _OP_MSG:
            raise ValueError(f"unexpected opCode {opcode}")
        # flagBits(4) + kind byte(1) + BSON body
        if payload[4] != 0:
            raise ValueError("only kind-0 OP_MSG sections supported")
        doc, _ = bson_decode(payload, 5)
        if not doc.get("ok"):
            raise RuntimeError(f"mongo command failed: {doc}")
        return doc


class _MongosSplit(InputPartition):
    def __init__(self, host: str, port: int):
        self.host, self.port = host, port


class MongoReader(DataSourceReader):
    def __init__(self, nodes, database, collection, fields, batch_size):
        self._nodes = nodes
        self._db = database
        self._coll = collection
        self._fields = fields
        self._batch = batch_size

    def partitions(self):
        # MongoSplit.java:29 — split per host address
        return [_MongosSplit(h, p) for h, p in self._nodes]

    def read(self, partition):
        wire = MongoWire(partition.host, partition.port)
        try:
            # projection = declared columns only (source-side pruning,
            # MongoPageSource builds the same projection doc)
            projection = {f: 1 for f in self._fields}
            projection["_id"] = 0
            reply = wire.command(
                {
                    "find": self._coll,
                    "$db": self._db,
                    "filter": {},
                    "projection": projection,
                    "batchSize": self._batch,
                }
            )
            cursor = reply["cursor"]
            batch = cursor.get("firstBatch", [])
            while True:
                for doc in batch:
                    yield tuple(doc.get(f) for f in self._fields)
                cid = cursor.get("id", 0)
                if not cid:
                    break
                reply = wire.command(
                    {
                        "getMore": cid,
                        "$db": self._db,
                        "collection": self._coll,
                        "batchSize": self._batch,
                    }
                )
                cursor = reply["cursor"]
                batch = cursor.get("nextBatch", [])
        finally:
            wire.close()


class MongoDataSource(DataSource):
    """format("mongo_kv"): options nodes ("h:p[,h:p...]"), database,
    collection, schema (Spark DDL string — the declared column set, like
    the reference's _schema collection), batch_size."""

    @classmethod
    def name(cls) -> str:
        return "mongo_kv"

    def schema(self) -> str:
        ddl = self.options.get("schema")
        if not ddl:
            raise ValueError(
                "mongo_kv requires option 'schema' (declared columns, e.g."
                " 'x bigint, name string') — the reference's MongoMetadata"
                " equally requires a declared/inferred schema"
            )
        # returned as a DDL string: the Python DataSource API parses it
        # driver-side (StructType.fromDDL needs an active context, which
        # executor workers don't have)
        return ddl

    def reader(self, schema: StructType) -> MongoReader:
        raw = self.options.get("nodes")
        if not raw:
            raise ValueError("mongo_kv requires option 'nodes' (host:port[,host:port...])")
        nodes = []
        for part in raw.split(","):
            host, _, port = part.strip().rpartition(":")
            nodes.append((host or "localhost", int(port)))
        return MongoReader(
            nodes,
            self.options.get("database", "test"),
            self.options.get("collection", "collection"),
            [f.name for f in schema.fields],
            int(self.options.get("batch_size", "1000")),
        )


def register_mongo(spark) -> None:
    """Idempotent registration of the mongo_kv format."""
    spark.dataSource.register(MongoDataSource)
