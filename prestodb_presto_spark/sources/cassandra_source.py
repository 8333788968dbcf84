"""presto-cassandra — CQL tables as scannable tables, as a REAL
pure-Python DataSource V2 speaking the CQL native wire protocol v4
(public spec: cassandra.apache.org/_/native_protocol.html) — no jar,
no client library; completes the remote-store trio alongside
sources/redis_source.py (RESP) and sources/mongo_source.py (OP_MSG).

Reference mapping (presto-cassandra/src/main/java/...):

  - CassandraSplit / CassandraSplitManager — splits by token range over
    the ring; here one InputPartition per ``nodes`` entry, each carrying
    a token-range WHERE fragment when ``token_ranges`` is set (the
    reference's partitioned scan), else a full scan per node;
  - CassandraRecordCursor — paged QUERY execution: each RESULT carries
    a paging state blob that the next QUERY resends (result_page_size),
    exactly this loop;
  - CassandraType — the scalar bridge (boolean/bigint/double/int/
    varchar map 1:1; the binary layouts below follow the spec's
    [bytes] encodings).

Usage:
    spark.dataSource.register(CassandraDataSource)
    df = (spark.read.format("cassandra_cql")
          .option("nodes", "localhost:9042")
          .option("keyspace", "ks").option("table", "events")
          .option("schema", "id bigint, name string, score double")
          .load())

Scale posture: partitions = nodes × token ranges (a real ring fans out
one ranged scan per vnode); paging bounds executor memory by
``page_size``; only declared columns are selected (source-side column
pruning in the generated CQL).
"""

from __future__ import annotations

import socket
import struct

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_VERSION = 0x04  # CQL native protocol v4
_OP_STARTUP, _OP_READY, _OP_QUERY, _OP_RESULT, _OP_ERROR = 0x01, 0x02, 0x07, 0x08, 0x00
_CONSISTENCY_ONE = 0x0001
_RESULT_ROWS = 0x0002
_FLAG_VALUES, _FLAG_PAGE_SIZE, _FLAG_PAGING_STATE = 0x01, 0x04, 0x08
_META_GLOBAL_SPEC, _META_HAS_MORE_PAGES, _META_NO_METADATA = 0x01, 0x02, 0x04

# CQL option id → decoder for the spec's fixed [bytes] layouts
_DECODERS = {
    0x0002: lambda b: struct.unpack(">q", b)[0],  # bigint
    0x0004: lambda b: b[0] == 1,                  # boolean
    0x0007: lambda b: struct.unpack(">d", b)[0],  # double
    0x0009: lambda b: struct.unpack(">i", b)[0],  # int
    0x000D: lambda b: b.decode("utf-8"),          # varchar
    0x000A: lambda b: b.decode("utf-8"),          # text
}


def _string(s: str) -> bytes:
    b = s.encode()
    return struct.pack(">H", len(b)) + b


def _long_string(s: str) -> bytes:
    b = s.encode()
    return struct.pack(">i", len(b)) + b


class CqlWire:
    """Minimal CQL v4 client: STARTUP handshake + paged QUERY."""

    def __init__(self, host: str, port: int, timeout: float = 10.0):
        self._sock = socket.create_connection((host, port), timeout=timeout)
        self._stream = 0
        # STARTUP with the mandatory CQL_VERSION string map
        body = struct.pack(">H", 1) + _string("CQL_VERSION") + _string("3.0.0")
        op, _ = self._request(_OP_STARTUP, body)
        if op != _OP_READY:
            raise ConnectionError(f"cassandra STARTUP rejected (opcode {op})")

    def close(self) -> None:
        try:
            self._sock.close()
        except OSError:
            pass

    def _request(self, opcode: int, body: bytes):
        self._stream = (self._stream + 1) % 32768
        frame = struct.pack(
            ">BBhBi", _VERSION, 0, self._stream, opcode, len(body)
        ) + body
        self._sock.sendall(frame)
        return self._read_frame()

    def _read_exact(self, n: int) -> bytes:
        chunks = []
        while n:
            c = self._sock.recv(n)
            if not c:
                raise ConnectionError("cassandra connection closed mid-frame")
            chunks.append(c)
            n -= len(c)
        return b"".join(chunks)

    def _read_frame(self):
        hdr = self._read_exact(9)
        _ver, _flags, _stream, opcode, length = struct.unpack(">BBhBi", hdr)
        body = self._read_exact(length) if length else b""
        if opcode == _OP_ERROR:
            code = struct.unpack_from(">i", body)[0]
            n = struct.unpack_from(">H", body, 4)[0]
            raise RuntimeError(
                f"cassandra error 0x{code:04x}: {body[6 : 6 + n].decode()}"
            )
        return opcode, body

    def query_page(self, cql: str, page_size: int, paging_state: bytes | None):
        """One QUERY round-trip → (rows, col_decoders, next_paging_state)."""
        flags = _FLAG_PAGE_SIZE
        tail = struct.pack(">i", page_size)
        if paging_state is not None:
            flags |= _FLAG_PAGING_STATE
            tail += struct.pack(">i", len(paging_state)) + paging_state
        body = (
            _long_string(cql)
            + struct.pack(">H", _CONSISTENCY_ONE)
            + bytes([flags])
            + tail
        )
        op, reply = self._request(_OP_QUERY, body)
        if op != _OP_RESULT:
            raise RuntimeError(f"unexpected opcode {op} for QUERY")
        return self._parse_rows(reply)

    @staticmethod
    def _parse_rows(body: bytes):
        kind = struct.unpack_from(">i", body)[0]
        if kind != _RESULT_ROWS:
            raise RuntimeError(f"unexpected RESULT kind {kind}")
        pos = 4
        meta_flags, col_count = struct.unpack_from(">ii", body, pos)
        pos += 8
        paging_state = None
        if meta_flags & _META_HAS_MORE_PAGES:
            n = struct.unpack_from(">i", body, pos)[0]
            pos += 4
            paging_state = body[pos : pos + n]
            pos += n
        if meta_flags & _META_GLOBAL_SPEC:
            for _ in range(2):  # keyspace + table [string]
                n = struct.unpack_from(">H", body, pos)[0]
                pos += 2 + n
        decoders = []
        for _ in range(col_count):
            if not meta_flags & _META_GLOBAL_SPEC:
                for _ in range(2):
                    n = struct.unpack_from(">H", body, pos)[0]
                    pos += 2 + n
            n = struct.unpack_from(">H", body, pos)[0]  # column name
            pos += 2 + n
            opt = struct.unpack_from(">H", body, pos)[0]  # type option id
            pos += 2
            dec = _DECODERS.get(opt)
            if dec is None:
                raise ValueError(f"unsupported CQL type option 0x{opt:04x}")
            decoders.append(dec)
        row_count = struct.unpack_from(">i", body, pos)[0]
        pos += 4
        rows = []
        for _ in range(row_count):
            vals = []
            for dec in decoders:
                n = struct.unpack_from(">i", body, pos)[0]
                pos += 4
                if n < 0:
                    vals.append(None)
                else:
                    vals.append(dec(body[pos : pos + n]))
                    pos += n
            rows.append(tuple(vals))
        return rows, paging_state


class _RingSplit(InputPartition):
    def __init__(self, host: str, port: int, where: str):
        self.host, self.port, self.where = host, port, where


class CassandraReader(DataSourceReader):
    def __init__(self, nodes, keyspace, table, fields, page_size, token_ranges):
        self._nodes = nodes
        self._ks = keyspace
        self._table = table
        self._fields = fields
        self._page = page_size
        self._ranges = token_ranges

    def partitions(self):
        # CassandraSplitManager: splits = token ranges spread over nodes;
        # with no declared ranges, one full-scan split per node
        if not self._ranges:
            return [_RingSplit(h, p, "") for h, p in self._nodes]
        splits = []
        for i, (lo, hi) in enumerate(self._ranges):
            h, p = self._nodes[i % len(self._nodes)]
            splits.append(
                _RingSplit(
                    h, p,
                    f" WHERE token({self._fields[0]}) > {lo}"
                    f" AND token({self._fields[0]}) <= {hi}",
                )
            )
        return splits

    def read(self, partition):
        wire = CqlWire(partition.host, partition.port)
        try:
            cql = (
                f"SELECT {', '.join(self._fields)} FROM"
                f" {self._ks}.{self._table}{partition.where}"
            )
            state = None
            while True:
                rows, state = wire.query_page(cql, self._page, state)
                yield from rows
                if state is None:
                    break
        finally:
            wire.close()


class CassandraDataSource(DataSource):
    """format("cassandra_cql"): options nodes ("h:p[,h:p...]"), keyspace,
    table, schema (Spark DDL — the declared column set, like the
    reference's CassandraColumnHandle list), page_size, token_ranges
    ("lo:hi[,lo:hi...]" for ranged splits)."""

    @classmethod
    def name(cls) -> str:
        return "cassandra_cql"

    def schema(self) -> str:
        ddl = self.options.get("schema")
        if not ddl:
            raise ValueError(
                "cassandra_cql requires option 'schema' (declared columns)"
            )
        return ddl

    def reader(self, schema) -> CassandraReader:
        raw = self.options.get("nodes")
        if not raw:
            raise ValueError(
                "cassandra_cql requires option 'nodes' (host:port[,host:port...])"
            )
        nodes = []
        for part in raw.split(","):
            host, _, port = part.strip().rpartition(":")
            nodes.append((host or "localhost", int(port)))
        ranges = []
        for rng in (self.options.get("token_ranges") or "").split(","):
            if rng.strip():
                lo, hi = rng.split(":")
                ranges.append((int(lo), int(hi)))
        return CassandraReader(
            nodes,
            self.options.get("keyspace", "ks"),
            self.options.get("table", "table"),
            [f.name for f in schema.fields],
            int(self.options.get("page_size", "1000")),
            ranges,
        )


def register_cassandra(spark) -> None:
    """Idempotent registration of the cassandra_cql format."""
    spark.dataSource.register(CassandraDataSource)
