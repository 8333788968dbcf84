"""presto-thrift-connector — external Thrift data services as tables,
as a REAL pure-Python DataSource V2 speaking the Apache Thrift BINARY
protocol over the framed transport — the last connector row, same
zero-dependency playbook as redis (RESP) / mongodb (OP_MSG) /
cassandra (CQL) / kafka.

The service contract is the reference's own published IDL
(presto-docs/.../include/PrestoThriftService.thrift, served verbatim by
presto-thrift-connector):

  - prestoGetTableMetadata → column names + presto types (drives the
    Spark schema);
  - prestoGetSplits → PrestoThriftSplitBatch paged by nextToken; one
    InputPartition per PrestoThriftSplit (opaque splitId + host hints) —
    ThriftSplitManager's shape exactly;
  - prestoGetRows(splitId, columns, maxBytes, nextToken) →
    PrestoThriftPageResult paged by nextToken; each PrestoThriftBlock
    is a typed column (nulls[] + values[], varchar as sizes[]+bytes) —
    ThriftRecordCursor's decode loop.

The generic thrift-binary codec below (strict messages, struct fields
as (id, type) pairs, list/set/map containers) is ~80 lines — the full
protocol the service needs.

Usage:
    spark.dataSource.register(ThriftDataSource)
    df = (spark.read.format("thrift_tbl")
          .option("nodes", "host:7777")
          .option("schema_name", "s").option("table_name", "t").load())
"""

from __future__ import annotations

import datetime as _dt
import socket
import struct

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

# thrift binary protocol type ids
T_STOP, T_BOOL, T_BYTE, T_DOUBLE = 0, 2, 3, 4
T_I16, T_I32, T_I64, T_STRING = 6, 8, 10, 11
T_STRUCT, T_MAP, T_SET, T_LIST = 12, 13, 14, 15

_VERSION_1 = 0x80010000
MSG_CALL, MSG_REPLY, MSG_EXCEPTION = 1, 2, 3


def _w_val(out: bytearray, ttype: int, v) -> None:
    """Write one value.  STRUCT = {fid: (ttype, val)}, LIST/SET =
    (elem_ttype, [vals]), MAP = (kt, vt, {k: v}), STRING = str|bytes."""
    if ttype == T_BOOL:
        out += b"\x01" if v else b"\x00"
    elif ttype == T_BYTE:
        out += struct.pack(">b", v)
    elif ttype == T_I16:
        out += struct.pack(">h", v)
    elif ttype == T_I32:
        out += struct.pack(">i", v)
    elif ttype == T_I64:
        out += struct.pack(">q", v)
    elif ttype == T_DOUBLE:
        out += struct.pack(">d", v)
    elif ttype == T_STRING:
        b = v.encode() if isinstance(v, str) else bytes(v)
        out += struct.pack(">i", len(b)) + b
    elif ttype == T_STRUCT:
        for fid, (ft, fv) in v.items():
            out += struct.pack(">bh", ft, fid)
            _w_val(out, ft, fv)
        out += bytes([T_STOP])
    elif ttype in (T_LIST, T_SET):
        et, items = v
        out += struct.pack(">bi", et, len(items))
        for item in items:
            _w_val(out, et, item)
    elif ttype == T_MAP:
        kt, vt, d = v
        out += struct.pack(">bbi", kt, vt, len(d))
        for k, val in d.items():
            _w_val(out, kt, k)
            _w_val(out, vt, val)
    else:
        raise ValueError(f"unsupported thrift type {ttype}")


def _r_val(buf: bytes, pos: int, ttype: int):
    if ttype == T_BOOL:
        return buf[pos] == 1, pos + 1
    if ttype == T_BYTE:
        return struct.unpack_from(">b", buf, pos)[0], pos + 1
    if ttype == T_I16:
        return struct.unpack_from(">h", buf, pos)[0], pos + 2
    if ttype == T_I32:
        return struct.unpack_from(">i", buf, pos)[0], pos + 4
    if ttype == T_I64:
        return struct.unpack_from(">q", buf, pos)[0], pos + 8
    if ttype == T_DOUBLE:
        return struct.unpack_from(">d", buf, pos)[0], pos + 8
    if ttype == T_STRING:
        n = struct.unpack_from(">i", buf, pos)[0]
        return buf[pos + 4 : pos + 4 + n], pos + 4 + n
    if ttype == T_STRUCT:
        fields = {}
        while True:
            ft = buf[pos]
            pos += 1
            if ft == T_STOP:
                return fields, pos
            fid = struct.unpack_from(">h", buf, pos)[0]
            pos += 2
            v, pos = _r_val(buf, pos, ft)
            fields[fid] = (ft, v)
    if ttype in (T_LIST, T_SET):
        et = buf[pos]
        n = struct.unpack_from(">i", buf, pos + 1)[0]
        pos += 5
        items = []
        for _ in range(n):
            v, pos = _r_val(buf, pos, et)
            items.append(v)
        return items, pos
    if ttype == T_MAP:
        kt, vt = buf[pos], buf[pos + 1]
        n = struct.unpack_from(">i", buf, pos + 2)[0]
        pos += 6
        d = {}
        for _ in range(n):
            k, pos = _r_val(buf, pos, kt)
            v, pos = _r_val(buf, pos, vt)
            d[k] = v
        return d, pos
    raise ValueError(f"unsupported thrift type {ttype}")


class ThriftClient:
    """Framed-transport thrift-binary RPC client."""

    def __init__(self, host: str, port: int, timeout: float = 10.0):
        self._sock = socket.create_connection((host, port), timeout=timeout)
        self._seq = 0

    def close(self) -> None:
        try:
            self._sock.close()
        except OSError:
            pass

    def call(self, method: str, args: dict) -> dict:
        """args/result are STRUCT dicts {fid: (ttype, val)}."""
        self._seq += 1
        out = bytearray()
        out += struct.pack(">I", _VERSION_1 | MSG_CALL)
        _w_val(out, T_STRING, method)
        out += struct.pack(">i", self._seq)
        _w_val(out, T_STRUCT, args)
        self._sock.sendall(struct.pack(">i", len(out)) + out)
        size = struct.unpack(">i", self._read_exact(4))[0]
        buf = self._read_exact(size)
        ver = struct.unpack_from(">I", buf)[0]
        mtype = ver & 0xFF
        pos = 4
        _name, pos = _r_val(buf, pos, T_STRING)
        pos += 4  # seqid
        result, pos = _r_val(buf, pos, T_STRUCT)
        if mtype == MSG_EXCEPTION:
            raise RuntimeError(f"thrift exception: {result}")
        if 1 in result:  # declared PrestoThriftServiceException
            ex = result[1][1]
            msg = ex.get(1, (T_STRING, b""))[1]
            raise RuntimeError(f"PrestoThriftServiceException: {msg.decode()}")
        return result.get(0, (T_STRUCT, {}))[1]

    def _read_exact(self, n: int) -> bytes:
        chunks = []
        while n:
            c = self._sock.recv(n)
            if not c:
                raise ConnectionError("thrift connection closed mid-frame")
            chunks.append(c)
            n -= len(c)
        return b"".join(chunks)


def _schema_table(schema: str, table: str) -> tuple:
    return (T_STRUCT, {1: (T_STRING, schema), 2: (T_STRING, table)})


# PrestoThriftBlock field id → (inner decode kind)
_BLOCK_KINDS = {
    1: "i32", 2: "i64", 3: "double", 4: "sized_bytes",
    5: "bool", 6: "date", 7: "timestamp", 8: "sized_bytes",
}

_PRESTO_TO_SPARK = {
    "integer": "int", "bigint": "bigint", "double": "double",
    "boolean": "boolean", "date": "date", "timestamp": "timestamp",
    "json": "string",
}


def _decode_block(block_struct: dict, row_count: int) -> list:
    """PrestoThriftBlock → python column values (length row_count)."""
    for fid, (_ft, inner) in block_struct.items():
        kind = _BLOCK_KINDS.get(fid)
        if kind is None:
            raise ValueError(f"unsupported PrestoThriftBlock field {fid}")
        nulls = inner.get(1, (T_LIST, []))[1]
        if kind == "sized_bytes":
            sizes = inner.get(2, (T_LIST, []))[1]
            raw = inner.get(3, (T_STRING, b""))[1]
            vals, off, si = [], 0, 0
            for i in range(row_count):
                if nulls and nulls[i]:
                    vals.append(None)
                    si += 1  # sizes carry an (ignored) entry per row
                    continue
                n = sizes[si]
                si += 1
                vals.append(raw[off : off + n].decode("utf-8"))
                off += n
            return vals
        raw_vals = inner.get(2, (T_LIST, []))[1]
        vals = []
        for i in range(row_count):
            if nulls and nulls[i]:
                vals.append(None)
                continue
            v = raw_vals[i]
            if kind == "date":
                v = _dt.date(1970, 1, 1) + _dt.timedelta(days=v)
            elif kind == "timestamp":
                v = _dt.datetime.utcfromtimestamp(v / 1000.0)
            vals.append(v)
        return vals
    return [None] * row_count


class _ThriftSplit(InputPartition):
    def __init__(self, split_id: bytes, host: str, port: int):
        self.split_id, self.host, self.port = split_id, host, port


class ThriftReader(DataSourceReader):
    def __init__(self, host, port, schema_name, table_name, columns, max_bytes):
        self._host, self._port = host, port
        self._schema, self._table = schema_name, table_name
        self._columns = columns
        self._max_bytes = max_bytes

    def partitions(self):
        client = ThriftClient(self._host, self._port)
        try:
            splits, token = [], None
            while True:
                args = {
                    1: _schema_table(self._schema, self._table),
                    2: (T_STRUCT, {}),  # desiredColumns: null set = all
                    3: (T_STRUCT, {}),  # outputConstraint: no domains
                    4: (T_I32, 64),
                    5: (T_STRUCT, {} if token is None else {1: (T_STRUCT, {1: (T_STRING, token)})}),
                }
                batch = client.call("prestoGetSplits", args)
                for s in batch.get(1, (T_LIST, []))[1]:
                    sid = s[1][1][1][1]  # splitId.id binary
                    hosts = s.get(2, (T_LIST, []))[1]
                    if hosts:
                        h = hosts[0][1][1].decode()
                        p = hosts[0][2][1]
                    else:
                        h, p = self._host, self._port
                    splits.append(_ThriftSplit(bytes(sid), h, p))
                nt = batch.get(2, (T_STRUCT, {}))[1]
                if not nt or 1 not in nt:
                    return splits
                token = nt[1][1][1][1]
        finally:
            client.close()

    def read(self, split):
        client = ThriftClient(split.host, split.port)
        try:
            token = None
            while True:
                args = {
                    1: (T_STRUCT, {1: (T_STRING, split.split_id)}),
                    2: (T_LIST, (T_STRING, self._columns)),
                    3: (T_I64, self._max_bytes),
                    4: (T_STRUCT, {} if token is None else {1: (T_STRUCT, {1: (T_STRING, token)})}),
                }
                page = client.call("prestoGetRows", args)
                row_count = page.get(2, (T_I32, 0))[1]
                blocks = page.get(1, (T_LIST, []))[1]
                cols = [_decode_block(b, row_count) for b in blocks]
                for i in range(row_count):
                    yield tuple(col[i] for col in cols)
                nt = page.get(3, (T_STRUCT, {}))[1]
                if not nt or 1 not in nt:
                    return
                token = nt[1][1][1][1]
        finally:
            client.close()


class ThriftDataSource(DataSource):
    """format("thrift_tbl"): options nodes ("host:port"), schema_name,
    table_name, max_bytes.  The Spark schema comes from the service's
    own prestoGetTableMetadata — no declared schema needed, exactly like
    the reference connector."""

    @classmethod
    def name(cls) -> str:
        return "thrift_tbl"

    def _endpoint(self):
        raw = self.options.get("nodes")
        if not raw:
            raise ValueError("thrift_tbl requires option 'nodes' (host:port)")
        host, _, port = raw.split(",")[0].strip().rpartition(":")
        return host or "localhost", int(port)

    def _metadata(self):
        host, port = self._endpoint()
        client = ThriftClient(host, port)
        try:
            out = client.call(
                "prestoGetTableMetadata",
                {
                    1: _schema_table(
                        self.options.get("schema_name", "default"),
                        self.options.get("table_name", "table"),
                    )
                },
            )
        finally:
            client.close()
        meta = out.get(1, (T_STRUCT, {}))[1]
        if not meta:
            raise ValueError(
                f"thrift table not found: {self.options.get('table_name')}"
            )
        cols = []
        for cm in meta[2][1]:
            name = cm[1][1].decode()
            ptype = cm[2][1].decode()
            base = ptype.split("(")[0].lower()
            cols.append((name, _PRESTO_TO_SPARK.get(base, "string")))
        return cols

    def schema(self) -> str:
        return ", ".join(f"{n} {t}" for n, t in self._metadata())

    def reader(self, schema) -> ThriftReader:
        host, port = self._endpoint()
        return ThriftReader(
            host,
            port,
            self.options.get("schema_name", "default"),
            self.options.get("table_name", "table"),
            [f.name for f in schema.fields],
            int(self.options.get("max_bytes", str(1 << 20))),
        )


def register_thrift(spark) -> None:
    """Idempotent registration of the thrift_tbl format."""
    spark.dataSource.register(ThriftDataSource)
