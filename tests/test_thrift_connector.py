"""presto-thrift-connector over the published PrestoThriftService IDL
(presto-docs/.../include/PrestoThriftService.thrift): a generic
thrift-binary codec, a stub service implementing the IDL's read path,
and the thrift_tbl DataSource end-to-end (metadata-driven schema,
token-paged splits, token-paged row batches, typed blocks with nulls)."""

from __future__ import annotations

import datetime as dt
import socket
import struct
import threading

import pytest

from prestodb_presto_spark.sources.thrift_source import (
    MSG_CALL,
    MSG_REPLY,
    T_BOOL,
    T_DOUBLE,
    T_I32,
    T_I64,
    T_LIST,
    T_STRING,
    T_STRUCT,
    _r_val,
    _w_val,
    _VERSION_1,
)


def test_thrift_binary_codec_roundtrip():
    """Generic codec: every container/scalar the service IDL uses."""
    value = {
        1: (T_STRING, "héllo"),
        2: (T_I64, 1 << 40),
        3: (T_LIST, (T_I32, [1, 2, 3])),
        4: (T_STRUCT, {1: (T_BOOL, True), 2: (T_DOUBLE, 2.5)}),
        5: (T_LIST, (T_STRUCT, [{1: (T_STRING, "a")}, {1: (T_STRING, "b")}])),
    }
    out = bytearray()
    _w_val(out, T_STRUCT, value)
    back, pos = _r_val(bytes(out), 0, T_STRUCT)
    assert pos == len(out)
    assert back[1][1].decode() == "héllo"
    assert back[2] == (T_I64, 1 << 40)
    assert back[3][1] == [1, 2, 3]
    assert back[4][1][1] == (T_BOOL, True) and back[4][1][2] == (T_DOUBLE, 2.5)
    assert [s[1][1].decode() for s in back[5][1]] == ["a", "b"]


# --- stub PrestoThriftService ---------------------------------------------

ROWS = [
    (i, f"name{i}" if i % 5 else None, i * 1.5, dt.date(2020, 1, 1) + dt.timedelta(days=i))
    for i in range(22)
]
COLUMNS = [("id", "bigint"), ("name", "varchar"), ("score", "double"), ("d", "date")]


def _nullable_token(token):
    return (T_STRUCT, {} if token is None else {1: (T_STRUCT, {1: (T_STRING, token)})})


def _encode_block(col_idx, rows):
    nulls = [r[col_idx] is None for r in rows]
    name, ptype = COLUMNS[col_idx]
    if ptype == "bigint":
        inner = {1: (T_LIST, (T_BOOL, nulls)),
                 2: (T_LIST, (T_I64, [r[col_idx] or 0 for r in rows]))}
        fid = 2
    elif ptype == "double":
        inner = {1: (T_LIST, (T_BOOL, nulls)),
                 2: (T_LIST, (T_DOUBLE, [r[col_idx] or 0.0 for r in rows]))}
        fid = 3
    elif ptype == "date":
        epoch = dt.date(1970, 1, 1)
        inner = {1: (T_LIST, (T_BOOL, nulls)),
                 2: (T_LIST, (T_I32, [(r[col_idx] - epoch).days if r[col_idx] else 0 for r in rows]))}
        fid = 6
    else:  # varchar: sizes carry one entry per row (0 for nulls)
        blobs = [(r[col_idx] or "").encode() for r in rows]
        sizes = [0 if n else len(b) for n, b in zip(nulls, blobs)]
        raw = b"".join(b for n, b in zip(nulls, blobs) if not n)
        inner = {1: (T_LIST, (T_BOOL, nulls)),
                 2: (T_LIST, (T_I32, sizes)), 3: (T_STRING, raw)}
        fid = 4
    return {fid: (T_STRUCT, inner)}


@pytest.fixture()
def thrift_stub():
    def handle(method, args):
        if method == "prestoGetTableMetadata":
            stn = args[1][1]
            if stn[2][1].decode() != "events":
                return {0: (T_STRUCT, {})}  # nullable: absent
            cols = [
                {1: (T_STRING, n), 2: (T_STRING, t), 4: (T_BOOL, False)}
                for n, t in COLUMNS
            ]
            meta = {1: (T_STRUCT, {1: (T_STRING, "s"), 2: (T_STRING, "events")}),
                    2: (T_LIST, (T_STRUCT, cols))}
            return {0: (T_STRUCT, {1: (T_STRUCT, meta)})}
        if method == "prestoGetSplits":
            token = args[5][1]
            # two splits total, ONE per batch → exercises nextToken paging
            if not token or 1 not in token:
                splits = [{1: (T_STRUCT, {1: (T_STRING, b"rows:0:11")}),
                           2: (T_LIST, (T_STRUCT, []))}]
                return {0: (T_STRUCT, {1: (T_LIST, (T_STRUCT, splits)),
                                       2: _nullable_token(b"more")})}
            splits = [{1: (T_STRUCT, {1: (T_STRING, b"rows:11:22")}),
                       2: (T_LIST, (T_STRUCT, []))}]
            return {0: (T_STRUCT, {1: (T_LIST, (T_STRUCT, splits))})}
        if method == "prestoGetRows":
            sid = args[1][1][1][1].decode()
            _tag, lo, hi = sid.split(":")
            lo, hi = int(lo), int(hi)
            token = args[4][1]
            start = lo if (not token or 1 not in token) else int(token[1][1][1][1])
            page = ROWS[start : min(start + 6, hi)]  # 6-row pages → paging
            requested = [c.decode() for c in args[2][1]] if args[2][1] else []
            order = [next(i for i, (n, _t) in enumerate(COLUMNS) if n == rn) for rn in requested]
            blocks = [_encode_block(i, page) for i in order]
            nxt = start + len(page)
            result = {1: (T_LIST, (T_STRUCT, blocks)), 2: (T_I32, len(page))}
            if nxt < hi:
                result[3] = _nullable_token(str(nxt).encode())
            else:
                result[3] = _nullable_token(None)
            return {0: (T_STRUCT, result)}
        raise ValueError(f"unknown method {method}")

    def serve(conn):
        try:
            while True:
                raw = b""
                while len(raw) < 4:
                    c = conn.recv(4 - len(raw))
                    if not c:
                        return
                    raw += c
                size = struct.unpack(">i", raw)[0]
                buf = b""
                while len(buf) < size:
                    buf += conn.recv(size - len(buf))
                pos = 4  # version|type
                name, pos = _r_val(buf, pos, T_STRING)
                seq = struct.unpack_from(">i", buf, pos)[0]
                pos += 4
                args, pos = _r_val(buf, pos, T_STRUCT)
                result = handle(name.decode(), args)
                out = bytearray()
                out += struct.pack(">I", _VERSION_1 | MSG_REPLY)
                _w_val(out, T_STRING, name.decode())
                out += struct.pack(">i", seq)
                _w_val(out, T_STRUCT, result)
                conn.sendall(struct.pack(">i", len(out)) + out)
        except OSError:
            pass
        finally:
            conn.close()

    srv = socket.create_server(("127.0.0.1", 0))
    port = srv.getsockname()[1]
    stop = threading.Event()

    def accept_loop():
        srv.settimeout(0.2)
        while not stop.is_set():
            try:
                conn, _ = srv.accept()
            except TimeoutError:
                continue
            except OSError:
                return
            threading.Thread(target=serve, args=(conn,), daemon=True).start()

    threading.Thread(target=accept_loop, daemon=True).start()
    yield port
    stop.set()
    srv.close()


def test_thrift_client_metadata(thrift_stub):
    """Wire-level: metadata fetch through the generic client."""
    from prestodb_presto_spark.sources.thrift_source import ThriftClient, _schema_table

    c = ThriftClient("127.0.0.1", thrift_stub)
    try:
        out = c.call("prestoGetTableMetadata", {1: _schema_table("s", "events")})
        meta = out[1][1]  # PrestoThriftNullableTableMetadata.tableMetadata
        names = [cm[1][1].decode() for cm in meta[2][1]]
        assert names == ["id", "name", "score", "d"]
    finally:
        c.close()


def test_thrift_datasource(spark, thrift_stub):
    """presto-thrift-connector analog end-to-end: schema from
    prestoGetTableMetadata, token-paged prestoGetSplits (one split per
    batch), token-paged prestoGetRows (6-row pages), typed blocks with
    nulls — all through executor workers."""
    from prestodb_presto_spark.sources.thrift_source import register_thrift

    register_thrift(spark)
    df = (
        spark.read.format("thrift_tbl")
        .option("nodes", f"127.0.0.1:{thrift_stub}")
        .option("schema_name", "s")
        .option("table_name", "events")
        .load()
    )
    assert df.columns == ["id", "name", "score", "d"]
    assert dict(df.dtypes)["d"] == "date"
    assert df.rdd.getNumPartitions() == 2  # one per PrestoThriftSplit
    rows = sorted(df.collect(), key=lambda r: r.id)
    assert len(rows) == 22
    assert rows[7].name == "name7" and rows[7].score == 10.5
    assert rows[5].name is None  # i % 5 == 0 rows carry null names
    assert rows[3].d == dt.date(2020, 1, 4)
    # missing table surfaces the nullable-metadata miss as an error
    with pytest.raises(Exception, match="not found"):
        (
            spark.read.format("thrift_tbl")
            .option("nodes", f"127.0.0.1:{thrift_stub}")
            .option("table_name", "nope")
            .load()
        )
