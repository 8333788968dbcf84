"""Training-sequence packing and document chunking.

The two assembly steps between a cleaned corpus and a training run:

  - pack_sequences: concatenate the corpus in a deterministic order and
    split it into fixed token-budget sequences ("concat-and-chunk"
    packing) — every document is assigned the sequence id and offset
    where its first token lands.
  - doc_chunking: split each document into fixed-size overlapping token
    windows (retrieval / context-window chunking).

No reference counterpart (these are LLM-pipeline operators, like
textops).  Both are pure pyspark.sql.functions — no Python UDFs.

Scale design — the packing prefix sum is the interesting part.  A naive
``sum(tokens) OVER (ORDER BY key)`` is a SINGLE global window partition:
one task materializes the whole corpus at 100 TB.  This implementation
uses the classic distributed two-phase prefix sum instead:

  1. range-partition by the deterministic order key (Spark's
     repartitionByRange — the same sampling-based range exchange a
     global sort uses);
  2. per-partition token totals — numPartitions rows — collected to the
     driver (tiny, the same order of driver traffic as an AQE stats
     exchange) and turned into per-partition prefix offsets;
  3. a WITHIN-partition cumulative sum (window partitioned by
     spark_partition_id — parallel across partitions) plus the
     broadcast offset.

Wall-clock: one range exchange + one pass, identical to a global sort;
no single-task bottleneck.  The DuckDB oracle runs the equivalent
single-node global-window form; results match row-for-row because the
partition boundaries respect the total order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.storagelevel import StorageLevel

from prestodb_presto_spark.queries import query
from prestodb_presto_spark.queries.util import t

SEQ_BUDGET = 512  # tokens per packed training sequence (gate setting)

# cache hygiene: the phase-1 projection each packed_assignments call
# persists is tracked here; the NEXT call (or an explicit
# release_packing_cache()) unpersists it, so repeated packings in one
# session hold at most ONE ~24 B/doc projection in cache — never an
# accumulating set — and callers needn't clearCache() (which would drop
# unrelated caches too).
_LIVE_PACKING_CACHE: list[DataFrame] = []


def release_packing_cache() -> None:
    """Unpersist every phase-1 projection still cached by
    packed_assignments (safe to call while a returned DataFrame is
    still un-materialized: Spark just recomputes the projection).
    Tolerates projections owned by an already-stopped SparkSession —
    a dead session's cache is gone with its executors, so a failed
    unpersist is a no-op, not an error (the replay verifier cycles
    sessions between configs and hit exactly this)."""
    while _LIVE_PACKING_CACHE:
        df = _LIVE_PACKING_CACHE.pop()
        try:
            df.unpersist()
        except Exception:  # noqa: BLE001 - stale session: nothing to release
            pass


def packed_assignments(
    docs: DataFrame, budget: int = SEQ_BUDGET, partitions: int | None = None
) -> DataFrame:
    """(doc_id, n_tokens, seq_id, seq_offset): concat-and-chunk packing.

    Documents are concatenated in md5(doc_id) order (deterministic,
    shuffle-friendly — no semantic clustering) and the stream is cut
    every ``budget`` tokens; a document knows the sequence id and intra-
    sequence offset of its first token.  Distributed two-phase prefix
    sum; see the module docstring for the 100 TB posture.

    The (doc_id, n_tokens, __k, __pid) projection is persisted across
    the two phases (single source scan); the next packed_assignments
    call unpersists it automatically (at most one projection lingers),
    and release_packing_cache() drops it eagerly.
    """
    release_packing_cache()
    spark = docs.sparkSession
    n_parts = partitions or spark.sparkContext.defaultParallelism
    base = docs.select(
        "doc_id",
        # bigint on both engines (DuckDB len() is BIGINT; Spark size() INT)
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("__k"),
    )
    # deterministic hash-range bucket: the md5 key is uniform, so equal
    # slices of its leading 16 bits are balanced ranges — and, unlike
    # repartitionByRange, the assignment is a pure function of the key
    # (range sampling re-runs per job; the totals job and the final job
    # MUST see identical partition boundaries)
    bucket = (
        F.conv(F.substring("__k", 1, 4), 16, 10).cast("long")
        * n_parts
        / F.lit(65536)
    ).cast("int")
    # persist the 3-column projection between the two phases: the totals
    # job (phase 1) and the assignment job (phase 2) otherwise each
    # re-read the source and recompute the tokenization — at 100 TB that
    # second scan is a full extra pass.  MEMORY_AND_DISK: the projection
    # is ~24 B/doc, spills rather than recomputes under pressure.  The
    # md5 bucket stays a pure function of the key either way (the
    # repartitionByRange per-job-sampling trap does not apply).
    ranged = base.withColumn("__pid", bucket).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    _LIVE_PACKING_CACHE.append(ranged)
    # phase 1: per-partition totals -> prefix offsets (driver-side tiny)
    totals = {
        r["__pid"]: r["total"]
        for r in ranged.groupBy("__pid").agg(F.sum("n_tokens").alias("total")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid]
    offset_df = F.broadcast(
        spark.createDataFrame(
            [(pid, off) for pid, off in offsets.items()], "__pid int, __off long"
        )
    )
    # phase 2: within-partition running sum (parallel) + broadcast offset
    w = (
        Window.partitionBy("__pid")
        .orderBy("__k", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) + F.col("__off")
    return (
        ranged.join(offset_df, "__pid")
        .withColumn("__start", start)
        .select(
            "doc_id",
            "n_tokens",
            (F.col("__start") / budget).cast("bigint").alias("seq_id"),
            (F.col("__start") % budget).cast("bigint").alias("seq_offset"),
        )
    )


@query(
    "pack_sequences",
    oracle=f"""
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(FLOOR(start_tok / {SEQ_BUDGET}) AS BIGINT) AS seq_id,
           CAST(start_tok % {SEQ_BUDGET} AS BIGINT) AS seq_offset
    FROM (
      SELECT doc_id, n_tokens,
             COALESCE(SUM(n_tokens) OVER (
               ORDER BY k, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_tok
      FROM (SELECT doc_id,
                   len(string_split(text, ' ')) AS n_tokens,
                   md5(CAST(doc_id AS VARCHAR)) AS k
            FROM documents) b
    ) s
    ORDER BY seq_id, seq_offset, doc_id
    """,
    tags=("pipeline", "packing"),
)
def pack_sequences(spark, sf_dir):
    """Concat-and-chunk sequence packing over the documents table —
    distributed two-phase prefix sum (module docstring has the 100 TB
    analysis); the oracle's global window is the single-node equivalent."""
    docs = t(spark, sf_dir, "documents")
    return packed_assignments(docs).orderBy("seq_id", "seq_offset", "doc_id")


CHUNK_SIZE = 64
CHUNK_STRIDE = 48  # 16-token overlap


@query(
    "doc_chunking",
    oracle=f"""
    SELECT doc_id, chunk_idx,
           CAST(n_chunk_tokens AS BIGINT) AS n_chunk_tokens,
           chunk_head
    FROM (
      SELECT doc_id,
             CAST(gs.g AS BIGINT) AS chunk_idx,
             len(toks[(gs.g * {CHUNK_STRIDE} + 1):(gs.g * {CHUNK_STRIDE} + {CHUNK_SIZE})])
               AS n_chunk_tokens,
             toks[gs.g * {CHUNK_STRIDE} + 1] AS chunk_head
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) b,
           LATERAL (SELECT UNNEST(range(0, GREATEST(1, CAST(CEIL((len(toks) - {CHUNK_SIZE}) / CAST({CHUNK_STRIDE} AS DOUBLE)) AS BIGINT) + 1))) AS g) gs
    ) c
    ORDER BY doc_id, chunk_idx
    """,
    tags=("pipeline", "chunking"),
)
def doc_chunking(spark, sf_dir):
    """Overlapping token-window chunking (CHUNK_SIZE=64-token windows,
    stride CHUNK_STRIDE=48, i.e. 16-token overlap) — the
    retrieval-indexing primitive.  Chunk boundaries are a per-row array
    expression (sequence + slice) and ONE explode; zero shuffles besides
    the deterministic output sort.  Each chunk reports its token count
    and first token (a cheap content witness both engines agree on)."""
    docs = t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((F.size(toks) - F.lit(CHUNK_SIZE)) / F.lit(float(CHUNK_STRIDE))).cast(
            "bigint"
        )
        + F.lit(1),
    )
    chunked = (
        docs.select(
            "doc_id",
            toks.alias("toks"),
            F.explode(F.sequence(F.lit(0), n_chunks - F.lit(1))).alias("chunk_idx"),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
            F.size(
                F.slice(
                    F.col("toks"),
                    F.col("chunk_idx") * CHUNK_STRIDE + 1,
                    CHUNK_SIZE,
                )
            )
            .cast("bigint")
            .alias("n_chunk_tokens"),
            F.element_at(
                F.col("toks"), (F.col("chunk_idx") * CHUNK_STRIDE + 1).cast("int")
            ).alias("chunk_head"),
        )
    )
    return chunked.orderBy("doc_id", "chunk_idx")


TRUNC_BUDGET = 32  # max tokens kept per document (gate setting)


@query(
    "doc_truncate",
    oracle=f"""
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(LEAST(len(toks), {TRUNC_BUDGET}) AS BIGINT) AS n_kept,
           len(toks) > {TRUNC_BUDGET} AS truncated,
           array_to_string(toks[1:{TRUNC_BUDGET}], ' ') AS head_text
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) s
    ORDER BY doc_id
    """,
    tags=("pipeline", "packing"),
)
def doc_truncate(spark, sf_dir):
    """Token-budget truncation — keep each document's first
    {TRUNC_BUDGET} tokens and report the original/kept counts plus a
    truncated flag: the context-window guard every tokenization step
    applies before packing.

    Scale posture: a pure per-row slice (split -> slice -> concat_ws),
    zero shuffles before the output sort; at 100 TB this runs inside
    whole-stage codegen on the scan."""
    docs = t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    return docs.select(
        "doc_id",
        n.cast("bigint").alias("n_tokens"),
        F.least(n, F.lit(TRUNC_BUDGET)).cast("bigint").alias("n_kept"),
        (n > TRUNC_BUDGET).alias("truncated"),
        F.concat_ws(" ", F.slice(toks, 1, TRUNC_BUDGET)).alias("head_text"),
    ).orderBy("doc_id")
