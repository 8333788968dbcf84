"""Training-mix composition operators over the `documents` corpus.

Round-8 widening of the LLM-data-pipeline surface (north star): the
data-driven complement to the fixed-rate primitives in textops.py
(`sample_domain_mix` hardcodes target rates; `sample_stratified_threshold`
samples uniformly per source).  Here the rates are COMPUTED from corpus
statistics — temperature flattening of the domain mix, and deciled
length binning for curriculum / packing planning.

Determinism contract for the differential oracle (both engines must
agree bit-for-bit):
  - the per-doc uniform is a 13-hex-digit md5 prefix = an exact 52-bit
    integer (< 2^53, exact in double), scaled by the exact power of two
    16^13 — no rounding anywhere in the uniform;
  - the temperature rate uses alpha = 0.5 so it is sqrt(min_c / c):
    one IEEE division and one IEEE sqrt, BOTH correctly-rounded
    operations by the 754 standard — bit-identical on any conforming
    engine (general pow() is NOT correctly rounded and is avoided).

Reference provenance: the reference engine has no training-mix surface;
these extend it.  TABLESAMPLE semantics it does have are covered by
`sample_bernoulli` (presto-main SampleNode,
sql/planner/plan/SampleNode.java) — these operators are the
deterministic, reproducible form a 100 TB pipeline actually wants.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prestodb_presto_spark.queries import query
from prestodb_presto_spark.queries.util import t

# 13 hex digits = 52 bits: exact in BIGINT and in DOUBLE
_HEX_DIGITS = 13
_HEX_SCALE = float(16**_HEX_DIGITS)


def _uniform(col="doc_id"):
    """Deterministic per-row uniform in [0,1): md5-prefix / 16^13.

    conv() yields a decimal string of a 52-bit integer; the
    string->double cast is exact (< 2^53) and the division by a power
    of two is exact, so the uniform is IDENTICAL across engines.
    """
    prefix = F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, _HEX_DIGITS), 16, 10)
    return prefix.cast("double") / F.lit(_HEX_SCALE)


_UNIFORM_SQL = (
    "CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13) AS BIGINT) AS DOUBLE)"
    f" / {16**_HEX_DIGITS}.0"
)


@query(
    "sample_temperature_mix",
    oracle=f"""
    WITH c AS (SELECT lang, COUNT(*) AS c FROM documents GROUP BY lang),
    r AS (SELECT lang, sqrt((SELECT MIN(c) FROM c) * 1.0 / c) AS rate FROM c)
    SELECT d.doc_id, d.lang, ROUND(r.rate, 6) AS rate
    FROM documents d JOIN r ON d.lang = r.lang
    WHERE {_UNIFORM_SQL} < r.rate
    ORDER BY d.lang, d.doc_id
    """,
    tags=("pipeline", "sampling"),
)
def sample_temperature_mix(spark, sf_dir):
    """Temperature-flattened language mix (alpha = 0.5): each language
    is downsampled at rate sqrt(min_count / count), so the rarest
    language keeps every row and dominant languages shrink toward the
    alpha-0.5 frequency mix — the multilingual rebalancing move, with
    rates COMPUTED from the corpus instead of hand-set (the corpus is
    genuinely lang-skewed: en is ~3x any other language, so the filter
    path is exercised; `source` is balanced and would be a no-op).

    Scale posture (100 TB): pass 1 is one map-side-combined count by
    lang (output = #languages rows, trivially small); the rate table is
    broadcast, so pass 2 is a scan + per-row md5-prefix predicate —
    ZERO shuffles of the corpus, deterministic across reruns/backfills
    (the uniform is a pure function of doc_id), skew-immune (no
    per-lang window).  alpha = 0.5 is hardwired because sqrt is the
    one power IEEE 754 makes correctly-rounded — the rate is therefore
    bit-identical on every conforming engine.
    """
    docs = t(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count("*").alias("c"))
    min_c = counts.agg(F.min("c").alias("mc"))
    rates = counts.crossJoin(F.broadcast(min_c)).select(
        "lang", F.sqrt(F.col("mc") / F.col("c")).alias("rate")
    )
    return (
        docs.join(F.broadcast(rates), "lang")
        .filter(_uniform() < F.col("rate"))
        .select("doc_id", "lang", F.round("rate", 6).alias("rate"))
        .orderBy("lang", "doc_id")
    )


_NBINS = 10


@query(
    "corpus_length_bins",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, n_chars,
             ntile({_NBINS}) OVER (ORDER BY n_chars, doc_id) AS bin
      FROM documents)
    SELECT CAST(bin AS INT) AS bin, COUNT(*) AS n,
           MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM b GROUP BY bin ORDER BY bin
    """,
    tags=("pipeline", "sampling"),
)
def corpus_length_bins(spark, sf_dir):
    """Length-decile binning of the corpus (curriculum / packing
    planning): rank every document by n_chars, cut into 10
    equal-count bins, report per-bin count and char-range.

    Correctness form: ntile over a total order (n_chars, doc_id) —
    deterministic and identical across engines.  The global window is
    ONE task, so this exact form is small-scale-only; the 100 TB twin
    is `quality_bins_scale` below (exact-cutoff two-pass binning,
    distributed), proven rank-consistent in tests/test_mixing.py.
    """
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents")
    w = Window.orderBy("n_chars", "doc_id")
    return (
        docs.select("doc_id", "n_chars", F.ntile(_NBINS).over(w).alias("bin"))
        .groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
        .select(F.col("bin").cast("int").alias("bin"), "n", "min_chars", "max_chars", "sum_chars")
        .orderBy("bin")
    )


def quality_bins_scale(df, col: str, nbins: int = _NBINS, accuracy: int = 10000):
    """100 TB twin of `corpus_length_bins`: two-pass value-cutoff binning.

    Pass 1 computes (nbins-1) interior cutoffs with approx_percentile
    (a mergeable sketch — one map-side-combined aggregation, output =
    nbins doubles); pass 2 bins each row by comparing against the
    broadcast cutoff array with a binary-search expression — a pure
    per-row map, ZERO shuffles of the corpus before the per-bin
    aggregate.  Unlike the ntile form there is no global sort and no
    single-task window; ties around a cutoff all land in the same bin
    (value-consistent rather than exactly-equal-count — the documented
    trade for distributivity).

    Returns (bin-stats DataFrame with the same schema as
    corpus_length_bins, cutoffs list).
    """
    fracs = [i / nbins for i in range(1, nbins)]
    cuts = df.agg(
        F.percentile_approx(F.col(col), F.array(*[F.lit(f) for f in fracs]), accuracy).alias("c")
    ).head()[0]
    # bin = 1 + #cutoffs strictly below the value (array literal folds;
    # filter+size is a codegen'd expression, no UDF, no shuffle)
    cut_arr = F.array(*[F.lit(float(c)) for c in cuts])
    bin_expr = F.size(F.filter(cut_arr, lambda c: c < F.col(col).cast("double"))) + 1
    stats = (
        df.select(F.col(col), bin_expr.alias("bin"))
        .groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.min(col).alias(f"min_{col}"),
            F.max(col).alias(f"max_{col}"),
            F.sum(col).cast("bigint").alias(f"sum_{col}"),
        )
        .withColumn("bin", F.col("bin").cast("int"))
        .orderBy("bin")
    )
    return stats, list(cuts)


@query(
    "sample_epoch_repeat",
    oracle=f"""
    WITH f AS (
      SELECT d.doc_id, d.source,
             CASE d.source WHEN 'src0' THEN 2.5
                           WHEN 'src1' THEN 1.25 ELSE 0.75 END AS factor,
             {_UNIFORM_SQL} AS u
      FROM documents d),
    n AS (
      SELECT doc_id, source,
             CAST(floor(factor) + CASE WHEN u < factor - floor(factor)
                                       THEN 1 ELSE 0 END AS INT) AS n_copies
      FROM f)
    SELECT n.doc_id, n.source, CAST(g.i AS INT) AS copy_idx
    FROM n, LATERAL (SELECT unnest(generate_series(1, n.n_copies)) AS i) g
    ORDER BY doc_id, copy_idx
    """,
    tags=("sampling", "pipeline"),
)
def sample_epoch_repeat(spark, sf_dir):
    """Epoch-factor upsampling with fractional repeats — the
    'repeat Wikipedia 3.5 epochs, downsample CommonCrawl to 0.75' knob
    every LLM training mix turns: each document is emitted
    floor(f) + Bernoulli(frac(f)) times for its source's factor f
    (src0 2.5x, src1 1.25x, src2 0.75x), with a copy index for
    downstream shuffling/packing.  Deterministic: the Bernoulli draw is
    the corpus-standard md5-prefix uniform, so both engines emit the
    IDENTICAL multiset and E[copies] = f exactly.

    Scale posture (100 TB): map-ONLY — the factor table folds into a
    CASE expression (broadcast by construction), the repeat explode is
    a per-row sequence (output size = Σf_i·n_i, the size the TRAINING
    RUN pays anyway), and there is no shuffle at all (the gate's ORDER
    BY is presentation).  A factor table too big for a CASE becomes a
    broadcast join on source — still shuffle-free on the corpus.
    """
    d = t(spark, sf_dir, "documents").select("doc_id", "source")
    factor = (
        F.when(F.col("source") == "src0", F.lit(2.5))
        .when(F.col("source") == "src1", F.lit(1.25))
        .otherwise(F.lit(0.75))
    )
    n_copies = (
        F.floor(factor)
        + F.when(_uniform() < factor - F.floor(factor), F.lit(1)).otherwise(
            F.lit(0)
        )
    ).cast("int")
    return (
        d.select("doc_id", "source", n_copies.alias("n"))
        .select(
            "doc_id",
            "source",
            F.explode(
                F.when(
                    F.col("n") >= 1, F.sequence(F.lit(1), F.col("n"))
                ).otherwise(F.array().cast("array<int>"))
            ).alias("copy_idx"),
        )
        .select("doc_id", "source", F.col("copy_idx").cast("int").alias("copy_idx"))
        .orderBy("doc_id", "copy_idx")
    )


@query(
    "mix_budget_waterfill",
    oracle="""
    WITH s AS (
      SELECT source,
             CAST(SUM(n_chars) AS BIGINT) AS avail,
             CAST(COUNT(*) AS BIGINT) AS w
      FROM documents GROUP BY source),
    tot AS (
      SELECT CAST(SUM(avail) / 2 AS BIGINT) AS budget,
             CAST(SUM(w) AS BIGINT) AS w_total
      FROM s),
    ranked AS (
      SELECT s.*, t.budget, t.w_total,
             COALESCE(CAST(SUM(avail) OVER (ORDER BY avail * 1.0 / w, source
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
                 0) AS c_before,
             COALESCE(CAST(SUM(w) OVER (ORDER BY avail * 1.0 / w, source
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
                 0) AS w_before
      FROM s, tot t),
    flagged AS (
      SELECT *,
             CASE WHEN CAST(avail AS DECIMAL(38,0)) * (w_total - w_before)
                       <= CAST(budget - c_before AS DECIMAL(38,0)) * w
                  THEN 1 ELSE 0 END AS capped
      FROM ranked),
    pools AS (
      SELECT CAST(SUM(CASE WHEN capped = 1 THEN avail ELSE 0 END) AS BIGINT)
               AS c_capped,
             CAST(SUM(CASE WHEN capped = 0 THEN w ELSE 0 END) AS BIGINT)
               AS w_free
      FROM flagged)
    SELECT f.source, f.avail, f.w,
           CASE WHEN f.capped = 1 THEN f.avail
                ELSE CAST(CAST(f.budget - p.c_capped AS HUGEINT) * f.w
                          // p.w_free AS BIGINT)
           END AS alloc
    FROM flagged f, pools p
    ORDER BY f.source
    """,
    tags=("sampling", "pipeline"),
)
def mix_budget_waterfill(spark, sf_dir):
    """Token-budget water-filling across sources — 'spend B tokens,
    proportional to source size, but no source can give more than it
    has': alloc_i = min(avail_i, λ·w_i) with λ chosen so Σ alloc = B.
    The mix-planning step that turns a target budget into per-source
    sampling quotas (here B = half the corpus, w = doc counts).

    Exact closed form, no iteration: sources sort by avail/weight
    (saturation order — the exact int64 double quotient, IEEE-identical
    across engines); a source is CAPPED iff
    avail·W_remaining ≤ (B − C_before)·w (DECIMAL(38,0) cross-multiply,
    overflow-safe at any corpus size), which is monotone along the
    sort, and the uncapped pool splits the leftover budget by integer
    division.  Every output is a BIGINT — hash-exact.

    Scale posture (100 TB): the corpus is touched ONCE (one map-side-
    combined aggregate to per-source rows); everything after operates
    on #sources rows (window prefix sums over a broadcast-tiny
    relation).  The classic iterative water-fill would loop over the
    corpus; the sorted closed form never re-reads it.
    """
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        F.sum("n_chars").cast("bigint").alias("avail"),
        F.count("*").cast("bigint").alias("w"),
    )
    tot = s.agg(
        (F.sum("avail") / 2).cast("bigint").alias("budget"),
        F.sum("w").cast("bigint").alias("w_total"),
    )
    ratio = F.col("avail") * 1.0 / F.col("w")
    win = Window.orderBy(ratio, "source").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranked = (
        s.crossJoin(F.broadcast(tot))
        .withColumn("c_before", F.coalesce(F.sum("avail").over(win), F.lit(0)).cast("bigint"))
        .withColumn("w_before", F.coalesce(F.sum("w").over(win), F.lit(0)).cast("bigint"))
    )
    dec = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    flagged = ranked.withColumn(
        "capped",
        F.when(
            dec(F.col("avail")) * (F.col("w_total") - F.col("w_before"))
            <= dec(F.col("budget") - F.col("c_before")) * F.col("w"),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    pools = flagged.agg(
        F.sum(F.when(F.col("capped") == 1, F.col("avail")).otherwise(0))
        .cast("bigint")
        .alias("c_capped"),
        F.sum(F.when(F.col("capped") == 0, F.col("w")).otherwise(0))
        .cast("bigint")
        .alias("w_free"),
    )
    return (
        flagged.crossJoin(F.broadcast(pools))
        .select(
            "source",
            "avail",
            "w",
            F.when(F.col("capped") == 1, F.col("avail"))
            .otherwise(
                # exact integer floor division on BOTH engines (Spark
                # `div`, DuckDB `//`): decimal `/` rounds its quotient
                # differently per engine (r9 gate finding at sf0.001)
                F.expr(
                    "CAST((CAST(budget - c_capped AS DECIMAL(38,0)) * w)"
                    " div w_free AS BIGINT)"
                )
            )
            .alias("alloc"),
        )
        .orderBy("source")
    )


_CAP_N = 10  # per-source document cap


@query(
    "sample_domain_cap",
    oracle=f"""
    WITH u AS (SELECT doc_id, source,
                      CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))
                           AS BIGINT) AS hv
               FROM documents),
    r AS (SELECT source, doc_id,
                 row_number() OVER (PARTITION BY source ORDER BY hv, doc_id) AS rk
          FROM u)
    SELECT source, CAST(rk AS INT) AS rk, doc_id
    FROM r WHERE rk <= {_CAP_N} ORDER BY source, rk
    """,
    tags=("sampling", "pipeline"),
)
def sample_domain_cap(spark, sf_dir):
    """Per-domain document cap (keep at most 10 docs per source) — the
    anti-monoculture move of C4/RefinedWeb-class pipelines: no single
    domain may dominate the mix, and which docs survive must be a pure
    function of the data (the md5-prefix uniform, not rand()) so reruns
    and backfills keep the SAME sample.

    At 100 TB: ranking is row_number over (source, 52-bit md5 prefix) —
    Spark plans the rk <= N filter as WindowGroupLimit, so each map task
    forwards at most N candidate rows per source BEFORE the exchange;
    the shuffle carries O(sources x N), not the corpus.  Degenerate
    hot domains therefore cost their input scan, never a single-task
    global sort.
    """
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents")
    hv = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, _HEX_DIGITS), 16, 10
    ).cast("bigint")
    w = Window.partitionBy("source").orderBy(hv.asc(), F.col("doc_id").asc())
    return (
        docs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _CAP_N)
        .select("source", F.col("rk").cast("int").alias("rk"), "doc_id")
        .orderBy("source", "rk")
    )


@query(
    "sample_split_holdout",
    oracle="""
    WITH u AS (SELECT doc_id, source, n_chars,
                      CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))
                           AS BIGINT) % 100 AS bucket
               FROM documents)
    SELECT source,
           CASE WHEN bucket < 96 THEN 'train'
                WHEN bucket < 98 THEN 'valid' ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars
    FROM u GROUP BY source, split ORDER BY source, split
    """,
    tags=("sampling", "pipeline"),
)
def sample_split_holdout(spark, sf_dir):
    """Deterministic train/valid/test holdout split (96/2/2) with
    per-source accounting — the split must be a pure function of the
    document identity (52-bit md5 prefix mod 100, exact BIGINT
    arithmetic on both engines) so that (a) reruns reproduce it,
    (b) newly crawled copies of a held-out doc keep landing in the
    holdout, never leaking into train.

    At 100 TB: split assignment is a map-only expression; the only
    shuffle is the (source, split) count/sum aggregation — map-side
    combined to <= 3 x sources rows.
    """
    docs = t(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, _HEX_DIGITS), 16, 10
        ).cast("bigint")
        % 100
    )
    split = (
        F.when(bucket < 96, "train").when(bucket < 98, "valid").otherwise("test")
    )
    return (
        docs.groupBy("source", split.alias("split"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("n_chars"),
        )
        .orderBy("source", "split")
    )
