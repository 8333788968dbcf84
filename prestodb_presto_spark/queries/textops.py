"""Training-data text pipeline — dedup / language-ID / quality / tokens.

No reference counterpart (Presto 0.206 has word_stem only —
operator/scalar/WordStemFunction.java); these are the LLM-pipeline
operators the north star requires, designed Spark-first:

  - everything below is pure pyspark.sql.functions (JVM, codegen) — no
    Python UDFs anywhere in the hot path;
  - shingling/minhash are per-row array expressions (no explode→shuffle
    for signature computation);
  - the near-dup join shuffles only (band-hash, doc_id) pairs, which is
    the textbook LSH-at-scale layout.

Deterministic oracles: shingle sets and Jaccard are exact integer math;
fingerprints are md5 of canonicalized text — both engines agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from prestodb_presto_spark.queries import query
from prestodb_presto_spark.queries.util import guard_rows, jarr, t
from prestodb_presto_spark.text.analysis import shingles3, token_array as tokens

SHINGLES3_SQL = (
    "list_distinct([l[i] || ' ' || l[i+1] || ' ' || l[i+2] for i in range(1, len(l)-1)])"
)


@query(
    "text_token_stats",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MIN(len(string_split(text, ' '))) AS min_tokens,
           MAX(len(string_split(text, ' '))) AS max_tokens
    FROM documents GROUP BY lang ORDER BY lang
    """,
    tags=("text", "pipeline"),
)
def text_token_stats(spark, sf_dir):
    """Whitespace token counting per language — pure JVM expressions."""
    docs = t(spark, sf_dir, "documents")
    ntok = F.size(tokens())
    return (
        docs.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(ntok).cast("bigint").alias("total_tokens"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.min(ntok).alias("min_tokens"),
            F.max(ntok).alias("max_tokens"),
        )
        .orderBy("lang")
    )


@query(
    "text_quality_score",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           length(text) AS n_chars_m,
           len(list_filter(string_split(text, ' '),
               w -> w IN ('the', 'a', 'of', 'and', 'to'))) AS n_stop,
           ROUND(len(list_filter(string_split(text, ' '),
                     w -> w IN ('the', 'a', 'of', 'and', 'to')))
                 * 1.0 / len(string_split(text, ' ')), 6) AS stop_ratio,
           ROUND(length(text) * 1.0 / len(string_split(text, ' ')), 6) AS avg_word_len
    FROM documents WHERE doc_id < 50 ORDER BY doc_id
    """,
    tags=("text", "pipeline"),
)
def text_quality_score(spark, sf_dir):
    """Quality features: token count, stopword ratio, avg word length.

    Single int/int divisions → bit-identical across engines.
    """
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    tok = tokens()
    stop = F.filter(tok, lambda w: w.isin("the", "a", "of", "and", "to"))
    return docs.select(
        "doc_id",
        F.size(tok).alias("n_tokens"),
        F.length("text").alias("n_chars_m"),
        F.size(stop).alias("n_stop"),
        F.round(F.size(stop) * 1.0 / F.size(tok), 6).alias("stop_ratio"),
        F.round(F.length("text") * 1.0 / F.size(tok), 6).alias("avg_word_len"),
    ).orderBy("doc_id")


@query(
    "text_quality_rules",
    oracle="""
    WITH base AS (
      SELECT doc_id,
             string_split(text, ' ') AS l,
             len(string_split(text, ' ')) AS n,
             length(replace(text, ' ', '')) AS chars
      FROM documents),
    f AS (
      SELECT doc_id, n,
             (n BETWEEN 20 AND 10000) AS flag_word_count,
             (chars >= 3 * n AND chars <= 10 * n) AS flag_mean_word_len,
             (len(list_intersect(list_distinct(l),
                                 ['the', 'a', 'of', 'and', 'to'])) >= 2)
               AS flag_stopword,
             (5 * len(list_filter(l, w -> regexp_matches(w, '[A-Za-z]')))
               >= 4 * n) AS flag_alpha_words,
             (n < 2 OR 2 * len(list_distinct(
                 [l[i] || ' ' || l[i+1] for i in range(1, len(l))]))
               >= n - 1) AS flag_repetition
      FROM base)
    SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
           flag_word_count, flag_mean_word_len, flag_stopword,
           flag_alpha_words, flag_repetition,
           (flag_word_count AND flag_mean_word_len AND flag_stopword
            AND flag_alpha_words AND flag_repetition) AS keep
    FROM f ORDER BY doc_id
    """,
    tags=("text", "pipeline", "quality"),
)
def text_quality_rules(spark, sf_dir):
    """C4/Gopher-class heuristic quality-filter rule pack: per-doc rule
    flags plus a keep/drop verdict, every rule a NATIVE expression over
    the token array (zero Python, zero shuffles before the final sort).

    Rules (Gopher's repetition/format family, thresholds integer-exact so
    both engines agree bit-for-bit — no float ratios cross the boundary):
      word_count      20 <= n_tokens <= 10_000
      mean_word_len   3 <= non-space chars / n_tokens <= 10
      stopword        >= 2 distinct common stopwords present
      alpha_words     >= 80% of tokens contain an alphabetic char
      repetition      duplicate-bigram fraction <= 50%

    Scale posture: a pure per-row map — at 100 TB this is a single scan
    with predicate flags computed inside whole-stage codegen; the keep
    verdict is the filter a pipeline would push straight onto the scan.
    """
    docs = t(spark, sf_dir, "documents")
    tok = tokens()
    n = F.size(tok)
    chars = F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(tok),
            F.array(*[F.lit(w) for w in ("the", "a", "of", "and", "to")]),
        )
    )
    alpha = F.size(F.filter(tok, lambda w: w.rlike("[A-Za-z]")))
    # sequence(1, 0) descends in Spark — guard n < 2 explicitly
    distinct_bigrams = F.expr(
        "size(array_distinct(transform(sequence(1, size(split(text,' ')) - 1),"
        " i -> concat_ws(' ', slice(split(text,' '), i, 2)))))"
    )
    flags = {
        "flag_word_count": n.between(20, 10000),
        "flag_mean_word_len": (chars >= 3 * n) & (chars <= 10 * n),
        "flag_stopword": stop_hits >= 2,
        "flag_alpha_words": 5 * alpha >= 4 * n,
        "flag_repetition": (n < 2) | (2 * distinct_bigrams >= n - 1),
    }
    out = docs.select(
        "doc_id",
        n.cast("bigint").alias("n_tokens"),
        *[c.alias(name) for name, c in flags.items()],
    )
    keep = F.lit(True)
    for name in flags:
        keep = keep & F.col(name)
    return out.withColumn("keep", keep).orderBy("doc_id")


@query(
    "text_langid_heuristic",
    oracle="""
    SELECT pred_lang, COUNT(*) AS n FROM (
      SELECT CASE
        WHEN len(list_filter(string_split(text,' '), w -> w IN ('the','a','of'))) >=
             len(list_filter(string_split(text,' '), w -> w IN ('scan','merge','hash')))
        THEN 'en_like' ELSE 'tech_like' END AS pred_lang
      FROM documents
    ) x GROUP BY pred_lang ORDER BY pred_lang
    """,
    tags=("text", "pipeline"),
)
def text_langid_heuristic(spark, sf_dir):
    """Language-ID by stopword-list voting (n-gram heuristic family).

    The fixture's text is synthetic word soup, so the heuristic contract is
    what's verified: identical integer votes → identical labels.
    """
    docs = t(spark, sf_dir, "documents")
    tok = tokens()
    en = F.size(F.filter(tok, lambda w: w.isin("the", "a", "of")))
    tech = F.size(F.filter(tok, lambda w: w.isin("scan", "merge", "hash")))
    return (
        docs.select(F.when(en >= tech, "en_like").otherwise("tech_like").alias("pred_lang"))
        .groupBy("pred_lang")
        .agg(F.count("*").alias("n"))
        .orderBy("pred_lang")
    )


@query(
    "text_fingerprint",
    oracle="""
    SELECT COUNT(*) AS n_docs,
           COUNT(DISTINCT md5(array_to_string(list_sort(list_distinct(string_split(lower(trim(text)), ' '))), ' '))) AS n_fingerprints,
           COUNT(DISTINCT md5(lower(trim(text)))) AS n_exact_hashes
    FROM documents
    """,
    tags=("text", "dedup"),
)
def text_fingerprint(spark, sf_dir):
    """Document fingerprinting: canonical token-set fingerprint (the
    classic 'fingerprint' clustering key) + exact-content hash."""
    docs = t(spark, sf_dir, "documents")
    norm = F.lower(F.trim(F.col("text")))
    fp = F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(F.split(norm, " ")))))
    return docs.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct(fp).alias("n_fingerprints"),
        F.countDistinct(F.md5(norm)).alias("n_exact_hashes"),
    )


@query(
    "dedup_exact",
    oracle="""
    SELECT COUNT(*) AS n_docs,
           COUNT(DISTINCT md5(lower(trim(text)))) AS n_unique,
           COUNT(*) - COUNT(DISTINCT md5(lower(trim(text)))) AS n_dup_rows
    FROM documents
    """,
    tags=("text", "dedup"),
)
def dedup_exact(spark, sf_dir):
    """Exact dedup via content-hash group-by.

    At 100 TB: hash each doc (map-side), group by the 128-bit hash —
    one shuffle of (hash, 1) pairs; never shuffles document bodies.
    """
    docs = t(spark, sf_dir, "documents")
    h = F.md5(F.lower(F.trim(F.col("text"))))
    return docs.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct(h).alias("n_unique"),
        (F.count("*") - F.countDistinct(h)).alias("n_dup_rows"),
    )


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH g AS (SELECT doc_id, string_split(text, ' ') l FROM documents),
    sh AS (SELECT doc_id, {SHINGLES3_SQL} s FROM g),
    toks AS (SELECT doc_id, unnest(s) w FROM sh),
    sizes AS (SELECT doc_id, count(*) sz FROM toks GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
              FROM toks a JOIN toks b ON a.w = b.w AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id)
    SELECT id_a, id_b,
           ROUND(c * 1.0 / (sa.sz + sb.sz - c), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON id_a = sa.doc_id
    JOIN sizes sb ON id_b = sb.doc_id
    WHERE c * 1.0 / (sa.sz + sb.sz - c) >= 0.8
    ORDER BY id_a, id_b
    """,
    tags=("text", "dedup", "verifier-only"),
)
def dedup_ngram_jaccard(spark, sf_dir):
    """Exact n-gram Jaccard near-dup pairs (3-gram shingles, J ≥ 0.8).

    Spark plan: per-doc distinct shingle arrays (no UDF) → explode →
    self-join on shingle → pair-count agg → join back sizes.  Integer
    set math + one final division → hash-exact vs the oracle.

    VERIFIER-ONLY: the shingle self-join is quadratic by construction, so
    a hard row-count guard (100k docs) refuses unbounded inputs — at
    scale use dedup_minhash_lsh, which runs this exact verification over
    LSH candidates only.
    """
    docs = guard_rows(
        t(spark, sf_dir, "documents"),
        100_000,
        "dedup_ngram_jaccard",
        "Use dedup_minhash_lsh (LSH candidates + exact verify) at scale.",
    ).select("doc_id", shingles3().alias("s"))
    toks = docs.select("doc_id", F.explode("s").alias("w"))
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = toks.alias("a")
    b = toks.alias("b")
    inter = (
        a.join(b, (F.col("a.w") == F.col("b.w")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count("*").alias("c"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("sz").alias("sz_b"))
    jac = F.col("c") * 1.0 / (F.col("sz_a") + F.col("sz_b") - F.col("c"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(jac >= 0.8)
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
        .orderBy("id_a", "id_b")
    )


# --- MinHash-LSH (approximate; verified pairs hash-match the exact oracle) --


@query(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH g AS (SELECT doc_id, string_split(text, ' ') l FROM documents),
    sh AS (SELECT doc_id, {SHINGLES3_SQL} s FROM g),
    toks AS (SELECT doc_id, unnest(s) w FROM sh),
    sizes AS (SELECT doc_id, count(*) sz FROM toks GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
              FROM toks a JOIN toks b ON a.w = b.w AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id)
    SELECT id_a, id_b
    FROM inter JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id
    WHERE c * 1.0 / (sa.sz + sb.sz - c) >= 0.8
    ORDER BY id_a, id_b
    """,
    tags=("text", "dedup", "approximate"),
)
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash+LSH near-dup detection, exact-verified.

    Pipeline: shingle → 64-hash MinHash signature (map-side expression) →
    32-band LSH bucketing (shuffle on band hash only) → candidate pairs →
    exact-Jaccard verification of candidates only.  The verified output
    equals the exact J≥0.8 pair set (banding at r=2 catches J≥0.8 pairs
    with prob 1 - (1-J²)³² ≈ 1-1e-13), which is what the oracle computes.

    At 100 TB this is THE dedup plan: the quadratic shingle self-join is
    replaced by bucket-local joins; only candidates are re-verified.
    """
    from prestodb_presto_spark.text.minhash import verified_near_dup_pairs

    docs = t(spark, sf_dir, "documents")
    return (
        verified_near_dup_pairs(docs, threshold=0.8)
        .select("id_a", "id_b")
        .orderBy("id_a", "id_b")
    )


@query(
    "dedup_simhash",
    oracle="""
    WITH toks AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
                  FROM documents),
         h AS (SELECT doc_id,
                      CAST(('0x' || substr(md5(tok), 1, 15)) AS UBIGINT) AS hv
               FROM toks),
         bits AS (SELECT doc_id, b,
                         SUM(CASE WHEN (hv >> b) & 1 = 1 THEN 1 ELSE -1 END) AS acc
                  FROM h CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS b) bs
                  GROUP BY doc_id, b)
    SELECT doc_id,
           CAST(SUM(CASE WHEN acc > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT)
             AS simhash
    FROM bits GROUP BY doc_id ORDER BY doc_id
    """,
    tags=("text", "dedup", "approximate"),
)
def dedup_simhash(spark, sf_dir):
    """60-bit SimHash fingerprints, hash-matched against a DuckDB oracle.

    SimHash: per distinct token a 60-bit md5-prefix hash; for each bit
    accumulate +1/-1; the sign vector is the fingerprint.  One
    aggregate() expression over the token array — map-side only.  The
    oracle re-derives identical fingerprints bit-for-bit in SQL (was a
    rows-only check while the token hash was xxhash64, which DuckDB
    lacks).  Hamming-near pairs vs exact Jaccard stay pytest-asserted
    (tests/test_text.py).
    """
    from prestodb_presto_spark.text.analysis import with_simhash64

    docs = t(spark, sf_dir, "documents")
    return with_simhash64(docs, F.array_distinct(tokens())).select("doc_id", "simhash").orderBy(
        "doc_id"
    )


@query(
    "dedup_simhash_pairs",
    oracle="""
    WITH toks AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
                  FROM documents),
         h AS (SELECT doc_id,
                      CAST(('0x' || substr(md5(tok), 1, 15)) AS UBIGINT) AS hv
               FROM toks),
         bits AS (SELECT doc_id, b,
                         SUM(CASE WHEN (hv >> b) & 1 = 1 THEN 1 ELSE -1 END) AS acc
                  FROM h CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS b) bs
                  GROUP BY doc_id, b),
         fp AS (SELECT doc_id,
                       CAST(SUM(CASE WHEN acc > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)
                            AS BIGINT) AS simhash
                FROM bits GROUP BY doc_id),
         bands AS (SELECT doc_id, simhash, b, (simhash >> (b * 15)) & 32767 AS bv
                   FROM fp CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS b) bs),
         cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                         a.simhash AS ha, b.simhash AS hb
                  FROM bands a JOIN bands b
                    ON a.b = b.b AND a.bv = b.bv AND a.doc_id < b.doc_id)
    SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
    FROM cand WHERE bit_count(xor(ha, hb)) <= 3
    ORDER BY id_a, id_b
    """,
    tags=("text", "dedup", "approximate"),
)
def dedup_simhash_pairs(spark, sf_dir):
    """SimHash Hamming-near pair SEARCH (<=3 bits apart on the 60-bit
    fingerprint) — the retrieval step that turns dedup_simhash's
    fingerprints into actual duplicate pairs at scale.

    Bit-band LSH (text/simhash.py): 4 bands x 15 bits; pigeonhole makes
    banding EXACT for Hamming <= 3 (at least one band survives intact),
    so the verified pair set is complete and the DuckDB oracle matches
    it row-for-row — no probabilistic recall caveat, unlike MinHash.
    Shuffles: fingerprint agg + band-bucket self-join + final sort; the
    hot-bucket cap (gate data is far below it) bounds candidates at
    O(cap * n) on boilerplate clusters.
    """
    from prestodb_presto_spark.text.simhash import simhash_near_pairs

    docs = t(spark, sf_dir, "documents")
    # GATE form: cap disabled so the result is the complete pair set the
    # uncapped oracle computes at ANY fixture data; production callers
    # use the default DEFAULT_BUCKET_CAP (skew receipt in COVERAGE)
    return simhash_near_pairs(docs, bucket_cap=None).orderBy("id_a", "id_b")


@query(
    "sample_stratified",
    oracle="""
    SELECT doc_id, source FROM (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
               COUNT(*) OVER (PARTITION BY source) AS n
        FROM documents) t
    WHERE rn <= CEIL(n * 0.1)
    ORDER BY source, doc_id
    """,
    tags=("pipeline", "sampling"),
)
def sample_stratified(spark, sf_dir):
    """Deterministic stratified (per-source) 10% sample — the
    training-mix primitive: every source contributes proportionally and
    the selection is a pure function of the data (md5 of the key), so
    reruns and backfills pick identical rows.

    Scale posture: ONE hash shuffle on source for the two windows; at
    100 TB a skewed giant source serializes its partition — for that
    regime use ``sample_stratified_threshold`` below: the windowless
    md5-prefix filter (zero shuffles, binomial-exact at scale), which is
    itself oracle-checked row-for-row.  This exact row_number form
    guarantees ceil(n * 0.1) per source and is the small/medium-scale
    choice.  No Python, no collect; the sampled set streams straight to
    the sink.
    """
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents")
    w = Window.partitionBy("source")
    w_rank = w.orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    return (
        docs.withColumn("__n", F.count("*").over(w))
        .withColumn("__rn", F.row_number().over(w_rank))
        .filter(F.col("__rn") <= F.ceil(F.col("__n") * F.lit(0.1)))
        .select("doc_id", "source")
        .orderBy("source", "doc_id")
    )


# 10% of the md5-prefix space: floor(0.1 * 16^15) as a 15-digit lowercase
# hex string.  Lexicographic `<` on equal-length lowercase hex equals
# numeric `<`, and Spark's md5() and DuckDB's md5() render identical
# lowercase hex — so both engines select the exact same rows.
_STRAT_RATE_HEX = format(16**15 // 10, "x").rjust(15, "0")


def _rate_hex(rate: float) -> str:
    return format(int(rate * 16**15), "x").rjust(15, "0")


# training-mix target rates per source domain (the gate setting): boost
# src0, sample the rest down — the "domain reweighting" primitive
DOMAIN_MIX_RATES = {"src0": 0.8, "src1": 0.05}
DOMAIN_MIX_DEFAULT = 0.2


@query(
    "sample_domain_mix",
    oracle=f"""
    SELECT doc_id, source FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) <
          CASE source
            WHEN 'src0' THEN '{_rate_hex(0.8)}'
            WHEN 'src1' THEN '{_rate_hex(0.05)}'
            ELSE '{_rate_hex(0.2)}'
          END
    ORDER BY source, doc_id
    """,
    tags=("pipeline", "sampling"),
)
def sample_domain_mix(spark, sf_dir):
    """Domain-mixture reweighting: each source domain is sampled at its
    own target rate (boost src0 to 80%, squeeze src1 to 5%, default
    20%) — the training-mix composition primitive.

    Scale posture: the per-source rate is a CASE over the partition/
    source column and the pick is the same windowless md5-prefix filter
    as sample_stratified_threshold — a pure per-row predicate, ZERO
    shuffles before the output sort, deterministic across reruns and
    backfills, and skew-immune (no per-source window).  At 100 TB with
    source-partitioned input the CASE folds per partition and the
    filter pushes to the scan boundary.
    """
    docs = t(spark, sf_dir, "documents")
    rate = F.when(F.col("source") == "src0", F.lit(_rate_hex(0.8)))
    rate = rate.when(F.col("source") == "src1", F.lit(_rate_hex(0.05)))
    rate = rate.otherwise(F.lit(_rate_hex(0.2)))
    return (
        docs.filter(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15) < rate
        )
        .select("doc_id", "source")
        .orderBy("source", "doc_id")
    )


# conservative PII patterns sharing semantics between Java regex (Spark)
# and RE2 (DuckDB): no backrefs, no lookaround
_PII_RULES = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<ID>"),
    (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
]


@query(
    "text_pii_scrub",
    oracle=f"""
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(regexp_replace(
             raw,
             '{_PII_RULES[0][0]}', '{_PII_RULES[0][1]}', 'g'),
             '{_PII_RULES[1][0]}', '{_PII_RULES[1][1]}', 'g'),
             '{_PII_RULES[2][0]}', '{_PII_RULES[2][1]}', 'g'),
             '{_PII_RULES[3][0]}', '{_PII_RULES[3][1]}', 'g') AS clean_text,
           regexp_matches(raw, '{_PII_RULES[0][0]}') AS had_email,
           regexp_matches(raw, '{_PII_RULES[3][0]}') AS had_phone
    FROM (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN
               'contact user' || CAST(doc_id AS VARCHAR)
               || '@example.com or 555-01' || lpad(CAST(doc_id % 10 AS VARCHAR), 1, '0')
               || '-4567 at 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1 '
               || substr(text, 1, 40)
             ELSE substr(text, 1, 60) END AS raw
      FROM documents WHERE doc_id < 200) s
    ORDER BY doc_id
    """,
    tags=("text", "pipeline", "privacy"),
)
def text_pii_scrub(spark, sf_dir):
    """PII scrubbing: redact emails / IPv4s / SSN-shaped ids / phone
    numbers with typed placeholders, plus per-doc detection flags — the
    privacy pass every training-data pipeline runs before tokenization.

    The fixture corpus is synthetic word soup, so the query PLANTS
    deterministic PII in one third of the docs (doc_id-derived email,
    phone, ip) and the gate verifies the scrubbing semantics character-
    for-character against DuckDB applying the same rule chain.  Rules
    are conservative regex (no lookaround/backrefs) so Java regex and
    RE2 agree.

    Scale posture: a pure per-row regexp_replace chain — one scan, zero
    shuffles before the output sort, whole-stage codegen (JVM regex;
    no Python).
    """
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    raw = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(
            F.lit("contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-01"),
            F.lpad((F.col("doc_id") % 10).cast("string"), 1, "0"),
            F.lit("-4567 at 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".1 "),
            F.substring("text", 1, 40),
        ),
    ).otherwise(F.substring("text", 1, 60))
    clean = raw
    for pat, repl in _PII_RULES:
        clean = F.regexp_replace(clean, pat, repl)
    return (
        docs.select(
            "doc_id",
            clean.alias("clean_text"),
            raw.rlike(_PII_RULES[0][0]).alias("had_email"),
            raw.rlike(_PII_RULES[3][0]).alias("had_phone"),
        )
        .orderBy("doc_id")
    )


@query(
    "sample_stratified_threshold",
    oracle=f"""
    SELECT doc_id, source
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) < '{_STRAT_RATE_HEX}'
    ORDER BY source, doc_id
    """,
    tags=("pipeline", "sampling"),
)
def sample_stratified_threshold(spark, sf_dir):
    """Windowless stratified 10% sample — the 100 TB scale path for
    sample_stratified.  Selection is a pure per-row filter: keep rows
    whose md5(key) prefix falls below the rate threshold.  ZERO shuffles
    (the trailing ORDER BY exists only for oracle determinism); no
    per-source window, so a skewed giant source can never serialize one
    partition the way row_number() over PARTITION BY source does.

    Trade-off vs the exact form: each source's realized rate is binomial
    around 10% (concentrating as the source grows — exactly the regime
    where the window form breaks), rather than exactly ceil(n * 0.1).
    Deterministic: md5 of the key, so reruns/backfills pick identical
    rows, and the DuckDB oracle selects the exact same set.  Reference
    context: SampleNode.java / ImplementBernoulliSampleAsFilter.java —
    the same sample-as-filter rewrite.
    """
    docs = t(spark, sf_dir, "documents")
    return (
        docs.filter(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15)
            < F.lit(_STRAT_RATE_HEX)
        )
        .select("doc_id", "source")
        .orderBy("source", "doc_id")
    )


@query(
    "text_topk_ngrams",
    oracle="""
    SELECT lang, ngram, cnt FROM (
        SELECT lang, ngram, cnt,
               ROW_NUMBER() OVER (PARTITION BY lang
                   ORDER BY cnt DESC, ngram) AS rk
        FROM (
            SELECT lang, ngram, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM (
                SELECT lang,
                       unnest([l[i] || ' ' || l[i + 1]
                               for i in range(1, len(l))]) AS ngram
                FROM (SELECT lang, string_split(text, ' ') AS l
                      FROM documents) s
            ) g
            GROUP BY lang, ngram
        ) c
    ) r
    WHERE rk <= 5
    ORDER BY lang, cnt DESC, ngram
    """,
    tags=("text", "pipeline"),
)
def text_topk_ngrams(spark, sf_dir):
    """Top-5 bigrams per language — vocabulary induction over the
    corpus, the first step of tokenizer/quality work on training data.

    Bigram construction is a per-row array expression (transform over
    the token array — no explode until the array is built), then ONE
    explode feeds a partial-agg-friendly (lang, ngram) count and a
    WindowGroupLimit top-k per language.  Shuffle volume is the
    distinct-bigram count, not the token count.
    """
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents")
    bigrams = F.expr(
        "transform(slice(split(text, ' '), 1, size(split(text, ' ')) - 1),"
        " (x, i) -> concat(x, ' ', element_at(split(text, ' '), i + 2)))"
    )
    counts = (
        docs.select("lang", F.explode(bigrams).alias("ngram"))
        .groupBy("lang", "ngram")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("cnt"), F.asc("ngram"))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("lang", "ngram", "cnt")
        .orderBy("lang", F.desc("cnt"), "ngram")
    )


# eval-gram broadcast cap: ~2M distinct 5-grams (~50 B each ≈ 100 MB
# serialized) is the most a driver/executor should hold per-task; a
# benchmark suite is orders of magnitude below this, but nothing about
# the input ENFORCES that, so the plan must degrade instead of OOM
MAX_BROADCAST_EVAL_GRAMS = 2_000_000


def decontaminate_join(corpus: DataFrame, eval_grams: DataFrame) -> DataFrame:
    """Join exploded corpus grams against the eval-gram set and count
    distinct hits per doc.

    Scale guard: the fast path BROADCASTS the eval grams (benchmarks are
    tiny vs a 100 TB corpus — one shuffle total, the per-doc agg).  But
    the broadcast is only safe if the eval side really is small, so probe
    it with a bounded action first — ``limit(cap+1).count()`` early-exits
    at cap+1 rows, it never counts an unbounded set — and above the cap
    fall back to a plain shuffle hash join (two shuffles, no memory
    cliff).  Mirrors the MAX_PROBE_QUERIES guard in similarity/ivf.py.
    """
    n_eval = eval_grams.limit(MAX_BROADCAST_EVAL_GRAMS + 1).count()
    rhs = (
        F.broadcast(eval_grams)
        if n_eval <= MAX_BROADCAST_EVAL_GRAMS
        else eval_grams.hint("shuffle_hash")
    )
    return (
        corpus.join(rhs, "g")
        .groupBy("doc_id")
        .agg(F.count_distinct("g").cast("bigint").alias("n_hits"))
        .orderBy("doc_id")
    )


@query(
    "decontaminate_ngram",
    oracle="""
    WITH grams AS (
      SELECT doc_id, source,
             unnest(list_distinct([array_to_string(l[i:i+4], ' ')
                                   for i in range(1, len(l) - 3)])) AS g
      FROM (SELECT doc_id, source, string_split(text, ' ') AS l
            FROM documents) s
    ),
    eval_grams AS (SELECT DISTINCT g FROM grams WHERE source = 'src0')
    SELECT doc_id, CAST(COUNT(DISTINCT g) AS BIGINT) AS n_hits
    FROM grams
    WHERE source <> 'src0' AND g IN (SELECT g FROM eval_grams)
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    tags=("pipeline", "decontamination"),
)
def decontaminate_ngram(spark, sf_dir):
    """Benchmark decontamination: flag corpus documents sharing any
    5-gram with the held-out eval set (here: source 'src0' stands in for
    the benchmark suite) and report how many distinct eval 5-grams each
    document collides with.

    Scale posture: the eval side is benchmarks — tiny versus a 100 TB
    corpus — so its distinct-gram set BROADCASTS and the corpus-side
    explode feeds a broadcast semi-style join + per-doc count: ONE
    shuffle (the per-doc aggregation), no corpus self-join.  The
    broadcast is GUARDED (decontaminate_join): a bounded probe counts the
    eval grams and an oversized set degrades to a shuffle hash join
    instead of OOMing the driver.  Grams are per-row array expressions
    (no premature explode); duplicate grams are dropped per doc before
    exploding.
    """
    docs = t(spark, sf_dir, "documents")
    # sequence(1, 0) is DESCENDING [1, 0] in Spark (step defaults to -1),
    # so a <=4-token doc must yield an empty array, not slice(toks, 0, 5)
    grams = F.expr(
        "CASE WHEN size(split(text, ' ')) >= 5 THEN"
        " transform(sequence(1, size(split(text, ' ')) - 4),"
        " i -> concat_ws(' ', slice(split(text, ' '), i, 5)))"
        " ELSE array() END"
    )
    with_grams = docs.select(
        "doc_id", "source", F.explode(F.array_distinct(grams)).alias("g")
    )
    eval_grams = (
        with_grams.filter(F.col("source") == "src0").select("g").distinct()
    )
    corpus = with_grams.filter(F.col("source") != "src0")
    return decontaminate_join(corpus, eval_grams)


# --- cross-doc structural (line-level) dedup --------------------------------


def dedup_lines(lines: DataFrame) -> DataFrame:
    """Corpus-wide keep-first line dedup (the C4 move): a line unit
    survives only at its FIRST occurrence — minimal (doc_id, pos) —
    across the whole corpus; later occurrences are dropped and each doc
    is reassembled from its surviving lines in original order.

    Input: (doc_id, pos, line) — one row per line unit.
    Output: (doc_id, text_dedup, n_lines_kept) for docs that kept >= 1
    line; callers left-join back to the corpus for per-doc totals.

    Scale posture (100 TB): ONE shuffle on the line content to pick the
    winner — groupBy(line).min(struct(doc_id, pos)) is an algebraic
    aggregate, so the map side combines and a boilerplate line present
    in half the corpus still reduces to one row per input partition
    before the exchange (skew-immune, receipt in COVERAGE.md); then one
    doc-level shuffle to reassemble.  No window function ever sees the
    corpus, and document bodies are never shuffled twice: the winner
    rows alone (<= distinct lines) reach the reassembly.
    """
    firsts = lines.groupBy("line").agg(
        F.min(F.struct("doc_id", "pos")).alias("w")
    )
    kept = firsts.select(
        F.col("w.doc_id").alias("doc_id"),
        F.col("w.pos").alias("pos"),
        "line",
    )
    return kept.groupBy("doc_id").agg(
        F.expr(
            "concat_ws('\\n', transform(array_sort(collect_list("
            "named_struct('pos', pos, 'line', line))), s -> s.line))"
        ).alias("text_dedup"),
        F.count("*").cast("bigint").alias("n_lines_kept"),
    )


# the gate's line unit: 4-token chunks of the token array (the synthetic
# corpus has no newlines; chunking makes cross-doc repetition real while
# keeping the unit definition deterministic in both engines)
_LINE_CHUNK = 4
_CHUNKS_SPARK = (
    f"CASE WHEN size(split(text, ' ')) < 1 THEN array() ELSE"
    f" transform(sequence(0, cast(ceil(size(split(text, ' ')) / {_LINE_CHUNK}.0) as int) - 1),"
    f" i -> concat_ws(' ', slice(split(text, ' '), i * {_LINE_CHUNK} + 1, {_LINE_CHUNK})))"
    f" END"
)
_DUCK_TOKS = "string_split(text, ' ')"
_CHUNKS_DUCK = (
    f"[array_to_string({_DUCK_TOKS}[(i - 1) * {_LINE_CHUNK} + 1 : i * {_LINE_CHUNK}], ' ')"
    f" for i in range(1, cast(ceil(len({_DUCK_TOKS}) / {_LINE_CHUNK}.0) as int) + 1)]"
)


@query(
    "dedup_lines_cross_doc",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, {_CHUNKS_DUCK} AS chunks
      FROM documents),
    lines AS (
      SELECT doc_id, s.pos AS pos, s.line AS line FROM (
        SELECT doc_id,
               unnest([{{'pos': i, 'line': chunks[i]}} for i in range(1, len(chunks) + 1)]) AS s
        FROM base)),
    ranked AS (
      SELECT doc_id, pos, line,
             row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn
      FROM lines),
    kept AS (
      SELECT doc_id,
             string_agg(line, chr(10) ORDER BY pos) AS text_dedup,
             COUNT(*) AS n_lines_kept
      FROM ranked WHERE rn = 1 GROUP BY doc_id)
    SELECT b.doc_id,
           coalesce(k.text_dedup, '') AS text_dedup,
           CAST(coalesce(k.n_lines_kept, 0) AS BIGINT) AS n_lines_kept,
           CAST(len(b.chunks) - coalesce(k.n_lines_kept, 0) AS BIGINT)
             AS n_lines_dropped
    FROM base b LEFT JOIN kept k ON b.doc_id = k.doc_id
    ORDER BY b.doc_id
    """,
    tags=("text", "dedup", "pipeline"),
)
def dedup_lines_cross_doc(spark, sf_dir):
    """Cross-document line-level exact dedup, keep-first deterministic
    (C4-style: a line unit occurring in multiple docs survives only at
    its first (doc_id, pos) occurrence; docs reassemble from surviving
    lines).  Line unit here = 4-token chunk (the corpus has no
    newlines); `dedup_lines` takes any (doc_id, pos, line) relation.

    Hash-exact vs the DuckDB oracle including fully-deduped docs (empty
    text_dedup) and per-doc kept/dropped counts.
    """
    docs = t(spark, sf_dir, "documents")
    chunks = F.expr(_CHUNKS_SPARK)
    base = docs.select("doc_id", chunks.alias("chunks"))
    lines = base.select(
        "doc_id", F.posexplode("chunks").alias("pos0", "line")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "line")
    dd = dedup_lines(lines)
    totals = base.select("doc_id", F.size("chunks").alias("n_total"))
    return (
        totals.join(dd, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("text_dedup", F.lit("")).alias("text_dedup"),
            F.coalesce("n_lines_kept", F.lit(0)).cast("bigint").alias("n_lines_kept"),
            (F.col("n_total") - F.coalesce("n_lines_kept", F.lit(0)))
            .cast("bigint")
            .alias("n_lines_dropped"),
        )
        .orderBy("doc_id")
    )


# --- composite pipeline verdict ---------------------------------------------


def _keep_flags_sql(src: str) -> str:
    """base/q/firsts CTE bodies computing the keep flags over relation
    ``src`` (columns doc_id, text) — shared by _PIPE_KEEP_ORACLE and the
    pipeline_incremental_refresh composition oracle."""
    return f"""base AS (
      SELECT doc_id, text, string_split(text, ' ') AS l,
             md5(lower(trim(text))) AS h
      FROM {src}),
    q AS (
      SELECT doc_id, h,
        (len(l) BETWEEN 20 AND 10000
         AND length(replace(text, ' ', '')) >= 3 * len(l)
         AND length(replace(text, ' ', '')) <= 10 * len(l)
         AND len(list_intersect(list_distinct(l),
                 ['the', 'a', 'of', 'and', 'to'])) >= 2
         AND 5 * len(list_filter(l, w -> regexp_matches(w, '[A-Za-z]')))
             >= 4 * len(l)
         AND (len(l) < 2 OR 2 * len(list_distinct(
               [l[i] || ' ' || l[i+1] for i in range(1, len(l))]))
             >= len(l) - 1)) AS flag_quality,
        (len(list_filter(l, w -> w IN ('the', 'a', 'of'))) >=
         len(list_filter(l, w -> w IN ('scan', 'merge', 'hash'))))
          AS flag_lang,
        NOT (regexp_matches(text, '{_PII_RULES[0][0]}')
          OR regexp_matches(text, '{_PII_RULES[1][0]}')
          OR regexp_matches(text, '{_PII_RULES[2][0]}')
          OR regexp_matches(text, '{_PII_RULES[3][0]}')) AS flag_no_pii
      FROM base),
    firsts AS (SELECT h, min(doc_id) AS first_doc FROM base GROUP BY h)"""


_PIPE_KEEP_ORACLE = f"""
    WITH {_keep_flags_sql("documents")}
    SELECT q.doc_id, flag_quality, flag_lang, flag_no_pii,
           (q.doc_id = f.first_doc) AS flag_first_copy,
           (flag_quality AND flag_lang AND flag_no_pii
            AND q.doc_id = f.first_doc) AS keep
    FROM q JOIN firsts f ON q.h = f.h
    ORDER BY q.doc_id
"""


def _keep_flag_frame(docs):
    """Shared keep/drop flag computation over (doc_id, text) — the
    engine of `pipeline_keep`, reused by `pipeline_incremental_refresh`.
    Returns (doc_id, flag_quality, flag_lang, flag_no_pii,
    flag_first_copy, keep); first-copy is exact dedup WITHIN the input
    frame (groupBy(content-hash).min(doc_id), algebraic)."""
    base = docs.select(
        "doc_id",
        "text",
        tokens().alias("toks"),
        F.md5(F.lower(F.trim(F.col("text")))).alias("h"),
    )
    tok = F.col("toks")
    n = F.size(tok)
    chars = F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(tok),
            F.array(*[F.lit(w) for w in ("the", "a", "of", "and", "to")]),
        )
    )
    alpha = F.size(F.filter(tok, lambda w: w.rlike("[A-Za-z]")))
    distinct_bigrams = F.expr(
        "size(array_distinct(transform(sequence(1, size(toks) - 1),"
        " i -> concat_ws(' ', slice(toks, i, 2)))))"
    )
    flag_quality = (
        n.between(20, 10000)
        & (chars >= 3 * n)
        & (chars <= 10 * n)
        & (stop_hits >= 2)
        & (5 * alpha >= 4 * n)
        & ((n < 2) | (2 * distinct_bigrams >= n - 1))
    )
    en = F.size(F.filter(tok, lambda w: w.isin("the", "a", "of")))
    tech = F.size(F.filter(tok, lambda w: w.isin("scan", "merge", "hash")))
    pii_any = F.lit(False)
    for pat, _repl in _PII_RULES:
        pii_any = pii_any | F.col("text").rlike(pat)
    feats = base.select(
        "doc_id",
        "h",
        flag_quality.alias("flag_quality"),
        (en >= tech).alias("flag_lang"),
        (~pii_any).alias("flag_no_pii"),
    )
    firsts = base.groupBy("h").agg(F.min("doc_id").alias("first_doc"))
    joined = feats.join(firsts, "h")
    first_copy = F.col("doc_id") == F.col("first_doc")
    return joined.select(
        "doc_id",
        "flag_quality",
        "flag_lang",
        "flag_no_pii",
        first_copy.alias("flag_first_copy"),
        (
            F.col("flag_quality")
            & F.col("flag_lang")
            & F.col("flag_no_pii")
            & first_copy
        ).alias("keep"),
    )


@query(
    "pipeline_keep",
    oracle=_PIPE_KEEP_ORACLE,
    tags=("text", "pipeline", "quality"),
)
def pipeline_keep(spark, sf_dir):
    """Composite per-doc keep/drop verdict — the gate a real training
    pipeline applies before packing: C4/Gopher quality rules AND
    language-ID AND no-PII AND exact-dedup first-copy membership, all
    composed over ONE shared token/hash projection (the flags derive
    from a single `toks`/`h` select; split(text) is not recomputed per
    rule — Spark keeps the projection separate because the array is
    referenced many times, and codegen CSEs any residual repeats).

    Scale posture: the rule flags are per-row expressions on the scan;
    the only shuffle is the exact-dedup winner aggregation
    (groupBy(content-hash).min(doc_id), algebraic, map-side combined)
    plus its join back — no window over the corpus, no Python anywhere.
    """
    return _keep_flag_frame(t(spark, sf_dir, "documents")).orderBy("doc_id")


# --- intra-doc repetition removal -------------------------------------------


@query(
    "text_dedup_intradoc",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, {_CHUNKS_DUCK} AS chunks
      FROM documents),
    lines AS (
      SELECT doc_id, s.pos AS pos, s.line AS line FROM (
        SELECT doc_id,
               unnest([{{'pos': i, 'line': chunks[i]}} for i in range(1, len(chunks) + 1)]) AS s
        FROM base)),
    kept AS (
      SELECT doc_id, pos, line,
             row_number() OVER (PARTITION BY doc_id, line ORDER BY pos) AS rn
      FROM lines)
    SELECT b.doc_id,
           coalesce(string_agg(k.line, chr(10) ORDER BY k.pos), '') AS text_intradoc,
           CAST(COUNT(k.pos) AS BIGINT) AS n_lines_kept,
           CAST(len(b.chunks) - COUNT(k.pos) AS BIGINT) AS n_lines_dropped
    FROM base b LEFT JOIN kept k ON b.doc_id = k.doc_id AND k.rn = 1
    GROUP BY b.doc_id, len(b.chunks)
    ORDER BY b.doc_id
    """,
    tags=("text", "dedup", "pipeline"),
)
def text_dedup_intradoc(spark, sf_dir):
    """WITHIN-document repetition removal (the other half of the C4
    move — `dedup_lines_cross_doc` handles cross-doc): each line unit
    (4-token chunk) survives only at its first occurrence INSIDE its
    own document; the doc reassembles from surviving lines in order.

    Scale posture (100 TB): a pure per-row array fold — the keep-first
    filter runs inside one expression over the chunk array (no explode,
    no shuffle, nothing leaves the row).  Duplicate detection within a
    doc is O(lines²) in the fold's array_contains but lines-per-doc is
    bounded by the doc length, not the corpus; the operator pushes onto
    the scan and composes with the cross-doc pass (intra first shrinks
    the line stream the corpus-wide shuffle sees).
    """
    docs = t(spark, sf_dir, "documents")
    chunks = F.expr(_CHUNKS_SPARK)
    kept = F.expr(
        "aggregate(__chunks, CAST(array() AS ARRAY<STRING>),"
        " (acc, x) -> IF(array_contains(acc, x), acc, concat(acc, array(x))))"
    )
    return (
        docs.select("doc_id", chunks.alias("__chunks"))
        .select("doc_id", F.size("__chunks").alias("__n"), kept.alias("__kept"))
        .select(
            "doc_id",
            F.concat_ws("\n", F.col("__kept")).alias("text_intradoc"),
            F.size("__kept").cast("bigint").alias("n_lines_kept"),
            (F.col("__n") - F.size("__kept")).cast("bigint").alias("n_lines_dropped"),
        )
        .orderBy("doc_id")
    )


# --- corpus unigram-LM rarity scoring ----------------------------------------

_VOCAB_TOP = 1000  # known-vocabulary size for the rarity model


@query(
    "text_unigram_rarity",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
    counts AS (
      SELECT token, COUNT(*) AS c FROM tok GROUP BY token),
    vocab AS (
      SELECT token, row_number() OVER (ORDER BY c DESC, token) AS rank
      FROM counts ORDER BY c DESC, token LIMIT {_VOCAB_TOP}),
    scored AS (
      SELECT t.doc_id,
             coalesce(v.rank, {_VOCAB_TOP + 1}) AS r,
             CASE WHEN v.token IS NULL THEN 1 ELSE 0 END AS oov
      FROM tok t LEFT JOIN vocab v ON t.token = v.token)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(oov) AS BIGINT) AS n_oov,
           ROUND(SUM(r) * 1.0 / COUNT(*), 6) AS mean_rank
    FROM scored GROUP BY doc_id ORDER BY doc_id
    """,
    tags=("text", "quality", "pipeline"),
)
def text_unigram_rarity(spark, sf_dir):
    """Corpus-unigram rarity scoring — the integer-exact stand-in for
    CCNet-style LM perplexity filtering: build a frequency-ranked
    top-1000 vocabulary over the corpus, then score each doc by
    its mean token rank (out-of-vocabulary tokens take rank V+1) and
    its OOV count.  High mean rank = rare/garbled vocabulary — the
    docs a perplexity filter would drop.  Rank arithmetic stays in
    integers (single final division), so the gate is hash-exact where a
    cross-engine ln() would drift.

    Scale posture (100 TB): vocabulary = one map-side-combined count
    shuffle over tokens + TakeOrdered(V) (parallel top-k, never a
    global window over the vocabulary); the V-row vocab BROADCASTS to
    the scoring join; per-doc aggregation is the only other shuffle,
    keyed on doc_id with map-side combine.
    """
    docs = t(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens()).alias("token"))
    counts = tok.groupBy("token").agg(F.count("*").alias("c"))
    top = counts.orderBy(F.col("c").desc(), "token").limit(_VOCAB_TOP)
    from pyspark.sql import Window

    vocab = top.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.col("c").desc(), "token")),
    ).select("token", "rank")
    scored = tok.join(F.broadcast(vocab), "token", "left").select(
        "doc_id",
        F.coalesce("rank", F.lit(_VOCAB_TOP + 1)).alias("r"),
        F.when(F.col("rank").isNull(), 1).otherwise(0).alias("oov"),
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum("oov").cast("bigint").alias("n_oov"),
            F.round(F.sum("r") * 1.0 / F.count("*"), 6).alias("mean_rank"),
        )
        .orderBy("doc_id")
    )


# --- per-doc keyword extraction (tf-df ratio top-k) ---------------------------

_TFIDF_K = 3


@query(
    "text_tfdf_keywords",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
    tf AS (
      SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token),
    df AS (
      SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY token),
    ranked AS (
      SELECT tf.doc_id, tf.token, tf.tf, df.df,
             ROUND(tf.tf * 1.0 / df.df, 6) AS score,
             row_number() OVER (PARTITION BY tf.doc_id
                                ORDER BY tf.tf * 1.0 / df.df DESC, tf.token) AS rn
      FROM tf JOIN df ON tf.token = df.token)
    SELECT doc_id, CAST(rn AS INT) AS rn, token,
           CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df, score
    FROM ranked WHERE rn <= {_TFIDF_K}
    ORDER BY doc_id, rn
    """,
    tags=("text", "pipeline"),
)
def text_tfdf_keywords(spark, sf_dir):
    """Per-document keyword extraction: top-3 tokens by
    tf/df — term frequency over document frequency, the
    monotone-in-idf rational form of tf-idf that stays hash-exact
    across engines (a single exactly-rounded division; no ln()).
    Deterministic tie-break on token.

    Scale posture (100 TB): tf = one (doc, token) count shuffle
    (map-side combined); df = one token-keyed distinct-doc count (the
    (doc,token) stream is ALREADY distinct after tf, so df reuses it
    with a plain count — no count-distinct expansion); the tf⋈df join
    shuffles on token (a vocabulary-sized side — too big to broadcast
    at corpus scale, so a shuffle hash join is the right call); the
    top-k is a per-doc WindowGroupLimit (rank pushdown prunes to
    3 rows per doc before the final sort).
    """
    docs = t(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens()).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("token").agg(F.count("*").alias("df"))
    from pyspark.sql import Window

    score = F.col("tf") * 1.0 / F.col("df")
    w = Window.partitionBy("doc_id").orderBy(score.desc(), "token")
    return (
        tf.join(df_, "token")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TFIDF_K)
        .select(
            "doc_id",
            F.col("rn").cast("int").alias("rn"),
            "token",
            F.col("tf").cast("bigint").alias("tf"),
            F.col("df").cast("bigint").alias("df"),
            F.round(score, 6).alias("score"),
        )
        .orderBy("doc_id", "rn")
    )


_BPE_TOPK = 20


@query(
    "text_bpe_pair_counts",
    oracle=f"""
    WITH tk AS (SELECT string_split(lower(text), ' ') AS l FROM documents),
    p AS (
      SELECT unnest(CASE WHEN len(l) < 2 THEN []::VARCHAR[]
                    ELSE [l[i] || ' ' || l[i+1] for i in generate_series(1, len(l) - 1)]
                    END) AS pair
      FROM tk)
    SELECT pair, COUNT(*) AS cnt FROM p
    GROUP BY pair ORDER BY cnt DESC, pair LIMIT {_BPE_TOPK}
    """,
    tags=("text", "pipeline"),
)
def text_bpe_pair_counts(spark, sf_dir):
    """Corpus-wide adjacent-token-pair frequencies, top-20:
    the counting step of one BPE merge round (the highest-count pair is
    the merge a BPE trainer would pick), and the bigram statistic
    quality filters build on.  Deterministic tie-break on the pair.

    Scale posture (100 TB): the pair list is ONE array expression per
    doc (no per-token self-join — the adjacency is resolved inside the
    row), one explode, then a map-side-combined count and a
    TakeOrderedAndProject(20) — a single shuffle of (pair,
    partial count) rows, no global sort.
    """
    docs = t(spark, sf_dir, "documents")
    pairs = F.expr(
        "CASE WHEN size(split(lower(text), ' ')) < 2 THEN array()"
        " ELSE transform(array(split(lower(text), ' ')),"
        "   t -> transform(sequence(1, size(t) - 1),"
        "        i -> concat(element_at(t, i), ' ', element_at(t, i + 1))))[0]"
        " END"
    )
    return (
        docs.select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "pair")
        .limit(_BPE_TOPK)
    )


@query(
    "decontaminate_exact_passage",
    oracle="""
    WITH p AS (
      SELECT DISTINCT substr(text, 11, 12) AS passage
      FROM documents WHERE doc_id % 37 = 0 AND length(text) >= 50),
    hits AS (
      SELECT d.doc_id, COUNT(*) AS n_hits
      FROM documents d JOIN p ON d.doc_id % 37 <> 0
                              AND position(p.passage IN d.text) > 0
      GROUP BY d.doc_id)
    SELECT doc_id, CAST(n_hits AS BIGINT) AS n_hits
    FROM hits ORDER BY doc_id
    """,
    tags=("pipeline", "decontamination"),
)
def decontaminate_exact_passage(spark, sf_dir):
    """Exact-passage decontamination: flag corpus documents containing
    any held-out eval passage VERBATIM as a substring (the exact-match
    complement of decontaminate_ngram's 5-gram collision test — the
    GPT-3-style 'remove documents with an exact overlap' rule).  Eval
    passages here are deterministic 12-char spans drawn from the
    doc_id%37 subset; every other document is scanned for containment.

    Scale posture (100 TB): the passage set is benchmark-sized — tiny —
    so it BROADCASTS and the containment scan is a map-only
    BroadcastNestedLoopJoin over the corpus (instr() in whole-stage
    codegen, no Python); the only shuffle is the per-doc hit count.
    For very large passage sets the same guard/degrade pattern as
    decontaminate_join applies (Aho-Corasick via a token-anchored
    shuffle join is the documented fallback); at gate scale the
    broadcast is always in-bounds.
    """
    docs = t(spark, sf_dir, "documents")
    passages = (
        docs.filter((F.col("doc_id") % 37 == 0) & (F.length("text") >= 50))
        .select(F.substring("text", 11, 12).alias("passage"))
        .distinct()
    )
    corpus = docs.filter(F.col("doc_id") % 37 != 0)
    return (
        corpus.join(F.broadcast(passages), F.instr(F.col("text"), F.col("passage")) > 0)
        .groupBy("doc_id")
        .agg(F.count("*").cast("bigint").alias("n_hits"))
        .orderBy("doc_id")
    )


_VOCAB_V = 500


def _vocab(docs):
    """(tok, id): the frequency-ranked top-V vocabulary (id = rank,
    deterministic tie-break on token) — ONE definition shared by encode
    and decode so the two can never drift out of being inverses.
    The top-V pick is a TakeOrderedAndProject; the rank window runs over
    V rows only; callers broadcast the result into their lookup join."""
    from pyspark.sql import Window

    toks = F.split(F.lower(F.col("text")), " ")
    cnt = (
        docs.select(F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    top = cnt.orderBy(F.desc("c"), "tok").limit(_VOCAB_V)
    return top.withColumn(
        "id", F.row_number().over(Window.orderBy(F.desc("c"), "tok"))
    ).select("tok", "id")


@query(
    "text_vocab_encode",
    oracle=f"""
    WITH tk AS (SELECT doc_id, string_split(lower(text), ' ') AS l FROM documents),
    cnt AS (SELECT tok, COUNT(*) AS c
            FROM (SELECT unnest(l) AS tok FROM tk) GROUP BY tok),
    v AS (SELECT tok, row_number() OVER (ORDER BY c DESC, tok) AS id
          FROM cnt ORDER BY c DESC, tok LIMIT {_VOCAB_V}),
    pos AS (SELECT tk.doc_id, u.i, tk.l[u.i] AS tok
            FROM tk, LATERAL (SELECT unnest(generate_series(1, len(tk.l))) AS i) u),
    j AS (SELECT p.doc_id, p.i, COALESCE(v.id, 0) AS id
          FROM pos p LEFT JOIN v ON p.tok = v.tok)
    SELECT doc_id,
           array_to_string(list(id ORDER BY i), '|') AS ids,
           COUNT(*) AS n_tokens,
           CAST(SUM(CASE WHEN id = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
    FROM j GROUP BY doc_id ORDER BY doc_id
    """,
    tags=("text", "pipeline"),
)
def text_vocab_encode(spark, sf_dir):
    """Tokenizer ENCODE: induce a frequency-ranked 500-entry
    vocabulary over the corpus (id = rank, deterministic tie-break on
    token; 0 = OOV) and map every document to its id sequence — the
    step between text cleaning and sequence packing in a training
    pipeline.  Emits the id array plus per-doc token/OOV counts.

    Scale posture (100 TB): the vocab candidates come from ONE
    map-side-combined token count; the top-V pick is a
    TakeOrderedAndProject (parallel, no global sort of the vocabulary)
    and the rank window runs over V rows only.  The encode pass
    broadcasts the vocabulary (tokenizer vocabs are ~10^4-10^5 rows) so
    the per-token id lookup is map-side; the id sequence reassembles
    with ONE per-doc aggregation (sort_array(collect_list(struct(pos,
    id)))) — the same single-shuffle reassembly as dedup_lines.
    """
    docs = t(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), " ")
    vocab = _vocab(docs)
    pos = docs.select("doc_id", F.posexplode(toks).alias("i", "tok"))
    enc = pos.join(F.broadcast(vocab), "tok", "left").select(
        "doc_id", "i", F.coalesce("id", F.lit(0)).alias("id")
    )
    pairs = F.sort_array(F.collect_list(F.struct("i", "id")))
    return (
        enc.groupBy("doc_id")
        .agg(
            jarr(F.transform(pairs, lambda p: p["id"])).alias("ids"),
            F.count("*").alias("n_tokens"),
            F.sum(F.when(F.col("id") == 0, 1).otherwise(0)).cast("bigint").alias("n_oov"),
        )
        .orderBy("doc_id")
    )


_BIGRAM_TOP = 5000  # known-bigram table size for the surprise model


@query(
    "text_bigram_logprob",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS l FROM documents),
    pairs AS (
      SELECT doc_id, unnest([l[i] || ' ' || l[i+1]
                             for i in range(1, len(l))]) AS pair
      FROM toks WHERE len(l) >= 2),
    counts AS (SELECT pair, COUNT(*) AS c FROM pairs GROUP BY pair),
    known AS (SELECT pair, c FROM counts
              ORDER BY c DESC, pair LIMIT {_BIGRAM_TOP}),
    total AS (SELECT CAST(length(printf('%b', CAST(SUM(c) AS BIGINT))) AS INT) AS blt
              FROM counts),
    scored AS (
      SELECT p.doc_id,
             (SELECT blt FROM total)
               - CAST(length(printf('%b', CAST(coalesce(k.c, 1) AS BIGINT))) AS INT)
               AS surprise,
             CASE WHEN k.pair IS NULL THEN 1 ELSE 0 END AS unk
      FROM pairs p LEFT JOIN known k ON p.pair = k.pair)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(unk) AS BIGINT) AS n_unknown,
           CAST(SUM(surprise) AS BIGINT) AS sum_surprise,
           ROUND(SUM(surprise) * 1.0 / COUNT(*), 6) AS mean_surprise
    FROM scored GROUP BY doc_id ORDER BY doc_id
    """,
    tags=("text", "quality", "pipeline"),
)
def text_bigram_logprob(spark, sf_dir):
    """Bigram language-model surprise scoring — the ASSOCIATION-aware
    tier above text_unigram_rarity's frequency model: a doc whose words
    are individually common but adjacently improbable ('the the of и')
    scores high here and passes the unigram filter.  Per adjacent token
    pair, surprise = bitlen(T) − bitlen(c(pair)) — an integer ⌈−log2
    p⌉-style code length (T = total corpus pair occurrences; unknown
    pairs take c=1, the maximum code length) — summed and averaged per
    document.  This is the integer-exact stand-in for KenLM-style
    bigram perplexity filtering: bit lengths come from exact binary
    renderings on BOTH engines (Spark conv(c,10,2), DuckDB
    printf('%b')), so the gate hash-matches where a cross-engine ln()
    would drift in the last ulp.

    Scale posture (100 TB): pairs are a PER-ROW transform of the token
    array (no self-join of the token stream); the bigram count is one
    map-side-combined shuffle; the model is the top-5000 known-bigram
    table (TakeOrdered — a parallel top-k, never a global sort) which
    BROADCASTS into the scoring join; the per-doc aggregation is the
    only other shuffle, keyed on doc_id with map-side combine.  The
    top-K cut is what makes the model broadcastable at any corpus size
    — the full bigram table would be corpus-sized (documented cap, not
    a silent one: unknown pairs are REPORTED per doc as n_unknown).
    """
    docs = t(spark, sf_dir, "documents").select("doc_id", tokens().alias("l"))
    pairs = (
        docs.filter(F.size("l") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(l) - 1),"
                    " i -> concat(element_at(l, i), ' ', element_at(l, i + 1)))"
                )
            ).alias("pair"),
        )
    )
    counts = pairs.groupBy("pair").agg(F.count("*").alias("c"))
    known = counts.orderBy(F.col("c").desc(), "pair").limit(_BIGRAM_TOP)
    blt = counts.agg(
        F.length(F.conv(F.sum("c"), 10, 2)).cast("int").alias("blt")
    )
    scored = (
        pairs.join(F.broadcast(known), "pair", "left")
        .crossJoin(F.broadcast(blt))
        .select(
            "doc_id",
            (
                F.col("blt")
                - F.length(F.conv(F.coalesce("c", F.lit(1)), 10, 2)).cast("int")
            ).alias("surprise"),
            F.when(F.col("c").isNull(), 1).otherwise(0).alias("unk"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.sum("unk").cast("bigint").alias("n_unknown"),
            F.sum("surprise").cast("bigint").alias("sum_surprise"),
            F.round(F.sum("surprise") * 1.0 / F.count("*"), 6).alias(
                "mean_surprise"
            ),
        )
        .orderBy("doc_id")
    )


# --- Cross-doc duplicate-SPAN detection / removal (winnowing + keep-first) --

_WIN_K = 8   # token n-gram width hashed per offset
_WIN_W = 4   # winnowing window (grams per selection window)
# Detection guarantee (Schleimer/Wilkerson/Aiken, SIGMOD'03 winnowing
# theorem): any token run shared verbatim by two documents of length
# >= _WIN_K + _WIN_W - 1 = 11 tokens contributes at least one identical
# selected fingerprint to BOTH documents.

_WINNOW_HS_SQL = f"""
    toks AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS tk
             FROM documents),
    hs AS (SELECT doc_id, tk,
                  list_transform(range(1, len(tk)-{_WIN_K}+2),
                    i -> CAST(('0x' || substr(md5(array_to_string(
                           tk[i:i+{_WIN_K - 1}], ' ')), 1, 15)) AS BIGINT)) AS h
           FROM toks WHERE len(tk) >= {_WIN_K}),
    sel AS (SELECT doc_id,
                   list_distinct(list_transform(
                     range(1, greatest(len(h)-{_WIN_W}+1, 1)+1),
                     j -> list_min(h[j:j+{_WIN_W - 1}]))) AS sels
            FROM hs),
    fp AS (SELECT doc_id, unnest(sels) AS fph FROM sel),
    shared AS (SELECT fph FROM fp GROUP BY fph HAVING min(doc_id) <> max(doc_id))
"""

_TOKS_EXPR = "split(lower(trim(text)), ' ')"

# stride-1 gram-hash projection shared by phase A (detection over the
# whole corpus) and phase B (exact marking over the flagged slice) —
# ONE definition so the two phases can never hash differently
_GRAM_HASH_EXPR = f"""transform(sequence(1, size({_TOKS_EXPR}) - {_WIN_K} + 1),
      i -> cast(conv(substr(md5(concat_ws(' ',
             slice({_TOKS_EXPR}, i, {_WIN_K}))), 1, 15), 16, 10)
           AS BIGINT))"""


def _gram_base(docs):
    """(doc_id, tk, h): token array + stride-1 gram hashes, map-only."""
    return docs.filter(F.expr(f"size({_TOKS_EXPR}) >= {_WIN_K}")).select(
        "doc_id",
        F.expr(_TOKS_EXPR).alias("tk"),
        F.expr(_GRAM_HASH_EXPR).alias("h"),
    )


def _winnow_parts(spark, sf_dir):
    """Shared plumbing: (base, fp, shared) for the winnowed-span family.

    base  = (doc_id, tk, h): per-doc token array + stride-1 8-gram
            60-bit md5-prefix hashes — ONE map-only projection, no shuffle.
    fp    = (doc_id, fph): per-doc DISTINCT winnowed fingerprints
            (density ~2/(W+1) of grams — the corpus-wide shuffle carries
            ~40% of token count, in 8-byte keys, never text).
    shared = fingerprints seen in >= 2 distinct docs, tested with the
            algebraic min(doc_id) <> max(doc_id) (map-side combined; no
            count-distinct state).
    """
    docs = t(spark, sf_dir, "documents")
    base = _gram_base(docs)
    fp = base.select(
        "doc_id",
        F.explode(
            F.expr(
                f"array_distinct(transform(sequence(1, greatest(size(h) - {_WIN_W} + 1, 1)),"
                f" j -> array_min(slice(h, j, {_WIN_W}))))"
            )
        ).alias("fph"),
    )
    # Materialize the fingerprint stream: `shared` aggregates fp AND fp
    # is the probe side of the share-test join — without this the
    # tokenize+md5 subtree (the dominant map cost) runs twice per query.
    from prestodb_presto_spark.operators.materialize import materialize

    fp = materialize(fp, eager=False)
    shared = (
        fp.groupBy("fph")
        .agg(F.min("doc_id").alias("mn"), F.max("doc_id").alias("mx"))
        .filter("mn <> mx")
        .select("fph")
    )
    return base, fp, shared


@query(
    "dedup_spans_winnowed",
    oracle=f"""
    WITH {_WINNOW_HS_SQL}
    SELECT f.doc_id,
           COUNT(*) AS n_sel,
           CAST(SUM(CASE WHEN s.fph IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_shared,
           (SUM(CASE WHEN s.fph IS NOT NULL THEN 1 ELSE 0 END) > 0) AS dup_flag
    FROM fp f LEFT JOIN shared s ON f.fph = s.fph
    GROUP BY f.doc_id ORDER BY doc_id
    """,
    tags=("text", "dedup", "pipeline"),
)
def dedup_spans_winnowed(spark, sf_dir):
    """Cross-document duplicate-SPAN detection via winnowing (MOSS
    fingerprinting; Schleimer et al., SIGMOD'03) — the content-defined
    selection that makes exact-substring dedup (Lee et al., "Deduplicating
    Training Data Makes Language Models Better") tractable distributed:
    positional stride can't align across documents, winnowing can.

    Per doc: stride-1 8-token-gram 60-bit hashes (map-only array
    expression), then one fingerprint per window of 4 consecutive
    gram hashes — the window MIN.  Guarantee: two docs sharing a verbatim
    run of >= 8+4-1 = 11 tokens share a selected
    fingerprint (the shared window's min is selected in both).  Output
    per doc: selected-fingerprint count, corpus-shared count, dup flag.

    At 100 TB: the only corpus-wide shuffle carries (fingerprint, doc_id)
    pairs at ~2/(4+1) ~ 40% token density in 8-byte keys — never
    text; the shared test is the algebraic min<>max (map-side combined);
    the join back is fingerprint-keyed.  No reference counterpart
    (LLM-pipeline surface); detection guarantee property-tested with a
    planted 11-token run in tests/test_text.py.
    """
    _, fp, shared = _winnow_parts(spark, sf_dir)
    return (
        fp.join(shared.withColumn("is_sh", F.lit(1)), "fph", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_sel"),
            F.sum(F.coalesce(F.col("is_sh"), F.lit(0))).cast("bigint").alias("n_shared"),
        )
        .withColumn("dup_flag", F.col("n_shared") > 0)
        .orderBy("doc_id")
    )


@query(
    "dedup_spans_strip",
    oracle=f"""
    WITH {_WINNOW_HS_SQL},
    flagged AS (SELECT DISTINCT f.doc_id FROM fp f JOIN shared s ON f.fph = s.fph),
    grams AS (SELECT h.doc_id, i AS pos, h.h[i] AS gh
              FROM hs h JOIN flagged g ON h.doc_id = g.doc_id
              CROSS JOIN unnest(range(1, len(h.h)+1)) AS u(i)),
    ranked AS (SELECT doc_id, pos,
                      row_number() OVER (PARTITION BY gh ORDER BY doc_id, pos) AS rn
               FROM grams),
    losing AS (SELECT doc_id, list_sort(list(pos)) AS lpos
               FROM ranked WHERE rn > 1 GROUP BY doc_id),
    cleaned AS (SELECT t.doc_id, t.tk, len(t.tk) AS n_tokens,
                       list_filter(range(1, len(t.tk)+1),
                         p -> len(list_filter(l.lpos,
                                i -> i <= p AND p <= i+{_WIN_K}-1)) > 0) AS rmpos
                FROM toks t JOIN losing l ON t.doc_id = l.doc_id)
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(len(rmpos) AS BIGINT) AS n_removed,
           md5(coalesce(array_to_string(
             list_transform(
               list_filter(range(1, len(tk)+1), p -> NOT list_contains(rmpos, p)),
               p -> tk[p]), ' '), '')) AS cleaned_md5
    FROM cleaned ORDER BY doc_id
    """,
    tags=("text", "dedup", "pipeline"),
)
def dedup_spans_strip(spark, sf_dir):
    """Cross-document duplicate-span REMOVAL, keep-first (the ExactSubstr
    step of Lee et al.): every verbatim token run >= 8+4-1
    = 11 tokens duplicated anywhere in the corpus is stripped from all
    but its first occurrence (ordered by (doc_id, position) — also
    collapses within-doc repeats).  Output per affected doc: token count,
    removed-token count, md5 of the cleaned text.

    Two-phase plan (the part that survives 100 TB): phase A winnows the
    corpus to candidate docs (dedup_spans_winnowed's fingerprints — any
    doc participating in a >= 11-token duplicate IS flagged, so phase B
    loses nothing within the guarantee); phase B explodes stride-1 gram
    hashes ONLY for flagged docs (bounded by the dup rate, not corpus
    size), picks each gram hash's keep-first winner with the ALGEBRAIC
    min(struct(doc_id, pos)) — map-side combined, so a boilerplate gram
    in a third of the corpus never becomes a single-task window sort —
    folds losing positions back into a per-doc token mask, and
    reassembles text map-side.  Shared runs SHORTER than 11
    tokens are out of contract (winnowing may not flag them) — exactly
    the length-threshold semantics of the published pipeline.
    """
    _, fp, shared = _winnow_parts(spark, sf_dir)

    flagged = fp.join(shared, "fph").select("doc_id").distinct()
    # Re-project tokens + gram hashes AFTER the flagged-docs join, so
    # phase B's md5 work (the dominant map cost) runs only on the
    # flagged slice — phase A already paid the one full-corpus pass.
    # _gram_base guarantees phases A and B hash identically.
    docs = t(spark, sf_dir, "documents")
    base = _gram_base(docs.join(flagged, "doc_id"))
    grams = base.select("doc_id", F.posexplode("h").alias("p0", "gh")).select(
        "doc_id", (F.col("p0") + 1).alias("pos"), "gh"
    )
    # Keep-first winner per gram hash = min(struct(doc_id, pos)) — an
    # ALGEBRAIC aggregate (map-side combined), deliberately NOT
    # row_number() over (partition by gh): a boilerplate gram present in
    # a third of a 100 TB corpus would make one window partition of
    # billions of rows (single-task sort), while the min-struct collapses
    # it to one row per input partition before the exchange.  Same move
    # as dedup_lines_cross_doc's winner; receipt in
    # tests/test_text.py::test_spans_strip_hot_gram_skew.
    winner = grams.groupBy("gh").agg(
        F.min(F.struct("doc_id", "pos")).alias("w")
    )
    losing = (
        grams.join(winner, "gh")
        .filter((F.col("doc_id") != F.col("w.doc_id")) | (F.col("pos") != F.col("w.pos")))
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("pos")).alias("lpos"))
    )
    return (
        base.join(losing, "doc_id")
        .withColumn(
            "rmpos",
            F.expr(
                f"filter(sequence(1, size(tk)),"
                f" p -> exists(lpos, i -> i <= p AND p <= i + {_WIN_K} - 1))"
            ),
        )
        .select(
            "doc_id",
            F.size("tk").cast("bigint").alias("n_tokens"),
            F.size("rmpos").cast("bigint").alias("n_removed"),
            F.md5(
                F.coalesce(
                    F.expr(
                        "concat_ws(' ', transform(filter(sequence(1, size(tk)),"
                        " p -> NOT array_contains(rmpos, p)), p -> element_at(tk, p)))"
                    ),
                    F.lit(""),
                )
            ).alias("cleaned_md5"),
        )
        .orderBy("doc_id")
    )


@query(
    "text_vocab_decode",
    oracle=f"""
    WITH tk AS (SELECT doc_id, string_split(lower(text), ' ') AS l FROM documents),
    cnt AS (SELECT tok, COUNT(*) AS c
            FROM (SELECT unnest(l) AS tok FROM tk) GROUP BY tok),
    v AS (SELECT tok, row_number() OVER (ORDER BY c DESC, tok) AS id
          FROM cnt ORDER BY c DESC, tok LIMIT {_VOCAB_V}),
    pos AS (SELECT tk.doc_id, u.i, tk.l[u.i] AS tok
            FROM tk, LATERAL (SELECT unnest(generate_series(1, len(tk.l))) AS i) u),
    dec AS (SELECT p.doc_id, p.i,
                   CASE WHEN v.id IS NULL THEN '<unk>' ELSE v.tok END AS out_tok,
                   CASE WHEN v.id IS NULL THEN 1 ELSE 0 END AS unk
            FROM pos p LEFT JOIN v ON p.tok = v.tok)
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(unk) AS BIGINT) AS n_oov,
           md5(array_to_string(list(out_tok ORDER BY i), ' ')) AS decoded_md5
    FROM dec GROUP BY doc_id ORDER BY doc_id
    """,
    tags=("text", "pipeline"),
)
def text_vocab_decode(spark, sf_dir):
    """Tokenizer DECODE — the inverse of text_vocab_encode: map each
    document's id sequence back to tokens (OOV ids render as '<unk>')
    and emit the md5 of the reconstructed text.  Together with encode
    this closes the tokenizer round-trip: decode(encode(x)) == x
    wherever every token is in-vocabulary (property-tested in
    tests/test_text.py), and degrades to '<unk>' markers exactly where
    encode emitted id 0.

    Scale posture (100 TB): identical to encode — the id->token table
    is the SAME broadcast vocabulary (inverse lookup joins on id
    instead of token); reconstruction is one per-doc
    sort_array(collect_list) aggregation.  No new shuffle shape.
    """
    docs = t(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), " ")
    vocab = _vocab(docs)
    pos = docs.select("doc_id", F.posexplode(toks).alias("i", "tok"))
    dec = pos.join(F.broadcast(vocab), "tok", "left").select(
        "doc_id",
        "i",
        F.when(F.col("id").isNull(), "<unk>").otherwise(F.col("tok")).alias("out_tok"),
        F.when(F.col("id").isNull(), 1).otherwise(0).alias("unk"),
    )
    pairs = F.sort_array(F.collect_list(F.struct("i", "out_tok")))
    return (
        dec.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("unk").cast("bigint").alias("n_oov"),
            F.md5(F.concat_ws(" ", F.transform(pairs, lambda p: p["out_tok"]))).alias(
                "decoded_md5"
            ),
        )
        .orderBy("doc_id")
    )


@query(
    "corpus_snapshot_diff",
    oracle="""
    WITH v1 AS (SELECT doc_id, source, n_chars, md5(text) AS h FROM documents),
    v2 AS (
      SELECT doc_id, source, n_chars,
             CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))
                       AS BIGINT) % 20 = 1
                  THEN md5(text || ' [rev2]') ELSE md5(text) END AS h
      FROM documents
      WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))
                 AS BIGINT) % 20 <> 0
      UNION ALL
      SELECT doc_id + 1000000000, source, n_chars, md5(text || ' [new]')
      FROM documents
      WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))
                 AS BIGINT) % 20 = 2),
    d AS (SELECT COALESCE(v1.source, v2.source) AS source,
                 CASE WHEN v1.doc_id IS NULL THEN 'added'
                      WHEN v2.doc_id IS NULL THEN 'removed'
                      WHEN v1.h <> v2.h THEN 'changed'
                      ELSE 'unchanged' END AS status,
                 COALESCE(v1.n_chars, 0) AS c1, COALESCE(v2.n_chars, 0) AS c2
          FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id)
    SELECT source, status, COUNT(*) AS n_docs,
           CAST(SUM(c2) - SUM(c1) AS BIGINT) AS chars_delta
    FROM d GROUP BY source, status ORDER BY source, status
    """,
    tags=("pipeline",),
)
def corpus_snapshot_diff(spark, sf_dir):
    """Corpus version diff — the audit every curation round needs before
    retraining: given snapshot v1 and v2 of the corpus, classify every
    document added / removed / changed / unchanged by content hash and
    account the size delta per source.  (v2 here is derived
    deterministically from the fixture — ~5% of docs removed, ~5%
    rewritten, ~5% re-keyed as new — so both engines build the identical
    snapshot pair.)

    Scale posture (100 TB): content hashing is map-only on both sides;
    the FULL OUTER JOIN shuffles (doc_id, 16-byte hash, source, length)
    pairs — never document bodies; the status rollup is one
    map-side-combined aggregate.  Two snapshots of the corpus are read
    exactly once each.
    """
    docs = t(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13), 16, 10
        ).cast("bigint")
        % 20
    )
    v1 = docs.select("doc_id", "source", "n_chars", F.md5("text").alias("h"))
    v2 = (
        docs.filter(bucket != 0)
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.when(bucket == 1, F.md5(F.concat(F.col("text"), F.lit(" [rev2]"))))
            .otherwise(F.md5("text"))
            .alias("h"),
        )
        .unionAll(
            docs.filter(bucket == 2).select(
                (F.col("doc_id") + 1000000000).alias("doc_id"),
                "source",
                "n_chars",
                F.md5(F.concat(F.col("text"), F.lit(" [new]"))).alias("h"),
            )
        )
    )
    j = v1.alias("a").join(
        v2.alias("b"), F.col("a.doc_id") == F.col("b.doc_id"), "full_outer"
    )
    status = (
        F.when(F.col("a.doc_id").isNull(), "added")
        .when(F.col("b.doc_id").isNull(), "removed")
        .when(F.col("a.h") != F.col("b.h"), "changed")
        .otherwise("unchanged")
    )
    return (
        j.select(
            F.coalesce(F.col("a.source"), F.col("b.source")).alias("source"),
            status.alias("status"),
            F.coalesce(F.col("a.n_chars"), F.lit(0)).alias("c1"),
            F.coalesce(F.col("b.n_chars"), F.lit(0)).alias("c2"),
        )
        .groupBy("source", "status")
        .agg(
            F.count("*").alias("n_docs"),
            (F.sum("c2") - F.sum("c1")).cast("bigint").alias("chars_delta"),
        )
        .orderBy("source", "status")
    )


_QLIN_D = 1024  # hashed feature buckets


@query(
    "text_quality_linear",
    oracle=f"""
    WITH w AS (SELECT i AS bucket,
                      CAST(('0x' || substr(md5('w' || CAST(i AS VARCHAR)), 1, 13))
                           AS BIGINT) % 2001 - 1000 AS wt
               FROM (SELECT unnest(range(0, {_QLIN_D})) AS i)),
    tk AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS l FROM documents),
    feats AS (
      SELECT doc_id, unnest(l || [l[i] || '_' || l[i+1] for i in range(1, len(l))]) AS f
      FROM tk),
    b AS (SELECT doc_id,
                 CAST(('0x' || substr(md5(f), 1, 13)) AS BIGINT) % {_QLIN_D} AS bucket
          FROM feats)
    SELECT b.doc_id,
           COUNT(*) AS n_feats,
           CAST(SUM(w.wt) AS BIGINT) AS score,
           (SUM(w.wt) > 0) AS keep
    FROM b JOIN w ON b.bucket = w.bucket
    GROUP BY b.doc_id ORDER BY b.doc_id
    """,
    tags=("text", "pipeline"),
)
def text_quality_linear(spark, sf_dir):
    """Model-based quality filtering: linear-classifier INFERENCE over
    hashed unigram+bigram features (the fastText-style scorer used to
    filter CommonCrawl against a high-quality reference corpus) — the
    learned complement to the heuristic rule pack (text_quality_rules),
    rarity (text_unigram_rarity) and bigram-LM (text_bigram_logprob)
    tiers.  Per doc: feature count, integer margin score, keep verdict.

    The 1024-bucket weight table here is derived deterministically from
    md5(bucket) (integers in [-1000, 1000]) so both engines build the
    identical "model"; a real trained model ships as exactly such a
    (bucket, weight) table — the plumbing below is what inference looks
    like either way.

    At 100 TB: featurization (unigrams + in-row bigram pairing) is a
    per-row array expression, bucketing is map-side md5 arithmetic, and
    the model joins as a BROADCAST table (fastText-class models are
    ~10^5-10^7 buckets, megabytes); the only shuffle is the per-doc
    score aggregation — map-side combined.  No Python anywhere.
    """
    docs = t(spark, sf_dir, "documents")
    weights = spark.range(_QLIN_D).select(
        F.col("id").alias("bucket"),
        (
            F.conv(F.substring(F.md5(F.concat(F.lit("w"), F.col("id").cast("string"))), 1, 13), 16, 10)
            .cast("bigint")
            % 2001
            - 1000
        ).alias("wt"),
    )
    l = F.split(F.lower(F.trim(F.col("text"))), " ")
    bigrams = F.expr(
        "CASE WHEN size(l) >= 2 THEN transform(sequence(1, size(l) - 1),"
        " i -> concat(element_at(l, i), '_', element_at(l, i + 1)))"
        " ELSE slice(l, 1, 0) END"
    )
    feats = (
        docs.select("doc_id", l.alias("l"))
        .select("doc_id", F.explode(F.concat(F.col("l"), bigrams)).alias("f"))
    )
    b = feats.select(
        "doc_id",
        (F.conv(F.substring(F.md5("f"), 1, 13), 16, 10).cast("bigint") % _QLIN_D).alias("bucket"),
    )
    return (
        b.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_feats"),
            F.sum("wt").cast("bigint").alias("score"),
            (F.sum("wt") > 0).alias("keep"),
        )
        .orderBy("doc_id")
    )


# Shared by dedup_incremental (index derived in-query) and
# dedup_incremental_persisted (index materialized through the engine's
# writer): both compute the exact cross-corpus Jaccard >= 0.8 pair set.
_INCR_DEDUP_ORACLE = f"""
    WITH bkt AS (SELECT doc_id, text,
                        CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))
                             AS BIGINT) % 20 AS b
                 FROM documents),
    old AS (SELECT doc_id, text FROM bkt WHERE b <> 2),
    new AS (SELECT doc_id + 1000000000 AS doc_id, text || ' appendix terms' AS text
            FROM bkt WHERE b = 3
            UNION ALL
            SELECT doc_id + 2000000000,
                   array_to_string(list_reverse(string_split(text, ' ')), ' ')
            FROM bkt WHERE b = 2),
    sn AS (SELECT doc_id AS new_id,
                  (SELECT {SHINGLES3_SQL.replace("l[", "ll[").replace("len(l)", "len(ll)")}
                   FROM (SELECT string_split(new.text, ' ') AS ll)) AS s
           FROM new),
    so AS (SELECT doc_id AS old_id,
                  (SELECT {SHINGLES3_SQL.replace("l[", "ll[").replace("len(l)", "len(ll)")}
                   FROM (SELECT string_split(old.text, ' ') AS ll)) AS s
           FROM old),
    tn AS (SELECT new_id, len(s) AS sz, unnest(s) AS w FROM sn),
    tk AS (SELECT old_id, len(s) AS sz, unnest(s) AS w FROM so),
    inter AS (SELECT tn.new_id, tk.old_id, tn.sz AS sz_n, tk.sz AS sz_o,
                     COUNT(*) AS c
              FROM tn JOIN tk ON tn.w = tk.w
              GROUP BY tn.new_id, tk.old_id, tn.sz, tk.sz)
    SELECT new_id, old_id,
           ROUND(c * 1.0 / (sz_n + sz_o - c), 6) AS jaccard
    FROM inter WHERE c * 1.0 / (sz_n + sz_o - c) >= 0.8
    ORDER BY new_id, old_id
    """


def _incr_dedup_fixture(spark, sf_dir):
    """(new, old) fixture shared by both incremental-dedup gates: the new
    batch is ~5% perturbed copies of docs that remain in the corpus
    (near-dups the index must catch) plus ~5% reversed-token rewrites
    (shingle-disjoint, must NOT match)."""
    docs = t(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13), 16, 10)
        .cast("bigint")
        % 20
    )
    old = docs.filter(bucket != 2).select("doc_id", "text")
    new = docs.filter(bucket == 3).select(
        (F.col("doc_id") + 1000000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" appendix terms")).alias("text"),
    ).unionAll(
        docs.filter(bucket == 2).select(
            (F.col("doc_id") + 2000000000).alias("doc_id"),
            F.concat_ws(" ", F.reverse(F.split(F.col("text"), " "))).alias("text"),
        )
    )
    return new, old


@query(
    "dedup_incremental",
    oracle=_INCR_DEDUP_ORACLE,
    tags=("text", "dedup", "approximate", "pipeline"),
)
def dedup_incremental(spark, sf_dir):
    """Incremental-ingestion dedup: check a NEW batch of documents
    against the EXISTING corpus without re-deduplicating the corpus —
    the pattern a continuously-fed 100 TB pipeline actually runs (the
    corpus side's LSH band buckets persist between batches as the dedup
    INDEX; each arriving batch shingles/signs only itself and equi-joins
    its buckets against the index).  The fixture derives both sides
    deterministically: the new batch is ~5% perturbed copies of docs that
    REMAIN in the corpus (near-dups the index must catch) plus ~5%
    reversed-token rewrites (shingle-disjoint, must NOT match).

    Verified output = the exact cross-corpus Jaccard >= 0.8 pair set
    (banding at r=2/b=32 catches J >= 0.8 with prob ~1-1e-13), which is
    what the oracle computes exactly.  At 100 TB: the index join
    shuffles (band-hash, id) keys only — batch-sized, not corpus-sized;
    exact verification touches candidates only.
    """
    from prestodb_presto_spark.text.minhash import incremental_near_dup_pairs

    new, old = _incr_dedup_fixture(spark, sf_dir)
    # bucket_cap=None in the GATED form: the oracle computes the exact
    # all-pairs J>=0.8 set, which the index-side cap does not model — a
    # hot band bucket at a larger fixture would be a deterministic
    # recall miss that fails the gate instead of the query.  Production
    # callers keep the default cap (minhash.DEFAULT_BUCKET_CAP).
    return (
        incremental_near_dup_pairs(new, old, threshold=0.8, bucket_cap=None)
        .select("new_id", "old_id", F.round("jaccard", 6).alias("jaccard"))
        .orderBy("new_id", "old_id")
    )


@query(
    "dedup_incremental_persisted",
    oracle=_INCR_DEDUP_ORACLE,
    tags=("text", "dedup", "approximate", "pipeline"),
)
def dedup_incremental_persisted(spark, sf_dir):
    """The PRODUCTION shape of incremental dedup: the corpus's LSH
    band-bucket index is materialized through the engine's own writer
    (sources/io.write_table — bucketed by band hash, the Hive-bucketing
    analog of SURVEY §2.2), then the arriving batch is checked against
    the STORED table with minhash.check_batch — batch N+1 reuses batch
    N's artifact; the corpus text is touched only for the candidate
    slice during exact verification.  Same fixture and exact oracle as
    `dedup_incremental`, so the gate proves the persisted round-trip is
    lossless: write index → fresh catalog read → identical pair set.

    At 100 TB: the index is 32×16 bytes per corpus document, written
    once per snapshot; the nightly check shuffles only the batch's band
    rows (the index reads pre-bucketed on the join key).
    """
    from prestodb_presto_spark.sources.io import drop_table
    from prestodb_presto_spark.text.minhash import check_batch, write_dedup_index

    new, old = _incr_dedup_fixture(spark, sf_dir)
    tbl = "dedup_lsh_index"
    drop_table(spark, tbl)  # clears stale cross-session warehouse dirs too
    write_dedup_index(old, tbl)
    index = spark.table(tbl)
    # bucket_cap=None for the same reason as dedup_incremental: the
    # oracle is the exact all-pairs set
    return (
        check_batch(new, index, old, threshold=0.8, bucket_cap=None)
        .select("new_id", "old_id", F.round("jaccard", 6).alias("jaccard"))
        .orderBy("new_id", "old_id")
    )


@query(
    "text_contamination_report",
    oracle="""
    WITH p AS (
      SELECT DISTINCT substr(text, 11, 12) AS passage
      FROM documents WHERE doc_id % 37 = 0 AND length(text) >= 50),
    corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 37 <> 0),
    hits AS (
      SELECT p.passage, c.doc_id
      FROM p JOIN corpus c ON position(p.passage IN c.text) > 0),
    agg AS (SELECT passage, COUNT(*) AS n FROM hits GROUP BY passage)
    SELECT p.passage,
           CAST(COALESCE(a.n, 0) AS BIGINT) AS n_corpus_docs,
           (COALESCE(a.n, 0) > 0) AS contaminated
    FROM p LEFT JOIN agg a ON p.passage = a.passage
    ORDER BY p.passage
    """,
    tags=("pipeline", "decontamination"),
)
def text_contamination_report(spark, sf_dir):
    """Eval-side contamination report — the inverse view of
    decontaminate_exact_passage: for every EVAL passage, how many corpus
    documents contain it verbatim (zero-hit passages included).  This is
    the audit you run BEFORE trusting a benchmark number: a per-item
    contamination table, not just a corpus-side drop list.

    At 100 TB: the eval set broadcasts (it is always tiny relative to
    the corpus); the scan is one map-only pass with instr() in
    whole-stage codegen; per-passage counts combine map-side; the final
    LEFT join back to the passage list preserves clean items and runs
    over eval-set-sized data.
    """
    docs = t(spark, sf_dir, "documents")
    passages = (
        docs.filter((F.col("doc_id") % 37 == 0) & (F.length("text") >= 50))
        .select(F.substring("text", 11, 12).alias("passage"))
        .distinct()
    )
    corpus = docs.filter(F.col("doc_id") % 37 != 0)
    hits = (
        corpus.join(F.broadcast(passages), F.instr(F.col("text"), F.col("passage")) > 0)
        .groupBy("passage")
        .agg(F.count("*").alias("n"))
    )
    return (
        passages.join(hits, "passage", "left")
        .select(
            "passage",
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_corpus_docs"),
            (F.coalesce(F.col("n"), F.lit(0)) > 0).alias("contaminated"),
        )
        .orderBy("passage")
    )


_BLOCKLIST = ("slow", "error", "drop")  # the C4-style bad-terms list


@query(
    "text_blocklist_filter",
    oracle=f"""
    WITH tk AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS l
                FROM documents),
    f AS (SELECT doc_id,
                 len(l) AS n_tokens,
                 len(list_filter(l, x -> list_contains({list(_BLOCKLIST)!r}, x)))
                   AS n_blocked,
                 COALESCE(array_to_string(list_sort(list_distinct(
                   list_filter(l, x -> list_contains({list(_BLOCKLIST)!r}, x)))), '|'),
                          '') AS blocked_terms
          FROM tk)
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_blocked AS BIGINT) AS n_blocked, blocked_terms,
           (n_blocked * 20 <= n_tokens) AS keep
    FROM f ORDER BY doc_id
    """,
    tags=("text", "pipeline"),
)
def text_blocklist_filter(spark, sf_dir):
    """Blocklist term filtering (the C4 'bad words' pass): per document,
    how many tokens hit the blocklist, which distinct terms, and a keep
    verdict (blocked fraction <= 5%, tested as the integer inequality
    n_blocked * 20 <= n_tokens so no float ratio crosses the engine
    boundary).

    At 100 TB: the blocklist folds into the filter lambda as a literal
    array (real lists of ~10^3 terms broadcast the same way the quality
    model does); counting and term extraction are per-row array
    expressions in codegen — zero shuffles except the output sort.
    """
    docs = t(spark, sf_dir, "documents")
    lst = ", ".join(f"'{w}'" for w in _BLOCKLIST)
    l = f"split(lower(trim(text)), ' ')"
    blocked = f"filter({l}, x -> array_contains(array({lst}), x))"
    return docs.select(
        "doc_id",
        F.expr(f"size({l})").cast("bigint").alias("n_tokens"),
        F.expr(f"size({blocked})").cast("bigint").alias("n_blocked"),
        F.expr(
            f"array_join(array_sort(array_distinct({blocked})), '|')"
        ).alias("blocked_terms"),
        F.expr(f"size({blocked}) * 20 <= size({l})").alias("keep"),
    ).orderBy("doc_id")


_SH_LL = SHINGLES3_SQL.replace("l[", "ll[").replace("len(l)", "len(ll)")

_REFRESH_ORACLE = f"""
    WITH bkt AS (SELECT doc_id, source, text,
                        CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))
                             AS BIGINT) % 20 AS b
                 FROM documents),
    incoming AS (
      SELECT doc_id, source, text || ' [rev2]' AS text FROM bkt WHERE b = 1
      UNION ALL
      SELECT doc_id + 1000000000 AS doc_id, source, text || ' [new]' AS text
      FROM bkt WHERE b = 2),
    corpus AS (SELECT doc_id, source, text FROM bkt WHERE b NOT IN (0, 1)),
    si AS (SELECT doc_id AS new_id,
                  (SELECT {_SH_LL}
                   FROM (SELECT string_split(incoming.text, ' ') AS ll)) AS s
           FROM incoming),
    sc AS (SELECT doc_id AS old_id,
                  (SELECT {_SH_LL}
                   FROM (SELECT string_split(corpus.text, ' ') AS ll)) AS s
           FROM corpus),
    ti AS (SELECT new_id, len(s) AS sz, unnest(s) AS w FROM si),
    tc AS (SELECT old_id, len(s) AS sz, unnest(s) AS w FROM sc),
    pairs AS (SELECT ti.new_id, tc.old_id, ti.sz AS szn, tc.sz AS szo,
                     COUNT(*) AS c
              FROM ti JOIN tc ON ti.w = tc.w
              GROUP BY ti.new_id, tc.old_id, ti.sz, tc.sz),
    dup AS (SELECT DISTINCT new_id FROM pairs
            WHERE c * 1.0 / (szn + szo - c) >= 0.8),
    survivors AS (SELECT * FROM incoming
                  WHERE doc_id NOT IN (SELECT new_id FROM dup)),
    {_keep_flags_sql("survivors")},
    kept AS (SELECT q.doc_id
             FROM q JOIN firsts f ON q.h = f.h
             WHERE flag_quality AND flag_lang AND flag_no_pii
               AND q.doc_id = f.first_doc),
    final AS (SELECT s.source, length(s.text) AS nc,
                     CAST(('0x' || substr(md5(CAST(s.doc_id AS VARCHAR)), 1, 13))
                          AS BIGINT) % 100 AS bucket
              FROM survivors s JOIN kept k ON s.doc_id = k.doc_id)
    SELECT source,
           CASE WHEN bucket < 96 THEN 'train'
                WHEN bucket < 98 THEN 'valid' ELSE 'test' END AS split,
           COUNT(*) AS n_docs, CAST(SUM(nc) AS BIGINT) AS n_chars
    FROM final GROUP BY source, split ORDER BY source, split
"""


@query(
    "pipeline_incremental_refresh",
    oracle=_REFRESH_ORACLE,
    tags=("pipeline", "dedup", "quality", "sampling"),
)
def pipeline_incremental_refresh(spark, sf_dir):
    """The nightly incremental-ingest loop, composed END-TO-END from the
    catalog's own lifecycle stages: snapshot-diff the corpus (v2 derives
    deterministically from the fixture: 5% removed, 5% rewritten, 5%
    new — the corpus_snapshot_diff derivation), take the changed+added
    slice as the arriving batch, dedup it against the unchanged corpus
    (minhash.check_batch semantics, exact-oracle form), apply the
    pipeline_keep quality/language/PII/first-copy verdict to the
    survivors, and account the accepted documents per (source,
    train/valid/test holdout split) — the sample_split_holdout stage.

    At 100 TB each stage keeps its audited posture: diff classification
    is map-only hashing; the batch-vs-corpus LSH join shuffles band keys
    only (batch-sized); keep flags are per-row expressions with one
    algebraic first-copy aggregation over the BATCH (not the corpus);
    the split rollup is map-side combined to <= 3 x sources rows.  The
    corpus itself is scanned once for the index derivation and once for
    the candidate-slice verification — never shuffled whole.
    """
    from prestodb_presto_spark.text.minhash import incremental_near_dup_pairs

    docs = t(spark, sf_dir, "documents")
    b20 = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13), 16, 10)
        .cast("bigint")
        % 20
    )
    incoming = (
        docs.filter(b20 == 1)
        .select(
            "doc_id", "source",
            F.concat(F.col("text"), F.lit(" [rev2]")).alias("text"),
        )
        .unionAll(
            docs.filter(b20 == 2).select(
                (F.col("doc_id") + 1000000000).alias("doc_id"),
                "source",
                F.concat(F.col("text"), F.lit(" [new]")).alias("text"),
            )
        )
    )
    corpus = docs.filter(~b20.isin(0, 1)).select("doc_id", "source", "text")
    # exact-oracle form: uncapped, same reasoning as dedup_incremental
    dups = (
        incremental_near_dup_pairs(incoming, corpus, threshold=0.8, bucket_cap=None)
        .select(F.col("new_id").alias("doc_id"))
        .distinct()
    )
    survivors = incoming.join(dups, "doc_id", "left_anti")
    kept = _keep_flag_frame(survivors.select("doc_id", "text")).filter("keep").select("doc_id")
    final = survivors.join(kept, "doc_id")
    b100 = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13), 16, 10)
        .cast("bigint")
        % 100
    )
    split = F.when(b100 < 96, "train").when(b100 < 98, "valid").otherwise("test")
    return (
        final.groupBy("source", split.alias("split"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length("text")).cast("bigint").alias("n_chars"),
        )
        .orderBy("source", "split")
    )
