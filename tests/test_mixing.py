"""Training-mix operators: temperature sampling, length binning (and its
two-pass scale twin), BPE pair counts, and k-means SemDeDup properties
the differential gate can't see (plan shape, invariants, scale-twin
consistency)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_TINY


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_temperature_rates_and_invariants(spark):
    from prestodb_presto_spark.queries.mixing import sample_temperature_mix
    from prestodb_presto_spark.queries.util import t

    out = sample_temperature_mix(spark, SF_TINY).collect()
    docs = t(spark, SF_TINY, "documents")
    counts = {r["lang"]: r["c"] for r in docs.groupBy("lang").agg(F.count("*").alias("c")).collect()}
    min_c = min(counts.values())
    kept = {}
    rates = {}
    for r in out:
        kept[r["lang"]] = kept.get(r["lang"], 0) + 1
        rates[r["lang"]] = r["rate"]
    # the rarest language keeps every row at rate 1.0
    rare = min(counts, key=lambda s: (counts[s], s))
    assert rates[rare] == 1.0
    assert kept[rare] == counts[rare]
    # every rate is sqrt(min_c / c) rounded to 6
    for s, c in counts.items():
        if s in rates:
            assert rates[s] == round((min_c / c) ** 0.5, 6)
    # sampled counts respect the rate within binomial noise (loose 5-sigma)
    for s, c in counts.items():
        rate = (min_c / c) ** 0.5
        mu, sigma = c * rate, max(1.0, (c * rate * (1 - rate)) ** 0.5)
        assert abs(kept.get(s, 0) - mu) <= 5 * sigma + 1


def test_temperature_mix_plan_is_broadcast_only(spark):
    from prestodb_presto_spark.queries.mixing import sample_temperature_mix

    plan = _plan(sample_temperature_mix(spark, SF_TINY))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # the corpus side must not shuffle before the filter: no SortMergeJoin
    assert "SortMergeJoin" not in plan


def test_quality_bins_scale_twin_consistency(spark):
    from prestodb_presto_spark.queries.mixing import corpus_length_bins, quality_bins_scale
    from prestodb_presto_spark.queries.util import t

    docs = t(spark, SF_TINY, "documents")
    exact = corpus_length_bins(spark, SF_TINY).collect()
    stats, cuts = quality_bins_scale(docs, "n_chars")
    rows = stats.collect()
    # cutoffs strictly ordered (monotone non-decreasing)
    assert cuts == sorted(cuts)
    # total count preserved and bins ordered by value range
    assert sum(r["n"] for r in rows) == docs.count()
    assert sum(r["n"] for r in exact) == docs.count()
    ordered = sorted(rows, key=lambda r: r["bin"])
    for lo, hi in zip(ordered, ordered[1:]):
        assert lo["max_n_chars"] <= hi["min_n_chars"]
    # the scale twin must not use a global window (no single-task sort)
    assert "Window" not in _plan(stats)


def test_bpe_pair_counts_deterministic_and_ordered(spark):
    from prestodb_presto_spark.queries.textops import text_bpe_pair_counts

    a = text_bpe_pair_counts(spark, SF_TINY).collect()
    b = text_bpe_pair_counts(spark, SF_TINY).collect()
    assert a == b
    counts = [r["cnt"] for r in a]
    assert counts == sorted(counts, reverse=True)
    assert len(a) <= 20 and all(" " in r["pair"] for r in a)


def test_kmeans_semdedup_partition_invariants(spark):
    from prestodb_presto_spark.queries.similarity_q import similarity_kmeans_semdedup
    from prestodb_presto_spark.queries.util import t

    rows = similarity_kmeans_semdedup(spark, SF_TINY).collect()
    total = t(spark, SF_TINY, "embeddings").count()
    # clusters partition the corpus: member counts sum to the total
    assert sum(r["n_members"] for r in rows) == total
    for r in rows:
        assert 0 <= r["n_dropped"] <= r["n_dup_pairs"]
        assert r["n_dropped"] < r["n_members"] or r["n_members"] == 0
    # seed centroids are their own nearest centroid => every seed cluster exists
    assert {r["cluster_id"] for r in rows} <= set(range(8))


def test_kmeans_semdedup_assignment_is_broadcast(spark):
    from prestodb_presto_spark.queries.similarity_q import similarity_kmeans_semdedup

    plan = _plan(similarity_kmeans_semdedup(spark, SF_TINY))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_quality_bins_scale_under_zipf_skew(spark):
    """The two-pass cutoff binning must stay usable on a heavily skewed
    length distribution (zipf-ish): counts preserved, bins ordered, and
    no bin grabs the whole corpus unless the VALUE distribution forces
    it (ties land in one bin by design)."""
    from pyspark.sql import functions as F

    from prestodb_presto_spark.queries.mixing import quality_bins_scale

    n = 20_000
    df = spark.range(n).select(
        (F.floor(F.lit(1000.0) / (F.col("id") % 997 + 1))).cast("bigint").alias("n_chars")
    )
    stats, cuts = quality_bins_scale(df, "n_chars")
    rows = sorted(stats.collect(), key=lambda r: r["bin"])
    assert sum(r["n"] for r in rows) == n
    assert cuts == sorted(cuts)
    for lo, hi in zip(rows, rows[1:]):
        assert lo["max_n_chars"] <= hi["min_n_chars"]
    # the dominant tie value (floor(1000/k) == 1 for k >= 501, ~half the
    # corpus) must land in exactly ONE bin — value-consistency
    one_bins = [r for r in rows if r["min_n_chars"] <= 1 <= r["max_n_chars"]]
    assert len(one_bins) == 1


def test_waterfill_invariants(spark):
    """mix_budget_waterfill: allocations never exceed availability, the
    budget is met up to integer-division remainder (< #uncapped
    sources), and capped sources are exactly those fully consumed."""
    from tests.conftest import SF_TINY

    from prestodb_presto_spark.queries.mixing import mix_budget_waterfill
    from prestodb_presto_spark.queries.util import t

    rows = mix_budget_waterfill(spark, SF_TINY).collect()
    total_avail = sum(r["avail"] for r in rows)
    budget = total_avail // 2
    allocated = sum(r["alloc"] for r in rows)
    n_uncapped = sum(1 for r in rows if r["alloc"] < r["avail"])
    assert all(0 <= r["alloc"] <= r["avail"] for r in rows)
    assert budget - n_uncapped < allocated <= budget, (allocated, budget)
    # uncapped allocations are weight-proportional: alloc/w equal up to
    # the floor (within 1 per unit weight)
    lam = [
        (r["alloc"], r["w"]) for r in rows if r["alloc"] < r["avail"]
    ]
    if len(lam) >= 2:
        ratios = [a / w for a, w in lam]
        assert max(ratios) - min(ratios) <= 1.0, ratios
