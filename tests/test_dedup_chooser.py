"""Stats-driven exact-Jaccard strategy chooser (VERDICT r7 item 4).

The round-7 sweep's apparent 40x prefix/inverted crossover was
adjudicated in round 8 as a HEAP artifact (the 20x inverted run was
spill-bound at the default heap; the 40x run had 48g), and the fix is
a chooser that picks the formulation from corpus statistics rather
than a hardcoded preference. These tests pin the decision rule.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from elb_log_to_mysql_spark.operators import dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_small_corpus_chooses_inverted(spark):
    """Low candidate volume -> inverted index (lower constant factors:
    no frequency join, no rank window, no candidate dedup)."""
    rows = [(i, f"alpha beta gamma delta {i} epsilon zeta") for i in range(50)]
    strategy, stats = dedup.choose_jaccard_strategy(_docs(spark, rows))
    assert strategy == "inverted"
    assert stats["est_pairs"] <= stats["pair_budget"]
    assert not stats["skew_limited"]


def test_volume_over_budget_chooses_prefix(spark):
    """est_pairs above the shuffle budget -> prefix filtering. The
    budget is the knob (per-core), so the test pins the comparison,
    not a magic corpus size."""
    rows = [(i, f"alpha beta gamma delta {i % 5} epsilon") for i in range(60)]
    strategy, stats = dedup.choose_jaccard_strategy(
        _docs(spark, rows), pair_budget_per_core=1
    )
    assert strategy == "prefix"
    assert stats["est_pairs"] > stats["pair_budget"]


def test_posting_list_skew_forces_prefix(spark):
    """A single boilerplate shingle shared by every document
    concentrates d^2/2 candidate rows on ONE join key — prefix must
    win on the skew guard even when TOTAL volume is under budget."""
    boiler = "all rights reserved worldwide"
    rows = [(i, f"{boiler} unique tail {i} x{i} y{i}") for i in range(500)]
    strategy, stats = dedup.choose_jaccard_strategy(
        _docs(spark, rows), skew_budget=10_000
    )
    assert strategy == "prefix"
    assert stats["skew_limited"]
    assert stats["max_df"] >= 500  # the boilerplate shingle's df


def test_auto_output_equals_both_twins(spark):
    """Whatever the chooser picks, the pair set is the twins' common
    output — the lossless-choice contract the oracle certifies."""
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "completely different text with no overlap here at all"),
        (4, "the quick brown fox jumps over the lazy dog"),
    ]
    docs = _docs(spark, rows)
    want = {
        (r.doc_id_a, r.doc_id_b, round(r.jaccard, 9))
        for r in dedup.ngram_jaccard_pairs(docs).collect()
    }
    assert want == {
        (r.doc_id_a, r.doc_id_b, round(r.jaccard, 9))
        for r in dedup.ngram_jaccard_pairs_prefix(docs).collect()
    }
    for budget in (1, 10**9):  # force each strategy through the auto path
        got = {
            (r.doc_id_a, r.doc_id_b, round(r.jaccard, 9))
            for r in dedup.ngram_jaccard_pairs_auto(
                docs, pair_budget_per_core=budget
            ).collect()
        }
        assert got == want


def test_est_pairs_is_exact_join_volume(spark):
    """The probe's Σ df·(df−1)/2 must equal the ACTUAL row count the
    inverted self-join would emit (before the a<b halving, which the
    estimate and the join apply consistently): pin it by computing
    the join volume directly on a small corpus."""
    rows = [(i, f"shared trigram text plus unique {i} tail") for i in range(8)]
    docs = _docs(spark, rows)
    _, stats = dedup.choose_jaccard_strategy(docs)
    sh = docs.select(
        "doc_id",
        F.explode(dedup.word_shingles("text", 3)).alias("s"),
    ).select("doc_id", F.xxhash64("s").alias("shingle"))
    a = sh.select(F.col("doc_id").alias("a"), "shingle")
    b = sh.select(F.col("doc_id").alias("b"), "shingle")
    actual = a.join(b, "shingle").filter("a < b").count()
    assert stats["est_pairs"] == actual


def test_default_budget_derives_from_runtime_heap(spark):
    """With no explicit override the pair budget must be the live
    JVM's max heap / 32 B-per-pair (JACCARD_CROSSOVER_r08
    calibration) — a constant tuned on a 48 g box must not wave a
    556M-pair corpus through on an 8 g host, where the inverted
    index is measurably UNSTABLE, not just slower."""
    rows = [(i, f"alpha beta gamma delta {i} epsilon zeta") for i in range(20)]
    _, stats = dedup.choose_jaccard_strategy(_docs(spark, rows))
    jvm_heap = int(
        spark.sparkContext._jvm.Runtime.getRuntime().maxMemory()
    )
    assert stats["budget_source"] == "heap-derived"
    assert stats["heap_bytes"] == jvm_heap
    assert stats["pair_budget"] == jvm_heap // dedup._HEAP_BYTES_PER_PAIR
    # explicit override keeps the legacy per-core semantics
    _, stats = dedup.choose_jaccard_strategy(
        _docs(spark, rows), pair_budget_per_core=7
    )
    assert stats["budget_source"] == "explicit"
    assert (
        stats["pair_budget"]
        == 7 * spark.sparkContext.defaultParallelism
    )


def test_mem_string_parser():
    assert dedup._parse_jvm_mem("48g") == 48 << 30
    assert dedup._parse_jvm_mem("512m") == 512 << 20
    assert dedup._parse_jvm_mem("8192k") == 8192 << 10
    assert dedup._parse_jvm_mem("1073741824") == 1 << 30
    assert dedup._parse_jvm_mem("1.5g") == int(1.5 * (1 << 30))


def test_sublinear_heap_model_brackets_the_measured_anchors():
    """The cluster-sizing formula (VERDICT r9 item 7) must reproduce
    the three calibration anchors' observed regimes:
    JACCARD_CROSSOVER_r08's 8 GiB cliff at 556M pairs, the 48 GiB
    cliff edge at 2.23G pairs, and the comfortable 80x/160x probe
    cells. Doc counts/token widths from the probe replicas."""
    from elb_log_to_mysql_spark.operators.dedup import (
        sublinear_heap_requirement,
    )

    gib = 1 << 30
    # 20x inverted-index cell: 100k docs, 556M est pairs — fell off
    # the cliff at 8 GiB, so the model must demand more than 8 GiB.
    assert sublinear_heap_requirement(100_000, 150, 555_785_320) > 8 * gib
    # 40x inverted-index cell: 2.23G est pairs GC-thrashed a 48 GiB
    # heap on the repeat rep — the model must flag 48 GiB as short.
    assert sublinear_heap_requirement(200_000, 150, 2_228_349_040) > 48 * gib
    # 80x banded-MinHash probe: 800k docs / 17.4M pairs ran clean in
    # 48 GiB; 160x (1.6M docs / 70.2M pairs) ran clean in 80 GiB.
    assert sublinear_heap_requirement(800_000, 150, 17_438_400) < 48 * gib
    assert sublinear_heap_requirement(1_600_000, 150, 70_153_600) < 80 * gib
    # Monotone in every argument (sanity for the sizing use).
    base = sublinear_heap_requirement(10**6, 100, 10**8)
    assert sublinear_heap_requirement(2 * 10**6, 100, 10**8) > base
    assert sublinear_heap_requirement(10**6, 200, 10**8) > base
    assert sublinear_heap_requirement(10**6, 100, 2 * 10**8) > base
