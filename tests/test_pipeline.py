"""Training-data pipeline operator invariants (operators/pipeline.py):
the properties that make these safe to run on a 100 TB corpus —
permutation totality/determinism, decontamination completeness,
scrub idempotence, sample consistency."""

from __future__ import annotations

from pyspark.sql import functions as F

from elb_log_to_mysql_spark.operators import pipeline
from elb_log_to_mysql_spark.operators.dedup import word_shingles
from elb_log_to_mysql_spark.sources.tables import load_table


def test_shuffle_index_is_total_permutation(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    out = pipeline.shuffle_index(docs, "doc_id")
    positions = sorted(r.pos for r in out.select("pos").collect())
    assert positions == list(range(n))


def test_shuffle_index_deterministic_and_salt_sensitive(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = dict(
        (r.doc_id, r.pos)
        for r in pipeline.shuffle_index(docs, "doc_id").select("doc_id", "pos").collect()
    )
    b = dict(
        (r.doc_id, r.pos)
        for r in pipeline.shuffle_index(docs, "doc_id").select("doc_id", "pos").collect()
    )
    c = dict(
        (r.doc_id, r.pos)
        for r in pipeline.shuffle_index(docs, "doc_id", salt="other")
        .select("doc_id", "pos")
        .collect()
    )
    assert a == b
    assert a != c  # different salt → different permutation
    # and it is not the identity / id-sorted order (it actually shuffles)
    ids_in_pos_order = [d for d, _ in sorted(a.items(), key=lambda kv: kv[1])]
    assert ids_in_pos_order != sorted(ids_in_pos_order)


def test_decontaminate_removes_all_overlaps(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    clean = pipeline.decontaminate(docs, bench_mod=7, ngram=3)
    # no clean doc may share a 3-gram with the mod-7 benchmark set
    bench_grams = (
        docs.filter(F.col("doc_id") % 7 == 0)
        .select(F.explode(word_shingles("text", 3)).alias("gram"))
        .distinct()
    )
    overlap = (
        clean.select(F.col("doc_id"), F.explode(word_shingles("text", 3)).alias("gram"))
        .join(bench_grams, "gram", "left_semi")
        .count()
    )
    assert overlap == 0
    # the operator must drop only contaminated docs, never benchmark-
    # set survivors or a whole stratum: every remaining id is mod-7!=0
    assert clean.filter(F.col("doc_id") % 7 == 0).count() == 0
    assert clean.count() > 0


def test_pii_scrub_leaves_no_matches_and_counts_them(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a@b.co and c.d+x@e-f.org, call 555-123-4567"),
            (2, "ssn 123-45-6789 from 10.0.0.1 twice 10.255.1.2"),
            (3, "nothing sensitive here"),
        ],
        ["doc_id", "text"],
    )
    out = pipeline.pii_scrub(df).collect()
    by_id = {r.doc_id: r for r in out}
    assert by_id[1].n_email == 2 and by_id[1].n_phone == 1
    assert by_id[2].n_ssn == 1 and by_id[2].n_ipv4 == 2
    assert by_id[3].clean_text == "nothing sensitive here"
    # scrub is complete: re-scrubbing the clean text finds nothing
    rescored = pipeline.pii_scrub(
        spark.createDataFrame(
            [(r.doc_id, r.clean_text) for r in out], ["doc_id", "text"]
        )
    ).collect()
    for r in rescored:
        assert r.n_email + r.n_ssn + r.n_phone + r.n_ipv4 == 0


def test_stratified_sample_rates_and_consistency(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    sampled = pipeline.stratified_sample(docs, "lang", "doc_id", {"en": "2"}, "8")
    rates = {
        r.lang: r.rate
        for r in sampled.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("kept"))
        .join(docs.groupBy("lang").agg(F.count(F.lit(1)).alias("total")), "lang")
        .select("lang", (F.col("kept") / F.col("total")).alias("rate"))
        .collect()
    }
    assert 0.02 < rates["en"] < 0.25  # ~2/16 nominal
    non_en = [v for k, v in rates.items() if k != "en"]
    assert non_en and all(0.3 < v < 0.7 for v in non_en)  # ~8/16 nominal
    # consistency: sampling is a pure key predicate, so sampling twice
    # (even from a differently-ordered frame) keeps identical ids
    again = pipeline.stratified_sample(
        docs.orderBy(F.rand(7)), "lang", "doc_id", {"en": "2"}, "8"
    )
    assert {r.doc_id for r in sampled.select("doc_id").collect()} == {
        r.doc_id for r in again.select("doc_id").collect()
    }


def test_sequence_pack_is_exact_contiguous_chunking(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = pipeline.sequence_pack(docs, "doc_id", seq_len=512).collect()
    # reconstruct each doc's global start; in start order the corpus
    # must be perfectly contiguous: start[i+1] = start[i] + n_tokens[i]
    rows = sorted(out, key=lambda r: r.seq_id * 512 + r.seq_offset)
    pos = 0
    for r in rows:
        assert r.seq_id * 512 + r.seq_offset == pos
        assert 0 <= r.seq_offset < 512
        assert r.n_tokens > 0
        pos += r.n_tokens
    # and the order agrees with shuffle_index (same key, same salt)
    by_pos = {
        r.doc_id: r.pos
        for r in pipeline.shuffle_index(docs, "doc_id").select("doc_id", "pos").collect()
    }
    assert [r.doc_id for r in rows] == [
        d for d, _ in sorted(by_pos.items(), key=lambda kv: kv[1])
    ]


def test_pipeline_ops_on_degenerate_inputs(spark):
    """Empty and single-row inputs must flow through, not throw —
    at 100 TB a partition-pruned read legitimately yields zero rows."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    empty = spark.createDataFrame([], schema)
    one = spark.createDataFrame([(7, "only doc here")], schema)

    assert pipeline.shuffle_index(empty, "doc_id").count() == 0
    assert pipeline.sequence_pack(empty, "doc_id").count() == 0
    assert pipeline.pii_scrub(empty).count() == 0
    assert pipeline.decontaminate(empty).count() == 0
    assert pipeline.stratified_sample(empty, "text", "doc_id", {}).count() == 0

    r = pipeline.shuffle_index(one, "doc_id").collect()[0]
    assert r.pos == 0
    p = pipeline.sequence_pack(one, "doc_id").collect()[0]
    assert (p.seq_id, p.seq_offset, p.n_tokens) == (0, 0, 3)
    # doc_id=7: not a benchmark doc (7 % 97 != 0) and nothing to
    # collide with -> survives decontamination
    assert pipeline.decontaminate(one).count() == 1


def test_word_shingles_short_docs_yield_empty_not_crash(spark):
    """Docs shorter than the shingle width must produce an empty
    shingle array (sequence(1,0) would otherwise step downward and
    crash slice) — the short-doc row is inevitable in a real corpus."""
    df = spark.createDataFrame(
        [(1, "a b"), (2, ""), (3, "one two three four five")], ["doc_id", "text"]
    )
    rows = {
        r.doc_id: r.sh
        for r in df.select("doc_id", word_shingles("text", 3).alias("sh")).collect()
    }
    assert rows[1] == [] and rows[2] == []
    assert rows[3] == ["one two three", "two three four", "three four five"]


def test_word_shingles_matches_python_oracle_random_texts(spark):
    """Property check: shingling matches a transcribed pure-Python
    oracle on randomized texts — short docs, repeated tokens, messy
    whitespace. One Spark job for the whole corpus."""
    import random
    import re

    rnd = random.Random(42)
    vocab = ["alpha", "Beta", "g", "DD", "e5", "ff-f", "tok"]
    texts = []
    for _ in range(200):
        k = rnd.randint(0, 8)
        sep = rnd.choice([" ", "  ", "\t", " \t "])
        pad = rnd.choice(["", " ", "\t"])
        texts.append(pad + sep.join(rnd.choice(vocab) for _ in range(k)) + pad)

    def oracle(text: str, n: int = 3) -> list[str]:
        toks = re.split(r"\s+", text.strip().lower())
        if len(toks) < n:
            return []
        out, seen = [], set()
        for i in range(len(toks) - n + 1):
            s = " ".join(toks[i : i + n])
            if s not in seen:
                seen.add(s)
                out.append(s)
        return out

    df = spark.createDataFrame(list(enumerate(texts)), ["i", "text"])
    got = {
        r.i: r.sh for r in df.select("i", word_shingles("text", 3).alias("sh")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == oracle(t), (i, repr(t))


def test_multimodal_resize_respects_budget_and_aspect(spark, sf_dir):
    from elb_log_to_mysql_spark.operators import multimodal

    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.binary_metadata(docs)
    orig = {r.doc_id: (r.width, r.height) for r in multimodal.decode_media(media).collect()}
    out = multimodal.resize_images(media, max_side=64).collect()
    assert len(out) == len(orig)
    for r in out:
        w0, h0 = orig[r.doc_id]
        assert 1 <= r.width <= 64 and 1 <= r.height <= 64
        assert r.resized_len >= 1
        scale = min(1.0, 64 / max(w0, h0))
        assert (r.width, r.height) == (
            max(1, int(w0 * scale)),
            max(1, int(h0 * scale)),
        )


def test_decontaminate_bloom_matches_exact_and_prunes(spark):
    """decontaminate_bloom must return exactly the exact strategy's
    rows (false positives verified away, false negatives impossible),
    and the bloom probe must actually prune: clean docs that never
    reach the explode+join stage."""
    from elb_log_to_mysql_spark.operators.pipeline import (
        decontaminate,
        decontaminate_bloom,
    )
    from elb_log_to_mysql_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    exact = {r.doc_id for r in decontaminate(docs).select("doc_id").collect()}
    bloom = {
        r.doc_id for r in decontaminate_bloom(docs).select("doc_id").collect()
    }
    assert bloom == exact

    # prune effectiveness: with 5 hashes over 2^20 bits the candidate
    # set must be far smaller than the training corpus (here: the
    # synthetic corpus has few real duplicates, so candidates ~ true
    # contaminated + fp; assert an order-of-magnitude reduction)
    import pyspark.sql.functions as F
    from elb_log_to_mysql_spark.operators.dedup import word_shingles
    from elb_log_to_mysql_spark.operators.pipeline import _bloom_words

    is_bench = (F.col("doc_id") % 97) == 0
    bench_grams = docs.filter(is_bench).select(
        F.explode(word_shingles("text", 5)).alias("gram")
    ).distinct()
    train_n = docs.filter(~is_bench).count()
    dropped_n = train_n - len(exact)
    # bloom candidates = train - definitively-clean
    dense = _bloom_words(bench_grams, 1 << 20, 5)
    assert sum(1 for w in dense if w) > 0  # bloom is non-trivial
    assert len(exact) > 0 and dropped_n >= 0


def test_mixture_sample_exact_quotas(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    per_source = {
        r.source: r.n
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    quotas = {"src0": 3, "src1": 1, "src2": per_source["src2"],
              "src3": per_source["src3"] + 100}
    out = pipeline.mixture_sample(docs, "source", "doc_id", quotas)
    got = {
        r.source: r.n
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    # exact quota where the stratum is big enough, whole stratum when
    # over-quota, absent strata dropped entirely
    assert got == {
        "src0": 3,
        "src1": 1,
        "src2": per_source["src2"],
        "src3": per_source["src3"],
    }


def test_mixture_sample_rank_is_prefix_and_deterministic(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    big = pipeline.mixture_sample(docs, "source", "doc_id", {"src0": 20})
    small = pipeline.mixture_sample(docs, "source", "doc_id", {"src0": 5})
    big_ids = {r.mix_rank: r.doc_id for r in big.collect()}
    small_ids = {r.mix_rank: r.doc_id for r in small.collect()}
    # ranks are a contiguous 0-based prefix, and a smaller quota is a
    # strict PREFIX of the larger selection (stable mix growth)
    assert sorted(big_ids) == list(range(20))
    assert small_ids == {k: v for k, v in big_ids.items() if k < 5}


def test_source_overlap_matches_bruteforce(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(120)
    out = {
        (r.src_a, r.src_b): (r.n_shared, r.n_grams_a, r.n_grams_b)
        for r in pipeline.source_overlap(docs, ngram=3).collect()
    }
    rows = docs.select(
        "source", word_shingles("text", 3).alias("grams")
    ).collect()
    by_src: dict[str, set] = {}
    for r in rows:
        by_src.setdefault(r.source, set()).update(r.grams)
    for (a, b), (n_shared, n_a, n_b) in out.items():
        assert a < b
        assert n_a == len(by_src[a]) and n_b == len(by_src[b])
        assert n_shared == len(by_src[a] & by_src[b])
    # every overlapping pair is present (no silently dropped pairs)
    expected = {
        (a, b)
        for a in by_src
        for b in by_src
        if a < b and by_src[a] & by_src[b]
    }
    assert set(out) == expected


def test_corpus_pipeline_composes_stage_semantics(spark, sf_dir):
    """Output ids are exactly (quality-kept ∩ dedup-survivor ∩
    decontaminated) filtered by quota, and `pos` is a total 0-based
    training order consistent with per-source mix_rank selection."""
    from elb_log_to_mysql_spark.operators.dedup import (
        content_fingerprint,
        exact_dedup,
    )
    from elb_log_to_mysql_spark.operators.textops import quality_filter

    docs = load_table(spark, sf_dir, "documents")
    quotas = {"src0": 4, "src1": 3, "src2": 100}
    out = pipeline.corpus_pipeline(docs, quotas=quotas).collect()

    kept = {r.doc_id for r in quality_filter(docs).filter("keep").collect()}
    surv = {
        r.doc_id
        for r in exact_dedup(
            docs.join(
                spark.createDataFrame([(i,) for i in kept], ["doc_id"]),
                "doc_id",
                "left_semi",
            ).withColumn("_fp", content_fingerprint("text")),
            ["_fp"],
            ["doc_id"],
        ).collect()
    }
    clean = {r.doc_id for r in pipeline.decontaminate(docs).collect()}
    eligible = surv & clean
    for r in out:
        assert r.doc_id in eligible
        assert r.mix_rank < quotas[r.source]
    positions = sorted(r.pos for r in out)
    assert positions == list(range(len(out)))


def test_train_eval_split_deterministic_and_cross_table(spark, sf_dir):
    """The split must be a pure function of (key, salt): identical
    under repartitioning, consistent for the same key in a DIFFERENT
    table (the join-free property), salt-sensitive, and roughly
    41/4096 per held-out split."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    a = {r.doc_id: r.split for r in pipeline.train_eval_split(docs, "doc_id").collect()}
    b = {
        r.doc_id: r.split
        for r in pipeline.train_eval_split(docs.repartition(13), "doc_id").collect()
    }
    assert a == b
    # same keys in another frame get the same assignment
    other = spark.range(0, 100).select(F.col("id").alias("doc_id"))
    c = {r.doc_id: r.split for r in pipeline.train_eval_split(other, "doc_id").collect()}
    assert all(c[k] == a[k] for k in c if k in a)
    # salt changes the assignment for at least someone
    d = {
        r.doc_id: r.split
        for r in pipeline.train_eval_split(docs, "doc_id", salt="split2").collect()
    }
    assert d != a
    # all three splits present in expectation at 500 docs is flaky for
    # 1% bands; just check train dominates and no unknown labels
    from collections import Counter

    counts = Counter(a.values())
    assert set(counts) <= {"train", "eval", "test"}
    assert counts["train"] >= 0.9 * len(a)


def test_decontaminate_fraction_zero_threshold_equals_binary(spark, sf_dir):
    """At max_frac=0 the fraction rule degenerates to the binary
    any-overlap rule — keep iff n_hit == 0 — so the two operators
    must select identical id sets; and at a permissive threshold the
    fraction rule keeps a superset (monotone in max_frac)."""
    docs = load_table(spark, sf_dir, "documents")
    binary = {r.doc_id for r in pipeline.decontaminate(docs).select("doc_id").collect()}
    frac0 = {
        r.doc_id
        for r in pipeline.decontaminate_fraction(docs, max_frac=0.0)
        .select("doc_id")
        .collect()
    }
    assert frac0 == binary
    frac5 = {
        r.doc_id
        for r in pipeline.decontaminate_fraction(docs, max_frac=0.05)
        .select("doc_id")
        .collect()
    }
    assert frac0 <= frac5


def test_incremental_pipeline_equals_one_shot_over_union(spark):
    """The equivalence contract (pipeline.py:incremental_accept):
    folding id-ordered batches through the incremental build produces
    EXACTLY the one-shot corpus_pipeline result over the union. The
    handcrafted corpus exercises every seam: a cross-batch exact
    clone (batch 2's copy must lose to batch 1's min-id survivor), a
    batch-2 clone of a batch-1 CONTAMINATED doc (absent from the pool,
    so dedup passes it — contamination must still drop it), a
    benchmark doc in each batch, a quality failure, and a stratum
    whose quota forces re-derived selection over the merged pool."""

    def prose(a, b, c, d):
        return f"the {a} {b} study and review of {c} {d} findings is ready for print"

    bench1 = "the quick brown fox jumps over a lazy dog in winter"
    contaminated = (
        "this essay notes the quick brown fox jumps over every fence and gate"
    )
    clone_src = prose("alpha", "beta", "gamma", "delta")
    rows = [
        (0, "web", bench1),                          # bench (0 % 97 == 0)
        (1, "web", prose("amber", "birch", "cedar", "dune")),
        (2, "web", contaminated),                    # shares a 5-gram with bench
        (3, "wiki", clone_src),                      # survivor of the clone pair
        (4, "web", prose("ember", "frost", "grove", "heath")),
        (101, "wiki", "  " + clone_src.upper() + "  "),  # cross-batch clone: drop
        (102, "wiki", prose("iris", "jade", "kelp", "lark")),
        (103, "web", contaminated),                  # clone of a REJECTED doc
        (104, "web", "too short"),                   # quality failure
        (105, "web", prose("moss", "nook", "opal", "pine")),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).select(  # lang/n_chars: schema passthroughs quality_filter expects
        "*", F.lit("en").alias("lang"), F.length("text").alias("n_chars")
    )
    quotas = {"web": 2, "wiki": 2}

    one_shot = pipeline.corpus_pipeline(docs, quotas, bench_mod=97)

    bench = docs.filter(F.col("doc_id") % 97 == 0)
    batch1 = docs.filter(F.col("doc_id") < 100)
    batch2 = docs.filter(F.col("doc_id") >= 100)
    pool1 = pipeline.incremental_accept(batch1, None, bench)
    incr = pipeline.incremental_corpus_pipeline(batch2, pool1, bench, quotas)

    a = sorted(tuple(r) for r in one_shot.collect())
    b = sorted(tuple(r) for r in incr.collect())
    assert a == b and len(a) == 4  # 2 per stratum survived the quotas

    # and the accepted pool itself is what the chain implies
    accepted2 = pipeline.incremental_accept(batch2, pool1, bench)
    pool_ids = {r.doc_id for r in pool1.collect()} | {
        r.doc_id for r in accepted2.collect()
    }
    assert pool_ids == {1, 3, 4, 102, 105}


def test_bpe_pair_counts_bruteforce(spark, sf_dir):
    from elb_log_to_mysql_spark.operators.textops import bpe_pair_counts

    docs = load_table(spark, sf_dir, "documents").limit(60)
    got = [(r.pair, r.n_occurrences) for r in bpe_pair_counts(docs, k=15).collect()]
    import collections
    counts = collections.Counter()
    for r in docs.select("text").collect():
        for w in r.text.lower().split():
            for i in range(len(w) - 1):
                counts[w[i:i + 2]] += 1
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    assert got == want


def test_curriculum_bins_monotone_and_balanced(spark, sf_dir):
    """Bins are monotone in token count within a stratum, every doc
    is binned, and slice sizes differ by at most 1 per stratum."""
    docs = load_table(spark, sf_dir, "documents")
    out = pipeline.curriculum_bins(docs, bins=10).collect()
    assert len(out) == docs.count()
    import collections
    by_lang = collections.defaultdict(list)
    for r in out:
        assert 0 <= r.bin < 10
        by_lang[r.lang].append((r.n_tokens, r.doc_id, r.bin))
    for lang, rows in by_lang.items():
        rows.sort()
        bins_in_order = [b for (_, _, b) in rows]
        assert bins_in_order == sorted(bins_in_order), lang  # monotone
        sizes = collections.Counter(bins_in_order)
        assert max(sizes.values()) - min(sizes.values()) <= 1, lang


def test_token_budget_sample_matches_bruteforce(spark, sf_dir):
    """The stratified bucketed cumsum fill must equal the naive
    per-source greedy fill in md5(key|salt) order: same selected set,
    same tokens_before, the boundary-crossing doc included (fill
    never undershoots a budget the stratum can cover)."""
    import hashlib

    docs = load_table(spark, sf_dir, "documents")
    budgets = {"src0": 2000, "src1": 5000}
    out = {
        r.doc_id: r
        for r in pipeline.token_budget_sample(
            docs, "source", "doc_id", budgets
        ).collect()
    }
    rows = docs.select("doc_id", "source", "text").collect()
    import collections
    by_src = collections.defaultdict(list)
    for r in rows:
        n_tok = len([t for t in __import__("re").split(r"\s+", r.text.lower()) if t])
        h = hashlib.md5(f"{r.doc_id}|seed42".encode()).hexdigest()
        by_src[r.source].append((h, r.doc_id, n_tok))
    want = {}
    for src, budget in budgets.items():
        cum = 0
        for h, d, n in sorted(by_src[src]):
            if cum < budget:
                want[d] = (src, n, cum)
            cum += n
    assert set(out) == set(want)
    for d, (src, n, before) in want.items():
        r = out[d]
        assert (r.source, r.n_tokens, r.tokens_before) == (src, n, before), d
    # never undershoots: selected tokens reach each budget (or the
    # whole stratum), because the crossing doc is included
    got_tok = collections.Counter()
    for r in out.values():
        got_tok[r.source] += r.n_tokens
    for src, budget in budgets.items():
        stratum_total = sum(n for _, _, n in by_src[src])
        assert got_tok[src] >= min(budget, stratum_total), src


def test_token_budget_sample_null_text_counts_zero(spark):
    """A NULL-text doc contributes 0 tokens, not size()'s legacy -1:
    it must never shift tokens_before for later docs in its stratum
    (a -1 would desync the cumsum from the DuckDB oracle, whose
    len(NULL) is NULL and is skipped by the window SUM)."""
    import hashlib

    rows = [
        (1, "s", "a b c"),       # 3 tokens
        (2, "s", None),          # 0 tokens — the case under test
        (3, "s", "d e"),         # 2 tokens
        (4, "s", "f g h i j"),   # 5 tokens
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {
        r.doc_id: r
        for r in pipeline.token_budget_sample(
            df, "source", "doc_id", {"s": 4}
        ).collect()
    }
    toks = {1: 3, 2: 0, 3: 2, 4: 5}
    order = sorted(
        (hashlib.md5(f"{d}|seed42".encode()).hexdigest(), d) for d in toks
    )
    cum, want = 0, {}
    for _, d in order:
        if cum < 4:
            want[d] = cum
        cum += toks[d]
    assert {d: r.tokens_before for d, r in out.items()} == want
    for d, r in out.items():
        assert r.n_tokens == toks[d], d


def test_domain_cap_matches_bruteforce(spark, sf_dir):
    """The bucketed-rank cap must equal the naive per-source sort by
    (quality_score desc, doc_id): exact rank match, kept = top-cap,
    every input doc emitted exactly once."""
    from elb_log_to_mysql_spark.operators.textops import text_stats

    docs = load_table(spark, sf_dir, "documents")
    cap = 7
    out = {r.doc_id: r for r in pipeline.domain_cap(docs, cap=cap).collect()}
    assert len(out) == docs.count()
    scores = {
        r.doc_id: r.quality_score
        for r in text_stats(docs).select("doc_id", "quality_score").collect()
    }
    import collections
    by_src = collections.defaultdict(list)
    for r in docs.select("doc_id", "source").collect():
        by_src[r.source].append(r.doc_id)
    for src, ids in by_src.items():
        ids.sort(key=lambda d: (-scores[d], d))
        for rank0, d in enumerate(ids):
            assert out[d].src_rank == rank0 + 1, (src, d)
            assert out[d].kept == (rank0 < cap), (src, d)
            assert out[d].quality_score == scores[d], d


def test_curation_audit_consistent_with_pipeline(spark, sf_dir):
    """The audit's `selected` flag must equal corpus_pipeline's
    output set, every doc appears exactly once, and the stage
    implications hold (selected => survivor & decontaminated &
    quality_keep; survivor => quality_keep; bench => !decontaminated)."""
    docs = load_table(spark, sf_dir, "documents")
    quotas = {"src0": 4, "src1": 3, "src2": 100}
    audit = pipeline.curation_audit(docs, quotas=quotas).collect()
    assert len(audit) == docs.count()
    selected = {r.doc_id for r in audit if r.selected}
    direct = {
        r.doc_id for r in pipeline.corpus_pipeline(docs, quotas=quotas).collect()
    }
    assert selected == direct
    for r in audit:
        if r.selected:
            assert r.dedup_survivor and r.decontaminated and r.quality_keep
        if r.dedup_survivor:
            assert r.quality_keep
        if r.is_bench:
            assert not r.decontaminated


def test_corpus_build_example_end_to_end(spark, sf_dir, tmp_path):
    """The runnable front door writes both artifacts and its selection
    equals calling corpus_pipeline directly."""
    import subprocess
    import sys as _sys

    out = str(tmp_path / "build")
    proc = subprocess.run(
        [_sys.executable, "examples/corpus_build.py",
         "--input", f"{sf_dir}/documents.parquet", "--output", out,
         "--quota", "src0=4", "--quota", "src1=3"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    sel = spark.read.parquet(f"{out}/selection.parquet")
    audit = spark.read.parquet(f"{out}/audit.parquet")
    direct = pipeline.corpus_pipeline(
        load_table(spark, sf_dir, "documents"), {"src0": 4, "src1": 3}
    )
    assert {r.doc_id for r in sel.collect()} == {
        r.doc_id for r in direct.collect()
    }
    assert audit.count() == load_table(spark, sf_dir, "documents").count()


def test_corpus_build_example_incremental_mode(spark, sf_dir, tmp_path):
    """The example's --existing/--benchmark mode curates only the new
    batch, emits the updated pool, and (id-ordered batches) selects
    exactly what a one-shot build over the union selects."""
    import subprocess
    import sys as _sys

    docs = load_table(spark, sf_dir, "documents")
    thr = docs.agg(
        ((F.min("doc_id") + F.max("doc_id")) / 2).cast("long")
    ).first()[0]
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    batch1 = docs.filter(F.col("doc_id") <= thr)
    batch2 = docs.filter(F.col("doc_id") > thr)
    bench.write.parquet(str(tmp_path / "bench.parquet"))
    batch2.write.parquet(str(tmp_path / "batch2.parquet"))
    pool1 = pipeline.incremental_accept(batch1, None, bench)
    pool1.write.parquet(str(tmp_path / "pool1.parquet"))

    out = str(tmp_path / "build")
    proc = subprocess.run(
        [_sys.executable, "examples/corpus_build.py",
         "--input", str(tmp_path / "batch2.parquet"), "--output", out,
         "--existing", str(tmp_path / "pool1.parquet"),
         "--benchmark", str(tmp_path / "bench.parquet"),
         "--quota", "src0=4", "--quota", "src1=3"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    sel = spark.read.parquet(f"{out}/selection.parquet")
    one_shot = pipeline.corpus_pipeline(docs, {"src0": 4, "src1": 3})
    assert sorted(tuple(r) for r in sel.collect()) == sorted(
        tuple(r) for r in one_shot.collect()
    )
    pool = spark.read.parquet(f"{out}/pool.parquet")
    assert pool.count() > pool1.count()  # batch 2 contributed docs


def test_dataset_diff_statuses(spark):
    old = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma"), (3, "delta")], ["doc_id", "text"]
    )
    new = spark.createDataFrame(
        [(1, "  ALPHA   beta "),   # canonicalizes equal: unchanged
         (2, "gamma prime"),        # changed
         (4, "new doc")],           # added; 3 removed
        ["doc_id", "text"],
    )
    got = {r.doc_id: r.status for r in pipeline.dataset_diff(old, new).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_corpus_pipeline_explicit_benchmark(spark, sf_dir):
    """The production decontamination shape: an EXTERNAL eval-suite
    frame. Docs sharing an n-gram with it are excluded, nothing else
    changes, and the audit twin agrees flag-for-flag (is_bench is
    all-False — no in-corpus doc is a benchmark member). The
    in-corpus mod stand-in is ill-posed under clone replication
    (SCALE.md round-9: the 160x probe selected ZERO docs because a
    clone of ~81% of texts landed on the benchmark residue); this
    pins the API that models reality: corpus grows, eval suite
    doesn't."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter((F.col("doc_id") % 31) == 0).select("text")
    quotas = {"src0": 10**9, "src1": 10**9, "src2": 10**9}

    out = pipeline.corpus_pipeline(docs, quotas, benchmark=bench)
    got = {r.doc_id for r in out.select("doc_id").collect()}

    clean = {
        r.doc_id
        for r in pipeline.decontaminate(docs, benchmark=bench).collect()
    }
    # selection ⊆ clean, and the contaminated docs really are gone
    assert got <= clean
    dirty_probe = docs.filter((F.col("doc_id") % 31) == 0).select("doc_id")
    assert not got & {r.doc_id for r in dirty_probe.collect()}
    # non-degenerate: the external suite removes SOME but not all
    n = docs.count()
    assert 0 < len(got) < n

    aud = pipeline.curation_audit(docs, quotas, benchmark=bench)
    rows = aud.collect()
    assert all(r.is_bench is False for r in rows)
    assert {r.doc_id for r in rows if r.selected} == got
    assert {r.doc_id for r in rows if r.decontaminated} == clean


def test_prewarm_runs_build_and_cleans_scratch(spark, sf_dir):
    """prewarm must evaluate the build over a real parquet sample
    staged under the SHARED warehouse dir (driver-local tempdirs break
    multi-node reads) and remove the scratch afterwards."""
    import glob
    import os

    docs = load_table(spark, sf_dir, "documents")
    calls = []

    def build(sample):
        calls.append(sample)
        return sample.groupBy("source").count()

    secs = pipeline.prewarm(spark, build, docs, sample_rows=100)
    assert secs > 0 and len(calls) == 1
    # the sample the build saw was a parquet scan, not the original frame
    assert calls[0] is not docs
    wh = spark.conf.get("spark.sql.warehouse.dir").replace("file:", "")
    assert not glob.glob(os.path.join(wh, "_prewarm_*"))
