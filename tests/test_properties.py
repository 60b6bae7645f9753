"""Property-based invariants for the dedup family (hypothesis).

Each property pins an operator against a plain-Python oracle on
randomized corpora drawn from a SMALL token alphabet — small so that
shingle collisions, duplicate documents, and near-duplicates actually
occur instead of every document being trivially unique. Example
counts are kept low because each example is a real Spark job.
"""

from __future__ import annotations

import random

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from elb_log_to_mysql_spark.operators import dedup

_WORDS = ["the", "cat", "sat", "on", "mat", "dog", "ran", "far", "big", "red"]

_DOC = st.lists(st.sampled_from(_WORDS), min_size=0, max_size=12).map(" ".join)
_CORPUS = st.lists(_DOC, min_size=1, max_size=20)

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _py_shingles(text: str, n: int = 3) -> set[str]:
    toks = [t for t in text.lower().split() if t]
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


@given(corpus=_CORPUS)
@settings(**_SETTINGS)
def test_word_shingles_match_python_oracle(spark, corpus):
    """word_shingles (sequence+slice+transform, no explode) must equal
    the plain sliding-window definition, including docs shorter than n
    tokens (empty array, not a crash) and duplicate shingles
    (distinct)."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], ["doc_id", "text"]
    )
    rows = df.select(
        "doc_id", dedup.word_shingles("text", 3).alias("sh")
    ).collect()
    for r in rows:
        assert set(r.sh) == _py_shingles(corpus[r.doc_id]), corpus[r.doc_id]
        assert len(r.sh) == len(set(r.sh))


@given(corpus=st.lists(_DOC.filter(bool), min_size=1, max_size=12), seed=st.integers(0, 2**16))
@settings(**_SETTINGS)
def test_simhash_is_token_order_invariant(spark, corpus, seed):
    """SimHash is a bag-of-words vote tally: permuting a document's
    tokens must leave its fingerprint bit-identical (the property that
    makes it a CONTENT sketch rather than a sequence hash)."""
    rng = random.Random(seed)

    def shuffled(t: str) -> str:
        toks = t.split()
        rng.shuffle(toks)
        return " ".join(toks)

    n = len(corpus)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)]
        + [(i + n, shuffled(t)) for i, t in enumerate(corpus)],
        ["doc_id", "text"],
    )
    fps = {
        r.doc_id: r.fp for r in dedup.simhash_fingerprints(df).collect()
    }
    for i in range(n):
        assert fps[i] == fps[i + n], corpus[i]


@given(corpus=_CORPUS)
@settings(**_SETTINGS)
def test_ngram_jaccard_pairs_match_python_bruteforce(spark, corpus):
    """The inverted-index exact-Jaccard join must equal the O(n²)
    Python brute force — same pair set AND same jaccard values — on
    corpora dense with shared shingles (the regime where the
    size-compatibility prune and hash representation could silently
    drop or distort pairs)."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], ["doc_id", "text"]
    )
    got = {
        (r.doc_id_a, r.doc_id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(df, threshold=0.5).collect()
    }
    sh = {i: _py_shingles(t) for i, t in enumerate(corpus)}
    want = {}
    for a in range(len(corpus)):
        for b in range(a + 1, len(corpus)):
            if not sh[a] or not sh[b]:
                continue
            j = len(sh[a] & sh[b]) / len(sh[a] | sh[b])
            if j >= 0.5:
                want[(a, b)] = j
    assert got.keys() == want.keys()
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-12


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50), st.integers(0, 9)),
        min_size=1,
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_exact_dedup_picks_deterministic_survivor(spark, rows):
    """exact_dedup must keep exactly the row the total order selects
    per key — never an arbitrary partition-dependent one (the reason
    it is row_number, not dropDuplicates)."""
    df = spark.createDataFrame(rows, ["k", "ord", "payload"]).repartition(8)
    got = {
        (r.k, r.ord, r.payload)
        for r in dedup.exact_dedup(df, ["k"], ["ord", "payload"]).collect()
    }
    want = {min(g) for g in {
        k: [t for t in rows if t[0] == k] for k, _, _ in rows
    }.values()}
    assert got == {(k, o, p) for (k, o, p) in want}


# --- analytics family properties -----------------------------------------

_EVENT_TYPES = ["view", "click", "purchase"]

_EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=5),        # user_id
        st.integers(min_value=0, max_value=50),       # ts offset (seconds)
        st.sampled_from(_EVENT_TYPES),                # event_type
    ),
    min_size=0,
    max_size=30,
)


def _py_funnel(rows, steps):
    """Greedy earliest-match subsequence per user over (ts, event_id)
    order — the plain-Python definition of the funnel fold."""
    by_user: dict[int, list] = {}
    for user, ts, eid, et in rows:
        by_user.setdefault(user, []).append((ts, eid, et))
    reached = [0] * len(steps)
    for evs in by_user.values():
        stage = 0
        for _, _, et in sorted(evs):
            if stage < len(steps) and et == steps[stage]:
                stage += 1
        for k in range(stage):
            reached[k] += 1
    return reached


@given(events=_EVENTS)
@settings(**_SETTINGS)
def test_funnel_matches_python_oracle(spark, events):
    import datetime as dt

    from elb_log_to_mysql_spark.operators import analytics

    base = dt.datetime(2024, 1, 1)
    rows = [
        (u, base + dt.timedelta(seconds=off), i, et)
        for i, (u, off, et) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows or [(1, base, 0, "view")],
        "user_id long, ts timestamp, event_id long, event_type string",
    )
    if not rows:
        rows = [(1, base, 0, "view")]
    got = {
        r["step_idx"]: r["n_users"]
        for r in analytics.funnel_analysis(df, _EVENT_TYPES).collect()
    }
    want = _py_funnel(
        [(u, ts, eid, et) for (u, ts, eid, et) in rows], _EVENT_TYPES
    )
    assert [got[k] for k in (1, 2, 3)] == want


@given(events=_EVENTS, split_off=st.integers(min_value=0, max_value=50))
@settings(**_SETTINGS)
def test_scd1_merge_equals_python_latest_state(spark, events, split_off):
    import datetime as dt

    from elb_log_to_mysql_spark.operators import analytics

    base = dt.datetime(2024, 1, 1)
    rows = [
        (u, base + dt.timedelta(seconds=off), i, et)
        for i, (u, off, et) in enumerate(events)
    ]
    if not rows:
        return
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    split = base + dt.timedelta(seconds=split_off)
    out = {
        r["user_id"]: (r["state"], r["action"])
        for r in analytics.scd1_merge(df, split.isoformat(sep=" ")).collect()
    }
    latest: dict[int, tuple] = {}
    pre, post = set(), set()
    for u, ts, eid, et in rows:
        (pre if ts < split else post).add(u)
        if u not in latest or (ts, eid) > latest[u][:2]:
            latest[u] = (ts, eid, et)
    assert set(out) == pre | post
    for u, (state, action) in out.items():
        assert state == latest[u][2]
        want = (
            "insert" if u not in pre else "carry" if u not in post else "update"
        )
        assert action == want


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 6), st.integers(0, 10_000)),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[2],
    )
)
@settings(**_SETTINGS)
def test_stratified_bucketed_rank_equals_window_rank(spark, rows):
    """The two-pass decomposed rank must equal the one-shot
    ROW_NUMBER() OVER (PARTITION BY stratum ORDER BY bucket, key)
    for ANY stratum/bucket/key distribution — including empty
    buckets, single-row strata, and colliding bucket values — and be
    independent of input partitioning."""
    from elb_log_to_mysql_spark.operators.pipeline import (
        _stratified_bucketed_rank,
    )

    df = spark.createDataFrame(rows, ["st", "bkt", "key"]).repartition(7)
    got = {
        (r.st, r.key): r.rank
        for r in _stratified_bucketed_rank(
            df, "st", "bkt", ["key"], "rank"
        ).collect()
    }
    want = {}
    for stv in {t[0] for t in rows}:
        ordered = sorted(
            [t for t in rows if t[0] == stv], key=lambda t: (t[1], t[2])
        )
        for i, t in enumerate(ordered):
            want[(t[0], t[2])] = i
    assert got == want


@given(
    probes=st.lists(
        st.tuples(st.integers(0, 3), st.one_of(st.none(), st.integers(0, 500))),
        min_size=1, max_size=15,
    ),
    points=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 500)),
        min_size=0, max_size=25,
    ),
    tol=st.sampled_from([7, 60, 200]),
)
@settings(**_SETTINGS)
def test_interval_join_bucketed_matches_naive(spark, probes, points, tol):
    """Bucket decomposition == the naive quadratic join for random
    users/offsets/tolerances, including NULL probe timestamps (kept
    with n_nearby = 0) and boundary-exact deltas."""
    import datetime as dt

    from elb_log_to_mysql_spark.operators.relational import (
        interval_join_bucketed,
    )

    base = dt.datetime(2024, 1, 1)
    sec = dt.timedelta(seconds=1)
    pdf = spark.createDataFrame(
        [(i, u, base + s * sec if s is not None else None)
         for i, (u, s) in enumerate(probes)],
        "event_id long, user_id long, ts timestamp",
    )
    cdf = spark.createDataFrame(
        [(1000 + i, u, base + s * sec) for i, (u, s) in enumerate(points)],
        "event_id long, user_id long, ts timestamp",
    )
    got = {
        r.event_id: r.n_nearby
        for r in interval_join_bucketed(
            pdf, cdf, tolerance_us=tol * 1_000_000
        ).collect()
    }
    want = {
        i: (
            0 if s is None else sum(
                1 for (cu, cs) in points if cu != u and abs(cs - s) <= tol
            )
        )
        for i, (u, s) in enumerate(probes)
    }
    assert got == want


# ---------------------------------------------------------------------------
# round-10 continuation: maintenance + CDC properties
# ---------------------------------------------------------------------------

_SIZES = st.lists(
    st.tuples(st.sampled_from(["a", "b"]), st.integers(1, 900)),
    min_size=1,
    max_size=24,
)


@given(objects=_SIZES, target=st.integers(100, 1200))
@settings(**_SETTINGS)
def test_compaction_plan_matches_python_packer(spark, objects, target):
    """compaction_plan must equal the sequential scan-order packer:
    bin(i) = floor(sum(sizes before i in key order) / target), per
    partition — conservation and never-split follow from equality."""
    from elb_log_to_mysql_spark.operators import maintenance

    rows = [(src, i, n) for i, (src, n) in enumerate(objects)]
    df = spark.createDataFrame(rows, "source string, doc_id long, n_chars long")
    got = {
        (r["source"], r["bin"]): (r["n_objects"], r["bin_bytes"])
        for r in maintenance.compaction_plan(df, target_bytes=target).collect()
    }
    expected: dict = {}
    for src in ("a", "b"):
        cum = 0
        for i, (s, n) in enumerate(objects):
            if s != src:
                continue
            b = cum // target
            cnt, byts = expected.get((src, b), (0, 0))
            expected[(src, b)] = (cnt + 1, byts + n)
            cum += n
    assert got == expected


_EVENTS = st.lists(
    st.tuples(
        st.integers(1, 5),                      # user_id
        st.integers(0, 59),                     # minute (unique-ified below)
        st.sampled_from(["view", "click", "error", "signup"]),
    ),
    min_size=1,
    max_size=30,
)


@given(evs=_EVENTS)
@settings(**_SETTINGS)
def test_cdc_apply_matches_python_replay(spark, evs):
    """cdc_apply's merge audit must equal a literal sequential replay
    of the changelog over the base snapshot."""
    from elb_log_to_mysql_spark.operators.analytics import cdc_apply

    # half the events land before the split, half after; event_id is
    # the global sequence so (ts, event_id) ordering is total
    rows = []
    for i, (u, minute, et) in enumerate(evs):
        day = 10 if i % 2 == 0 else 25
        rows.append(
            (i, f"2024-01-{day:02d} 00:{minute:02d}:00", u, et, 1.0, "{}")
        )
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) ts", "user_id", "event_type",
        "value", "props",
    )
    got = {r["user_id"]: r.asDict() for r in
           cdc_apply(df, "2024-01-20").collect()}

    base: dict = {}
    chg: dict = {}
    for i, (u, minute, et) in enumerate(evs):
        key = (f"2024-01-{10 if i % 2 == 0 else 25}", minute, i)
        if i % 2 == 0:
            if u not in base or key > base[u][0]:
                base[u] = (key, et)
        else:
            op = "D" if et == "error" else "U"
            if u not in chg or key > chg[u][0]:
                chg[u] = (key, op, et)
    for u in set(base) | set(chg):
        g = got[u]
        if u in chg and chg[u][1] == "D":
            assert g["action"] == "delete" and not g["in_snapshot"]
            assert g["state"] is None
        elif u in chg:
            assert g["state"] == chg[u][2] and g["in_snapshot"]
            assert g["action"] == ("update" if u in base else "insert")
        else:
            assert g["action"] == "carry" and g["state"] == base[u][1]
    assert set(got) == set(base) | set(chg)


# ---- lsh_config_search: pure-math properties (no Spark job per example,
# so these run at full hypothesis budget) ----

_P = st.floats(min_value=1e-6, max_value=1.0, exclude_max=True)
_FLOOR = st.floats(min_value=0.5, max_value=0.999)


@given(p_near=_P, p_rand=_P, floor=_FLOOR)
@settings(max_examples=300, deadline=None)
def test_lsh_config_search_soundness(p_near, p_rand, floor):
    """Any accepted config must actually satisfy everything the
    docstring claims: theoretical recall at p_near covers the design
    floor, both caps hold, and the modeled scan fraction is < 1."""
    from elb_log_to_mysql_spark.operators.similarity import (
        lsh_config_search,
    )

    got = lsh_config_search(p_near, p_rand, floor, 16, 64)
    if got is None:
        return
    b, t, frac = got
    assert 1 <= b <= 16 and 1 <= t <= 64
    assert frac == t * p_rand**b < 1.0
    recall = 1.0 - (1.0 - p_near**b) ** t
    assert recall >= floor - 1e-9


@given(p_near=_P, p_rand=_P, floor=_FLOOR)
@settings(max_examples=300, deadline=None)
def test_lsh_config_search_matches_exhaustive_oracle(p_near, p_rand, floor):
    """The search's decision equals a from-scratch exhaustive
    reimplementation: same accept/refuse verdict, same minimal
    fraction (the chosen (b, T) may differ only on exact ties)."""
    import math

    from elb_log_to_mysql_spark.operators.similarity import (
        lsh_config_search,
    )

    candidates = []
    for b in range(1, 17):
        pb = p_near**b
        if pb <= 0.0:
            continue
        if pb >= 1.0:
            t = 1
        else:
            t = math.ceil(math.log(1.0 - floor) / math.log1p(-pb))
        if t < 1 or t > 64:
            continue
        frac = t * p_rand**b
        if frac < 1.0:
            candidates.append((frac, b, t))
    got = lsh_config_search(p_near, p_rand, floor, 16, 64)
    if not candidates:
        assert got is None
    else:
        assert got is not None
        assert got[2] == min(c[0] for c in candidates)


@given(p_near=_P, p_rand=_P, f1=_FLOOR, f2=_FLOOR)
@settings(max_examples=300, deadline=None)
def test_lsh_config_search_floor_monotone(p_near, p_rand, f1, f2):
    """A higher design floor can never buy a CHEAPER config: per-b
    table counts grow weakly with the floor and the valid set
    shrinks, so the minimal fraction is weakly larger — and an accept
    can flip to a refusal but never the reverse."""
    from elb_log_to_mysql_spark.operators.similarity import (
        lsh_config_search,
    )

    lo, hi = sorted((f1, f2))
    got_lo = lsh_config_search(p_near, p_rand, lo, 16, 64)
    got_hi = lsh_config_search(p_near, p_rand, hi, 16, 64)
    if got_hi is not None:
        assert got_lo is not None
        assert got_lo[2] <= got_hi[2] + 1e-12


@given(p=st.floats(min_value=1e-6, max_value=0.5), floor=_FLOOR)
@settings(max_examples=300, deadline=None)
def test_lsh_config_search_refuses_noise_like_neighbors(p, floor):
    """The provable-refusal regime (docstring): neighbors colliding no
    better than random pairs (p_near = p_rand = p ≤ 0.5) with a floor
    that needs more than whole-cluster one-table coverage. Every
    covering T costs T·p^b ≥ L·g(p^b), g(x) = x/-ln(1-x) — below the
    one-table regime that is pinned ≥ 1, so the search must refuse."""
    import math

    from elb_log_to_mysql_spark.operators.similarity import (
        lsh_config_search,
    )

    # restrict to the provable region: even b=1 is far from the
    # one-table cover (p ≤ 0.5 < x* for every floor ≥ 0.5)
    L = -math.log(1.0 - floor)
    if L * (p / -math.log(1.0 - p)) < 1.0:
        # outside the provable region for this (p, floor): g(p)·L < 1
        # means a near-full-scan single-table cover could qualify
        return
    assert lsh_config_search(p, p, floor, 16, 64) is None


@given(
    n=st.integers(min_value=1, max_value=10**12),
    probes=st.integers(min_value=1, max_value=64),
)
@settings(max_examples=300, deadline=None)
def test_derive_ivf_cells_clamps_and_monotone(n, probes):
    """Derived cell count respects every clamp, is weakly monotone in
    corpus size, and in the unclamped region sits at the discrete
    serving-cost optimum of f(C) = C + probes*n/C."""
    from elb_log_to_mysql_spark.operators.similarity import (
        derive_ivf_cells,
    )

    c = derive_ivf_cells(n, probes)
    # n_rows is the outermost cap (ADVICE r14): never more centers
    # than points, min_cells floor otherwise
    assert min(n, 16) <= c <= 4096 and c <= n
    assert c <= max(16, n // 50 if n >= 50 * 16 else 16)
    # weak monotonicity in n (one doubling step)
    assert derive_ivf_cells(2 * n, probes) >= c
    # local optimality when no clamp is binding
    import math

    raw = round(math.sqrt(probes * n))
    if 16 < c < min(4096, n // 50) and c == raw:
        f = lambda k: k + probes * n / k
        assert f(c) <= f(max(1, c // 2)) + 1e-9 or f(c) <= f(c - 1) + 1
        assert f(c) <= f(2 * c) + 1e-9 or f(c) <= f(c + 1) + 1
