"""Streaming MinHash-LSH near-duplicate candidate generation.

The batch near-dedup (operators/dedup.py:near_dedup_minhash) finds
candidate pairs with a self-join on (band_idx, band_hash); on a
continuous ingest stream the same bucket keys become STATE: each LSH
bucket remembers the doc ids it has seen, and a new document that
lands in a non-empty bucket emits a candidate pair against every
remembered occupant. Band-key derivation is the identical column
expression as the batch path (dedup.band_hashes); the signature
kernel is a JVM-expression minhash (`minhash_signatures_expr`)
rather than the batch path's Arrow-vectorized kernel, because a
scalar pandas UDF cannot be planned upstream of
applyInPandasWithState inside one micro-batch (Spark plans the UDF
into the stateful operator's child Project, where it cannot
evaluate — verified empirically). Seeded-xxhash64 min is an equally
valid minhash family with the same LSH S-curve, so the recall
contract is unchanged; the stream-vs-batch candidate-set equivalence
test derives the batch twin from the SAME expressions
(tests pin this), it just isn't bit-compatible with
vectorops.minhash_signatures' multiply-shift family.

Design split — candidates stream, verification is a join:
the stream ships (doc_id, band_idx, band_hash) rows only (three
longs; shingle sets stay OUT of the shuffle and the state store,
exactly like the batch path keeps them out of the band self-join).
Emitted candidates are verified with exact Jaccard by joining the
shingle sets back from the corpus store — in production a batch
verifier over the landed table, here the same verification join the
batch operator uses. Precision therefore stays STRUCTURAL (every
reported pair is exact-verified); recall is the LSH S-curve, same
contract as `near_dedup`.

State size: O(occupied buckets × bucket occupancy), bounded two ways:
`max_per_bucket` — a degenerate bucket (spam cluster) stops
accumulating state and stops emitting pairs beyond the cap, the
streaming twin of the batch `max_bucket` skew guard — and
`idle_timeout_ms` — a bucket untouched for that long is evicted from
the state store (the dedup HORIZON: a new document no longer pairs
against occupants older than the horizon), the same
processing-time-timeout pattern as stateful.py's profile operator.
Without a timeout, state is a pure function of the input and the
gate checks it bit-for-bit; production continuous ingest always sets
one.

State-store provider: the operator keys state on (band_idx,
band_hash) — O(corpus) DISTINCT groups (16 per doc), so the default
in-heap HDFSBacked provider stops fitting long before the data does
(measured: 1.6M buckets OOM an 8 GiB local JVM at the 20x probe
scale). Set `spark.sql.streaming.stateStore.providerClass` to
RocksDBStateStoreProvider for any real corpus — state then lives
off-heap/on-disk and the probe exercises exactly that configuration
(tools/scale_probe_newops.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from elb_log_to_mysql_spark.operators.dedup import band_hashes, word_shingles


def minhash_signatures_expr(
    shingle_hashes, num_hashes: int = 64
) -> "F.Column":
    """JVM-expression minhash over an array<long> of shingle hashes:
    sig_i = min over shingles of xxhash64(shingle, i). Seeding each
    hash function by its index gives an independent family; signed
    min is a valid total order for the argmin (any consistent order
    over a uniform hash works). Interpreted HOF per row (64 passes) —
    acceptable at streaming ingest rates; the batch operator keeps
    its Arrow-vectorized multiply-shift kernel which this
    deliberately does NOT replicate (ANSI mode forbids the JVM
    wraparound arithmetic that family needs)."""
    return F.array(
        *[
            F.array_min(
                F.transform(
                    shingle_hashes, lambda h, i=i: F.xxhash64(h, F.lit(i))
                )
            )
            for i in range(num_hashes)
        ]
    )

BUCKET_STATE_SCHEMA = T.StructType(
    [T.StructField("doc_ids", T.ArrayType(T.LongType()))]
)

PAIR_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id_a", T.LongType()),
        T.StructField("doc_id_b", T.LongType()),
    ]
)


def make_bucket_update_fn(
    max_per_bucket: int = 1000, idle_timeout_ms: int | None = None
):
    """Per-bucket state update: emit (smaller_id, larger_id) for every
    (remembered occupant, new arrival) pair, then remember the
    arrival. Batch rows are processed in doc_id order so the emitted
    set is a pure function of the input corpus, not of Arrow batch
    ordering. With `idle_timeout_ms`, a bucket idle that long is
    dropped from the state store (emitting nothing — a dedup bucket
    has no final aggregate to flush), bounding state to buckets
    touched within the horizon."""

    def _update(
        key: tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # horizon passed: forget the bucket; nothing to emit
            state.remove()
            return
        seen: list[int] = list(state.get[0]) if state.exists else []
        out_a: list[int] = []
        out_b: list[int] = []
        for pdf in batches:
            for doc_id in sorted(int(d) for d in pdf["doc_id"]):
                if doc_id in seen:
                    continue  # redelivered input: exactly-once emission
                if len(seen) >= max_per_bucket:
                    break  # skew guard: degenerate bucket stops pairing
                for other in seen:
                    lo, hi = (other, doc_id) if other < doc_id else (doc_id, other)
                    out_a.append(lo)
                    out_b.append(hi)
                seen.append(doc_id)
        state.update((seen,))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        if out_a:
            yield pd.DataFrame({"doc_id_a": out_a, "doc_id_b": out_b})

    return _update


def stream_band_collisions(
    documents,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    max_per_bucket: int = 1000,
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Streaming LSH candidate pairs over a documents stream.

    Returns an append-mode stream of (doc_id_a, doc_id_b) candidate
    pairs (doc_id_a < doc_id_b; the same pair may surface from
    several bands — dedupe downstream, where the verifier joins the
    shingle sets anyway). `idle_timeout_ms` bounds bucket state to
    the dedup horizon (see module docstring)."""
    rows_per_band = num_hashes // bands
    sh = documents.select(
        F.col(id_col).alias("doc_id"),
        F.transform(
            word_shingles(text_col, shingle_n), lambda s: F.xxhash64(s)
        ).alias("shingles"),
    ).filter(F.size("shingles") > 0)
    sig = sh.withColumn(
        "sig", minhash_signatures_expr(F.col("shingles"), num_hashes)
    )
    banded = sig.select(
        "doc_id",
        F.posexplode(band_hashes(F.col("sig"), bands, rows_per_band)).alias(
            "band_idx", "band_hash"
        ),
    )
    return banded.groupBy("band_idx", "band_hash").applyInPandasWithState(
        make_bucket_update_fn(max_per_bucket, idle_timeout_ms),
        outputStructType=PAIR_OUTPUT_SCHEMA,
        stateStructType=BUCKET_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if idle_timeout_ms is None
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )


def verify_candidate_pairs(
    candidates: DataFrame,
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.6,
) -> DataFrame:
    """Exact-Jaccard verification of streamed candidate pairs against
    the corpus store — identical math to the batch operator's
    verification leg, so precision is structural."""
    sh = documents.select(
        F.col(id_col).alias("doc_id"),
        F.transform(
            word_shingles(text_col, shingle_n), lambda s: F.xxhash64(s)
        ).alias("shingles"),
    ).filter(F.size("shingles") > 0)
    cand = candidates.dropDuplicates(["doc_id_a", "doc_id_b"])
    joined = cand.join(
        sh.select(F.col("doc_id").alias("doc_id_a"), F.col("shingles").alias("sh_a")),
        "doc_id_a",
    ).join(
        sh.select(F.col("doc_id").alias("doc_id_b"), F.col("shingles").alias("sh_b")),
        "doc_id_b",
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        joined.withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_id_a", "doc_id_b", "jaccard")
    )
