"""Custom Python Data Source (Spark 4 DataSource API): a
deterministic synthetic-events generator.

The reference ingests from an object store (etl:53-61); this is the
other end of the source spectrum a Spark-4-native engine should
cover — a source implemented IN PYTHON against the V2-style
`pyspark.sql.datasource` API: schema declaration, option handling,
and partition-parallel reads (one InputPartition per slice, each
executor materializes only its slice). Used for load generation and
harness seeding; because every field is a closed-form function of the
row index, a SQL oracle can replay the whole table independently
(the gate does exactly that over DuckDB's range()).

Generator contract (row i of n, all integer arithmetic):
    event_id = i
    user_id  = i % 97
    event_type = ('view','click','purchase','signup','error')[i % 5]
    cents    = (i * 31) % 10000
Partitioning: `parts` slices of n/parts contiguous ids each (n must
divide evenly; the source validates), so output is identical at any
parallelism.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

EVENT_TYPES = ("view", "click", "purchase", "signup", "error")


class SynthEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 10000))
        self.parts = int(options.get("parts", 8))
        if self.n % self.parts:
            raise ValueError(
                f"n={self.n} must be divisible by parts={self.parts}"
            )

    def partitions(self):
        return [InputPartition(i) for i in range(self.parts)]

    def read(self, partition):
        per = self.n // self.parts
        start = partition.value * per
        for i in range(start, start + per):
            yield (i, i % 97, EVENT_TYPES[i % 5], (i * 31) % 10000)


class SynthEventsDataSource(DataSource):
    """spark.read.format("synth_events").option("n", ...).load()"""

    @classmethod
    def name(cls) -> str:
        return "synth_events"

    def schema(self) -> str:
        return "event_id long, user_id long, event_type string, cents long"

    def reader(self, schema):
        return SynthEventsReader(self.options)

    def simpleStreamReader(self, schema):
        return SynthEventsStreamReader(self.options)


def register(spark) -> None:
    """Idempotent per-session registration."""
    spark.dataSource.register(SynthEventsDataSource)


class SynthEventsStreamReader(SimpleDataSourceStreamReader):
    """SimpleDataSourceStreamReader over the same generator: offsets
    are row indices; each micro-batch emits the next `chunk` ids.
    Exactly-once comes from the offset contract — a redelivered
    (start, end) range regenerates identical rows because the
    generator is a pure function of the index."""

    def __init__(self, options):
        self.n = int(options.get("n", 10000))
        self.chunk = int(options.get("chunk", 1000))

    def initialOffset(self):
        return {"i": 0}

    @staticmethod
    def _rows(lo, hi):
        # a concrete list (wrapped in iter() by callers): the
        # simple-reader API pickles the prefetched batch to ship it
        # to executors, so a lazy generator cannot cross the boundary
        return [
            (i, i % 97, EVENT_TYPES[i % 5], (i * 31) % 10000)
            for i in range(lo, hi)
        ]

    def read(self, start):
        lo = start["i"]
        hi = min(lo + self.chunk, self.n)
        return iter(self._rows(lo, hi)), {"i": hi}

    def readBetweenOffsets(self, start, end):
        return iter(self._rows(start["i"], end["i"]))

    def commit(self, end):
        pass
