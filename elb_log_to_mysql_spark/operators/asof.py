"""As-of (time-travel) join — an operator Spark has no builtin for.

Reference scope note: the reference engine has no joins at all
(/root/reference/etl_elb_log_to_mysql.py — linear parse pipeline,
SURVEY.md §2.1); this is part of the mandated extension surface.

Semantics: for every left row, attach the payload of the latest right
row with the same key and `right_ts <= left_ts` (backward as-of, the
kdb+/pandas `merge_asof` default). Ties on timestamp resolve to the
right row (a quote at trade time matches that trade).

Implementation — union-merge, not a range join:

    left ∪ right  →  one shuffle on key  →  per-key time-sorted
    window  →  last_value(right payload, ignorenulls)  →  keep left

A naive `join(l.key == r.key && r.ts <= l.ts)` + row_number builds
O(|L_k| × |R_k|) intermediate pairs per key before pruning — quadratic
in per-key cardinality, fatal at 100 TB. The union-merge form is
O(|L_k| + |R_k|) with exactly ONE shuffle (the window's partitionBy)
and no join operator in the plan at all; skewed keys cost a sort, not
a blow-up. This is the same merge-scan strategy a single-node engine
would use, expressed as a Spark window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TS, _SIDE = "_asof_ts", "_asof_side"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_values: dict[str, str],
    tolerance_us: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join (backward or forward).

    Parameters
    ----------
    on            : equality key columns (present on both sides)
    left_ts       : event-time column on `left`
    right_ts      : event-time column on `right`
    right_values  : {right column -> output name} payload to attach
    tolerance_us  : optional max |right_ts - left_ts| in microseconds;
                    matches further away are nulled out (pandas
                    merge_asof `tolerance` semantics)
    direction     : "backward" (latest right row <= left_ts, default)
                    or "forward" (earliest right row >= left_ts)

    Returns `left`'s columns plus the renamed right payload (null
    where no right row qualifies). Both directions are the same
    union-merge plan; forward just walks time reversed.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    out_names = list(right_values.values())
    reserved = set(on) | {_TS, _SIDE, "_asof_right_ts"}
    clash = (set(left.columns) & set(out_names)) | (set(out_names) & reserved)
    if clash:
        raise ValueError(f"right_values output names collide: {sorted(clash)}")

    # side 0 = right, sorts before side 1 = left at equal ts, so an
    # exactly-simultaneous right row is visible to the left row.
    l_tagged = left.withColumn(_TS, F.col(left_ts)).withColumn(_SIDE, F.lit(1))
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        F.col(right_ts).alias("_asof_right_ts"),
        *[F.col(src).alias(dst) for src, dst in right_values.items()],
    )
    merged = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    # Total order: ts, then side, then the right payload itself — so
    # when several right rows share one timestamp the survivor is the
    # greatest payload tuple, deterministically, at any partitioning
    # (payload columns are null on left rows, which leaves their
    # relative order irrelevant: they carry no values to propagate).
    ts_key = F.col(_TS).asc() if direction == "backward" else F.col(_TS).desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_key, _SIDE, *[F.col(c).asc_nulls_first() for c in out_names])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [
        F.last(c, ignorenulls=True).over(w).alias(c)
        for c in [*out_names, "_asof_right_ts"]
    ]
    result = (
        merged.select(
            *[c for c in merged.columns if c not in {*out_names, "_asof_right_ts"}],
            *carried,
        )
        .filter(F.col(_SIDE) == 1)
        .drop(_TS, _SIDE)
    )

    if tolerance_us is not None:
        lt, rt = F.unix_micros(F.col(left_ts)), F.unix_micros(F.col("_asof_right_ts"))
        age = (lt - rt) if direction == "backward" else (rt - lt)
        stale = F.col("_asof_right_ts").isNull() | (age > F.lit(tolerance_us))
        for c in out_names:
            result = result.withColumn(
                c, F.when(stale, F.lit(None)).otherwise(F.col(c))
            )
    return result.drop("_asof_right_ts")
