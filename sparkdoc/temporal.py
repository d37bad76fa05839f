"""Temporal join analogs: as-of join and bucketized interval join.

Spark has no native ASOF JOIN (DuckDB/Pandas/kdb do) and a naive
`l.ts >= r.ts` theta-join is a broadcast-nested-loop — O(|L|·|R|) per key
and a non-starter at 100 TB. Both operators here are re-expressed as
equi-shuffle plans:

- ``asof_join``: ONE shuffle total. Tag both sides, union them, and run a
  single `last_value(ignorenulls)` window per key ordered by
  (ts, side, tiebreak) — every left row picks up the latest right row at or
  before it while the data streams through one sort. No join node at all,
  so there is nothing to explode on skewed keys beyond the sort itself.
- ``interval_join``: the classic bucketed range join. Both sides get a
  coarse time bucket of width `max_gap`; the right side explodes to
  {b-1, b, b+1}; an equi-join on (key, bucket) generates candidates and the
  exact |Δts| <= gap predicate filters. Candidate count is bounded by
  actual temporal locality, never |L|·|R|.

Determinism contract: ties among right rows at the same (key, ts) resolve
to the greatest tiebreak column; all lag arithmetic is integer microseconds
(unix_micros / epoch_us) so the DuckDB LATERAL twin is bit-exact.

No counterpart in the reference repo (it has no event-stream engine);
these are LLM-data-pipeline additions (event-log feature joins: "state of
X as of each training example's timestamp").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _us(col: str | Column) -> Column:
    """Microseconds since epoch as BIGINT. Parquet event times load as
    TIMESTAMP_NTZ; the session timezone is pinned to UTC (session.py), so
    casting to TIMESTAMP is the exact UTC interpretation DuckDB's epoch_us
    applies — no DST/offset skew can enter the lag arithmetic."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    right_vals: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    tiebreak: str | None = None,
    tolerance_s: float | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """For every left row, attach the latest right row with
    ``right.ts <= left.ts`` on the same key (inclusive, like DuckDB's
    ASOF JOIN >=). Right-side columns come back as ``{prefix}{col}`` plus
    ``{prefix}lag_us`` (BIGINT microseconds, NULL when unmatched).

    ``tiebreak``: right column deciding among equal-(key, ts) right rows —
    the GREATEST value wins (deterministic; required when right ts can
    collide). ``tolerance_s``: matches older than this many seconds are
    nulled out (tolerance applies to the already-chosen latest match,
    matching DuckDB `ASOF JOIN .. WHERE lag <= tol` semantics on a
    deduplicated right side).

    Plan shape: union → one Exchange on key → window sort. The payload
    struct rides the sort; left columns pass through untouched.
    """
    tb = tiebreak or right_ts
    # the tiebreak rides the sort as a double: a non-numeric column would
    # cast to NULL and silently void the "greatest tiebreak wins" guarantee
    # (every equal-(key, ts) row would tie on NULL and the winner would be
    # partition-order luck) — fail fast instead. Integer tiebreaks beyond
    # 2^53 would likewise collapse; spot it here, not in the output.
    from pyspark.sql.types import (
        DateType, NumericType, TimestampNTZType, TimestampType,
    )

    tb_type = right.schema[tb].dataType
    if not isinstance(tb_type, (NumericType, DateType, TimestampType, TimestampNTZType)):
        raise ValueError(
            f"asof_join: tiebreak column {tb!r} has non-orderable-as-double "
            f"type {tb_type.simpleString()} — pass a numeric/timestamp "
            "column (string ids would tie on NULL and pick a nondeterministic "
            "winner)"
        )
    payload = F.struct(
        _us(right_ts).alias("_ts_us"),
        *[F.col(c).alias(c) for c in right_vals],
    )
    # equality-join semantics for NULL keys (the DuckDB ASOF twin's): a
    # NULL-keyed right row can never match, so it is dropped; NULL-keyed
    # left rows pass through unmatched (the window would otherwise group
    # all NULLs together and hand them each other's payloads)
    r = right
    for c in key_cols:
        r = r.filter(F.col(c).isNotNull())
    r = r.select(
        *[F.col(c) for c in key_cols],
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        F.col(tb).cast("double").alias("_tb"),
        payload.alias("_pay"),
    )
    lcols = left.columns
    l = left.select(
        *[F.col(c) for c in key_cols],
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(0.0).alias("_tb"),
        F.lit(None).cast(r.schema["_pay"].dataType).alias("_pay"),
        F.struct(*[F.col(c) for c in lcols]).alias("_lrow_s"),
    )
    r = r.withColumn("_lrow_s", F.lit(None).cast(l.schema["_lrow_s"].dataType))
    u = r.unionByName(l)
    # right rows sort BEFORE left rows at equal ts (inclusive match); among
    # equal right (key, ts) the greatest tiebreak sorts last and wins
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("_t").asc(), F.col("_side").asc(), F.col("_tb").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.withColumn("_m", F.last("_pay", ignorenulls=True).over(w))
    out = carried.filter(F.col("_side") == 1)
    lag_us = _us("_t") - F.col("_m._ts_us")
    if tolerance_s is not None:
        keep = lag_us <= F.lit(int(round(tolerance_s * 1_000_000)))
        out = out.withColumn("_m", F.when(keep, F.col("_m")))
        lag_us = _us("_t") - F.col("_m._ts_us")
    return out.select(
        *[F.col(f"_lrow_s.{c}").alias(c) for c in lcols],
        *[F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in right_vals],
        lag_us.alias(f"{prefix}lag_us"),
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    max_gap_s: float,
    left_ts: str = "ts",
    right_ts: str = "ts",
    left_cols: list[str] | None = None,
    right_cols: list[str] | None = None,
) -> DataFrame:
    """All (left, right) pairs on the same key with |left.ts - right.ts|
    <= max_gap seconds, as a bucketed EQUI-join: bucket = floor(ts_us /
    gap_us); the right side explodes to {b-1, b, b+1} (3× the right rows,
    a constant) and the join runs on (key, bucket) with the exact predicate
    as a post-filter. Adds ``gap_us`` (signed: left_ts - right_ts).

    At 100 TB this is the difference between a shuffle hash join and a
    broadcast-nested-loop: candidates are bounded by rows per time bucket,
    and AQE's skew split applies because the join IS an equi-join."""
    gap_us = int(round(max_gap_s * 1_000_000))
    if gap_us <= 0:
        raise ValueError(
            f"interval_join: max_gap_s={max_gap_s} rounds to a {gap_us} µs "
            "bucket — `us % 0` is NULL (silently empty result) or a "
            "DIVIDE_BY_ZERO under ANSI; for exact-timestamp pairs use an "
            "equi-join on the timestamp instead"
        )
    # explicit [] means "no payload columns" — only None selects the default
    lc = [c for c in left.columns if c not in key_cols] if left_cols is None else left_cols
    rc = [c for c in right.columns if c not in key_cols] if right_cols is None else right_cols
    # exact BIGINT floor-division ((us - us % gap) / gap on exact multiples,
    # all < 2^53 so the double divide is exact) — the bucket id must be
    # bit-identical to the twin's `//` on epoch_us (timestamps are positive,
    # so % and floor-div agree across engines)
    def _bucket(us: Column) -> Column:
        return ((us - us % F.lit(gap_us)) / F.lit(gap_us)).cast("long")

    lus = _us(left_ts)
    l = left.select(
        *key_cols,
        _bucket(lus).alias("_b"),
        lus.alias("_lus"),
        *[F.col(c).alias(f"l_{c}") for c in lc],
    )
    rus = _us(right_ts)
    rb = _bucket(rus)
    r = right.select(
        *key_cols,
        F.explode(F.array(rb - 1, rb, rb + 1)).alias("_b"),
        rus.alias("_rus"),
        *[F.col(c).alias(f"r_{c}") for c in rc],
    )
    joined = l.join(r, [*key_cols, "_b"])
    exact = F.abs(F.col("_lus") - F.col("_rus")) <= F.lit(gap_us)
    return joined.filter(exact).select(
        *key_cols,
        *[f"l_{c}" for c in lc],
        *[f"r_{c}" for c in rc],
        (F.col("_lus") - F.col("_rus")).alias("gap_us"),
    )
