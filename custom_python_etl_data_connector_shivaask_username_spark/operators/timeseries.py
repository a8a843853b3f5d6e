"""X32: time-series gap fill / resample — dense-grid densification
with LOCF / NOCB / linear-interpolation / constant fills.

A rollup (X22) or any bucketed series only has rows for buckets that
saw data; downstream consumers (charting, joins against a calendar,
training-window extraction) need a DENSE series with an explicit fill
policy. TimescaleDB calls this ``time_bucket_gapfill`` + ``locf`` /
``interpolate``; this module re-expresses it Spark-first:

- ``time_spine`` — one row per (group, bucket) over each group's (or
  the global) observed [min, max] range at a fixed step. Built with
  ``F.sequence`` + ``explode`` — the grid is generated DISTRIBUTED,
  per group, never as a driver-side loop, and a loud
  ``assert_true`` cap on per-group bucket count catches a mis-typed
  step ("1 second" over a year) before it materializes.
- ``gap_fill`` — left-join the observed series onto the spine, then
  fill each value column by policy: ``locf`` (last observation
  carried forward), ``nocb`` (next observation carried backward),
  ``linear`` (time-weighted interpolation between the neighboring
  observations), ``zero`` / ``("const", v)``, or ``None`` (leave
  NULL). Fill policies apply to NULL cells — gap rows are NULL by
  construction, and an *observed* NULL is treated as missing too,
  the TimescaleDB ``locf`` convention.
- ``gap_fill_rollup`` — convenience composition over the X22 store:
  ``read_rollup`` → dense hourly/daily series (counts fill to 0,
  value aggregates carry forward).

100 TB shape: the spine is ``groups × buckets`` rows — for bucketed
inputs that is metadata-scale next to the raw feed (it is the same
cardinality as the rollup store itself). The spine join is an
equi-join on (group, bucket) that AQE broadcasts when small; the
fills are single-pass window functions partitioned by group, so the
work distributes across groups and each group's timeline is one
sorted partition stream — the same shape as any windowed query in
`operators/windows.py`. Nothing is collected to the driver.

Correctness: pinned against DuckDB (``generate_series`` spine +
``IGNORE NULLS`` window fills) in `tests/test_timeseries.py`, plus
hand-computed interpolation fixtures and identity-on-dense-input.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

#: loud default cap on buckets a single group's spine may generate —
#: a mis-typed step is an error, not a 2^31-row explode
MAX_BUCKETS_PER_GROUP = 1_000_000

#: recognized fill policies (beside ("const", v) tuples and None)
FILL_POLICIES = ("locf", "nocb", "linear", "zero")


def time_spine(
    df: DataFrame,
    ts_col: str,
    step: str,
    group_cols: list[str],
    bounds: str = "per_group",
    max_buckets_per_group: int = MAX_BUCKETS_PER_GROUP,
) -> DataFrame:
    """Dense (group, bucket) grid covering the observed time range.

    ``step`` is an interval literal ("1 hour", "15 minutes").
    ``bounds="per_group"`` spans each group's own [min, max] — no
    fabricated history before a group's first observation;
    ``bounds="global"`` spans the table-wide range for every group
    (calendar-aligned comparisons). Input timestamps are assumed
    step-aligned (bucketed upstream, e.g. by ``date_trunc`` or the
    rollup); the spine lands on exactly those stamps.
    """
    if bounds not in ("per_group", "global"):
        raise ValueError("bounds must be 'per_group' or 'global'")
    if not group_cols:
        raise ValueError("time_spine needs at least one group column")
    interval = F.expr(f"interval {step}")
    lo, hi = F.min(ts_col).alias("__lo"), F.max(ts_col).alias("__hi")
    if bounds == "per_group":
        ranges = df.groupBy(*group_cols).agg(lo, hi)
    else:
        ranges = df.select(*group_cols).distinct().crossJoin(
            F.broadcast(df.agg(lo, hi))
        )
    return ranges.select(
        *group_cols,
        F.explode(
            _guarded_seq(step, max_buckets_per_group, "time_spine")
        ).alias(ts_col),
    )


def _guarded_seq(step: str, max_buckets: int, label: str) -> Column:
    """Guarded ``sequence(__lo, __hi, step)``, shared by the time and
    grid spines. The bucket count is pre-checked ARITHMETICALLY —
    ``size(sequence(...))`` would materialize the full per-row array,
    so an extreme step would OOM before any assert fires; CaseWhen
    evaluates the value branch only after the condition passes, so
    the sequence is never built for a failing row. Month-ish steps
    use their 1970-01 epoch length — close enough for a sanity cap.
    NULL bounds (an empty frame's global agg row, an all-NULL group)
    yield a NULL sequence that ``explode`` drops: empties densify to
    empties instead of tripping the cap assert with a misleading
    message."""
    interval = F.expr(f"interval {step}")
    t0 = F.lit("1970-01-01 00:00:00").cast("timestamp")
    step_secs = _epoch(t0 + interval) - _epoch(t0)
    n_buckets = (
        _epoch(F.col("__hi")) - _epoch(F.col("__lo"))
    ) / step_secs + F.lit(1.0)
    seq = F.sequence(F.col("__lo"), F.col("__hi"), interval)
    return F.when(
        F.col("__lo").isNull() | F.col("__hi").isNull(), F.lit(None)
    ).when(
        F.assert_true(
            n_buckets <= F.lit(float(max_buckets)),
            f"{label}: a series spans more than {max_buckets} "
            f"buckets at step '{step}' — wrong step or unbounded "
            "range",
        ).isNull(),
        seq,
    )


def _epoch(c: Column) -> Column:
    """Seconds-since-epoch as double for interpolation weights (only
    ever used in differences, so the ntz→session-tz convention
    cancels)."""
    return c.cast("timestamp").cast("double")


def _fill_expr(
    c: str, spec: Any, ts_col: str, w_prev: Window, w_next: Window
) -> Column:
    col = F.col(c)
    if spec is None:
        return col
    if spec == "locf":
        return F.last(col, ignorenulls=True).over(w_prev)
    if spec == "nocb":
        return F.first(col, ignorenulls=True).over(w_next)
    if spec == "zero":
        return F.coalesce(col, F.lit(0))
    if isinstance(spec, tuple) and len(spec) == 2 and spec[0] == "const":
        return F.coalesce(col, F.lit(spec[1]))
    if spec == "linear":
        obs_ts = F.when(col.isNotNull(), F.col(ts_col))
        prev_v = F.last(col, ignorenulls=True).over(w_prev)
        prev_t = F.last(obs_ts, ignorenulls=True).over(w_prev)
        next_v = F.first(col, ignorenulls=True).over(w_next)
        next_t = F.first(obs_ts, ignorenulls=True).over(w_next)
        frac = (_epoch(F.col(ts_col)) - _epoch(prev_t)) / (
            _epoch(next_t) - _epoch(prev_t)
        )
        interp = prev_v + (next_v - prev_v) * frac
        return F.when(col.isNotNull(), col).otherwise(interp)
    raise ValueError(f"unknown fill policy for column {c!r}: {spec!r}")


def calendar_spine(
    df: DataFrame,
    calendar: DataFrame,
    ts_col: str,
    group_cols: list[str],
) -> DataFrame:
    """Spine from an EXPLICIT calendar (business days, trading hours,
    holiday-aware buckets — anything a fixed step can't express):
    every observed group × every calendar row. ``calendar`` is a
    one-column frame named ``ts_col``; it is broadcast (calendars are
    metadata-sized by nature)."""
    if calendar.columns != [ts_col]:
        raise ValueError(
            f"calendar must have exactly one column named {ts_col!r}"
        )
    return (
        df.select(*group_cols)
        .distinct()
        .crossJoin(F.broadcast(calendar))
    )


def gap_fill(
    df: DataFrame,
    ts_col: str,
    step: str,
    group_cols: list[str],
    fill: dict[str, Any],
    bounds: str = "per_group",
    mark_gaps: str | None = None,
    max_buckets_per_group: int = MAX_BUCKETS_PER_GROUP,
    spine: DataFrame | None = None,
) -> DataFrame:
    """Densify a bucketed series and fill the gaps.

    ``df`` holds at most one row per (group, bucket); ``fill`` maps
    each value column to a policy from ``FILL_POLICIES`` /
    ``("const", v)`` / ``None``. Policies fill NULL cells: gap rows
    are NULL by construction, and observed NULLs are treated as
    missing (the TimescaleDB ``locf`` convention). ``linear`` leaves
    edge gaps (no neighbor on one side) NULL; ``locf``/``nocb``
    likewise before the first / after the last observation.
    ``mark_gaps`` adds a boolean column flagging spine-fabricated
    rows. A custom ``spine`` (e.g. :func:`calendar_spine`) overrides
    the generated grid — rows outside it are DROPPED (calendar
    semantics), rows inside it densify as usual; ``step``/``bounds``
    are ignored then."""
    unknown = set(fill) - set(df.columns)
    if unknown:
        raise ValueError(f"fill references absent columns: {sorted(unknown)}")
    if spine is None:
        spine = time_spine(
            df, ts_col, step, group_cols, bounds, max_buckets_per_group
        )
    obs_col = "__obs"
    while obs_col in df.columns:  # never clobber a caller's column
        obs_col += "_"
    obs = df.withColumn(obs_col, F.lit(1))
    dense = spine.join(obs, on=[*group_cols, ts_col], how="left")
    w = Window.partitionBy(*group_cols).orderBy(ts_col)
    w_prev = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_next = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    out = dense.select(
        *group_cols,
        ts_col,
        *[
            _fill_expr(c, fill.get(c), ts_col, w_prev, w_next).alias(c)
            for c in df.columns
            if c not in group_cols and c != ts_col
        ],
        *(
            [F.col(obs_col).isNull().alias(mark_gaps)]
            if mark_gaps
            else []
        ),
    )
    return out


def gap_fill_rollup(
    spark: SparkSession,
    store_path: str,
    step: str = "1 hour",
    mark_gaps: str | None = "is_gap",
) -> DataFrame:
    """Dense rollup series straight off the X22 store: counts fill to
    0 (no events IS zero events), value aggregates carry forward
    (LOCF — "level as of"), min/max left NULL for fabricated buckets
    (there was no extremum)."""
    from .rollup import read_rollup

    return gap_fill(
        read_rollup(spark, store_path),
        ts_col="window_start",
        step=step,
        group_cols=["event_type"],
        fill={
            "event_count": ("const", 0),
            "total_value": ("const", 0.0),
            "avg_value": "locf",
            "min_value": None,
            "max_value": None,
        },
        mark_gaps=mark_gaps,
    )


#: loud default cap on the dense dimensional grid (X39) — a
#: high-cardinality dimension is an error, not a 10^12-cell explode
MAX_GRID_CELLS = 10_000_000


def dim_spine(
    df: DataFrame,
    dim_cols: list[str],
    domains: dict[str, DataFrame] | None = None,
    max_cells: int = MAX_GRID_CELLS,
) -> DataFrame:
    """X39: dense NON-TIME grid — the cross product of each
    dimension's observed domain (or a caller-supplied one).

    The time spine answers "every bucket between min and max"; a
    dimensional spine answers "every (store, product) cell, observed
    or not" — the densification a sales cube, an experiment×bucket
    matrix, or a confusion-matrix report needs before "absent" can
    mean "zero" instead of "missing row".

    ``domains`` optionally overrides a dimension's observed distinct
    values with an explicit one-column frame (the calendar_spine
    convention): cells outside a supplied domain are DROPPED, cells
    inside densify. The grid size (product of per-dim distinct
    counts, computed in one cheap agg) must clear ``max_cells`` —
    a high-cardinality dimension errors loudly BEFORE anything
    materializes, the ``time_spine`` cap convention.

    100 TB shape: each domain is a distinct over one dimension
    column (tiny by definition of "dimension"); the chained
    ``crossJoin`` of broadcast-sized domains never shuffles; the
    guard agg is one pass over the dim columns only (column-pruned
    scan)."""
    if not dim_cols or len(dim_cols) < 2:
        raise ValueError("dim_spine needs at least two dimension columns")
    missing = set(dim_cols) - set(df.columns)
    if missing:
        raise ValueError(f"dim columns absent from frame: {sorted(missing)}")
    domains = domains or {}
    for c, dom in domains.items():
        if dom.columns != [c]:
            raise ValueError(
                f"domain for {c!r} must be a one-column frame named {c!r}"
            )
    counts_row = df.agg(
        *[F.countDistinct(c).alias(c) for c in dim_cols if c not in domains]
    ).first() if any(c not in domains for c in dim_cols) else {}
    cells = 1
    for c in dim_cols:
        cells *= (
            domains[c].count() if c in domains else int(counts_row[c] or 0)
        )
        if cells > max_cells:
            raise ValueError(
                f"dim_spine: grid exceeds {max_cells} cells at {c!r} — "
                "a dimension is too high-cardinality to densify"
            )
    spine = None
    for c in dim_cols:
        dom = domains.get(c)
        if dom is None:
            dom = df.select(c).where(F.col(c).isNotNull()).distinct()
        dom = F.broadcast(dom)
        spine = dom if spine is None else spine.crossJoin(dom)
    return spine


def dim_gap_fill(
    df: DataFrame,
    dim_cols: list[str],
    fill: dict[str, Any],
    mark_gaps: str | None = None,
    domains: dict[str, DataFrame] | None = None,
    max_cells: int = MAX_GRID_CELLS,
) -> DataFrame:
    """Densify onto the dimensional grid and fill fabricated cells.

    ``df`` holds at most one row per dim tuple (aggregate upstream —
    the same contract ``gap_fill`` has per bucket). Without an
    ordering axis only order-free policies make sense here:
    ``zero`` / ``("const", v)`` / ``None`` — LOCF/NOCB/linear live in
    :func:`gap_fill`, where time provides the order. Observed NULLs
    are filled too (consistent with the time-side convention that a
    NULL cell is a missing measurement)."""
    unknown = set(fill) - set(df.columns)
    if unknown:
        raise ValueError(f"fill references absent columns: {sorted(unknown)}")
    for c, spec in fill.items():
        ok = spec is None or spec == "zero" or (
            isinstance(spec, tuple) and len(spec) == 2 and spec[0] == "const"
        )
        if not ok:
            raise ValueError(
                f"dim_gap_fill supports zero/const/None fills only "
                f"(no ordering axis); got {spec!r} for {c!r} — use "
                "gap_fill for ordered policies"
            )
    spine = dim_spine(df, dim_cols, domains, max_cells)
    obs_col = "__obs"
    while obs_col in df.columns:
        obs_col += "_"
    obs = df.withColumn(obs_col, F.lit(1))
    dense = spine.join(obs, on=list(dim_cols), how="left")
    def _const_fill(c: str) -> Column:
        # the accepted policies are all window-free coalesces — no
        # ordering semantics exist (or are implied) on a dim grid
        spec = fill.get(c)
        if spec is None:
            return F.col(c)
        if spec == "zero":
            return F.coalesce(F.col(c), F.lit(0))
        return F.coalesce(F.col(c), F.lit(spec[1]))  # ("const", v)

    return dense.select(
        *dim_cols,
        *[
            _const_fill(c).alias(c)
            for c in df.columns
            if c not in dim_cols
        ],
        *(
            [F.col(obs_col).isNull().alias(mark_gaps)]
            if mark_gaps
            else []
        ),
    )


def grid_gap_fill(
    df: DataFrame,
    ts_col: str,
    step: str,
    dim_cols: list[str],
    fill: dict[str, Any],
    domains: dict[str, DataFrame] | None = None,
    mark_gaps: str | None = None,
    max_cells: int = MAX_GRID_CELLS,
    max_buckets: int = MAX_BUCKETS_PER_GROUP,
    max_grid_rows: int = MAX_GRID_CELLS,
) -> DataFrame:
    """X32×X39 composed (round 9): densify onto (every dimensional
    cell) × (every time bucket in the GLOBAL observed range) and fill
    by policy — the per-store-per-product daily series with LOCF that
    previously required manual spine composition.

    This differs from ``gap_fill(group_cols=dim_cols)`` in exactly
    the way a sales cube needs: that form densifies only OBSERVED dim
    tuples over each tuple's own time span; this one fabricates
    never-observed (store, product) cells too (X39 cross product,
    ``domains`` overrides per X39's contract) and spans the
    table-global time range for every cell — a cell with no
    observations at all becomes a full series of gap rows. Ordered
    policies (locf/nocb/linear) are meaningful here (time orders each
    cell's series); counts usually want ``("const", 0)``.

    Guards, all before anything materializes: the X39 cell cap, the
    arithmetic bucket cap, and a combined ``max_grid_rows`` on
    cells × buckets (two metadata-scale counts) — a wide grid times a
    fine step must be an error, not a 10^12-row explode."""
    if len(dim_cols) == 1:
        # a 1-D "grid" is just the dimension's domain — dim_spine's
        # cross-product machinery (and its ≥2-dims contract) is moot
        c = dim_cols[0]
        if domains and c in domains:
            if domains[c].columns != [c]:
                raise ValueError(
                    f"domain for {c!r} must be a one-column frame "
                    f"named {c!r}"
                )
            cells = domains[c]
        else:
            cells = df.select(c).where(F.col(c).isNotNull()).distinct()
    else:
        cells = dim_spine(df, dim_cols, domains, max_cells)
    bounds = df.agg(
        F.min(ts_col).alias("__lo"), F.max(ts_col).alias("__hi")
    )
    axis = bounds.select(
        F.explode(
            _guarded_seq(step, max_buckets, "grid_gap_fill")
        ).alias(ts_col)
    )
    # combined budget: both counts are metadata-scale (the cell frame
    # is a broadcast cross product of tiny distinct sets; the axis is
    # one guarded sequence)
    n_cells = cells.count()
    n_axis = axis.count()
    if n_cells * n_axis > max_grid_rows:
        raise ValueError(
            f"grid_gap_fill: {n_cells} cells × {n_axis} buckets = "
            f"{n_cells * n_axis} grid rows exceeds max_grid_rows="
            f"{max_grid_rows} — coarsen the step, restrict domains, "
            "or raise the budget deliberately"
        )
    spine = cells.crossJoin(F.broadcast(axis))
    return gap_fill(
        df,
        ts_col,
        step,
        dim_cols,
        fill,
        spine=spine,
        mark_gaps=mark_gaps,
    )
