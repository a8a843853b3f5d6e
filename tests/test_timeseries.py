"""X32 gap-fill / resample pins.

The heavyweight pin is differential: the Spark dense-series builder
(spine + window fills) against a DuckDB formulation (generate_series
spine + IGNORE NULLS window fills) over the real events fixture, for
BOTH locf and linear policies. Beside it: hand-computed interpolation,
identity on dense input, per-group vs global bounds, the mis-typed
step guard, and the rollup-store composition."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from custom_python_etl_data_connector_shivaask_username_spark.operators.timeseries import (
    gap_fill,
    gap_fill_rollup,
    time_spine,
)
from tests.oracle import duck_connect, fetch_duck, fetch_spark

TS = datetime


def _series(spark, rows, schema="g string, ts timestamp_ntz, v double"):
    return spark.createDataFrame(rows, schema)


# --- differential pin vs DuckDB ------------------------------------------


#: hourly avg(value) per event_type with the compat.py exact-decimal
#: strategy, so both engines agg to bit-identical observed points; at
#: sf0.001 most (type, hour) cells are naturally empty → real gaps.
_DUCK_ORACLE = """
WITH obs AS (
  SELECT event_type,
         date_trunc('hour', ts) AS h,
         CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE)
           / COUNT(value) AS v
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT event_type, MIN(h) AS lo, MAX(h) AS hi FROM obs GROUP BY 1
), spine AS (
  SELECT b.event_type, UNNEST(generate_series(b.lo, b.hi,
         INTERVAL 1 HOUR)) AS h
  FROM bounds b
), joined AS (
  SELECT s.event_type, s.h, o.v
  FROM spine s LEFT JOIN obs o USING (event_type, h)
)
SELECT event_type,
       h AS window_start,
       LAST_VALUE(v IGNORE NULLS) OVER wp AS v_locf,
       CASE WHEN v IS NOT NULL THEN v ELSE
         LAST_VALUE(v IGNORE NULLS) OVER wp
         + (FIRST_VALUE(v IGNORE NULLS) OVER wn
            - LAST_VALUE(v IGNORE NULLS) OVER wp)
         * (EXTRACT(epoch FROM h)
            - EXTRACT(epoch FROM LAST_VALUE(
                CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS
              ) OVER wp))
         / (EXTRACT(epoch FROM FIRST_VALUE(
                CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS
              ) OVER wn)
            - EXTRACT(epoch FROM LAST_VALUE(
                CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS
              ) OVER wp))
       END AS v_linear,
       v IS NULL AS is_gap
FROM joined
WINDOW wp AS (PARTITION BY event_type ORDER BY h
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       wn AS (PARTITION BY event_type ORDER BY h
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
"""


def test_gap_fill_matches_duckdb_on_events(spark, sf_dir):
    from custom_python_etl_data_connector_shivaask_username_spark.compat import DEC
    from custom_python_etl_data_connector_shivaask_username_spark.tables import (
        load_table,
        normalize_events_ts,
    )

    ev = normalize_events_ts(load_table(spark, sf_dir, "events"))
    obs = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("window_start")
    ).agg(
        (
            F.sum(F.col("value").cast(DEC)).cast("double")
            / F.count("value")
        ).alias("v")
    )
    dense = gap_fill(
        obs.withColumn("v2", F.col("v")),
        ts_col="window_start",
        step="1 hour",
        group_cols=["event_type"],
        fill={"v": "locf", "v2": "linear"},
        mark_gaps="is_gap",
    ).select(
        "event_type",
        "window_start",
        F.col("v").alias("v_locf"),
        F.col("v2").alias("v_linear"),
        "is_gap",
    )
    s_cols, s_rows = fetch_spark(dense)
    con = duck_connect(sf_dir)
    d_cols, d_rows = fetch_duck(con, _DUCK_ORACLE)
    con.close()
    assert s_cols == d_cols
    assert len(s_rows) == len(d_rows) and len(s_rows) > 0
    # key rows on (event_type, window_start): fp-last-bit noise in the
    # interpolated column must not perturb row alignment
    ki = [s_cols.index("event_type"), s_cols.index("window_start")]
    s_by_key = {tuple(r[i] for i in ki): r for r in s_rows}
    d_by_key = {tuple(r[i] for i in ki): r for r in d_rows}
    assert s_by_key.keys() == d_by_key.keys()
    # some rows must actually be gaps or the pin proves nothing
    gap_idx = s_cols.index("is_gap")
    assert any(r[gap_idx] for r in s_rows)
    for key, a in s_by_key.items():
        b = d_by_key[key]
        for c, (x, y) in enumerate(zip(a, b)):
            if isinstance(x, float) and isinstance(y, float):
                # interpolation arithmetic differs only in fp assoc.
                assert x == pytest.approx(y, abs=1e-9), (s_cols[c], a, b)
            else:
                assert x == y, (s_cols[c], a, b)


# --- unit fixtures --------------------------------------------------------


def test_linear_interpolation_hand_computed(spark):
    df = _series(
        spark,
        [
            ("a", TS(2024, 1, 1, 0), 10.0),
            ("a", TS(2024, 1, 1, 3), 40.0),
        ],
    )
    got = {
        r["ts"]: r["v"]
        for r in gap_fill(
            df, "ts", "1 hour", ["g"], {"v": "linear"}
        ).collect()
    }
    assert got == {
        TS(2024, 1, 1, 0): 10.0,
        TS(2024, 1, 1, 1): 20.0,
        TS(2024, 1, 1, 2): 30.0,
        TS(2024, 1, 1, 3): 40.0,
    }


def test_locf_nocb_const_and_edges(spark):
    df = _series(
        spark,
        [
            ("a", TS(2024, 1, 1, 1), 5.0),
            ("a", TS(2024, 1, 1, 3), None),  # observed NULL: missing
            ("a", TS(2024, 1, 1, 4), 9.0),
        ],
    )
    out = gap_fill(
        df,
        "ts",
        "1 hour",
        ["g"],
        {"v": "locf"},
        mark_gaps="gap",
    ).collect()
    rows = {r["ts"]: (r["v"], r["gap"]) for r in out}
    assert rows == {
        TS(2024, 1, 1, 1): (5.0, False),
        TS(2024, 1, 1, 2): (5.0, True),
        TS(2024, 1, 1, 3): (5.0, False),  # observed NULL carried over
        TS(2024, 1, 1, 4): (9.0, False),
    }
    nocb = {
        r["ts"]: r["v"]
        for r in gap_fill(
            df, "ts", "1 hour", ["g"], {"v": "nocb"}
        ).collect()
    }
    assert nocb[TS(2024, 1, 1, 2)] == 9.0
    const = {
        r["ts"]: r["v"]
        for r in gap_fill(
            df, "ts", "1 hour", ["g"], {"v": ("const", -1.0)}
        ).collect()
    }
    assert const[TS(2024, 1, 1, 2)] == -1.0
    # linear edge gap (before first / after last obs) stays NULL
    df2 = _series(spark, [("a", TS(2024, 1, 1, 0), None),
                         ("a", TS(2024, 1, 1, 1), 3.0)])
    lin = {
        r["ts"]: r["v"]
        for r in gap_fill(
            df2, "ts", "1 hour", ["g"], {"v": "linear"}
        ).collect()
    }
    assert lin == {TS(2024, 1, 1, 0): None, TS(2024, 1, 1, 1): 3.0}


def test_dense_input_is_identity(spark):
    rows = [("a", TS(2024, 1, 1, h), float(h)) for h in range(5)]
    df = _series(spark, rows)
    out = gap_fill(
        df, "ts", "1 hour", ["g"], {"v": "locf"}, mark_gaps="gap"
    )
    got = sorted((r["ts"], r["v"], r["gap"]) for r in out.collect())
    assert got == [(t, v, False) for _, t, v in rows]


def test_bounds_per_group_vs_global(spark):
    df = _series(
        spark,
        [
            ("a", TS(2024, 1, 1, 0), 1.0),
            ("a", TS(2024, 1, 1, 2), 2.0),
            ("b", TS(2024, 1, 1, 2), 3.0),
            ("b", TS(2024, 1, 1, 3), 4.0),
        ],
    )
    per = time_spine(df, "ts", "1 hour", ["g"])
    assert per.count() == 3 + 2  # a: 0-2, b: 2-3
    glob = time_spine(df, "ts", "1 hour", ["g"], bounds="global")
    assert glob.count() == 2 * 4  # both span 0-3
    # no fabricated history before a's window under per-group bounds
    a_first = min(
        r["ts"] for r in per.filter(F.col("g") == "b").collect()
    )
    assert a_first == TS(2024, 1, 1, 2)


def test_mistyped_step_guard_raises(spark):
    df = _series(
        spark,
        [("a", TS(2024, 1, 1), 1.0), ("a", TS(2024, 3, 1), 2.0)],
    )
    with pytest.raises(Exception, match="buckets|ASSERT"):
        gap_fill(
            df,
            "ts",
            "1 second",
            ["g"],
            {"v": "locf"},
            max_buckets_per_group=10_000,
        ).collect()
    # extreme step: ~1.6e9 buckets would exceed Spark's array limit
    # (and executor memory) if the sequence were built before the
    # guard — the arithmetic pre-check must fire OUR message instead
    wide = _series(
        spark,
        [("a", TS(1974, 1, 1), 1.0), ("a", TS(2024, 1, 1), 2.0)],
    )
    with pytest.raises(Exception, match="time_spine"):
        gap_fill(wide, "ts", "1 second", ["g"], {"v": "locf"}).collect()


def test_unknown_policy_and_absent_column_raise(spark):
    df = _series(spark, [("a", TS(2024, 1, 1), 1.0)])
    with pytest.raises(ValueError, match="absent columns"):
        gap_fill(df, "ts", "1 hour", ["g"], {"nope": "locf"})
    with pytest.raises(ValueError, match="unknown fill policy"):
        gap_fill(df, "ts", "1 hour", ["g"], {"v": "cubic"}).collect()


def test_gap_fill_rollup_composition(spark, sf_dir, tmp_path):
    from custom_python_etl_data_connector_shivaask_username_spark.operators.rollup import (
        refresh_rollup,
    )
    from custom_python_etl_data_connector_shivaask_username_spark.tables import (
        load_table,
        normalize_events_ts,
    )

    store = str(tmp_path / "store")
    ev = normalize_events_ts(load_table(spark, sf_dir, "events"))
    refresh_rollup(ev, store, batch_id=0)
    dense = gap_fill_rollup(spark, store)
    rows = dense.collect()
    assert len(rows) > 0
    gaps = [r for r in rows if r["is_gap"]]
    assert gaps, "fixture should produce hourly gaps per type"
    for r in gaps:
        assert r["event_count"] == 0
        assert r["total_value"] == 0.0
        assert r["min_value"] is None and r["max_value"] is None
    # dense per type: every hour between that type's min and max
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r["window_start"])
    for ts_list in by_type.values():
        ts_list.sort()
        deltas = {
            int((b - a).total_seconds())
            for a, b in zip(ts_list, ts_list[1:])
        }
        assert deltas == {3600}


def test_calendar_spine_gap_fill(spark):
    """An explicit calendar spine: only calendar buckets survive
    (off-calendar observations drop), gaps on the calendar fill."""
    from custom_python_etl_data_connector_shivaask_username_spark.operators.timeseries import (
        calendar_spine,
    )

    df = _series(
        spark,
        [
            ("a", TS(2024, 1, 1), 1.0),
            ("a", TS(2024, 1, 6), 6.0),   # saturday: off-calendar
            ("a", TS(2024, 1, 8), 8.0),
        ],
    )
    # business days only: Jan 1-5 and Jan 8 2024
    cal = spark.createDataFrame(
        [(TS(2024, 1, d),) for d in (1, 2, 3, 4, 5, 8)],
        "ts timestamp_ntz",
    )
    out = gap_fill(
        df,
        "ts",
        "1 day",
        ["g"],
        {"v": "locf"},
        spine=calendar_spine(df, cal, "ts", ["g"]),
        mark_gaps="gap",
    )
    rows = {r["ts"]: (r["v"], r["gap"]) for r in out.collect()}
    assert set(rows) == {TS(2024, 1, d) for d in (1, 2, 3, 4, 5, 8)}
    assert rows[TS(2024, 1, 3)] == (1.0, True)   # gap, carried forward
    assert rows[TS(2024, 1, 8)] == (8.0, False)
    with pytest.raises(ValueError, match="exactly one column"):
        calendar_spine(df, cal.withColumn("x", F.lit(1)), "ts", ["g"])


def test_gap_fill_obs_collision_safe(spark):
    """A data column named `__obs` must survive gap_fill untouched —
    the gap marker picks a collision-free working name instead of
    clobbering it (and inverting mark_gaps)."""
    df = spark.createDataFrame(
        [
            ("g", datetime(2024, 1, 1, 0), 5.0),
            ("g", datetime(2024, 1, 1, 2), 7.0),
        ],
        "g string, ts timestamp, __obs double",
    )
    out = gap_fill(
        df,
        ts_col="ts",
        step="1 hour",
        group_cols=["g"],
        fill={"__obs": "locf"},
        mark_gaps="is_gap",
    ).collect()
    rows = {r["ts"]: (r["__obs"], r["is_gap"]) for r in out}
    assert len(rows) == 3
    assert rows[datetime(2024, 1, 1, 1)] == (5.0, True)  # gap: carried, marked
    assert rows[datetime(2024, 1, 1, 0)] == (5.0, False)
    assert rows[datetime(2024, 1, 1, 2)] == (7.0, False)


# --- X39: dimensional (non-time) gap fill ---


def test_dim_gap_fill_differential_vs_duckdb(spark, sf_dir):
    """(event_type × hour-of-day) sales-cube shape over real events:
    the dense grid, zero-filled counts, and gap markers must match a
    DuckDB CROSS JOIN of the distinct domains left-joined back."""
    from custom_python_etl_data_connector_shivaask_username_spark.operators.timeseries import (
        dim_gap_fill,
    )
    from custom_python_etl_data_connector_shivaask_username_spark.tables import (
        load_table,
    )

    ev = load_table(spark, sf_dir, "events")
    # a sparse slice so the grid genuinely has holes
    obs = (
        ev.filter(F.col("event_id") % 37 == 0)
        .groupBy(
            "event_type", F.hour("ts").alias("hod")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("total"),
        )
    )
    out = dim_gap_fill(
        obs,
        dim_cols=["event_type", "hod"],
        fill={"n": ("const", 0), "total": None},
        mark_gaps="is_gap",
    )
    s_rows = {
        (r["event_type"], r["hod"]): (r["n"], r["is_gap"])
        for r in out.collect()
    }
    con = duck_connect(sf_dir)
    d_rows = {
        (t, h): (n, g)
        for t, h, n, g in con.sql("""
            WITH obs AS (
              SELECT event_type, EXTRACT(hour FROM ts) AS hod,
                     COUNT(*) AS n
              FROM events WHERE event_id % 37 = 0
              GROUP BY 1, 2
            )
            SELECT d1.event_type, d2.hod,
                   COALESCE(obs.n, 0) AS n,
                   obs.n IS NULL AS is_gap
            FROM (SELECT DISTINCT event_type FROM obs) d1
            CROSS JOIN (SELECT DISTINCT hod FROM obs) d2
            LEFT JOIN obs USING (event_type, hod)
        """).fetchall()
    }
    assert s_rows == d_rows
    assert any(g for _, g in s_rows.values())  # the slice has holes


def test_dim_gap_fill_domains_and_guards(spark):
    from custom_python_etl_data_connector_shivaask_username_spark.operators.timeseries import (
        dim_gap_fill,
        dim_spine,
    )

    df = spark.createDataFrame(
        [("a", 1, 10.0), ("b", 2, 20.0)], "s string, p int, v double"
    )
    # explicit domain for p: cells outside observed p values densify;
    # the observed p=2 row for s='a' is fabricated as a gap
    dom = spark.createDataFrame([(1,), (2,), (3,)], "p int")
    out = dim_gap_fill(
        df,
        dim_cols=["s", "p"],
        fill={"v": "zero"},
        domains={"p": dom},
        mark_gaps="g",
    )
    rows = {(r["s"], r["p"]): (r["v"], r["g"]) for r in out.collect()}
    assert len(rows) == 6  # 2 stores × 3 domain cells
    assert rows[("a", 1)] == (10.0, False)
    assert rows[("a", 3)] == (0.0, True)
    assert rows[("b", 2)] == (20.0, False)
    # guards: ordered policies refused, absent columns refused,
    # high-cardinality grids refused loudly
    with pytest.raises(ValueError, match="ordered"):
        dim_gap_fill(df, ["s", "p"], fill={"v": "locf"})
    with pytest.raises(ValueError, match="absent"):
        dim_gap_fill(df, ["s", "p"], fill={"zz": "zero"})
    big = spark.range(0, 10_000).select(
        F.col("id").alias("a"), (F.col("id") * 7).alias("b")
    )
    with pytest.raises(ValueError, match="cells"):
        dim_spine(big, ["a", "b"], max_cells=1_000_000)
    with pytest.raises(ValueError, match="at least two"):
        dim_spine(df, ["s"])


def test_grid_gap_fill_differential_vs_duckdb(spark, sf_dir):
    """X32×X39 (round 9): (event_type × user-bucket) cells × daily
    buckets over the GLOBAL range, counts zero-filled and a LOCF
    level per cell — against a DuckDB CROSS JOIN of the distinct
    domains × generate_series, LEFT JOIN, IGNORE NULLS window. The
    grid must contain never-observed (type, bucket) cells as full
    gap series — the property plain gap_fill(group_cols=...) cannot
    produce."""
    from custom_python_etl_data_connector_shivaask_username_spark.operators.timeseries import (
        grid_gap_fill,
    )
    from custom_python_etl_data_connector_shivaask_username_spark.tables import (
        load_table,
    )

    ev = load_table(spark, sf_dir, "events")
    obs = (
        ev.filter(F.col("event_id") % 11 == 0)
        .groupBy(
            "event_type",
            (F.col("user_id") % 3).alias("ub"),
            F.date_trunc("day", "ts").alias("day"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            # exact-decimal max is deterministic cross-engine
            F.max(F.col("value").cast("decimal(20,6)")).alias("lvl"),
        )
    )
    out = grid_gap_fill(
        obs,
        ts_col="day",
        step="1 day",
        dim_cols=["event_type", "ub"],
        fill={"n": ("const", 0), "lvl": "locf"},
        mark_gaps="is_gap",
    )
    s_rows = {
        (r["event_type"], r["ub"], str(r["day"])): (
            r["n"],
            None if r["lvl"] is None else float(r["lvl"]),
            r["is_gap"],
        )
        for r in out.collect()
    }
    con = duck_connect(sf_dir)
    d_rows = {
        (t, int(ub), str(day)): (
            int(n),
            None if lvl is None else float(lvl),
            bool(g),
        )
        for t, ub, day, n, lvl, g in con.sql("""
            WITH obs AS (
              SELECT event_type, user_id % 3 AS ub,
                     date_trunc('day', ts) AS day,
                     COUNT(*) AS n,
                     MAX(CAST(value AS DECIMAL(20,6))) AS lvl
              FROM events WHERE event_id % 11 = 0
              GROUP BY 1, 2, 3
            ),
            axis AS (
              SELECT unnest(generate_series(
                       (SELECT MIN(day) FROM obs),
                       (SELECT MAX(day) FROM obs),
                       INTERVAL 1 DAY)) AS day
            ),
            grid AS (
              SELECT d1.event_type, d2.ub, axis.day
              FROM (SELECT DISTINCT event_type FROM obs) d1
              CROSS JOIN (SELECT DISTINCT ub FROM obs) d2
              CROSS JOIN axis
            )
            SELECT g.event_type, g.ub, g.day,
                   COALESCE(obs.n, 0) AS n,
                   LAST_VALUE(obs.lvl IGNORE NULLS) OVER (
                     PARTITION BY g.event_type, g.ub ORDER BY g.day
                     ROWS UNBOUNDED PRECEDING) AS lvl,
                   obs.n IS NULL AS is_gap
            FROM grid g LEFT JOIN obs
              ON g.event_type = obs.event_type
             AND g.ub = obs.ub AND g.day = obs.day
        """).fetchall()
    }
    assert s_rows == d_rows
    # the grid spans every cell over the GLOBAL range: uniform series
    # length per cell, and at least one gap row exists
    from collections import Counter

    per_cell = Counter((t, ub) for (t, ub, _d) in s_rows)
    assert len(set(per_cell.values())) == 1
    assert any(g for _, _, g in s_rows.values())


def test_grid_gap_fill_budget_guard(spark):
    from custom_python_etl_data_connector_shivaask_username_spark.operators.timeseries import (
        grid_gap_fill,
    )

    df = _series(
        spark,
        [("a", TS(2024, 1, 1), 1.0), ("a", TS(2024, 1, 30), 2.0),
         ("b", TS(2024, 1, 5), 3.0)],
    )
    with pytest.raises(ValueError, match="max_grid_rows"):
        grid_gap_fill(
            df, "ts", "1 day", ["g"], {"v": "locf"}, max_grid_rows=10
        )


def test_grid_gap_fill_empty_input_yields_empty_grid(spark):
    """Round-9 review finding: an empty frame's global min/max row has
    NULL bounds — the spine must densify to empty instead of tripping
    the bucket-cap assert with a misleading message."""
    from custom_python_etl_data_connector_shivaask_username_spark.operators.timeseries import (
        grid_gap_fill,
    )

    df = _series(spark, [("a", TS(2024, 1, 1), 1.0)]).filter(
        F.lit(False)
    )
    out = grid_gap_fill(df, "ts", "1 day", ["g"], {"v": "locf"})
    assert out.count() == 0
