"""Per-series sequential time-series kernels.

Exponential smoothing is intrinsically a left fold — ``s_t`` depends on
``s_{t-1}`` — so it cannot be a window expression without ``pow()``
(banned cross-engine: libm is not correctly rounded). The engine runs
the fold in INTEGER fixed point inside one Arrow ``applyInPandas``
group per series: milli-unit observations, ``s_t = (alpha*x_t +
(1000-alpha)*s_{t-1}) div 1000`` — truncating integer division, the
same convention as the engine's sketches and PageRank, so DuckDB can
replay the identical recurrence with a recursive CTE and value-hash
the whole smoothed curve.

Scale: ONE shuffle partitions the pre-aggregated series points by
series key; each group is processed with O(1) state and O(points)
work. Series are bucket-grained (hourly → 8 760 points/series/year),
so a group is kilobytes even when the raw fact table is 100 TB — the
heavy lifting (raw rows → per-bucket aggregates) happens before the
fold, in a map-side-combining groupBy.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ewma_fold(
    points: DataFrame,
    key_col: str,
    time_col: str,
    x_col: str,
    alpha_milli: int,
) -> DataFrame:
    """Fixed-point EWMA over each series in ``points``.

    ``points`` has one row per (series, bucket) with an integer
    milli-unit observation ``x_col``. Returns one row per input row:
    ``(key, time, i, x, ewma)`` where ``i`` is the 1-based position in
    time order and ``ewma`` the smoothed value after that point
    (``s_1 = x_1``).
    """
    a, b = int(alpha_milli), 1000 - int(alpha_milli)

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(time_col).reset_index(drop=True)
        s = None
        out = []
        # Python-int fold: values are exact bigints (never float), and
        # the loop is O(points-per-series), not O(raw rows) — series
        # arrive pre-aggregated to their bucket grain.
        for x in pdf[x_col].tolist():
            x = int(x)
            # _tdiv, not //: DuckDB's // truncates toward zero while
            # Python's floors — they agree only for nonnegative values,
            # and the documented contract is truncating.
            s = x if s is None else _tdiv(a * x + b * s, 1000)
            out.append(s)
        pdf["i"] = range(1, len(pdf) + 1)
        pdf["ewma"] = out
        return pdf[[key_col, time_col, "i", x_col, "ewma"]]

    schema = (
        f"{key_col} string, {time_col} timestamp, i bigint, "
        f"{x_col} bigint, ewma bigint"
    )
    return points.groupBy(key_col).applyInPandas(fold, schema)


def ewma_oracle_sql(
    points_sql: str,
    key_col: str,
    time_col: str,
    x_col: str,
    alpha_milli: int,
) -> str:
    """DuckDB twin: the identical integer recurrence as a recursive
    CTE stepping the per-series row number. ``points_sql`` must be a
    complete SELECT producing (key, time, x)."""
    a, b = int(alpha_milli), 1000 - int(alpha_milli)
    return f"""
    WITH RECURSIVE pts AS (
      SELECT {key_col}, {time_col}, {x_col},
             ROW_NUMBER() OVER (PARTITION BY {key_col}
                                ORDER BY {time_col}) AS i
      FROM ({points_sql})
    ),
    s AS (
      SELECT {key_col}, {time_col}, i, {x_col},
             {x_col} AS ewma
      FROM pts WHERE i = 1
      UNION ALL
      SELECT p.{key_col}, p.{time_col}, p.i, p.{x_col},
             ({a} * p.{x_col} + {b} * s.ewma) // 1000 AS ewma
      FROM pts p JOIN s ON p.{key_col} = s.{key_col} AND p.i = s.i + 1
    )
    SELECT * FROM s"""


def debounce_fold(
    events: DataFrame,
    key_cols: list[str],
    time_col: str,
    id_col: str,
    gap: int,
) -> DataFrame:
    """Stateful event throttling: per key, keep an event iff it is the
    first or at least ``gap`` time units after the LAST KEPT event —
    the alert-dedup / retry-suppression / debounce primitive. Unlike a
    plain lag() window (which compares to the previous event whether or
    not it was kept), the kept-state makes this a sequential fold, so
    it runs as an Arrow group per key with O(1) state, and DuckDB
    replays the identical recurrence as a recursive CTE.

    ``gap`` compares against integer microsecond timestamps. Ties on
    ``time_col`` are ordered by ``id_col`` (total order). Returns the
    input rows plus ``kept`` (0/1).
    """
    import numpy as np
    import pandas as pd

    # One Arrow kernel PER PARTITION, not per key: a grouped
    # applyInPandas materializes a pandas frame per (user, type) group
    # — sub-millisecond groups, so constant per-group overhead dominated
    # the runtime (measured 15 s at sf0.1 for ~10⁵ groups). Instead the
    # rows are hash-partitioned by key and sorted (key, time, id) within
    # each partition, and ONE sequential scan carries a {key: last_kept}
    # dict across Arrow batches — same fold, ~group-count-independent
    # cost. Dict size is bounded by distinct keys per partition.
    def gen(batches):
        last: dict = {}
        for pdf in batches:
            # epoch MICROseconds whatever unit Arrow hands pandas — the
            # oracle compares epoch_us
            us_vals = (
                pdf[time_col].values.astype("datetime64[us]").astype("int64")
            )
            key_vals = list(zip(*(pdf[k].tolist() for k in key_cols)))
            kept = np.zeros(len(pdf), dtype="int32")
            for i, (kk, us) in enumerate(zip(key_vals, us_vals.tolist())):
                lk = last.get(kk)
                if lk is None or us - lk >= gap:
                    kept[i] = 1
                    last[kk] = us
            pdf = pdf.copy()
            pdf["kept"] = kept
            yield pdf

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in events.schema.fields
    )
    return (
        events.repartition(*[F.col(c) for c in key_cols])
        .sortWithinPartitions(*key_cols, time_col, id_col)
        .mapInPandas(gen, schema + ", kept int")
    )


def debounce_oracle_sql(
    events_sql: str,
    key_expr: str,
    time_col: str,
    id_col: str,
    gap: int,
) -> str:
    """DuckDB twin: the kept-state recurrence as a recursive CTE over
    per-key row numbers. ``events_sql`` yields (key, time, id, ...);
    ``gap`` in microseconds against epoch_us(time)."""
    return f"""
    WITH RECURSIVE ev AS (
      SELECT {key_expr} AS __k, {time_col} AS __t, {id_col} AS __id,
             epoch_us({time_col}) AS __us,
             ROW_NUMBER() OVER (PARTITION BY {key_expr}
                                ORDER BY {time_col}, {id_col}) AS __i
      FROM ({events_sql})
    ),
    st AS (
      SELECT __k, __t, __id, __us, __i,
             1 AS kept, __us AS last_kept
      FROM ev WHERE __i = 1
      UNION ALL
      SELECT e.__k, e.__t, e.__id, e.__us, e.__i,
             CASE WHEN e.__us - s.last_kept >= {gap} THEN 1 ELSE 0 END,
             CASE WHEN e.__us - s.last_kept >= {gap}
                  THEN e.__us ELSE s.last_kept END
      FROM ev e JOIN st s ON e.__k = s.__k AND e.__i = s.__i + 1
    )
    SELECT __k, __t, __id, __i, kept FROM st"""


def _tdiv(n: int, d: int) -> int:
    """Truncate-toward-zero integer division — Spark's ``div`` and
    DuckDB's ``//`` both truncate, but Python's ``//`` FLOORS, which
    diverges on the negative trend values Holt produces."""
    q = abs(n) // d
    return q if (n >= 0) == (d >= 0) else -q


def holt_fold(
    points: DataFrame,
    key_col: str,
    time_col: str,
    x_col: str,
    alpha_milli: int,
    beta_milli: int,
) -> DataFrame:
    """Holt double exponential smoothing (level + trend) per series,
    in truncating integer fixed point:

        l_t = (α·x_t + (1000−α)·(l + b)) div 1000
        b_t = (β·(l_t − l_{t−1}) + (1000−β)·b) div 1000,  l_1=x_1, b_1=0

    The trend-aware upgrade of :func:`ewma_fold` — same Arrow
    per-series fold, same recursive-CTE oracle twin, same O(1) state;
    division truncates toward zero on BOTH engines (and explicitly in
    this Python fold — Python's ``//`` floors, which would diverge the
    moment a declining series drives the trend negative).
    Returns (key, time, i, x, level, trend).
    """
    import pandas as pd

    a, na = int(alpha_milli), 1000 - int(alpha_milli)
    b_, nb = int(beta_milli), 1000 - int(beta_milli)

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(time_col).reset_index(drop=True)
        lvl = tr = None
        levels, trends = [], []
        for x in pdf[x_col].tolist():
            x = int(x)
            if lvl is None:
                lvl, tr = x, 0
            else:
                prev = lvl
                lvl = _tdiv(a * x + na * (lvl + tr), 1000)
                tr = _tdiv(b_ * (lvl - prev) + nb * tr, 1000)
            levels.append(lvl)
            trends.append(tr)
        pdf["i"] = range(1, len(pdf) + 1)
        pdf["level"] = levels
        pdf["trend"] = trends
        return pdf[[key_col, time_col, "i", x_col, "level", "trend"]]

    schema = (
        f"{key_col} string, {time_col} timestamp, i bigint, "
        f"{x_col} bigint, level bigint, trend bigint"
    )
    return points.groupBy(key_col).applyInPandas(fold, schema)


def holt_oracle_sql(
    points_sql: str,
    key_col: str,
    time_col: str,
    x_col: str,
    alpha_milli: int,
    beta_milli: int,
) -> str:
    """DuckDB twin of :func:`holt_fold` as a recursive CTE (DuckDB's
    ``//`` truncates toward zero, matching the fold)."""
    a, na = int(alpha_milli), 1000 - int(alpha_milli)
    b_, nb = int(beta_milli), 1000 - int(beta_milli)
    lvl = f"({a} * p.{x_col} + {na} * (s.level + s.trend)) // 1000"
    return f"""
    WITH RECURSIVE pts AS (
      SELECT {key_col}, {time_col}, {x_col},
             ROW_NUMBER() OVER (PARTITION BY {key_col}
                                ORDER BY {time_col}) AS i
      FROM ({points_sql})
    ),
    s AS (
      SELECT {key_col}, {time_col}, i, {x_col},
             {x_col} AS level, CAST(0 AS BIGINT) AS trend
      FROM pts WHERE i = 1
      UNION ALL
      SELECT p.{key_col}, p.{time_col}, p.i, p.{x_col},
             {lvl} AS level,
             ({b_} * (({lvl}) - s.level) + {nb} * s.trend) // 1000 AS trend
      FROM pts p JOIN s ON p.{key_col} = s.{key_col} AND p.i = s.i + 1
    )
    SELECT * FROM s"""
