"""Helpers shared by more than one thematic query module.

Mechanically split from the flat queries.py (r10); see the package
__init__ for conventions. Registration side effects only — import
through ``datagouv_tools_spark.queries``."""

from __future__ import annotations


from ._registry import query, t

# ---------------------------------------------------------------------------
# Analytics: dedup / text analysis / similarity search (documents, embeddings)
# ---------------------------------------------------------------------------

from datagouv_tools_spark.functions.text import SQL_WS as _WS


#: SQL fragment mirroring functions.text.tokens() — the whitespace
#: class is pinned explicitly (functions/text.py WS): Java `\s` and
#: RE2 `\s` disagree on \x0B, so a bare `\s` here would silently
#: diverge from the Spark tokenizer on vertical-tab-bearing text.
_SQL_TOKENS = (
    f"list_filter(string_split_regex(lower(text), '{_WS}+'), t -> t != '')"
)


_SESSION_ORACLE = """
    WITH o AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts - LAG(ts) OVER w >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, ts, value,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM o
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '30 minutes' AS session_end,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_value
    FROM s
    GROUP BY user_id, sid
    ORDER BY user_id, session_start
"""


def _sql_lsh_band_ctes() -> str:
    """Shared CTE block: seeded hyperplane literals → 10 band buckets
    per vector → Hamming≤1 multiprobe fan-out → candidate equi-join —
    the SQL twin of ``operators/similarity.cosine_pairs_lsh``'s
    candidate half. Used by both the standalone pair query and the
    hybrid dedup oracle."""
    from datagouv_tools_spark.operators.similarity import _hyperplanes

    n_bands, band_bits = 10, 10
    planes = _hyperplanes(64, n_bands * band_bits, seed=42)

    def band_expr(band: int) -> str:
        return "\n           + ".join(
            f"(CASE WHEN list_dot_product(embedding, "
            f"[{', '.join(repr(v) for v in planes[band * band_bits + j])}]) > 0"
            f" THEN {1 << j} ELSE 0 END)"
            for j in range(band_bits)
        )

    bands_cols = ",\n        ".join(
        f"{band_expr(i)} AS b{i}" for i in range(n_bands)
    )
    eb_union = "\n      UNION ALL ".join(
        f"SELECT vec_id, {i} AS band, b{i} AS bucket FROM cb"
        for i in range(n_bands)
    )
    masks = ", ".join(str(m) for m in [0] + [1 << j for j in range(band_bits)])
    return f"""c0 AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings
    ), cb AS (
      SELECT vec_id, embedding,
        {bands_cols}
      FROM c0
    ), eb AS (
      {eb_union}
    ), pr AS (
      SELECT e.vec_id, e.band, xor(e.bucket, m.mask) AS bucket
      FROM eb e CROSS JOIN (SELECT unnest([{masks}]) AS mask) m
    ), cand AS (
      SELECT DISTINCT p.vec_id AS id_a, e.vec_id AS id_b
      FROM pr p JOIN eb e ON p.band = e.band AND p.bucket = e.bucket
      WHERE p.vec_id < e.vec_id
    )"""
