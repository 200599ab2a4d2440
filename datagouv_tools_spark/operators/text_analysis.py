"""Document-level text analysis operator: one pass, all metrics
(token counts, quality, language guess, fingerprint) as a single
projection — no shuffle, scales linearly."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datagouv_tools_spark.functions.text import (
    bpe_ish_token_count,
    distinct_token_ratio,
    fingerprint_md5,
    lang_id,
    quality_score,
    stopword_ratio,
    token_count,
)

__all__ = ["text_stats"]


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the full metric set as columns."""
    return df.select(
        "*",
        token_count(text_col).alias("n_tokens"),
        bpe_ish_token_count(text_col).alias("n_subword_tokens"),
        F.length(F.col(text_col)).cast("bigint").alias("n_chars_measured"),
        F.round(F.coalesce(distinct_token_ratio(text_col), F.lit(0.0)), 6).alias(
            "distinct_ratio"
        ),
        F.round(F.coalesce(stopword_ratio(text_col, "en"), F.lit(0.0)), 6).alias(
            "stopword_ratio_en"
        ),
        F.round(quality_score(text_col), 6).alias("quality"),
        lang_id(text_col).alias("lang_guess"),
        fingerprint_md5(text_col).alias("fingerprint"),
    )
