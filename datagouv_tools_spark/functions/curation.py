"""Shared curation-stage expressions — single source of truth.

These constants and expression builders are used by BOTH the
oracle-checked query surface (queries.doc_quality_logit /
doc_split_assignment / doc_boilerplate_scrub) and the production
compositions (pipelines/curate.py, streaming/scrub_gate.py). Keeping
one copy is what makes "the pipeline has the same semantics as the
oracle-checked query" a structural guarantee instead of a convention:
retuning a weight, a stopword, or the split seed changes every consumer
together, and the DuckDB oracles keep verifying all of them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from datagouv_tools_spark.functions.text import tokens
from datagouv_tools_spark.functions.xhash import md5_hash60

__all__ = [
    "QUALITY_STOPWORDS",
    "quality_logit",
    "split_assignment",
    "reassembled_kept_text",
]

#: English stopword set shared by the quality features (and mirrored
#: literally in the doc_quality_logit oracle SQL).
QUALITY_STOPWORDS: tuple[str, ...] = (
    "the", "a", "of", "and", "to", "in", "is", "on", "for", "with",
)


def quality_logit(text_col: str = "text") -> Column:
    """The pinned linear quality classifier (doc_quality_logit):
    z = round(1.7·distinct_ratio + 0.9·length_term + 2.1·stopword_ratio
    − 1.2, 6). Pure +,*,/ double arithmetic in a fixed order — bit-equal
    across engines; z >= 0 is the keep threshold."""
    ts = tokens(text_col)
    n = F.size(ts)
    stops = F.array(*[F.lit(s) for s in QUALITY_STOPWORDS])
    nz = n > 0
    dr = F.when(
        nz, F.size(F.array_distinct(ts)).cast("double") / n.cast("double")
    ).otherwise(0.0)
    lt = F.least(n, F.lit(200)).cast("double") / F.lit(200.0)
    sw = F.when(
        nz,
        F.size(F.filter(ts, lambda t: F.array_contains(stops, t))).cast(
            "double"
        )
        / n.cast("double"),
    ).otherwise(0.0)
    return F.round(
        F.lit(1.7) * dr + F.lit(0.9) * lt + F.lit(2.1) * sw - F.lit(1.2), 6
    )


def split_assignment(id_col: str = "doc_id", seed: str = "split42") -> Column:
    """The deterministic 80/10/10 train/val/test assignment
    (doc_split_assignment): seeded md5 bucket of the id — stable across
    engines, reruns, and cluster sizes."""
    bucket = F.pmod(
        md5_hash60(
            F.concat_ws("-", F.col(id_col).cast("string"), F.lit(seed))
        ),
        F.lit(100),
    )
    return (
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def reassembled_kept_text() -> Column:
    """Aggregate expression rebuilding a document from its kept
    segments in seg_idx order (the doc_boilerplate_scrub reassembly).
    Use inside groupBy(id).agg(...) over segment_dedup_marks output
    with keep_seg_text=True; all-dropped docs yield ''."""
    return F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(F.col("kept"), F.struct("seg_idx", "seg"))
                )
            ),
            lambda x: x["seg"],
        ),
        " ",
    )
