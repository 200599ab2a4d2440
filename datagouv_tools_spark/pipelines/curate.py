"""End-to-end corpus curation pipeline: the training-data stages this
engine implements as individual oracle-checked queries, composed into
one deterministic batch run that writes a cleaned, split-partitioned
corpus plus a per-stage funnel report.

Stages (each is the library operator the matching query surface uses —
same semantics, same determinism guarantees):

1. **Exact dedup** — drop byte-duplicate documents by normalized
   fingerprint, keeping the min-id representative
   (operators/dedup.dedup_fingerprint).
2. **Boilerplate scrub** — segment-level exact dedup; every document is
   reassembled from only the corpus-wide first occurrences of its
   segments (operators/dedup.segment_dedup_marks, the
   doc_boilerplate_scrub shape). Documents scrubbed to empty are
   dropped.
3. **Quality filter** — the deterministic linear quality classifier
   (doc_quality_logit's pinned weights); logit < 0 drops.
4. **Split assignment** — seeded md5 train/val/test buckets
   (doc_split_assignment's rule): stable across engines, reruns, and
   cluster sizes.
5. **Write** — parquet partitioned by split.

Everything is rerun-deterministic: a doc's fate never depends on
partitioning, task order, or time. At 100 TB each stage is the shuffle
shape its operator documents (hash-only exchanges for dedup/scrub
winner selection; map-side quality + split; one text movement for
reassembly — the floor for a transform that rewrites documents).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datagouv_tools_spark.functions.text import fingerprint_md5, tokens
from datagouv_tools_spark.functions.xhash import md5_hash60
from datagouv_tools_spark.operators.dedup import segment_dedup_marks

__all__ = ["CurationReport", "curate_corpus"]


@dataclass
class CurationReport:
    n_input: int
    n_after_exact_dedup: int
    n_after_scrub: int
    n_after_quality: int
    split_counts: dict[str, int]

    def as_rows(self) -> list[tuple[str, int]]:
        rows = [
            ("input", self.n_input),
            ("exact_dedup", self.n_after_exact_dedup),
            ("scrub_nonempty", self.n_after_scrub),
            ("quality", self.n_after_quality),
        ]
        rows += [(f"split_{k}", v) for k, v in sorted(self.split_counts.items())]
        return rows


def _quality_logit() -> F.Column:
    """doc_quality_logit's pinned linear classifier (see queries.py)."""
    ts = tokens("text")
    n = F.size(ts)
    stops = F.array(*[F.lit(s) for s in
                      ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")])
    nz = n > 0
    dr = F.when(
        nz, F.size(F.array_distinct(ts)).cast("double") / n.cast("double")
    ).otherwise(0.0)
    lt = F.least(n, F.lit(200)).cast("double") / F.lit(200.0)
    sw = F.when(
        nz,
        F.size(F.filter(ts, lambda t: F.array_contains(stops, t))).cast("double")
        / n.cast("double"),
    ).otherwise(0.0)
    return F.round(
        F.lit(1.7) * dr + F.lit(0.9) * lt + F.lit(2.1) * sw - F.lit(1.2), 6
    )


def _split_col(id_col: str, seed: str = "split42") -> F.Column:
    """doc_split_assignment's 80/10/10 seeded bucket rule."""
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


def curate_corpus(
    docs: DataFrame,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_len: int = 8,
    keep_cols: tuple[str, ...] = ("source", "lang"),
) -> CurationReport:
    """Run the curation funnel over ``docs`` and write the cleaned,
    split-partitioned corpus to ``out_dir``. Returns stage counts."""
    n_input = docs.count()

    # 1. exact dedup (min-id representative per normalized fingerprint)
    fp = docs.withColumn("__fp", fingerprint_md5(text_col))
    winners = fp.groupBy("__fp").agg(F.min(id_col).alias(id_col))
    deduped = fp.join(winners, ["__fp", id_col], "left_semi").drop("__fp")
    n_dedup = deduped.count()

    # 2. boilerplate scrub: reassemble from kept segments only
    marks = segment_dedup_marks(
        deduped, id_col, text_col, seg_len=seg_len,
        keep_cols=keep_cols, keep_seg_text=True,
    )
    scrubbed = (
        marks.groupBy(id_col, *keep_cols)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("kept"), F.struct("seg_idx", "seg"))
                        )
                    ),
                    lambda x: x["seg"],
                ),
                " ",
            ).alias(text_col)
        )
        .filter(F.col(text_col) != "")
    )
    n_scrub = scrubbed.count()

    # 3. quality filter (pinned linear classifier)
    scored = scrubbed.withColumn("__z", _quality_logit())
    kept = scored.filter(F.col("__z") >= 0.0).drop("__z")
    n_quality = kept.count()

    # 4. split + 5. write (partitioned by split)
    final = kept.withColumn("split", _split_col(id_col))
    final.write.mode("overwrite").partitionBy("split").parquet(out_dir)
    out = final.sparkSession.read.parquet(out_dir)
    split_counts = {
        r["split"]: r["n"]
        for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    return CurationReport(n_input, n_dedup, n_scrub, n_quality, split_counts)
