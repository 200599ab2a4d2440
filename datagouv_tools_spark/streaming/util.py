"""Shared micro-batch plumbing for the streaming gates."""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["fan_out_batch"]


def fan_out_batch(batch: DataFrame) -> DataFrame:
    """Spread an under-partitioned micro-batch to cluster parallelism.

    File-triggered micro-batches arrive with one partition per source
    file, so a single-file trigger runs every CPU-bound per-row kernel
    (segmentation, MinHash, LSH projection) on ONE core — measured
    4.2 s → 0.9 s for a 2.5k-doc batch on local[8] after spreading.
    The round-robin shuffle moves only the micro-batch itself, which
    at-least-once gates already bound; batches that arrive with enough
    partitions pass through untouched.
    """
    target = batch.sparkSession.sparkContext.defaultParallelism
    if batch.rdd.getNumPartitions() < target:
        return batch.repartition(target)
    return batch
