"""Scoped one-pass-limit override for bounded driver fetches.

``executeTake``'s 1 → 4 → 16 partition scaling
(``spark.sql.limit.initialNumPartitions`` × ``scaleUpFactor``) is a
top-k early-exit optimization; probes that EXPECT to scan a whole
bounded set (CC edge fetch, exact-cosine kernel input) pay each scaling
round as a sequential job. Setting the initial partition count high
makes the fetch one parallel pass.

The conf is session-global, so concurrent set/restore from two threads
could race and leave 2^30 set permanently (the save/restore pairs
interleave). A process-wide lock serializes the override windows;
unrelated limit queries on the same session during a window merely run
their (rare) takes as one pass — a perf footnote, not a correctness
issue.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import SparkSession

_KEY = "spark.sql.limit.initialNumPartitions"
_LOCK = threading.Lock()


@contextmanager
def one_pass_limit(spark: SparkSession) -> Iterator[None]:
    """Run the body with ``initialNumPartitions`` maxed, serialized
    against other override windows on this process."""
    with _LOCK:
        conf = spark.conf
        old = conf.get(_KEY, None)
        conf.set(_KEY, str(1 << 30))
        try:
            yield
        finally:
            if old is None:
                conf.unset(_KEY)
            else:
                conf.set(_KEY, old)
