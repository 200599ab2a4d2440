"""Scale guardrails: assert plan properties, not just results.

Each test pins a property that keeps a query viable at 100 TB —
pushdown reaching the scan, column pruning, broadcast joins staying
broadcast, shuffle counts not growing. A refactor that silently
de-optimizes fails here instead of in production.
"""

from __future__ import annotations

import re

from datagouv_tools_spark import queries as q
from datagouv_tools_spark.plans.inspect import (
    exchange_count,
    has_broadcast_hash_join,
    physical_plan,
    pushed_filters,
    read_schemas,
)


def test_q1_scan_prunes_and_pushes(spark, sf_dir):
    df = q.QUERIES["q1_pricing_summary"](spark, sf_dir)
    schemas = read_schemas(df)
    assert len(schemas) == 1
    # 6 needed columns only — never the other 5 of lineitem's 11
    for col in ("l_orderkey", "l_partkey", "l_suppkey", "l_comment"):
        assert col not in schemas[0]
    assert any("l_shipdate" in f for f in pushed_filters(df))
    # one shuffle for the agg (+ optional range exchange for the sort)
    assert exchange_count(df) <= 2


def test_q3_dims_broadcast(spark, sf_dir):
    df = q.QUERIES["q3_shipping_priority"](spark, sf_dir)
    assert has_broadcast_hash_join(df)
    assert any("c_mktsegment" in f for f in pushed_filters(df))


def test_q5_star_join_single_fact_shuffle(spark, sf_dir):
    df = q.QUERIES["q5_local_supplier_volume"](spark, sf_dir)
    plan = physical_plan(df)
    # every dim joins as broadcast; the fact side may shuffle for the
    # orders⋈lineitem join + final agg + sort, but no more
    assert plan.count("BroadcastHashJoin") >= 3
    assert exchange_count(df) <= 4


def test_asof_join_is_single_shuffle(spark, sf_dir):
    df = q.QUERIES["events_asof_click_view"](spark, sf_dir)
    # one hash exchange for the keyed window (+ range exchange for the
    # final orderBy); crucially NO join exchange and no nested loop
    plan = physical_plan(df)
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert exchange_count(df) <= 2


def test_range_join_builds_local_relation(spark, sf_dir):
    df = q.QUERIES["orders_price_tier_rangejoin"](spark, sf_dir)
    plan = physical_plan(df)
    # literal dim must stay JVM-side: a Python RDD scan here costs
    # seconds of Py4J overhead per run (see queries.py)
    assert "ExistingRDD" not in plan
    assert "LocalTableScan" in plan


def test_dedup_fingerprint_prunes_documents(spark, sf_dir):
    df = q.QUERIES["doc_fingerprint_dedup"](spark, sf_dir)
    schemas = read_schemas(df)
    assert len(schemas) == 1
    assert "doc_id" not in schemas[0]  # only source + text are needed


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    """The bucketing payoff, asserted on the plan: fact tables written
    bucketed by the join key plan a sort-merge join with ZERO shuffle
    exchanges — the write-once pre-shuffle that makes repeated fact
    joins viable at 100 TB."""
    from datagouv_tools_spark.sinks.sink import BucketedTableSink
    from datagouv_tools_spark.sources.catalog import load_table
    from pyspark.sql import functions as F

    base = str(tmp_path / "wh")
    sink = BucketedTableSink(4, ("o_orderkey",), ("o_orderkey",), base_path=base)
    sink.write(load_table(spark, sf_dir, "orders"), "orders_b")
    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey")
    BucketedTableSink(4, ("o_orderkey",), ("o_orderkey",), base_path=base).write(li, "lineitem_b")

    # force sort-merge on both plans (at this test scale Spark would
    # broadcast; at 100 TB fact x fact neither side broadcasts)
    joined = (
        spark.table("orders_b")
        .hint("merge")
        .join(spark.table("lineitem_b").hint("merge"), "o_orderkey")
    )
    n = joined.count()
    assert n == load_table(spark, sf_dir, "lineitem").count()  # FK join preserves rows
    plan = physical_plan(joined)
    assert "SortMergeJoin" in plan
    assert exchange_count(joined) == 0 and "BroadcastExchange" not in plan
    # the same sort-merge join on unbucketed parquet shuffles both sides
    plain = (
        load_table(spark, sf_dir, "orders")
        .hint("merge")
        .join(
            load_table(spark, sf_dir, "lineitem").hint("merge"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
    )
    assert exchange_count(plain) >= 2


def test_q8_all_dims_broadcast_single_fact_shuffle(spark, sf_dir):
    """Q8's 8-way star: part/customer/supplier/nation x2/region all
    broadcast; the lineitem><orders orderkey join is the only shuffled
    join, so the fact never shuffles twice."""
    df = q.QUERIES["q8_market_share"](spark, sf_dir)
    plan = physical_plan(df)
    assert plan.count("BroadcastHashJoin") >= 6
    assert any("p_type" in f for f in pushed_filters(df))
    # orderkey join + agg + final sort at most; dims add none
    assert exchange_count(df) <= 4


def test_q21_semi_anti_self_joins_stay_on_orderkey(spark, sf_dir):
    """Q21's EXISTS/NOT EXISTS legs must plan as semi/anti hash joins
    on orderkey — a nested-loop fallback here is quadratic in lineitem
    and would never survive scale."""
    df = q.QUERIES["q21_waiting_supplier"](spark, sf_dir)
    plan = physical_plan(df)
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "LeftSemi" in plan and "LeftAnti" in plan


def test_q11_single_fact_scan_for_threshold(spark, sf_dir):
    """Q11's grand-total threshold (r11 shape: 1-row aggregate
    broadcast-crossed back over the per-part aggregate, replacing the
    SF-scaling single-partition window) must compute the per-part
    shuffle ONCE: the static plan shows the lineage in both branches,
    but at runtime AQE dedupes it as a ReusedExchange — assert the
    reuse actually happens, and that no single-partition window over
    the parts domain snuck back in."""
    from datagouv_tools_spark.plans.inspect import (
        single_partition_windows_scaling,
    )

    df = q.QUERIES["q11_important_parts"](spark, sf_dir)
    plan = physical_plan(df)
    assert "NestedLoop" not in plan.replace("BroadcastNestedLoopJoin", "")
    assert single_partition_windows_scaling(df) == []
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in final


def test_monthly_spine_broadcasts_the_calendar(spark, sf_dir):
    """Densification must broadcast the 80-row spine into the
    aggregated fact, never shuffle the fact against the calendar."""
    df = q.QUERIES["orders_monthly_spine"](spark, sf_dir)
    assert has_broadcast_hash_join(df)


def test_funnel_single_exchange(spark, sf_dir):
    """The three funnel stages must stack their windows on ONE user_id
    exchange — a per-stage shuffle would triple the fact movement."""
    df = q.QUERIES["events_conversion_funnel"](spark, sf_dir)
    assert exchange_count(df) == 1


def test_gap_sessions_shares_partitioning(spark, sf_dir):
    """lag -> running-sum -> rollup all ride the user_id exchange; only
    the final presentation sort may add a range exchange."""
    df = q.QUERIES["events_gap_sessions"](spark, sf_dir)
    assert exchange_count(df) <= 2


def test_tfidf_no_token_stream_recompute(spark, sf_dir):
    """df-as-window keeps the documents scan count at 2 (tf branch +
    corpus-count branch) — the naive tf/idf/join DAG scans it 3x."""
    df = q.QUERIES["doc_tfidf_top_terms"](spark, sf_dir)
    assert len(read_schemas(df)) <= 2


def test_blocked_all_pairs_no_driver_side_relation(spark, sf_dir):
    """cosine_pairs_blocked must be fully distributed: no LocalTableScan
    / ExistingRDD from driver-collected data feeding the kernel, no
    cartesian product — just scan → explode → one group-shuffle →
    applyInPandas."""
    df = q.QUERIES["emb_near_dup_pairs"](spark, sf_dir)
    plan = physical_plan(df)
    assert "FlatMapGroupsInPandas" in plan or "FlatMapGroupsInArrow" in plan
    assert "Scan ExistingRDD" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # explode + groupBy = one shuffle; final orderBy adds at most one more
    assert exchange_count(df) <= 2


def test_ivf_probes_are_executor_side(spark, sf_dir):
    """The IVF query side must be planned from the parquet scan (probes
    assigned in mapInPandas), never a driver-built local relation — the
    round-1 implementation collected query vectors to the driver and
    re-created a DataFrame, which showed up as Scan ExistingRDD."""
    df = q.QUERIES["ivf_ann_topk"](spark, sf_dir)
    plan = physical_plan(df)
    assert "Scan ExistingRDD" not in plan
    assert "LocalTableScan" not in plan
    # corpus assign + query probes (each node appears twice in the
    # formatted plan: tree line + detail section)
    assert plan.count("MapInPandas") in (2, 4)
    assert has_broadcast_hash_join(df)  # probes broadcast into the list join


def test_stratified_sample_prunes_per_partition(spark, sf_dir):
    """Top-k-per-group must plan a WindowGroupLimit so each task keeps
    only k rows per label before the shuffle."""
    df = q.QUERIES["label_stratified_sample"](spark, sf_dir)
    assert "WindowGroupLimit" in physical_plan(df)


def test_minhash_banding_is_equi_join(spark, sf_dir):
    """Candidate generation must join on the band bucket (equi-join →
    hash/sort-merge), never a nested-loop over all pairs — the property
    that makes MinHash-LSH O(candidates), not O(n²), at corpus scale."""
    df = q.QUERIES["minhash_candidate_pairs"](spark, sf_dir)
    plan = physical_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    )


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    """Partitioned parquet is THE 100 TB layout lever: a date-filtered
    scan over a date-partitioned table must plan PartitionFilters (and
    touch only matching directories), not read-all-then-filter."""
    from pyspark.sql import functions as F

    from datagouv_tools_spark.sinks.sink import ParquetSink
    from datagouv_tools_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    path = ParquetSink(str(tmp_path / "lake"), partition_by=("event_date",)).write(
        ev, "events_by_date"
    )
    one_day = spark.read.parquet(path).filter(
        F.col("event_date") == "2024-01-02"
    )
    plan = physical_plan(one_day)
    assert "PartitionFilters: [" in plan
    assert "event_date" in plan.split("PartitionFilters", 1)[1][:200]
    # the partition column must NOT appear as a post-scan data filter
    n = one_day.count()
    full = spark.read.parquet(path).count()
    assert 0 < n < full


def test_range_by_writes_disjoint_file_ranges(spark, sf_dir, tmp_path):
    """ParquetSink(range_by=...) must produce files whose parquet
    min/max statistics cover disjoint value ranges — the property that
    lets a range predicate skip whole files, verified on the actual
    footers, not the plan."""
    import glob

    import pyarrow.parquet as pq

    from datagouv_tools_spark.sinks.sink import ParquetSink
    from datagouv_tools_spark.sources.catalog import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    path = ParquetSink(
        str(tmp_path / "lake"), range_by=("o_totalprice",), range_partitions=6
    ).write(orders, "orders_ranged")

    ranges = []
    for f in glob.glob(path + "/part-*.parquet"):
        md = pq.read_metadata(f)
        idx = md.schema.names.index("o_totalprice")
        lo = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
        ranges.append((lo, hi))
    assert len(ranges) >= 4
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges: ({lo1},{hi1}) vs ({lo2},{hi2})"
    # row preservation
    assert spark.read.parquet(path).count() == orders.count()


def test_pq_adc_search_no_corpus_shuffle(spark, sf_dir):
    """PQ asymmetric-distance search must stay pure map work + a
    TakeOrdered: encode and LUT-lookup are projections, top-k is
    per-partition heaps — ZERO exchanges touch the corpus at any
    scale."""
    df = q.QUERIES["emb_pq_adc_topk"](spark, sf_dir)
    plan = physical_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert exchange_count(df) == 0


def test_hybrid_dedup_lsh_front_no_block_cross(spark, sf_dir):
    """The round-4 verdict's top item, as an executable guard: the
    hybrid dedup's embedding edge generator must be the banded-LSH
    candidate equi-join (join on band+bucket keys), NEVER the
    __gi × __gj block-pair replication of cosine_pairs_blocked — the
    one corpus-scale O(n²) plan round 4 shipped. The bucket fan-out is
    linear (corpus × bands × probes) and the exact-cosine kernel
    touches candidates only.

    The composite query localCheckpoints inside CC (which truncates the
    inspectable lineage), so this asserts (a) on the edge-generator
    stage's own plan with the query's exact parameters, and (b) at the
    source level that hybrid_dedup_clusters wires that generator, not
    the blocked all-pairs kernel."""
    import inspect

    from datagouv_tools_spark.operators.similarity import cosine_pairs_lsh
    from datagouv_tools_spark.sources.catalog import load_table

    src = inspect.getsource(q.hybrid_dedup_clusters)
    assert "import cosine_pairs_lsh" in src
    assert "import cosine_pairs_blocked" not in src

    emb = load_table(spark, sf_dir, "embeddings")
    df = cosine_pairs_lsh(emb, "vec_id", "embedding", threshold=0.4, dim=64)
    plan = physical_plan(df)
    # no all-pairs shapes anywhere in the composite
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the blocked kernel's applyInPandas block-cross is gone...
    assert "FlatMapGroupsInPandas" not in plan
    assert "__gi" not in plan and "__gj" not in plan
    # ...replaced by the band-bucket mapInPandas + candidate equi-join
    assert "MapInPandas" in plan
    assert "__band" in plan and "__bucket" in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    )


def test_ivfpq_list_pruning_no_corpus_shuffle(spark, sf_dir):
    """IVF-ADC composition: the probe filter must prune lists BEFORE
    the PQ encode (compressed-domain work on ~nprobe/n_lists of the
    corpus, not all of it), and the whole search must stay map work +
    TakeOrdered — zero corpus exchanges, like emb_pq_adc_topk but with
    list pruning in front."""
    df = q.QUERIES["emb_ivfpq_topk"](spark, sf_dir)
    plan = physical_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert exchange_count(df) == 0
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # assign kernel (+ encode kernel when the Arrow impl is chosen —
    # Catalyst may instead collapse the HOF encode + ADC into one
    # projection), nothing more
    assert plan.count("MapInPandas") in (2, 4)
    # the __list IN (...) probe filter exists and sits upstream of the
    # ADC distance projection (formatted plans print nodes scan→root,
    # so the filter must precede the adc_dist output)
    import re

    m = re.search(r"__list#\d+ IN ", plan)
    assert m, "probe-list filter missing from plan"
    assert "adc_dist" in plan
    assert m.start() < plan.index("adc_dist")


def test_segment_dedup_shuffles_hashes_not_text(spark, sf_dir):
    """The segment-dedup marking pass must exchange only the 8-byte
    seg_hash (+ ids), never segment text: at 100 TB the shuffle volume
    is the difference between hashes (~tens of GB) and the corpus
    itself. keep_seg_text=False is the audit path — assert no string
    segment column crosses an Exchange."""
    from datagouv_tools_spark.operators.dedup import segment_dedup_marks
    from datagouv_tools_spark.plans.inspect import physical_plan
    from datagouv_tools_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    marks = segment_dedup_marks(docs, "doc_id", "text", seg_len=8)
    plan = physical_plan(marks)
    # detail blocks of every Exchange operator: "(9) Exchange\nInput [..]: [...]"
    blocks = re.findall(r"\(\d+\) (?:Broadcast)?Exchange\n(?:.+\n)+?(?=\n)", plan)
    assert blocks, "expected at least one exchange detail block"
    # The r11 narrow-scan fan-out (operators/skew.fan_out_narrow_scan)
    # legitimately round-robins the raw rows BEFORE segmentation — it
    # only exists when the whole input is below one scan split, so that
    # exchange is bounded by construction and vanishes at scale. The
    # 100 TB invariant this test pins is about KEY-BASED exchanges: no
    # segment text may ride a hash/range partitioning.
    rr = 0
    for b in blocks:
        cols = re.search(r"Input \[\d+\]: \[([^\]]*)\]", b).group(1)
        if "roundrobinpartitioning" in b.lower():
            rr += 1
            continue
        assert "__seg" not in cols and "text#" not in cols, b
    # segs feeds both the winner aggregate and the join-back, so the
    # fan-out subtree appears (column-pruned differently) under each —
    # both instances remain bounded-by-construction narrow-scan spreads
    assert rr <= 2, "only the narrow-scan fan-out may round-robin"
    # the probe side itself never shuffles: the winner table comes back
    # as a broadcast, so segment rows flow scan -> explode -> hash ->
    # join with ZERO repartitioning of the corpus
    assert "BroadcastHashJoin" in plan


def test_incremental_rollup_dirty_repair_broadcasts(spark, sf_dir):
    """The maintenance query's extrema repair must reach the base via a
    broadcast semi-join on dirty keys AT RUNTIME (a shuffled semi-join
    would drag the 100 TB base through an exchange). The dirty-key side
    carries no forced hint — its cardinality is delta-derived, so the
    STATIC planner may pick SortMergeJoin on unknown stats; the
    contract is that AQE's runtime size check converts the semi-join to
    broadcast for a CDC-sized delta (and, unlike a hint, degrades to a
    shuffle instead of an OOM on a backfill-scale one)."""
    df = q.QUERIES["orders_incremental_rollup"](spark, sf_dir)
    df.collect()  # materialize so AQE finalizes join strategies
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    # AdaptiveSparkPlan.toString appends the pre-AQE "== Initial Plan =="
    # section, where the semi-join legitimately starts as SMJ on unknown
    # stats — assert on the final section only
    final = plan.split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in final
    # after AQE re-planning the dirty-key semi-join must be a broadcast
    # — LeftSemi must never survive as a SortMergeJoin at this scale
    assert not re.search(r"SortMergeJoin.*LeftSemi", final)


def test_distinct_sketch_single_ordinary_shuffle(spark, sf_dir):
    """The sketch path must stay one map-side-combining aggregation:
    partial min per (group, bucket) before the exchange — no
    count-distinct expansion of the sketch branch (the exact branch
    keeps its own distinct aggregate; at production the exact branch is
    dropped)."""
    df = q.QUERIES["events_distinct_sketch"](spark, sf_dir)
    plan = physical_plan(df)
    # partial aggregation happens before the shuffle on both branches
    assert plan.count("HashAggregate") >= 4
    # the sketch estimate itself is integer expressions, not a UDF
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_zorder_key_stays_in_codegen(spark, sf_dir):
    """Morton keys are bit expressions inside whole-stage codegen —
    never Python evaluation."""
    df = q.QUERIES["events_zorder_cells"](spark, sf_dir)
    plan = physical_plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the interleave shows up as shiftleft/& expressions in the project,
    # i.e. JVM expression evaluation, and partial-aggregates pre-shuffle
    assert "shiftleft" in plan
    assert "partial_count" in plan or "HashAggregate" in plan


def test_bloom_prefilter_sits_before_the_shuffle(spark, sf_dir):
    """The bloom membership test must be a Filter on the probe scan
    side (map-side, pre-exchange) — not applied after the join."""
    df = q.QUERIES["lineitem_bloom_prefilter"](spark, sf_dir)
    plan = physical_plan(df)
    # the probe filter's signature expressions: xxhash64 + element_at
    assert "xxhash64" in plan and "element_at" in plan
    assert "BatchEvalPython" not in plan


def test_bm25_topk_is_take_ordered_map_local(spark, sf_dir):
    """BM25 scoring is map-local array arithmetic over the scan (no
    explode, no join) and the top-k is TakeOrdered — never a corpus
    sort or shuffle beyond the one stats aggregation."""
    df = q.QUERIES["doc_bm25_topk"](spark, sf_dir)
    plan = physical_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "Generate" not in plan  # no explode in the scoring path
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_rrf_windows_only_over_candidates(spark, sf_dir):
    """The RRF fusion ranks with ROW_NUMBER only AFTER each candidate
    list is reduced by TakeOrdered(100), and since r11 the ranked
    100-row lists are PINNED (localCheckpoint) before fusion: the
    final plan consumes only the pinned candidate RDDs — no corpus
    scan, no Window, no Generate anywhere downstream. The windows ran
    once, over ≤100 rows, inside the pin jobs."""
    df = q.QUERIES["doc_retrieval_rrf"](spark, sf_dir)
    plan = physical_plan(df)
    assert "TakeOrderedAndProject" in plan
    # every input is a pinned candidate list, never the corpus
    assert "Scan ExistingRDD" in plan
    assert "Scan parquet" not in plan
    # the rank windows were evaluated at pin time over TakeOrdered
    # output; nothing re-ranks (or re-scores) downstream
    assert "Window" not in plan
    assert "Generate" not in plan


def test_batched_adc_single_scan_bounded_exchange(spark, sf_dir):
    """The batched ADC search reads the stored codes ONCE; the only
    exchange after the Arrow kernel moves the margin-pruned candidate
    rows (partitions × |Q| × ~k), never the corpus, into the per-query
    rank window."""
    df = q.QUERIES["emb_adc_topk_batch"](spark, sf_dir)
    plan = physical_plan(df, mode="simple")
    # exactly one Arrow kernel (the LUT-gather), no row-at-a-time python
    assert plan.count("MapInPandas") == 1, plan
    assert "BatchEvalPython" not in plan
    # the rank is a window over the kernel's bounded output
    assert "Window" in plan


def test_text_index_candidates_equi_join_no_cross(spark, sf_dir, tmp_path):
    """Candidate generation off the stored band index must be a
    (band_idx, band_hash) equi-join — never a cross/nested-loop
    product of the entry store with itself."""
    from pyspark.sql import functions as F

    from datagouv_tools_spark.operators.text_index import text_index_build
    from datagouv_tools_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    idx = text_index_build(docs, str(tmp_path / "ti"))
    for df in (idx.candidate_pairs(), idx.star_edges()):
        plan = physical_plan(df, mode="simple")
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_ngram_lm_no_cross_no_python_take_ordered(spark, sf_dir):
    """The LM filter is two shuffles (bigram count, per-doc re-agg) plus
    a bigram equi-join — never a cartesian product or Python kernel;
    bottom-20 must be TakeOrdered, not a corpus sort."""
    df = q.QUERIES["doc_ngram_lm_quality"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "TakeOrderedAndProject" in plan


def test_textrank_iterations_join_on_src_no_cross(spark, sf_dir):
    """Each PageRank round is an equi-join of edges against the rank
    vector — the only nested-loop joins allowed are the broadcast of
    the 1-row node count."""
    df = q.QUERIES["doc_textrank_keywords"](spark, sf_dir)
    plan = physical_plan(df, mode="simple")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "TakeOrderedAndProject" in plan


def test_association_rules_join_is_co_partitioned_basket(spark, sf_dir):
    """The pair expansion must be an equi-join on the basket key
    (l_orderkey) — the market-basket bound — with the 1-row total
    broadcast; never an item×item product."""
    df = q.QUERIES["part_association_rules"](spark, sf_dir)
    plan = physical_plan(df, mode="simple")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "TakeOrderedAndProject" in plan


def test_attribution_single_user_window_pass(spark, sf_dir):
    """Last-touch attribution is ONE window pass over one user_id
    exchange plus a tiny-domain agg — no self-join of purchases
    against touches."""
    df = q.QUERIES["events_attribution_last_touch"](spark, sf_dir)
    plan = physical_plan(df)
    assert "Window" in plan
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan


def test_bpe_pair_counts_aggregate_map_side(spark, sf_dir):
    """BPE pair counting must partial-aggregate before its exchange and
    stay pure JVM expression work (the fold is `aggregate`, never a
    Python kernel)."""
    from datagouv_tools_spark.functions.text import tokens
    from datagouv_tools_spark.operators.bpe import bpe_train
    from pyspark.sql import functions as F
    from datagouv_tools_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(tokens("text")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    out = bpe_train(words, rounds=1)
    plan = physical_plan(out, mode="simple")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bucketed_join_is_shuffle_free(spark, sf_dir, tmp_path):
    """operators/bucketing: same-bucketed tables join with ZERO
    Exchange — the write-once shuffle amortizes over every later join."""
    from pyspark.sql import functions as F

    from datagouv_tools_spark.operators.bucketing import (
        assert_colocated_join,
        bucketed_join,
        write_bucketed,
    )
    from datagouv_tools_spark.sources.catalog import load_table

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"), "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("okey"), "l_extendedprice"
    )
    write_bucketed(o, "t_bkt_o", str(tmp_path / "o"), "okey", n_buckets=4)
    write_bucketed(li, "t_bkt_l", str(tmp_path / "l"), "okey", n_buckets=4)
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        j = bucketed_join(spark, "t_bkt_o", "t_bkt_l", "okey")
        assert_colocated_join(j)  # SortMergeJoin, zero Exchange
        # layout-invariant: the bucketed copies hold exactly the rows
        assert j.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
        spark.sql("DROP TABLE IF EXISTS t_bkt_o")
        spark.sql("DROP TABLE IF EXISTS t_bkt_l")


def test_events_partitioned_prune_query_plan(spark, sf_dir):
    """events_partitioned_prune must prune at PLANNING time: the scan
    plans PartitionFilters on event_date and the date range never
    appears as a post-scan data filter — at 100 TB the other 23 days'
    directories are never opened."""
    df = q.QUERIES["events_partitioned_prune"](spark, sf_dir)
    plan = physical_plan(df)
    assert "PartitionFilters: [" in plan
    tail = plan.split("PartitionFilters", 1)[1]
    assert "event_date" in tail[:300]
    # the range predicate must live in PartitionFilters, not PushedFilters
    assert not any("event_date" in f for f in pushed_filters(df))


def test_semantic_dedup_pairs_are_cluster_equi_join(spark, sf_dir):
    """emb_semantic_dedup's pair generator must join on the cluster id
    (equi-join), never cross the corpus: the only non-equi joins in
    the composite are the kmeans one-row broadcast centroid singletons
    (BroadcastNestedLoopJoin against a single-row cands relation),
    which carry k·dim ints, not corpus rows."""
    df = q.QUERIES["emb_semantic_dedup"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    # the within-cluster verify is the Arrow per-cluster matmul kernel
    # (one G = X·Xᵀ per group), grouped BY the cluster id — never a
    # corpus-wide pair join
    assert "FlatMapGroupsInPandas" in plan
    # the centroid singletons are the only nested-loop shapes and are
    # broadcast one-row relations
    for frag in plan.split("BroadcastNestedLoopJoin")[1:]:
        assert "BuildRight" in frag[:80] or "BuildLeft" in frag[:80]


def test_mv_rewrite_never_scans_the_fact_table(spark, sf_dir):
    """orders_mv_rewrite's answering plan reads the daily rollup MV
    only — the orders fact table must not appear in any scan. That is
    the whole value of the summary table: the monthly query costs
    |days × priorities| rows however large the fact table grows."""
    df = q.QUERIES["orders_mv_rewrite"](spark, sf_dir)
    plan = physical_plan(df)
    assert "spark_graft_mv_daily_v1" in plan
    assert "orders.parquet" not in plan


def test_dpp_join_prunes_at_runtime(spark, sf_dir):
    """events_dpp_join's fact scan must carry a dynamicpruning
    subquery in its PartitionFilters — the campaign predicate is only
    implied by the broadcast dim, so pruning has to happen at runtime;
    without DPP the scan reads all 30 date directories."""
    df = q.QUERIES["events_dpp_join"](spark, sf_dir)
    plan = physical_plan(df)
    assert "dynamicpruning" in plan.lower()
    assert "PartitionFilters: [" in plan


def test_deciles_family_ranks_distributed(spark, sf_dir):
    """The r7 rank swap: the exact NTILE profile, the range-partition
    plan, and the sampled sketch all rank via the distributed two-pass
    rank — there must be NO window operator left in any of the three
    plans (the old global ntile/row_number was a Window over an
    Exchange SinglePartition: the whole table sorted in one task).
    Scalar 1-row aggregates still legitimately plan a SinglePartition
    exchange over partial-agg rows, so the guard targets Window."""
    for name in (
        "events_value_deciles",
        "events_value_deciles_sketch",
        "events_range_partition_plan",
        "customer_rfm_segments",
        "emb_calibration_bins",
        "emb_classifier_auc",
    ):
        plan = physical_plan(q.QUERIES[name](spark, sf_dir))
        assert "Window" not in plan, name


def test_matryoshka_recall_is_one_pass(spark, sf_dir):
    """The r8 rewrite: all four prefix-dimension score sets come from
    ONE corpus pass (per-row prefix norms + a 4-way explode), then the
    pinned top table joins itself for recall. Guard the shape: no
    parquet scan survives into the final plan (the single pass is
    checkpointed upstream), at most 2 shuffle exchanges (the tall-rank
    window + final agg), and no single-partition funnel. The pre-r8
    form was 5 sequential cosine_topk corpus scans (16 exchanges)."""
    from datagouv_tools_spark.plans.inspect import exchange_count

    df = q.QUERIES["emb_matryoshka_recall"](spark, sf_dir)
    plan = physical_plan(df)
    assert "Scan parquet" not in plan
    assert exchange_count(df) <= 2
    assert "SinglePartition" not in plan


def test_ivf_recall_curve_single_fanout(spark, sf_dir):
    """The r8 one-pass sweep: the corpus is list-assigned once and the
    8-probe candidate join serves every nprobe point as a rank-filtered
    slice. The pre-r8 form ran ivf_topk per sweep point (4 corpus
    assignment passes); hold the exchange budget well under that
    shape's (~26) so a regression back to per-point passes fails CI."""
    from datagouv_tools_spark.plans.inspect import exchange_count

    df = q.QUERIES["emb_ivf_recall_curve"](spark, sf_dir)
    assert exchange_count(df) <= 16


class TestScalingBroadcastAudit:
    """The r9 broadcast-grain check (plans/inspect.
    scaling_broadcast_tables): an explicit hint on an SF-scaling side
    must flag; constant-cardinality shapes (nation/region, scalar
    aggregates, literal-pinned keys, bounded top-k) must not."""

    def test_hinted_fact_table_flags(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from datagouv_tools_spark.plans.inspect import (
            scaling_broadcast_tables,
        )

        cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        df = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        assert scaling_broadcast_tables(df) == ["customer"]

    def test_bounded_shapes_stay_clean(self, spark, sf_dir):
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        from datagouv_tools_spark.plans.inspect import (
            scaling_broadcast_tables,
        )

        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
        # constant dim
        cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
        d1 = cust.join(
            F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
        )
        # 1-row scalar aggregate
        tot = orders.agg(F.sum("o_totalprice").alias("t"))
        d2 = orders.crossJoin(F.broadcast(tot))
        # literal-pinned entity key
        probe = orders.filter(F.col("o_orderkey") < 10)
        d3 = orders.join(F.broadcast(probe.select("o_orderkey")), "o_orderkey")
        # bounded top-k (rank filter over a window)
        w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice")
        top = (
            orders.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 3)
            .select("o_orderkey")
        )
        d4 = orders.join(F.broadcast(top), "o_orderkey", "left_semi")
        for df in (d1, d2, d3, d4):
            assert scaling_broadcast_tables(df) == []

    def test_entity_grain_aggregate_flags(self, spark, sf_dir):
        """Grouping BY an entity key keeps entity grain — the aggregate
        output scales with SF and a hint on it must flag."""
        from pyspark.sql import functions as F

        from datagouv_tools_spark.plans.inspect import (
            scaling_broadcast_tables,
        )

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        th = li.groupBy("l_partkey").agg(F.avg("l_quantity").alias("aq"))
        df = li.join(F.broadcast(th), "l_partkey")
        assert scaling_broadcast_tables(df) == ["lineitem"]

    def test_non_broadcast_hints_never_flag(self, spark, sf_dir):
        """merge/shuffle_hash hints are the OOM-safe alternatives the
        audit recommends — a deliberate .hint('merge') on an SF-scaling
        side must not trip the must-be-zero broadcast gate."""
        from datagouv_tools_spark.plans.inspect import (
            scaling_broadcast_tables,
        )

        cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        df = orders.join(
            cust.hint("merge"), orders.o_custkey == cust.c_custkey
        )
        assert scaling_broadcast_tables(df) == []
        df2 = orders.join(
            cust.hint("shuffle_hash"), orders.o_custkey == cust.c_custkey
        )
        assert scaling_broadcast_tables(df2) == []

    def test_disjunctive_key_filter_does_not_bound(self, spark, sf_dir):
        """A filter like (key < 10 OR value > 100) admits the whole
        table through its second disjunct — it must NOT count as
        bounding, or the gate would certify an OOM-at-scale hint."""
        from pyspark.sql import functions as F

        from datagouv_tools_spark.plans.inspect import (
            scaling_broadcast_tables,
        )

        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        leaky = orders.filter(
            (F.col("o_orderkey") < 10) | (F.col("o_totalprice") > 100)
        )
        df = orders.join(
            F.broadcast(leaky.select("o_orderkey")), "o_orderkey"
        )
        assert scaling_broadcast_tables(df) == ["orders"]

    def test_negated_key_filter_does_not_bound(self, spark, sf_dir):
        """A filter like key != 5 or ~(key < 10) admits essentially the
        whole table, but its inner comparison matches _BOUNDING_FILTER —
        NOT must disqualify bounding (ADVICE r9)."""
        from pyspark.sql import functions as F

        from datagouv_tools_spark.plans.inspect import (
            scaling_broadcast_tables,
        )

        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        neq = orders.filter(F.col("o_orderkey") != 5)
        df1 = orders.join(
            F.broadcast(neq.select("o_orderkey")), "o_orderkey"
        )
        assert scaling_broadcast_tables(df1) == ["orders"]
        negated = orders.filter(~(F.col("o_orderkey") < 10))
        df2 = orders.join(
            F.broadcast(negated.select("o_orderkey")), "o_orderkey"
        )
        assert scaling_broadcast_tables(df2) == ["orders"]
        # isnotnull alone must not trip the NOT check: a plain bounded
        # filter keeps its implicit isnotnull conjunct and still bounds.
        bounded = orders.filter(F.col("o_orderkey") < 10)
        df3 = orders.join(
            F.broadcast(bounded.select("o_orderkey")), "o_orderkey"
        )
        assert scaling_broadcast_tables(df3) == []


class TestSinglePartitionWindowAudit:
    """The r11 SPW-domain classifier (plans/inspect.
    single_partition_windows_scaling): a Window.partitionBy(lit(1)) /
    partitionBy() over an SF-scaling input must flag; the same window
    over a bounded post-aggregate domain must not (VERDICT r10 #1)."""

    def test_entity_grain_spw_flags(self, spark, sf_dir):
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        from datagouv_tools_spark.plans.inspect import (
            single_partition_windows_scaling,
        )

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        pv = li.groupBy("l_partkey").agg(F.sum("l_quantity").alias("v"))
        w = Window.partitionBy(F.lit(1))
        df = pv.withColumn("t", F.sum("v").over(w))
        assert single_partition_windows_scaling(df) == ["lineitem"]
        # empty partitionBy is the same single-partition shape
        w2 = Window.orderBy("v")
        df2 = pv.withColumn("rk", F.row_number().over(w2))
        assert single_partition_windows_scaling(df2) == ["lineitem"]

    def test_bounded_domain_spw_clean(self, spark, sf_dir):
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        from datagouv_tools_spark.plans.inspect import (
            single_partition_windows_scaling,
        )

        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        # bounded post-aggregate domain: order priorities (enum)
        bd = orders.groupBy("o_orderpriority").agg(
            F.sum("o_totalprice").alias("v")
        )
        w = Window.partitionBy(F.lit(1))
        df = bd.withColumn("share", F.col("v") / F.sum("v").over(w))
        assert single_partition_windows_scaling(df) == []

    def test_keyed_window_never_flags(self, spark, sf_dir):
        """A window partitioned by a real column distributes across
        tasks — it must not match even over a raw fact table."""
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        from datagouv_tools_spark.plans.inspect import (
            single_partition_windows_scaling,
        )

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        w = Window.partitionBy("l_partkey").orderBy("l_shipdate")
        df = li.withColumn("rn", F.row_number().over(w))
        assert single_partition_windows_scaling(df) == []

    def test_full_surface_spw_gate_is_zero(self, spark, sf_dir):
        """Every remaining single-partition window in the 244-query
        surface has a certified-bounded domain. Sampled here on the
        7 queries the r10 audit listed as SPW carriers; the full sweep
        is tools/planaudit.py's spw_scaling gate."""
        from datagouv_tools_spark.plans.inspect import (
            single_partition_windows_scaling,
        )

        for name in (
            "q11_important_parts",
            "customer_value_deciles",
            "revenue_pareto_curve",
        ):
            if name not in q.QUERIES:
                continue
            df = q.QUERIES[name](spark, sf_dir)
            assert single_partition_windows_scaling(df) == [], name


class TestBnljScalarAudit:
    """The r11 BNLJ build-side classifier (plans/inspect.
    unbounded_bnlj_sides): the repo's BNLJ are broadcast 1-row scalars
    or literal-bounded probes; a BNLJ whose broadcast side is an
    SF-scaling relation (or entity-grain aggregate) must hard-fail
    (VERDICT r10 #2)."""

    def test_scalar_crossjoin_clean(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from datagouv_tools_spark.plans.inspect import (
            unbounded_bnlj_sides,
        )

        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        tot = orders.agg(F.sum("o_totalprice").alias("t"))
        df = orders.crossJoin(F.broadcast(tot))
        assert unbounded_bnlj_sides(df) == []

    def test_unbounded_broadcast_side_flags(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from datagouv_tools_spark.plans.inspect import (
            unbounded_bnlj_sides,
        )

        nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
        cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
        df = nation.crossJoin(F.broadcast(cust))
        assert unbounded_bnlj_sides(df) == ["customer"]
        # entity-grain aggregate is just as unbounded
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        pv = li.groupBy("l_partkey").agg(F.sum("l_quantity").alias("v"))
        df2 = nation.crossJoin(F.broadcast(pv))
        assert unbounded_bnlj_sides(df2) == ["lineitem"]

    def test_non_equi_range_join_side_bounded(self, spark, sf_dir):
        """A non-equi theta join against a literal-bounded side (the
        range-join tier pattern) BNLJs but must stay clean."""
        from pyspark.sql import functions as F

        from datagouv_tools_spark.plans.inspect import (
            unbounded_bnlj_sides,
        )

        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        tiers = spark.createDataFrame(
            [(0.0, 100.0, "low"), (100.0, 1e9, "high")],
            "lo double, hi double, tier string",
        )
        df = orders.join(
            F.broadcast(tiers),
            (orders.o_totalprice >= tiers.lo)
            & (orders.o_totalprice < tiers.hi),
        )
        assert unbounded_bnlj_sides(df) == []


class TestBoundingRefinements:
    """r11 classifier refinements: per-conjunct filter bounding and
    driver-local RDD leaves (found by running the new gates over the
    full surface — events_dpp_join / simhash_hamming_pairs were false
    positives, events_user_kmv_setops a TRUE positive since fixed)."""

    def test_conjunct_bounding_survives_complex_sibling(self, spark, sf_dir):
        """A bounding key conjunct must bound even when ANDed with a
        huge unrelated expression containing OR/NOT internals (the
        pushed-down simhash projection pattern)."""
        from pyspark.sql import functions as F

        from datagouv_tools_spark.plans.inspect import (
            scaling_broadcast_tables,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        messy = docs.filter(
            (F.col("doc_id") < 60)
            & (
                (F.length("text") > 10) | F.col("text").isNotNull()
            )
        )
        df = docs.join(
            F.broadcast(messy.select("doc_id")), "doc_id", "left_semi"
        )
        assert scaling_broadcast_tables(df) == []

    def test_disjunctive_only_filter_still_leaks(self, spark, sf_dir):
        """No bounding CONJUNCT → still flags (the OR guard holds)."""
        from pyspark.sql import functions as F

        from datagouv_tools_spark.plans.inspect import (
            scaling_broadcast_tables,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        leaky = docs.filter(
            (F.col("doc_id") < 60) | F.col("text").isNotNull()
        )
        df = docs.join(
            F.broadcast(leaky.select("doc_id")), "doc_id", "left_semi"
        )
        assert scaling_broadcast_tables(df) == ["documents"]

    def test_driver_local_rdd_leaf_is_bounded(self, spark, sf_dir):
        """createDataFrame literals (LogicalRDD/ExistingRDD leaves) are
        driver-materialized — bounded by construction even when their
        column names shadow a fact-table prefix (event_date on a
        campaign dim)."""
        import datetime

        from pyspark.sql import functions as F

        from datagouv_tools_spark.plans.inspect import (
            scaling_broadcast_tables,
            unbounded_bnlj_sides,
        )

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        dim = spark.createDataFrame(
            [(datetime.date(2024, 1, d), d % 3 == 0) for d in range(1, 31)],
            "event_date date, is_campaign boolean",
        )
        df = ev.withColumn("event_date", F.col("ts").cast("date")).join(
            F.broadcast(dim.filter("is_campaign")), "event_date"
        )
        assert scaling_broadcast_tables(df) == []
        cross = spark.read.parquet(f"{sf_dir}/nation.parquet").crossJoin(
            F.broadcast(dim)
        )
        assert unbounded_bnlj_sides(cross) == []
