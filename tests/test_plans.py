"""Physical-plan quality gates: the properties that make queries
survive a 100× scale-up. These are the Spark equivalents of the
reference's pruning-effect claims (BASELINE.md: column pruning −50-80%
read, file pruning −90% reads)."""

import pytest
from pyspark.sql import functions as F

from miniodb_spark import plans
from miniodb_spark.queries import get_registry

US = 1_000_000
DAY = 86_400 * US
T0 = 1_700_000_000 * US


@pytest.fixture(scope="module")
def registry():
    return get_registry()


def test_predicate_pushdown_reaches_scan(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    df = li.filter(F.col("l_orderkey") == 42).select("l_orderkey", "l_quantity")
    pushed = plans.pushed_filters(df)
    assert any("l_orderkey" in p for p in pushed), pushed


def test_column_pruning_narrow_scan(spark, sf_dir, registry):
    # q1 touches 7 of lineitem's 11 columns; the scan must not read more
    df = registry["q1_pricing_summary"].fn(spark, sf_dir)
    cols = plans.scan_columns(df)
    assert "l_orderkey" not in cols and "l_partkey" not in cols, cols
    assert {"l_returnflag", "l_linestatus", "l_quantity"} <= cols


def test_partition_pruning_on_dt(engine):
    # engine-layout table partitioned by dt: a dt predicate must become a
    # PartitionFilter (zero data files of other days opened)
    for i in range(6):
        engine.write("pp", {"v": i}, record_id=f"r{i}", timestamp_us=T0 + i * DAY)
    engine.flush()
    df = engine.read_persisted("pp").filter(F.col("dt") == "2023-11-14")
    pf = plans.partition_filters(df)
    assert any("dt" in p for p in pf), pf
    assert df.count() == 1


def test_id_pointlookup_pushdown(engine):
    # id stays a data column (no per-id dirs at 100 TB): point lookups must
    # ride parquet footer min/max via PushedFilters
    for i in range(5):
        engine.write("idp", {"v": i}, record_id=f"r{i}", timestamp_us=T0)
    engine.flush()
    df = engine.read_persisted("idp").filter(F.col("id") == "r3")
    pushed = plans.pushed_filters(df)
    assert any("id" in p.lower() for p in pushed), pushed


def test_star_join_broadcasts_dims(spark, sf_dir, registry):
    df = registry["join_multiway_region"].fn(spark, sf_dir)
    kinds = plans.join_kinds(df)
    assert kinds["broadcast_hash"] == 3, kinds
    assert kinds["sort_merge"] == 0, kinds


def test_topk_is_take_ordered(spark, sf_dir, registry):
    df = registry["sort_limit_topk"].fn(spark, sf_dir)
    assert plans.has_take_ordered(df)


def test_q1_single_shuffle(spark, sf_dir, registry):
    # partial+final hash agg: exactly one exchange (on the group keys),
    # plus possibly one for the final orderBy of 6 rows
    df = registry["q1_pricing_summary"].fn(spark, sf_dir)
    assert plans.num_shuffles(df) <= 2, plans.simple_plan(df)


def test_codegen_active(spark, sf_dir, registry):
    df = registry["q1_pricing_summary"].fn(spark, sf_dir)
    assert plans.uses_whole_stage_codegen(df)


def test_engine_query_pushes_predicates(engine):
    # the full SQL path (gate → temp views → spark.sql) must preserve
    # pushdown through the hybrid persisted∪buffer union
    for i in range(10):
        engine.write("gq", {"age": 20 + i}, record_id=f"u{i}", timestamp_us=T0)
    engine.flush()
    df = engine.query_df("SELECT id FROM gq WHERE age > 25")
    pushed = plans.pushed_filters(df)
    assert any("age" in p.lower() for p in pushed), pushed


def test_contamination_probe_side_broadcasts(spark, sf_dir, registry):
    """The probe/benchmark shingle set must broadcast so the corpus side
    never shuffles — the property that keeps decontamination linear at
    100 TB."""
    df = registry["benchmark_contamination"].fn(spark, sf_dir)
    kinds = plans.join_kinds(df)
    assert kinds["broadcast_hash"] >= 1, kinds
    assert kinds["sort_merge"] == 0, kinds


def test_gopher_quality_zero_shuffle(spark, sf_dir, registry):
    """The Gopher rules are pure per-row expressions — no exchange
    beyond the final global sort of the result."""
    df = registry["gopher_quality_filter"].fn(spark, sf_dir)
    assert plans.num_shuffles(df) <= 1, plans.simple_plan(df)  # orderBy only
    cols = plans.scan_columns(df)
    assert "text" in cols and "embedding" not in cols


def test_repetition_fractions_shuffles_bounded(spark, sf_dir, registry):
    """Gram aggregation shuffles on (doc, gram) and joins two per-doc
    aggregates — the state is document-bounded, and the plan must not
    blow past the agg+join exchanges."""
    df = registry["repetition_fractions"].fn(spark, sf_dir)
    # g2 agg (2 exchanges: gram-count + doc rollup), g3 same, join + sort;
    # AQE reuses what it can — cap at the declared inventory
    assert plans.num_shuffles(df) <= 7, plans.simple_plan(df)


def test_substring_dedup_scans_text_only(spark, sf_dir, registry):
    df = registry["substring_dup_spans"].fn(spark, sf_dir)
    cols = plans.scan_columns(df)
    assert cols <= {"doc_id", "text"}, cols


def test_knn_join_corpus_side_never_shuffles(spark, sf_dir, registry):
    """Stage 1 of the batched k-NN join reduces each Arrow batch to
    Q*k candidate rows BEFORE anything shuffles; the only exchange in
    the plan is the tiny final window (+ result sort) over survivors —
    never the corpus."""
    df = registry["knn_batch_join"].fn(spark, sf_dir)
    # window on query_id + orderBy: at most 2 exchanges, none corpus-sized
    assert plans.num_shuffles(df) <= 2, plans.simple_plan(df)
    plan = plans.simple_plan(df)
    # the map-partitions stage must sit below the first exchange
    assert "MapInPandas" in plan or "mapInPandas" in plan.lower()


def test_image_phash_shuffles_hash_not_payload(spark, sf_dir, registry):
    """The perceptual-hash groupBy must shuffle only (dhash, media_id,
    sha1) projections — the payload bytes stay inside the map stage."""
    df = registry["image_phash_near_dup"].fn(spark, sf_dir)
    plan = plans.simple_plan(df)
    agg_and_below = plan[plan.index("HashAggregate"):] if "HashAggregate" in plan else plan
    assert "payload" not in agg_and_below.split("MapInPandas")[0], plan


def test_bloom_prefilter_store_join_is_gated(spark, sf_dir, registry):
    """The fingerprint-store join must consume the Bloom-filtered
    candidate stream (a Filter on maybe_seen below the join), not the
    raw batch."""
    df = registry["dedup_bloom_prefilter"].fn(spark, sf_dir)
    plan = plans.simple_plan(df)
    assert "maybe_seen" in plan, plan


def _final_plan(df):
    df.collect()
    s = df._jdf.queryExecution().executedPlan().toString()
    # keep only the executed plan: the trailing "Initial Plan" section is
    # the pre-AQE shape and may legitimately contain sort-merge joins
    # that the runtime then converted to broadcast
    return s.split("== Initial Plan ==")[0]


def test_funnel_stages_broadcast_under_aqe(spark, sf_dir, registry):
    """funnel_conversion's claim: per-stage user tables (cardinality =
    users << events) broadcast at runtime — AQE must convert every
    stage join, leaving no sort-merge join in the final plan."""
    import re

    df = registry["funnel_conversion"].fn(spark, sf_dir)
    plan = _final_plan(df)
    assert "isFinalPlan=true" in plan
    assert re.search(r"BroadcastHashJoin|BroadcastNestedLoopJoin", plan)
    assert "SortMergeJoin" not in plan, plan[:2000]


def test_retention_cohort_table_broadcasts(spark, sf_dir, registry):
    """retention_cohorts: the one-row-per-user cohort table must
    broadcast; the only real shuffle is the distinct-count agg."""
    df = registry["retention_cohorts"].fn(spark, sf_dir)
    plan = _final_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, plan[:2000]


def test_boilerplate_boiler_set_broadcasts(spark, sf_dir, registry):
    """boilerplate_ngrams: the boiler gram set (tiny after the >=5-doc
    filter) must come back as a broadcast join against the corpus-sized
    gram table, not a second corpus-wide shuffle."""
    df = registry["boilerplate_ngrams"].fn(spark, sf_dir)
    plan = _final_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, plan[:2000]


def test_ngram_novelty_two_gram_shuffles_only(spark, sf_dir, registry):
    """ngram_novelty avoids the oracle's join entirely (min window over
    the gram key) — the plan must carry no join at all."""
    df = registry["ngram_novelty"].fn(spark, sf_dir)
    plan = _final_plan(df)
    assert "Join" not in plan, plan[:2000]


def test_rolling_active_explodes_to_equi_join(spark, sf_dir, registry):
    """rolling_7d_active_users: pairs explode to their <=7 covered
    window days and equi-join the broadcast day dimension — a hash
    join, never a nested-loop range predicate (O(|days|*|pairs|)) or a
    cartesian over raw events. The only wide shuffles are the two
    distinct/count-distinct aggs over (day, user) pairs."""
    df = registry["rolling_7d_active_users"].fn(spark, sf_dir)
    plan = _final_plan(df)
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]


def test_cumulative_distinct_avoids_expanding_window(spark, sf_dir, registry):
    """cumulative_distinct_users: the first-seen-day formulation must
    contain no join and no expanding count-distinct — two hash aggs
    plus one window over the day-grain table."""
    df = registry["cumulative_distinct_users"].fn(spark, sf_dir)
    plan = _final_plan(df)
    assert "Join" not in plan, plan[:2000]


def test_pmi_unigram_sides_broadcast(spark, sf_dir, registry):
    """pmi_collocations: the unigram count table and both scalar
    totals broadcast into the bigram table — vocabulary-sized build
    sides, no sort-merge join anywhere."""
    df = registry["pmi_collocations"].fn(spark, sf_dir)
    plan = _final_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, plan[:2000]


def test_kl_divergence_totals_broadcast(spark, sf_dir, registry):
    """kl_divergence_sources: per-source totals and the global
    distribution join in as broadcast sides; the only wide shuffle is
    the (source, token) count agg."""
    df = registry["kl_divergence_sources"].fn(spark, sf_dir)
    plan = _final_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, plan[:2000]


def test_levenshtein_join_is_block_keyed(spark, sf_dir, registry):
    """levenshtein_blocked_pairs: the self-join must be an equi-join on
    the blocking key (hash-partitioned or broadcast), never a cartesian
    / nested-loop over all pairs."""
    df = registry["levenshtein_blocked_pairs"].fn(spark, sf_dir)
    plan = _final_plan(df)
    assert "CartesianProduct" not in plan, plan[:2000]
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]


# --- round-9 TPC-H-shaped suite -------------------------------------------


def test_q5_star_join_all_broadcast_under_aqe(spark, sf_dir, registry):
    """q5's 6-way star: after AQE every join (orders, customer, the
    two-key supplier join, nation, region) runs broadcast — no
    sort-merge join and no cartesian shape at test scale."""
    df = registry["q5_local_supplier_volume"].fn(spark, sf_dir)
    plan = _final_plan(df)
    assert "isFinalPlan=true" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, plan[:2000]
    assert "CartesianProduct" not in plan


def test_flat_star_fact_never_pre_shuffled(spark, sf_dir, registry):
    """r18 star-join flattening gate: q2/q7/q8/q20 join the fact to
    LEAF SCANS only (no joined/aggregated subtree as a build side), so
    the final plan must carry no sort-merge and no shuffled-hash join —
    the fact reaches its aggregate through broadcast probes alone. A
    regression to a pre-joined dim build side reintroduces a fact
    exchange that only AQE can (partially) rescue."""
    for name in ("q2_min_cost_supplier", "q7_volume_shipping",
                 "q8_market_share", "q20_promo_part_suppliers"):
        df = registry[name].fn(spark, sf_dir)
        plan = _final_plan(df)
        # a selective filter can yield zero rows at test SF, letting AQE
        # collapse the whole join tree to EmptyRelation — that trivially
        # satisfies the no-fact-shuffle property
        if "EmptyRelation" not in plan:
            assert "BroadcastHashJoin" in plan, (name, plan[:2000])
        assert "SortMergeJoin" not in plan, (name, plan[:2000])
        assert "ShuffledHashJoin" not in plan, (name, plan[:2000])


def test_q10_topk_is_take_ordered(spark, sf_dir, registry):
    """Top-20 by revenue must be TakeOrderedAndProject (per-partition
    heap + merge), never a global sort of the aggregate."""
    df = registry["q10_returned_items"].fn(spark, sf_dir)
    assert plans.has_take_ordered(df)


def test_q18_having_shortlist_broadcasts(spark, sf_dir, registry):
    """The >300-quantity survivor set (46 orders at sf0.01) must come
    back to orders/customer as the broadcast side."""
    df = registry["q18_large_volume_customers"].fn(spark, sf_dir)
    plan = _final_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, plan[:2000]


def test_q19_envelope_bounds_reach_scan(spark, sf_dir, registry):
    """The disjunction itself cannot push down; the stated envelope
    bounds (quantity 1..30) must appear as PushedFilters so the
    lineitem scan still prunes."""
    df = registry["q19_disjunctive_brackets"].fn(spark, sf_dir)
    pushed = plans.pushed_filters(df)
    assert any("l_quantity" in p for p in pushed), pushed


def test_q4_exists_is_semi_join(spark, sf_dir, registry):
    """EXISTS decorrelates to a LeftSemi hash join with the date
    comparison as residual — no per-row subquery re-execution."""
    df = registry["q4_priority_exists"].fn(spark, sf_dir)
    plan = plans.simple_plan(df)
    assert "LeftSemi" in plan, plan[:2000]


def test_q17_threshold_join_broadcasts(spark, sf_dir, registry):
    """The per-part average table (one row per Brand#12 part) joins
    back by broadcast; the fact side never shuffles on part key."""
    df = registry["q17_small_quantity_revenue"].fn(spark, sf_dir)
    plan = _final_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, plan[:2000]


# --- round-9 analytics batch ----------------------------------------------


def test_gap_fill_spine_broadcasts(spark, sf_dir, registry):
    """Both join sides are days x types bounded, but the broadcast
    hint must sit on the AGGREGATED counts side: the spine is the
    PRESERVED side of the left join, and a preserved side can never be
    the hash-join build side — a hint there is silently ignored
    (HintErrorLogger) and the join degrades to sort-merge (r14 verdict
    #6, fixed round 15). The gate pins that the broadcast actually
    lands."""
    df = registry["gap_fill_daily_counts"].fn(spark, sf_dir)
    plan = _final_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, plan[:2000]


def test_top_decile_share_has_no_global_window_or_sort(spark, sf_dir,
                                                       registry):
    """Revenue concentration must come from an exact-percentile scalar
    broadcast — an unpartitioned window or global sort over customer
    revenue would single-task at scale."""
    df = registry["top_decile_revenue_share"].fn(spark, sf_dir)
    plan = plans.simple_plan(df)
    assert "Window" not in plan, plan[:2000]
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row scalar join


def test_iqr_fences_table_broadcasts(spark, sf_dir, registry):
    """The per-type fence table (enum cardinality) joins the facts by
    broadcast; events shuffle only for the quantile aggregate."""
    df = registry["iqr_outlier_fences"].fn(spark, sf_dir)
    plan = _final_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, plan[:2000]


def test_out_of_order_window_is_user_partitioned(spark, sf_dir, registry):
    """The lag window must be partitioned by user_id (bounded per-user
    streams), never a global ordering of all events."""
    df = registry["out_of_order_rate"].fn(spark, sf_dir)
    plan = plans.simple_plan(df)
    assert "partitionBy" not in plan  # spark spells it in the Window node
    import re
    m = re.search(r"Window .*user_id", plan)
    assert m, plan[:2000]


def test_zipf_shortlist_is_take_ordered(spark, sf_dir, registry):
    """The top-1000 token shortlist must be TakeOrderedAndProject, so
    the rank window runs on 1000 rows no matter the corpus size."""
    df = registry["zipf_slope_top_tokens"].fn(spark, sf_dir)
    assert plans.has_take_ordered(df)


# --- TPC-H completion set (Q2/Q11/Q12/Q13/Q21) ----------------------------


def test_q2_correlation_is_window_not_self_join(spark, sf_dir, registry):
    """The correlated per-part MIN must run as a window over the
    (part, supplier) cost aggregate — one partkey shuffle, no second
    scan of lineitem and no nested-loop correlation."""
    df = registry["q2_min_cost_supplier"].fn(spark, sf_dir)
    plan = plans.simple_plan(df)
    assert plan.count("Window") >= 1
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]


def test_q11_threshold_is_scalar_broadcast(spark, sf_dir, registry):
    """The threshold branch and the filter branch share one per-part
    aggregate: the runtime must reuse the partkey exchange so the
    lineitem fact is scanned exactly once per execution (the static
    plan textually duplicates the subtree; ReuseExchange collapses
    it)."""
    df = registry["q11_important_parts"].fn(spark, sf_dir)
    plan = _final_plan(df)
    scans = plan.count("lineitem.parquet")
    assert scans == 1, f"lineitem scanned {scans}x\n{plan[:2000]}"
    assert "ReusedExchange" in plan, plan[:2000]


def test_q12_conditional_counts_share_one_aggregate(spark, sf_dir, registry):
    """Both FILTER counts fold into a single partial+final aggregate
    pass — no Expand (distinct-style rewrite) and no second join."""
    df = registry["q12_late_priority_lines"].fn(spark, sf_dir)
    plan = plans.simple_plan(df)
    assert plan.count("HashAggregate") == 2, plan[:2000]
    assert "Expand" not in plan, plan[:2000]


def test_q13_left_join_keeps_null_extension(spark, sf_dir, registry):
    """The priority exclusion must live in the join condition (LeftOuter
    with a join-side predicate), not a post-join filter that would drop
    the NULL-extended zero-order customers."""
    df = registry["q13_customer_distribution"].fn(spark, sf_dir)
    plan = plans.simple_plan(df)
    lines = plan.splitlines()
    join_at = next(i for i, l in enumerate(lines) if "LeftOuter" in l)
    filt_at = [i for i, l in enumerate(lines)
               if "Filter" in l and "o_orderpriority" in l]
    # the tree prints parents first: a build-side (pre-join) filter sits
    # BELOW the join line; a post-join filter would sit above it and
    # wrongly drop NULL-extended customers
    assert filt_at and all(i > join_at for i in filt_at), plan[:2000]


def test_q21_exists_rewrite_has_no_nested_loops(spark, sf_dir, registry):
    """The EXISTS / NOT EXISTS pair is per-order counts: every join is
    hash-based on l_orderkey (or a broadcast dim) — no nested-loop or
    cartesian shape anywhere, at any scale."""
    df = registry["q21_waiting_suppliers"].fn(spark, sf_dir)
    plan = _final_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]


def test_interpolation_windows_are_type_partitioned(spark, sf_dir, registry):
    """Both ignore-nulls windows partition by event_type — O(1) state
    per window over the bounded spine; never a global ordering, and the
    spine cross join is the only nested-loop shape (bounded by
    retention x enum, not data)."""
    df = registry["interpolate_hourly_values"].fn(spark, sf_dir)
    plan = plans.simple_plan(df)
    import re
    for m in re.finditer(r"Window \[[^\]]*\], \[([^\]]*)\]", plan):
        assert "event_type" in m.group(0), m.group(0)
    assert "SortMergeJoin" not in plan, plan[:2000]


def test_runtime_bloom_filter_engages_on_selective_dim(spark, sf_dir):
    """Runtime bloom-filter join (on by default in this Spark): a
    selective dim side injects a bloom_filter_agg semi-filter into the
    fact scan of a shuffle join — the companion to broadcast pruning
    when the dim is too big to broadcast at 100 TB. Size thresholds
    keep it dormant at test scale, so lower them (and disable auto
    broadcast, which would otherwise win) to prove the rewrite
    engages; every config is restored afterwards."""
    saved = {k: spark.conf.get(k) for k in (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
    )}
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold", "0")
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT")
        j = (li.join(o, li.l_orderkey == o.o_orderkey)
             .groupBy("o_orderpriority").count())
        opt = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in opt, opt[:2000]
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_pagerank_matches_first_principles_on_tiny_graph(spark, tmp_path):
    """The PageRank entry and its SQL oracle share one formulation; a
    shared conceptual bug would pass the parity check. Pin the entry to
    an independent dense-matrix power iteration on a hand-built
    4-part x 2-supplier graph."""
    import numpy as np
    import pandas as pd

    from miniodb_spark.queries import get_registry

    links = [(1, 1), (2, 1), (3, 1), (3, 2), (4, 2)]
    pdf = pd.DataFrame(links, columns=["l_partkey", "l_suppkey"])
    sf = tmp_path / "tiny"
    sf.mkdir()
    spark.createDataFrame(pdf).write.parquet(str(sf / "lineitem.parquet"))

    # independent computation: undirected bipartite adjacency,
    # column-stochastic transition, 3 damped iterations from uniform
    nodes = [1, 2, 3, 4, "s1", "s2"]
    idx = {n: i for i, n in enumerate(nodes)}
    A = np.zeros((6, 6))
    for p, s in links:
        A[idx[p], idx[f"s{s}"]] = A[idx[f"s{s}"], idx[p]] = 1.0
    M = A / A.sum(axis=0)  # column-stochastic (A symmetric)
    r = np.full(6, 1 / 6)
    for _ in range(3):
        r = 0.15 / 6 + 0.85 * (M @ r)

    out = get_registry()["pagerank_bipartite_topk"].fn(spark, str(sf))
    got = {row.s_suppkey: row.pagerank for row in out.collect()}
    assert got.keys() == {1, 2}
    assert abs(got[1] - round(r[idx["s1"]], 9)) < 1e-9, (got, r)
    assert abs(got[2] - round(r[idx["s2"]], 9)) < 1e-9, (got, r)


def test_interpolation_matches_numpy_interp_on_tiny_series(spark, tmp_path):
    """Pin interpolate_hourly_values to numpy.interp on a hand-built
    series: type A has values only at hours 0 and 3 (interior gap ->
    linear fill, trailing gap -> nearest side), type B spans all hours
    so it fixes the spine bounds."""
    import datetime as dt

    import pandas as pd

    from miniodb_spark.queries import get_registry

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0 + dt.timedelta(hours=0), 7, "A", 10.0, "{}"),
        (2, t0 + dt.timedelta(hours=3), 7, "A", 40.0, "{}"),
    ] + [
        (10 + h, t0 + dt.timedelta(hours=h), 8, "B", 5.0, "{}")
        for h in range(6)
    ]
    pdf = pd.DataFrame(rows, columns=[
        "event_id", "ts", "user_id", "event_type", "value", "props"])
    sf = tmp_path / "tinyev"
    sf.mkdir()
    spark.createDataFrame(pdf).write.parquet(str(sf / "events.parquet"))

    out = get_registry()["interpolate_hourly_values"].fn(spark, str(sf))
    a = {r.hour.hour: (r.value, r.interpolated)
         for r in out.collect() if r.event_type == "A"}
    # interior gap: linear between 10@h0 and 40@h3; trailing gap: nearest
    assert a[0] == (10.0, False) and a[3] == (40.0, False)
    assert a[1] == (20.0, True) and a[2] == (30.0, True)
    assert a[4] == (40.0, True) and a[5] == (40.0, True)


def test_skyline_is_reduce_first_no_join(spark, sf_dir, registry):
    """The Pareto frontier must be computed join-free: a distributed
    min-aggregate collapses the facts to the domain-bounded candidate
    set and the running-min window runs on that — never the quadratic
    NOT-EXISTS self-join formulation."""
    df = registry["skyline_parts"].fn(spark, sf_dir)
    plan = _final_plan(df)
    assert "Join" not in plan, plan[:2000]
    assert "HashAggregate" in plan and "Window" in plan, plan[:2000]


def test_winsorized_bounds_table_broadcasts(spark, sf_dir, registry):
    """The per-type (lo, hi) percentile bounds table (enum cardinality)
    joins the facts by broadcast; events shuffle only for the two
    aggregates."""
    df = registry["winsorized_value_stats"].fn(spark, sf_dir)
    plan = _final_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, plan[:2000]


def test_gini_single_window_then_agg_no_join(spark, sf_dir, registry):
    """Exact Gini is one in-group rank window plus one aggregate —
    no join, no second pass over orders."""
    df = registry["gini_totalprice_by_priority"].fn(spark, sf_dir)
    plan = _final_plan(df)
    assert "Join" not in plan, plan[:2000]
    assert plan.count("Window") >= 1 and "HashAggregate" in plan


def test_benford_window_runs_on_agg_output_not_facts(spark, sf_dir, registry):
    """The digit-share window must sit ABOVE the 9-group aggregate
    (constant-size input at any scale), never below it on the fact
    table, and the digit aggregate must be map-side combinable
    (partial HashAggregate under the exchange)."""
    df = registry["benford_first_digit"].fn(spark, sf_dir)
    plan = _final_plan(df)
    assert "Join" not in plan, plan[:2000]
    # Window appears after (above) the aggregate in the formatted tree:
    # the aggregate's scan feeds it, so the agg node id is deeper.
    assert "Window" in plan and "HashAggregate" in plan
    win_pos = plan.index("Window")
    assert "HashAggregate" in plan[win_pos:], (
        "digit aggregate should be below the share window\n" + plan[:2000]
    )


def test_chi2_no_cross_join_windows_on_cell_table(spark, sf_dir, registry):
    """The telescoped sparse-contingency form must not densify: no
    cross/nested-loop join anywhere; windows run on the |p|x|s| cell
    aggregate only."""
    df = registry["chi2_priority_status"].fn(spark, sf_dir)
    plan = _final_plan(df)
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan, (
        plan[:2000]
    )
    assert "Join" not in plan, plan[:2000]


def test_streak_join_free_user_partitioned_window(spark, sf_dir, registry):
    """Gaps-and-islands must stay join-free and the anchor window must
    be partitioned by user_id (high cardinality) — a global window
    here would serialize the whole corpus through one task."""
    df = registry["longest_daily_streak"].fn(spark, sf_dir)
    plan = _final_plan(df)
    assert "Join" not in plan, plan[:2000]
    assert "Window" in plan
    win_seg = plan[plan.index("Window"):]
    head = win_seg[:600]
    assert "user_id" in head, head


def test_rrf_shortlists_take_ordered_no_global_corpus_window(
    spark, sf_dir, registry
):
    """RRF must run over per-signal TakeOrdered shortlists: the plan
    carries TakeOrderedAndProject (per-partition top-M, merge — never
    a global sort of the corpus) feeding M-row rank windows, and the
    shortlist full-outer join must not be a nested loop."""
    df = registry["rrf_fused_selection"].fn(spark, sf_dir)
    plan = _final_plan(df)
    assert "TakeOrderedAndProject" in plan, plan[:2000]
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan, (
        plan[:2000]
    )


def test_ks_drift_windows_on_bin_grid_only(spark, sf_dir, registry):
    """The KS statistic must bin first: the only join is the scalar
    (lo, hi) bounds broadcast, and the cumulative-share windows run on
    the <=200-row bin table — never a global sort of raw values."""
    df = registry["ks_drift_event_types"].fn(spark, sf_dir)
    plan = _final_plan(df)
    assert "SortMergeJoin" not in plan, plan[:2000]
    assert "Window" in plan and "HashAggregate" in plan
    # the fact-table aggregate (g, bin) must sit below the windows
    win_pos = plan.index("Window")
    assert "HashAggregate" in plan[win_pos:], plan[:2000]


def test_equi_depth_histogram_no_global_window(spark, sf_dir, registry):
    """Equi-depth bins must come from a percentile AGGREGATE plus a
    1-row edge broadcast — never an ntile() global-sort window over the
    fact table, which would single-partition the corpus at scale."""
    df = registry["histogram_equi_depth"].fn(spark, sf_dir)
    plan = _final_plan(df)
    assert "Window" not in plan, plan[:2000]
    assert "BroadcastNestedLoopJoin" in plan or "Broadcast" in plan, (
        plan[:2000]
    )


def test_snapshot_diff_prunes_both_sides(spark, sf_dir, registry):
    """Each snapshot side must push its ts range into the scan (at an
    engine-layout 100 TB table this is dt partition pruning) and join
    co-partitioned on the key — no nested loop, no cartesian."""
    df = registry["snapshot_diff_users"].fn(spark, sf_dir)
    pushed = plans.pushed_filters(df)
    assert any("ts" in p for p in pushed), pushed
    plan = _final_plan(df)
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan, (
        plan[:2000]
    )


def test_market_basket_no_cartesian_topk_take_ordered(spark, sf_dir, registry):
    """The basket pair generator must self-join ON the order key (no
    cartesian) and the top-100-by-lift must compile to
    TakeOrderedAndProject, never a global sort of the pair table. The
    single BroadcastNestedLoopJoin is the intended 1-row order-count
    scalar broadcast — any second one would be a real data nested
    loop."""
    df = registry["market_basket_lift"].fn(spark, sf_dir)
    plan = _final_plan(df)
    assert "CartesianProduct" not in plan, plan[:2000]
    assert plan.count("BroadcastNestedLoopJoin") <= 1, plan[:2000]
    assert "TakeOrderedAndProject" in plan, plan[:2000]


def test_itemset3_no_self_join_single_orderkey_shuffle(
    spark, sf_dir, registry
):
    """Triples must come from per-order arrays (nested transform), NOT
    a 3-way self-join: no sort-merge join anywhere, only the broadcast
    part-dim join, and the top-10 is TakeOrderedAndProject."""
    df = registry["brand_itemset3_support"].fn(spark, sf_dir)
    kinds = plans.join_kinds(df)
    assert kinds["sort_merge"] == 0, kinds
    assert kinds["broadcast_hash"] == 1, kinds
    plan = _final_plan(df)
    assert "CartesianProduct" not in plan, plan[:2000]
    assert "TakeOrderedAndProject" in plan, plan[:2000]


def test_sliding_window_expand_no_join(spark, sf_dir, registry):
    """The 4x hopping-window fan-out must be the Expand operator (a
    per-row flat map, no join/explosion through a spine join), and the
    only shuffles are the window aggregate + distinct-users partials."""
    df = registry["sliding_window_counts"].fn(spark, sf_dir)
    plan = _final_plan(df)
    assert "Expand" in plan, plan[:2000]
    kinds = plans.join_kinds(df)
    assert sum(kinds.values()) == 0, kinds
    # distinct-users partial + window agg + output range sort
    assert plan.count("Exchange ") <= 4, plan[:3000]


def test_mann_whitney_joins_only_scalar_broadcast(spark, sf_dir, registry):
    """Rank stats reduce to two 1-row relations; the only 'join' is the
    1-row tie-sum broadcast (BroadcastNestedLoopJoin of scalars). No
    cartesian over data, no sort-merge join."""
    df = registry["mann_whitney_u"].fn(spark, sf_dir)
    plan = _final_plan(df)
    assert "CartesianProduct" not in plan, plan[:2000]
    assert plan.count("BroadcastNestedLoopJoin") <= 1, plan[:2000]
    kinds = plans.join_kinds(df)
    assert kinds["sort_merge"] == 0, kinds


def test_anova_single_fact_aggregate_no_join(spark, sf_dir, registry):
    """One map-side-combinable grouped aggregate over facts, pivoted to
    one row — zero joins of any kind in the plan."""
    df = registry["anova_oneway_priority"].fn(spark, sf_dir)
    kinds = plans.join_kinds(df)
    assert sum(kinds.values()) == 0, kinds
    plan = _final_plan(df)
    assert "Join" not in plan, plan[:2000]


def test_spearman_joins_are_bounded_broadcasts(spark, sf_dir, registry):
    """Since the distributed-midrank rewrite (operators/ranks.py) the
    two rank passes join midranks back over the per-value COUNT TABLE
    (aggregate-sized, broadcast) and fold the moments via 1-row
    broadcasts — so the plan's only joins are broadcast-shaped and
    bounded: no sort-merge (no fact-sized join side), no cartesian
    over data. The single-partition-sort hazard itself is gated by
    test_rank_stats_have_no_unpartitioned_window."""
    df = registry["spearman_rank_corr"].fn(spark, sf_dir)
    kinds = plans.join_kinds(df)
    assert kinds["sort_merge"] == 0, kinds
    assert kinds["shuffled_hash"] == 0, kinds
    assert kinds["broadcast_hash"] + kinds["broadcast_nested_loop"] <= 5, kinds
    plan = _final_plan(df)
    assert "CartesianProduct" not in plan, plan[:2000]


def test_cusum_windows_on_day_spine_only(spark, sf_dir, registry):
    """The cumulative window must run on the day aggregate (spine-sized),
    the mean is one scalar broadcast (<=1 BNLJ), and the argmax is
    TakeOrderedAndProject — facts are touched exactly once."""
    df = registry["cusum_changepoint"].fn(spark, sf_dir)
    plan = _final_plan(df)
    assert plan.count("BroadcastNestedLoopJoin") <= 1, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]
    assert "TakeOrderedAndProject" in plan, plan[:2000]
    # the window runs after the day aggregate: Window appears above a
    # HashAggregate on the day key in the plan tree, never over raw ts
    assert "Window" in plan, plan[:2000]


def test_neyman_single_aggregate_scalar_broadcast(spark, sf_dir, registry):
    """One stratum aggregate + a 1-row total broadcast; no data join."""
    df = registry["neyman_allocation_quotas"].fn(spark, sf_dir)
    plan = _final_plan(df)
    assert plan.count("BroadcastNestedLoopJoin") <= 1, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]
    kinds = plans.join_kinds(df)
    assert kinds["sort_merge"] == 0, kinds


def test_sql_udf_inlines_to_codegen_no_python_boundary(
    spark, sf_dir, registry
):
    """Spark 4 SQL scalar UDFs must inline into Catalyst: the plan is a
    codegen aggregate over a plain Project — no BatchEvalPython /
    ArrowEvalPython stage, which is exactly why this UDF surface is the
    one to use at 100 TB."""
    df = registry["sql_udf_price_bands"].fn(spark, sf_dir)
    plan = plans.simple_plan(df)
    assert "Python" not in plan, plan[:2000]
    assert plans.uses_whole_stage_codegen(df)


def test_lateral_decorrelates_to_window_group_limit(
    spark, sf_dir, registry
):
    """The correlated LATERAL (per-nation ORDER BY/LIMIT subquery) must
    decorrelate into the window top-n shape — WindowGroupLimit (partial
    per-key top-k before the shuffle) + a broadcast dim join — never a
    per-outer-row re-scan (nested loop) of customer."""
    df = registry["lateral_topn_per_nation"].fn(spark, sf_dir)
    plan = plans.simple_plan(df)
    assert "WindowGroupLimit" in plan, plan[:2000]
    kinds = plans.join_kinds(df)
    assert kinds["broadcast_hash"] >= 1, kinds
    assert "CartesianProduct" not in plan, plan[:2000]
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]


def test_pipe_syntax_compiles_to_standard_plan(spark, sf_dir, registry):
    """|> pipe SQL is parser-level only: the ship-date filter must still
    reach the parquet scan as a pushed filter and the aggregate must be
    the usual codegen partial+final pair."""
    df = registry["pipe_syntax_pricing"].fn(spark, sf_dir)
    pushed = plans.pushed_filters(df)
    assert any("l_shipdate" in p for p in pushed), pushed
    assert plans.uses_whole_stage_codegen(df)
    assert plans.num_shuffles(df) <= 2, plans.simple_plan(df)


def test_token_budget_mix_integer_only_membership(spark, sf_dir, registry):
    """The greedy quota fill must be a source-partitioned window over
    integer token counts — one window, no cartesian, quota table
    broadcast."""
    df = registry["token_budget_mix"].fn(spark, sf_dir)
    plan = plans.simple_plan(df)
    assert "Window" in plan, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]
    kinds = plans.join_kinds(df)
    assert kinds["sort_merge"] == 0, kinds


@pytest.mark.parametrize(
    "name", ["mann_whitney_u", "spearman_rank_corr", "kruskal_wallis_test"]
)
def test_rank_stats_have_no_unpartitioned_window(
    spark, sf_dir, registry, name
):
    """Round-10 verdict task 1: the rank statistics must never rank via
    a global-order window (single task over the whole input). The
    distributed path (operators/ranks.py) buckets the per-value count
    table by literal range bounds and prefix-sums per bucket, so every
    Window in these plans has a non-empty partition spec — and the
    cross-bucket offsets are a CASE over a 1-row broadcast, not a tiny
    single-task window."""
    df = registry[name].fn(spark, sf_dir)
    plan = plans.simple_plan(df)
    assert "Window" in plan, plan[:2000]  # the bucketed prefix sum
    bad = plans.unpartitioned_windows(df)
    assert not bad, bad


def test_unpartitioned_window_detector_not_vacuous(spark):
    """Negative control for the rank-stat gate: the detector must flag
    a deliberately global-order window and clear a partitioned one."""
    from pyspark.sql import Window

    df = spark.range(10).withColumn("v", F.col("id") % 3)
    bad = df.withColumn("r", F.rank().over(Window.orderBy("v")))
    good = df.withColumn(
        "r", F.sum("id").over(Window.partitionBy("v").orderBy("id")))
    assert plans.unpartitioned_windows(bad)
    assert not plans.unpartitioned_windows(good)


def test_attribution_range_join_keeps_user_equi_key(
    spark, sf_dir, registry
):
    """The 7-day touch lookback must join on the user equi-key with the
    time bounds as residual conditions — never a cartesian or a pure
    inequality (nested-loop) join; the per-purchase fan-in window runs
    on the joined result, not on raw events."""
    df = registry["linear_attribution_by_type"].fn(spark, sf_dir)
    plan = _final_plan(df)
    assert "CartesianProduct" not in plan, plan[:2000]
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]
    assert "Window" in plan, plan[:2000]


def test_surface_aggs_are_single_pass_no_join(spark, sf_dir, registry):
    """The SQL-surface aggregate showcases (GROUP BY ALL, bitwise,
    boolean/count_if, matryoshka fidelity) must compile to plain
    map-side-combinable aggregates: zero joins of any kind, and for the
    single-level ones at most the one grouping shuffle + output sort."""
    for name in ("group_by_all_shorthand", "bool_count_if_flags",
                 "matryoshka_cosine_fidelity"):
        df = registry[name].fn(spark, sf_dir)
        kinds = plans.join_kinds(df)
        assert sum(kinds.values()) == 0, (name, kinds)
        assert plans.num_shuffles(df) <= 2, (name, plans.simple_plan(df))
    # bitmap_presence_agg stacks two aggregates (per-user then per-type)
    df = registry["bitmap_presence_agg"].fn(spark, sf_dir)
    assert sum(plans.join_kinds(df).values()) == 0
    assert plans.num_shuffles(df) <= 3, plans.simple_plan(df)


def test_mode_window_runs_on_bucket_aggregate(spark, sf_dir, registry):
    """Deterministic mode: the row_number window must be partitioned
    (by event_type) and consume the (type x bucket) aggregate, never
    the fact table — no unpartitioned window anywhere."""
    df = registry["mode_deterministic"].fn(spark, sf_dir)
    assert not plans.unpartitioned_windows(df)
    assert sum(plans.join_kinds(df).values()) == 0


def test_kendall_pairs_join_bounded_to_month_spine(spark, sf_dir, registry):
    """Kendall tau-b: the quadratic pair join must be a broadcast over
    the ~80-row month aggregate (inequality join -> BNLJ of the bounded
    spine) — never a sort-merge or shuffled-hash join of fact-sized
    inputs."""
    df = registry["kendall_tau_monthly"].fn(spark, sf_dir)
    kinds = plans.join_kinds(df)
    assert kinds["sort_merge"] == 0, kinds
    assert kinds["shuffled_hash"] == 0, kinds


def test_psi_zero_joins_partitioned_window(spark, sf_dir, registry):
    """PSI drift: one conditional-count fact aggregate, totals via a
    window PARTITIONED by event_type on the bucket aggregate, final
    tiny aggregate — zero joins, no unpartitioned window."""
    df = registry["psi_value_drift"].fn(spark, sf_dir)
    assert sum(plans.join_kinds(df).values()) == 0
    assert not plans.unpartitioned_windows(df)


def test_kaplan_meier_windows_on_day_table_only(spark, sf_dir, registry):
    """KM survival: the at-risk / log-survival windows are unpartitioned
    by construction (a cumulative product over the <=31-row day table —
    the cusum day-spine shape), so the gate is that they consume the
    DAY AGGREGATE, not facts: the plan's only join is the 1-row
    n_total broadcast and facts shuffle exactly once into the user
    aggregate."""
    df = registry["kaplan_meier_user_retention"].fn(spark, sf_dir)
    kinds = plans.join_kinds(df)
    assert kinds["sort_merge"] == 0, kinds
    assert kinds["shuffled_hash"] == 0, kinds
    plan = plans.simple_plan(df)
    # user agg + day agg (+ AQE coalesces); windows add sorts not
    # fact shuffles
    assert plan.count("HashAggregate") >= 2, plan[:2000]


def test_cuped_single_fact_pass(spark, sf_dir, registry):
    """CUPED: facts collapse to the per-user covariate table in ONE
    grouped aggregate; the moment pass is aggregate-over-aggregate —
    zero joins, no windows at all."""
    df = registry["cuped_adjusted_uplift"].fn(spark, sf_dir)
    assert sum(plans.join_kinds(df).values()) == 0
    assert "Window" not in plans.simple_plan(df)


def test_tukey_hsd_joins_bounded_broadcasts(spark, sf_dir, registry):
    """Tukey-Kramer HSD: the pair join is a broadcast of the 5-row
    group table and MSW a 1-row broadcast — no sort-merge or
    shuffled-hash join anywhere."""
    df = registry["tukey_hsd_pairwise"].fn(spark, sf_dir)
    kinds = plans.join_kinds(df)
    assert kinds["sort_merge"] == 0, kinds
    assert kinds["shuffled_hash"] == 0, kinds


def test_sign_bits_single_probe_broadcast(spark, sf_dir, registry):
    """Binary-embedding audit: strictly linear — the only join is the
    1-row probe broadcast; no pairwise join of the corpus with itself."""
    df = registry["embedding_sign_bits_hamming"].fn(spark, sf_dir)
    kinds = plans.join_kinds(df)
    assert kinds["sort_merge"] == 0, kinds
    assert kinds["shuffled_hash"] == 0, kinds
    assert not plans.unpartitioned_windows(df)


def test_bm25_prunes_tokens_before_shuffle(spark, sf_dir, registry):
    """BM25: the query-term IN filter must sit below the tf aggregate
    (tokens pruned to 3 terms before any shuffle), and no cartesian
    anywhere; dl/df/stats sides are doc- or term-bounded."""
    df = registry["bm25_term_scores"].fn(spark, sf_dir)
    plan = plans.simple_plan(df)
    assert "CartesianProduct" not in plan, plan[:2000]
    assert plans.has_take_ordered(df) or "TakeOrdered" in plan, plan[:1500]


def test_moment_sums_zero_join_single_shuffle(spark, sf_dir, registry):
    """Skew/kurtosis power sums: one grouped aggregate, zero joins,
    moment algebra on the 5-row result."""
    df = registry["moment_skew_kurtosis"].fn(spark, sf_dir)
    assert sum(plans.join_kinds(df).values()) == 0
    assert plans.num_shuffles(df) <= 2, plans.simple_plan(df)


def test_star_except_scan_is_pruned(spark, sf_dir, registry):
    """SELECT * EXCEPT must resolve to a pruned projection: the scan
    reads neither excluded column."""
    df = registry["star_except_projection"].fn(spark, sf_dir)
    cols = plans.scan_columns(df)
    assert "props" not in cols and "value" not in cols, cols
    assert "event_id" in cols


def test_try_arithmetic_values_dim_broadcasts(spark, sf_dir, registry):
    """The inline VALUES dimension must broadcast — no shuffle join for
    a 5-row literal table."""
    df = registry["try_arithmetic_safety"].fn(spark, sf_dir)
    kinds = plans.join_kinds(df)
    assert kinds["sort_merge"] == 0, kinds
    assert kinds["shuffled_hash"] == 0, kinds
    assert kinds["broadcast_hash"] >= 1, kinds


def test_seasonal_decompose_windows_on_day_spine(spark, sf_dir, registry):
    """The decomposition's windows must consume the ~30-row day
    aggregate (facts shuffle once into it); the seasonal table is a
    7-row broadcast join."""
    df = registry["seasonal_decompose_additive"].fn(spark, sf_dir)
    kinds = plans.join_kinds(df)
    assert kinds["sort_merge"] == 0, kinds
    assert kinds["shuffled_hash"] == 0, kinds
    plan = plans.simple_plan(df)
    assert "Window" in plan


def test_text_augmentation_is_map_only(spark, sf_dir, registry):
    """Augmentation must be a pure map pass: no joins, no windows; the
    only shuffles are the source rollup + output sort."""
    df = registry["text_augment_char_noise"].fn(spark, sf_dir)
    assert sum(plans.join_kinds(df).values()) == 0
    assert "Window" not in plans.simple_plan(df)
    assert plans.num_shuffles(df) <= 2, plans.simple_plan(df)
    cols = plans.scan_columns(df)
    assert cols <= {"doc_id", "source", "text"}, cols


def test_fertility_and_card_single_aggregate(spark, sf_dir, registry):
    """Tokenizer fertility and dataset card: one aggregate pass over
    the narrow documents scan, zero joins, no windows."""
    for name in ("tokenizer_fertility_audit", "dataset_card_summary"):
        df = registry[name].fn(spark, sf_dir)
        assert sum(plans.join_kinds(df).values()) == 0, name
        assert "Window" not in plans.simple_plan(df), name
        cols = plans.scan_columns(df)
        assert "embedding" not in cols, (name, cols)


def test_unpivot_is_expand_no_join(spark, sf_dir, registry):
    """Native UNPIVOT must compile to the same Expand the stack() form
    uses — a projection, not a join."""
    df = registry["unpivot_order_by_all"].fn(spark, sf_dir)
    plan = plans.simple_plan(df)
    assert "Expand" in plan, plan[:2000]
    assert sum(plans.join_kinds(df).values()) == 0


def test_named_window_shares_one_operator(spark, sf_dir, registry):
    """The shared WINDOW-clause spec must produce exactly ONE physical
    Window operator for both functions (the dedup claim), partitioned
    (never single-task)."""
    df = registry["named_window_reuse"].fn(spark, sf_dir)
    plan = plans.simple_plan(df)
    assert plan.count("Window [") == 1, plan[:2500]
    assert not plans.unpartitioned_windows(df)


def test_bag_set_ops_are_joinless_count_compare(spark, sf_dir, registry):
    """INTERSECT ALL / EXCEPT ALL must compile to Spark's count-compare
    aggregate + replicate-rows Generate — never a join of the two
    fact-sized inputs (the pre-2.4 rewrite)."""
    df = registry["set_bag_intersect_except"].fn(spark, sf_dir)
    assert sum(plans.join_kinds(df).values()) == 0, plans.join_kinds(df)
    assert "Generate" in plans.simple_plan(df)


def test_array_set_ops_join_pre_aggregated(spark, sf_dir, registry):
    """The half-month set tables must each aggregate BEFORE the user_id
    join (facts never join facts), and nothing degenerates to a nested
    loop."""
    df = registry["array_set_ops_user_types"].fn(spark, sf_dir)
    kinds = plans.join_kinds(df)
    assert kinds["broadcast_nested_loop"] == 0, kinds
    plan = plans.simple_plan(df)
    # collect_set aggregates (partial+final per side) precede the join
    assert plan.count("Aggregate") >= 2, plan[:2000]


def test_ignore_nulls_window_is_partitioned(spark, sf_dir, registry):
    """IGNORE NULLS navigation must ride a user-partitioned window —
    no global-order single-task sort."""
    df = registry["lag_lead_ignore_nulls"].fn(spark, sf_dir)
    assert not plans.unpartitioned_windows(df)
    assert sum(plans.join_kinds(df).values()) == 0


def test_tz_conversion_single_aggregate(spark, sf_dir, registry):
    """Time-zone conversion is pure expression work: one map-side-
    combinable aggregate on the 24-row hour key, zero joins, codegen
    end to end."""
    df = registry["tz_conversion_ny_hours"].fn(spark, sf_dir)
    assert sum(plans.join_kinds(df).values()) == 0
    assert plans.num_shuffles(df) <= 2, plans.simple_plan(df)
    assert plans.uses_whole_stage_codegen(df)


def test_map_hof_shares_joinless_two_shuffles(spark, sf_dir, registry):
    """The map-HOF pipeline is groupBy(user,type) -> groupBy(user) ->
    explode: zero joins (the oracle's join is recomputation, not the
    plan), map_filter/transform_values stay in the projection, and the
    explode is a Generate."""
    df = registry["map_hof_event_shares"].fn(spark, sf_dir)
    assert sum(plans.join_kinds(df).values()) == 0
    plan = plans.simple_plan(df)
    assert "Generate" in plan
    assert plans.num_shuffles(df) <= 3, plan[:2000]


def test_mann_kendall_pairs_join_bounded_to_month_spine(
    spark, sf_dir, registry
):
    """Mann-Kendall's quadratic sign-pair join must be a broadcast
    nested loop over the ~80-row month AGGREGATE (kendall_tau /
    theil_sen shape) — never sort-merge/shuffled-hash of fact-sized
    inputs, and no windows anywhere."""
    df = registry["mann_kendall_trend"].fn(spark, sf_dir)
    kinds = plans.join_kinds(df)
    assert kinds["sort_merge"] == 0, kinds
    assert kinds["shuffled_hash"] == 0, kinds
    assert "Window" not in plans.simple_plan(df)


def test_durbin_watson_windows_on_day_table(spark, sf_dir, registry):
    """DW: facts shuffle once into the day aggregate; the lag window's
    global order consumes that calendar-bounded table, and the fit
    scalars ride 1-row broadcasts — no sort-merge/shuffled-hash join."""
    df = registry["durbin_watson_daily"].fn(spark, sf_dir)
    kinds = plans.join_kinds(df)
    assert kinds["sort_merge"] == 0, kinds
    assert kinds["shuffled_hash"] == 0, kinds
    plan = plans.simple_plan(df)
    assert plan.count("HashAggregate") >= 2, plan[:2000]


def test_cohens_d_single_pass_no_window(spark, sf_dir, registry):
    """Effect size is ONE conditional aggregate over the facts — zero
    joins, zero windows (the moment_skew_kurtosis shape)."""
    df = registry["cohens_d_effect_size"].fn(spark, sf_dir)
    assert sum(plans.join_kinds(df).values()) == 0
    assert "Window" not in plans.simple_plan(df)


def test_interarrival_gaps_user_partitioned_window(spark, sf_dir, registry):
    """Inter-arrival gaps: the lag window must be PARTITIONed BY
    user_id (never global) and the whole entry is join-free; the
    per-type percentile sort is the documented exact path."""
    df = registry["interarrival_gap_stats"].fn(spark, sf_dir)
    assert not plans.unpartitioned_windows(df)
    assert sum(plans.join_kinds(df).values()) == 0


def test_posexplode_is_map_side_generate(spark, sf_dir, registry):
    """Positional explode must be a Generate straight off the pruned
    scan — zero joins; the only exchange is the presentation sort."""
    df = registry["posexplode_word_positions"].fn(spark, sf_dir)
    plan = plans.simple_plan(df)
    assert "Generate" in plan
    assert sum(plans.join_kinds(df).values()) == 0
    assert plans.num_shuffles(df) <= 1, plan[:2000]


def test_grouping_id_rollup_is_expand_aggregate(spark, sf_dir, registry):
    """GROUPING() labeling rides the same Expand aggregate as plain
    ROLLUP — no extra pass, no joins."""
    df = registry["grouping_id_labels"].fn(spark, sf_dir)
    plan = plans.simple_plan(df)
    assert "Expand" in plan
    assert sum(plans.join_kinds(df).values()) == 0


@pytest.mark.parametrize(
    "name", ["runs_test_daily_revenue", "acf_multi_lag_daily"]
)
def test_day_spine_stats_aggregate_before_window(
    spark, sf_dir, registry, name
):
    """Runs test / ACF: facts must shuffle ONCE into the day aggregate
    before any window or scalar broadcast — never a sort-merge or
    shuffled-hash join of fact-sized inputs."""
    df = registry[name].fn(spark, sf_dir)
    kinds = plans.join_kinds(df)
    assert kinds["sort_merge"] == 0, kinds
    assert kinds["shuffled_hash"] == 0, kinds
    assert plans.simple_plan(df).count("HashAggregate") >= 2


def test_cramers_v_joins_bounded_cell_table(spark, sf_dir, registry):
    """Cramer's V: marginal joins run over the 21-cell contingency
    aggregate (broadcast under AQE) — no fact-sized join."""
    df = registry["cramers_v_dow_status"].fn(spark, sf_dir)
    kinds = plans.join_kinds(df)
    assert kinds["sort_merge"] == 0, kinds
    assert kinds["shuffled_hash"] == 0, kinds


def test_jensen_shannon_single_fact_pass(spark, sf_dir, registry):
    """JS divergence: ONE conditional fact aggregate; everything after
    runs on the 5-row type table with 1-row broadcasts — no windows,
    no fact joins."""
    df = registry["jensen_shannon_halves"].fn(spark, sf_dir)
    kinds = plans.join_kinds(df)
    assert kinds["sort_merge"] == 0, kinds
    assert kinds["shuffled_hash"] == 0, kinds
    assert "Window" not in plans.simple_plan(df)


def test_roc_auc_runs_on_midrank_backbone(spark, sf_dir, registry):
    """ROC-AUC: the rank identity must ride the distributed midrank
    backbone — no empty-partition-spec window anywhere (the oracle's
    global rank window is the oracle's business, not the plan's)."""
    df = registry["roc_auc_rank_eval"].fn(spark, sf_dir)
    assert not plans.unpartitioned_windows(df)
    kinds = plans.join_kinds(df)
    assert kinds["sort_merge"] == 0, kinds


def test_calibration_bins_joinless_windowless(spark, sf_dir, registry):
    """Calibration table: ONE conditional aggregate — no joins, no
    windows, map-side-combinable at any scale."""
    df = registry["calibration_brier_bins"].fn(spark, sf_dir)
    p = plans.simple_plan(df)
    assert "Window" not in p
    kinds = plans.join_kinds(df)
    assert sum(kinds.values()) == 0, kinds


def test_wasserstein_windows_on_bin_table(spark, sf_dir, registry):
    """W1 drift: the ECDF prefix window consumes the <=200-row bin
    aggregate, never fact rows — same gate shape as ks_drift. The
    bounded global window is accepted; fact-sized joins are not."""
    df = registry["wasserstein_value_drift"].fn(spark, sf_dir)
    kinds = plans.join_kinds(df)
    assert kinds["sort_merge"] == 0, kinds
    assert kinds["shuffled_hash"] == 0, kinds


def test_eval_trio_windows_are_bounded_or_partitioned(
    spark, sf_dir, registry
):
    """P/R@k + MRR: popularity windows run on the 5-row type table,
    target windows PARTITION BY user; no fact-sized sort-merge join."""
    for name in ("precision_recall_at_k", "mrr_popularity_rank"):
        df = registry[name].fn(spark, sf_dir)
        kinds = plans.join_kinds(df)
        assert kinds["sort_merge"] == 0, (name, kinds)


def test_ndcg_rankings_are_take_ordered(spark, sf_dir, registry):
    """NDCG@10: both ranking branches must cut with ORDER BY + LIMIT
    (TakeOrderedAndProject / per-partition top-k), so the rank windows
    only ever see the 10 survivors."""
    df = registry["ndcg_at_10_docs"].fn(spark, sf_dir)
    p = plans.formatted_plan(df)
    assert "TakeOrderedAndProject" in p, p[:2000]


def test_hhi_share_window_partitioned_over_cust_agg(
    spark, sf_dir, registry
):
    """HHI: the share window PARTITIONs BY nation and consumes the
    (nation, customer) aggregate, not raw orders."""
    df = registry["hhi_revenue_concentration"].fn(spark, sf_dir)
    assert not plans.unpartitioned_windows(df)


def test_markov_entropy_user_partitioned_lead(spark, sf_dir, registry):
    """Transition entropy: the lead window PARTITIONs BY user_id; all
    joins run on state-cardinality tables (broadcast under AQE)."""
    df = registry["markov_transition_entropy"].fn(spark, sf_dir)
    assert not plans.unpartitioned_windows(df)
    kinds = plans.join_kinds(df)
    assert kinds["sort_merge"] == 0, kinds


def test_mad_median_table_broadcasts(spark, sf_dir, registry):
    """MAD: the 5-row per-priority median table must broadcast back
    into the deviation pass — never a fact x fact sort-merge."""
    df = registry["mad_robust_scale"].fn(spark, sf_dir)
    kinds = plans.join_kinds(df)
    assert kinds["broadcast_hash"] >= 1, kinds
    assert kinds["sort_merge"] == 0, kinds


def test_hybrid_rrf_shortlists_take_ordered(spark, sf_dir, registry):
    """Hybrid RRF: both retrieval branches cut with TakeOrdered (never
    a global sort of docs/vectors); the fusion join and rank windows
    run on 20-row shortlists, so no fact-sized sort-merge join."""
    df = registry["hybrid_retrieval_rrf"].fn(spark, sf_dir)
    p = plans.formatted_plan(df)
    assert "TakeOrderedAndProject" in p
    kinds = plans.join_kinds(df)
    # exactly ONE sort-merge is allowed: the 20x20-row full-outer
    # fusion join (Spark cannot broadcast ANY full outer join); both
    # inputs are post-LIMIT shortlists, so the sort is 20 rows
    assert kinds["sort_merge"] <= 1, kinds
    assert kinds["shuffled_hash"] == 0, kinds


def test_agreement_and_gtest_bounded_shapes(spark, sf_dir, registry):
    """classifier_agreement_metrics: one joinless conditional
    aggregate. g_test: joins only the 15-cell contingency table."""
    df = registry["classifier_agreement_metrics"].fn(spark, sf_dir)
    kinds = plans.join_kinds(df)
    assert sum(kinds.values()) == 0, kinds
    assert "Window" not in plans.simple_plan(df)
    df = registry["g_test_independence"].fn(spark, sf_dir)
    kinds = plans.join_kinds(df)
    assert kinds["sort_merge"] == 0, kinds
    assert kinds["shuffled_hash"] == 0, kinds


def test_gauntlets_single_aggregate_no_join(spark, sf_dir, registry):
    """The three surface gauntlets + poisson dispersion are one
    aggregate pass each — no joins, no windows."""
    for name in ("string_funcs_gauntlet2", "date_funcs_gauntlet",
                 "iso_week_revenue", "poisson_dispersion_daily"):
        df = registry[name].fn(spark, sf_dir)
        kinds = plans.join_kinds(df)
        assert sum(kinds.values()) == 0, (name, kinds)
        assert "Window" not in plans.simple_plan(df), name


def test_did_and_elasticity_single_pass(spark, sf_dir, registry):
    """DiD: one grouped aggregate over the broadcast-dim join, 4-row
    pivot after. Elasticity: joinless grouped regression moments."""
    df = registry["diff_in_diff_revenue"].fn(spark, sf_dir)
    kinds = plans.join_kinds(df)
    assert kinds["sort_merge"] == 0, kinds
    df = registry["price_elasticity_slope"].fn(spark, sf_dir)
    kinds = plans.join_kinds(df)
    assert sum(kinds.values()) == 0, kinds
    assert "Window" not in plans.simple_plan(df)


def test_growth_and_hazard_bounded_windows(spark, sf_dir, registry):
    """new_vs_returning joins only the user-cardinality first-seen
    table; nelson_aalen windows run on the <=31-row distinct-t table
    (bounded global window, KM/day-spine precedent)."""
    df = registry["new_vs_returning_users"].fn(spark, sf_dir)
    assert not plans.unpartitioned_windows(df)
    df = registry["nelson_aalen_hazard"].fn(spark, sf_dir)
    kinds = plans.join_kinds(df)
    assert sum(kinds.values()) == 0, kinds


def test_bh_fdr_single_fact_pass_bounded_windows(spark, sf_dir, registry):
    """BH FDR: one conditional fact aggregate; ranking + step-up run
    on the m-row (=5) test table — no fact joins."""
    df = registry["benjamini_hochberg_fdr"].fn(spark, sf_dir)
    kinds = plans.join_kinds(df)
    assert kinds["sort_merge"] == 0, kinds
    assert kinds["shuffled_hash"] == 0, kinds


def test_mde_card_no_fact_join(spark, sf_dir, registry):
    """MDE card: two count-distinct aggregates + 1-row broadcast."""
    df = registry["mde_power_card"].fn(spark, sf_dir)
    kinds = plans.join_kinds(df)
    assert kinds["sort_merge"] == 0, kinds
    assert "Window" not in plans.simple_plan(df)


def test_peak_concurrency_sweep_is_partitioned(spark, sf_dir, registry):
    """Concurrency sweep: every window PARTITIONs (user for
    sessionization, day for the sweep) — no single-task global sort."""
    df = registry["peak_concurrent_sessions"].fn(spark, sf_dir)
    assert not plans.unpartitioned_windows(df)
    kinds = plans.join_kinds(df)
    assert sum(kinds.values()) == 0, kinds


def test_rfm_thresholds_broadcast_no_global_window(
    spark, sf_dir, registry
):
    """RFM: median thresholds ride a 1-row broadcast over the customer
    aggregate — no global ntile window over customers."""
    df = registry["rfm_segments"].fn(spark, sf_dir)
    assert not plans.unpartitioned_windows(df)
    kinds = plans.join_kinds(df)
    assert kinds["sort_merge"] == 0, kinds


def test_var_cvar_threshold_broadcasts(spark, sf_dir, registry):
    """VaR/CVaR: the 5-row per-type threshold table broadcasts back —
    never a fact x fact sort-merge (mad_robust_scale shape)."""
    df = registry["var_cvar_tail_risk"].fn(spark, sf_dir)
    kinds = plans.join_kinds(df)
    assert kinds["broadcast_hash"] >= 1, kinds
    assert kinds["sort_merge"] == 0, kinds


def test_augmentation_and_norm_audit_map_only(spark, sf_dir, registry):
    """span_corruption_t5 and embedding_norm_audit: pure higher-order
    array expressions + one rollup — no joins, no windows."""
    for name in ("span_corruption_t5", "embedding_norm_audit"):
        df = registry[name].fn(spark, sf_dir)
        kinds = plans.join_kinds(df)
        assert sum(kinds.values()) == 0, (name, kinds)
        assert "Window" not in plans.simple_plan(df), name


def test_ts_diagnostics_windows_on_day_table(spark, sf_dir, registry):
    """Ljung-Box + CCF: lag windows consume the calendar-bounded day
    aggregate (durbin_watson shape); DISTINCT ON translation is a
    user-partitioned window — no unpartitioned window over facts."""
    for name in ("ljung_box_daily", "cross_correlation_types"):
        df = registry[name].fn(spark, sf_dir)
        kinds = plans.join_kinds(df)
        assert kinds["sort_merge"] == 0, (name, kinds)
    df = registry["distinct_on_latest_event"].fn(spark, sf_dir)
    assert not plans.unpartitioned_windows(df)


def test_scd2_and_freshness_shapes(spark, sf_dir, registry):
    """SCD2: user-partitioned change/close windows only. Freshness:
    two aggregates + 1-row horizon broadcast, windowless."""
    df = registry["scd2_user_state_intervals"].fn(spark, sf_dir)
    assert not plans.unpartitioned_windows(df)
    df = registry["freshness_sla_audit"].fn(spark, sf_dir)
    assert "Window" not in plans.simple_plan(df)
    kinds = plans.join_kinds(df)
    assert kinds["sort_merge"] == 0, kinds


def test_privacy_and_bleu_bounded_shapes(spark, sf_dir, registry):
    """k-anonymity + DP counts: one aggregate each, no windows. BLEU-2:
    gram-table joins only, no fact-sized sort-merge beyond the
    vocabulary-bounded clip join."""
    for name in ("k_anonymity_audit", "dp_noised_counts"):
        df = registry[name].fn(spark, sf_dir)
        assert "Window" not in plans.simple_plan(df), name
    df = registry["bleu2_corpus_overlap"].fn(spark, sf_dir)
    assert not plans.unpartitioned_windows(df)


def test_vocab_coverage_shortlist_is_take_ordered(spark, sf_dir, registry):
    """Round-11 verdict task 2: the vocabulary rank window must run
    over a TakeOrderedAndProject shortlist (top-10k, the largest k),
    never over the unbounded vocabulary — a web-scale corpus has
    hundreds of millions of distinct words."""
    df = registry["vocab_coverage_curve"].fn(spark, sf_dir)
    assert plans.has_take_ordered(df)


def test_funnel_latency_has_no_unpartitioned_window(
    spark, sf_dir, registry
):
    """Round-11 verdict task 3: the funnel latency order statistics
    ride the midrank backbone — the per-value count table is bucketed
    by literal range bounds and prefix-summed per bucket, so every
    window has a non-empty partition spec (the latency table is
    user-cardinality, unbounded at 100x)."""
    df = registry["funnel_latency_percentiles"].fn(spark, sf_dir)
    plan = plans.simple_plan(df)
    assert "Window" in plan, plan[:2000]  # the bucketed prefix sum
    bad = plans.unpartitioned_windows(df)
    assert not bad, bad


def test_embedding_geometry_audits_are_joinless_aggregates(
    spark, sf_dir, registry
):
    """participation ratio / centroid drift must be map-side posexplode
    + per-dimension aggregate — no window, no sort-merge join (the only
    join is the 1-row stats broadcast cross)."""
    for name in ("embedding_participation_ratio",
                 "embedding_centroid_drift"):
        df = registry[name].fn(spark, sf_dir)
        plan = plans.simple_plan(df)
        assert "Window" not in plan, (name, plan[:2000])
        assert "SortMergeJoin" not in plan, (name, plan[:2000])
        assert "CartesianProduct" not in plan, (name, plan[:2000])


def test_triangle_closure_joins_are_broadcast(spark, sf_dir, registry):
    """The triangle two-hop closure runs over the vocabulary-bounded
    edge table via broadcast hash joins — never a shuffle join of the
    edge table against itself, and no cartesian anywhere."""
    df = registry["triangle_count_brand_graph"].fn(spark, sf_dir)
    plan = plans.simple_plan(df)
    assert "CartesianProduct" not in plan, plan[:2000]
    assert "BroadcastHashJoin" in plan, plan[:2000]


def test_decile_lift_has_no_unpartitioned_window(spark, sf_dir, registry):
    """Deciles come from the midrank backbone's cumulative brackets —
    no global ntile/row_number window over the user-cardinality score
    table."""
    df = registry["decile_lift_user_spend"].fn(spark, sf_dir)
    plan = plans.simple_plan(df)
    assert "Window" in plan, plan[:2000]  # the bucketed prefix sum
    assert not plans.unpartitioned_windows(df), plans.unpartitioned_windows(df)


def test_time_weighted_value_window_is_user_partitioned(
    spark, sf_dir, registry
):
    """The hold-until-next-event weights come from a USER-partitioned
    lead — never a global event-sequence window."""
    df = registry["time_weighted_user_value"].fn(spark, sf_dir)
    assert "Window" in plans.simple_plan(df)
    assert not plans.unpartitioned_windows(df)


def test_filter_waterfall_is_one_joinless_aggregate(
    spark, sf_dir, registry
):
    """All four gate counters come from ONE conditional aggregate over
    one scan — no join, no window, no second pass over documents."""
    df = registry["filter_waterfall_card"].fn(spark, sf_dir)
    plan = plans.simple_plan(df)
    for bad in ("SortMergeJoin", "BroadcastHashJoin", "Window",
                "CartesianProduct"):
        assert bad not in plan, (bad, plan[:2000])


def test_pivot_multi_agg_is_single_aggregate_no_distinct_pass(
    spark, sf_dir, registry
):
    """Explicit pivot VALUES keep the plan join-free with no
    distinct-values collect pre-pass: a (priority, status) aggregate,
    the pivotfirst aggregate on priority, and the ORDER BY's range
    exchange — three bounded shuffles, none data-joined."""
    df = registry["pivot_multi_agg_status"].fn(spark, sf_dir)
    plan = plans.simple_plan(df)
    for bad in ("SortMergeJoin", "BroadcastHashJoin", "Window",
                "CartesianProduct"):
        assert bad not in plan, (bad, plan[:2000])
    assert "pivotfirst" in plan, plan[:2000]
    assert plans.num_shuffles(df) <= 3, plans.num_shuffles(df)


def test_oov_vocab_shortlist_is_take_ordered(spark, sf_dir, registry):
    """The OOV vocabulary must be a TakeOrderedAndProject top-1000 over
    train word counts (broadcast-probed by the test side) — never a
    global sort of the vocabulary."""
    df = registry["tokenizer_oov_rate"].fn(spark, sf_dir)
    plan = plans.simple_plan(df)
    assert plans.has_take_ordered(df), plan[:2000]
    assert "Window" not in plan, plan[:2000]
    assert "SortMergeJoin" not in plan, plan[:2000]


def test_chow_test_is_one_conditional_aggregate(spark, sf_dir, registry):
    """All three regression fits come from ONE conditional aggregate of
    raw power sums over the day table — no join, no window, one fact
    pass."""
    df = registry["chow_test_break"].fn(spark, sf_dir)
    plan = plans.simple_plan(df)
    for bad in ("SortMergeJoin", "BroadcastHashJoin", "Window",
                "CartesianProduct"):
        assert bad not in plan, (bad, plan[:2000])


def test_asof_forward_is_user_partitioned_window_union(
    spark, sf_dir, registry
):
    """Forward as-of must be the union + following-window trick on a
    USER-partitioned window — no range self-join, no nested loop, no
    global sequence window."""
    df = registry["asof_join_forward"].fn(spark, sf_dir)
    plan = plans.simple_plan(df)
    assert "Window" in plan, plan[:2000]
    assert not plans.unpartitioned_windows(df)
    for bad in ("SortMergeJoin", "BroadcastNestedLoopJoin",
                "CartesianProduct"):
        assert bad not in plan, (bad, plan[:2000])


def test_split_leakage_is_one_hash_aggregate(spark, sf_dir, registry):
    """Leakage counts come from ONE groupBy on the md5 fingerprint with
    split-conditional sums — no join, text bytes never shuffle (the
    scan projects only doc_id/text into md5)."""
    df = registry["split_leakage_exact"].fn(spark, sf_dir)
    plan = plans.simple_plan(df)
    for bad in ("SortMergeJoin", "BroadcastHashJoin", "Window",
                "CartesianProduct"):
        assert bad not in plan, (bad, plan[:2000])


def test_cohort_ltv_window_is_cohort_partitioned(spark, sf_dir, registry):
    """The LTV cumulative sum must run inside a COHORT-partitioned
    window (bounded by calendar ages per cohort) — never a global
    running sum."""
    df = registry["cohort_ltv_matrix"].fn(spark, sf_dir)
    assert "Window" in plans.simple_plan(df)
    assert not plans.unpartitioned_windows(df)


def test_not_in_compiles_to_null_aware_anti_join(spark, sf_dir, registry):
    """The NOT IN half must compile to Spark's null-aware anti-join
    (the plan artifact the entry documents) alongside the plain left
    anti for NOT EXISTS."""
    df = registry["not_in_null_trap"].fn(spark, sf_dir)
    plan = plans.simple_plan(df)
    assert "LeftAnti" in plan, plan[:3000]


def test_weighted_quartiles_have_no_unpartitioned_window(
    spark, sf_dir, registry
):
    """Weighted order statistics ride the midrank backbone over the
    price-domain weight table — no global cumulative-weight window."""
    df = registry["weighted_quartiles_price"].fn(spark, sf_dir)
    plan = plans.simple_plan(df)
    assert "Window" in plan, plan[:2000]
    assert not plans.unpartitioned_windows(df)


def test_attribution_compare_keeps_equi_key_and_local_windows(
    spark, sf_dir, registry
):
    """The 7-day lookback must stay a user equi-join with time bounds
    as residuals (no nested loop / cartesian), and every fan-in window
    is purchase-partitioned."""
    df = registry["attribution_model_compare"].fn(spark, sf_dir)
    plan = plans.simple_plan(df)
    assert "CartesianProduct" not in plan, plan[:2000]
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]
    assert "Window" in plan, plan[:2000]
    assert not plans.unpartitioned_windows(df)


def test_conversion_sweep_has_no_window_function(spark, sf_dir, registry):
    """The 3-window sweep is a broadcast cross over the per-user
    latency table — two user aggregates, zero window functions."""
    df = registry["conversion_window_sensitivity"].fn(spark, sf_dir)
    plan = plans.simple_plan(df)
    assert "Window" not in plan, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]


def test_keyset_page_filter_reaches_scan(spark, sf_dir, registry):
    """Keyset pagination's whole point: the boundary predicate must be
    a broadcast-joined filter feeding TakeOrderedAndProject — no
    offset-style global sort, no cartesian."""
    df = registry["keyset_pagination_page3"].fn(spark, sf_dir)
    plan = plans.simple_plan(df)
    assert plans.has_take_ordered(df), plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]


def test_exists_under_or_plans_existence_join(spark, sf_dir, registry):
    """EXISTS under OR must compile to Catalyst's ExistenceJoin (mark
    join) — a semi-join here would silently DROP rows that fail the
    subquery but pass the balance disjunct; a per-row subquery would
    be the non-distributed fallback. The order-price predicate must
    still reach the orders scan."""
    df = registry["exists_under_or_customers"].fn(spark, sf_dir)
    plan = plans.formatted_plan(df)
    assert "ExistenceJoin" in plan, plan[:3000]
    assert "CartesianProduct" not in plan
    assert any("o_totalprice" in p for p in plans.pushed_filters(df)), (
        plans.pushed_filters(df)
    )


def test_lateral_offset_decorrelates_to_ranked_filter(
    spark, sf_dir, registry
):
    """LATERAL ... LIMIT 2 OFFSET 1 must decorrelate into one
    nationkey-partitioned ranking over customer (row_number BETWEEN
    2 AND 3 after rewrite) — no per-nation re-scan, no cartesian."""
    df = registry["lateral_offset_runnerups"].fn(spark, sf_dir)
    plan = plans.simple_plan(df)
    assert "Window" in plan, plan[:3000]
    assert not plans.unpartitioned_windows(df)
    assert "CartesianProduct" not in plan, plan[:3000]


def test_downcast_audit_is_single_pass_aggregate(spark, sf_dir, registry):
    """The narrowing audit is one map-side pass to a 1-row aggregate:
    no join, no window, only the final-combine exchange; the scan
    reads just the two audited columns."""
    df = registry["downcast_safety_audit"].fn(spark, sf_dir)
    plan = plans.simple_plan(df)
    assert "Join" not in plan, plan[:2000]
    assert "Window" not in plan, plan[:2000]
    cols = plans.scan_columns(df)
    assert cols <= {"o_custkey", "o_totalprice"}, cols


def test_full_outer_using_no_expansion(spark, sf_dir, registry):
    """USING-key full join: one FullOuter hash join over the two
    pre-filtered sides, key filters pushed to both scans, no
    cartesian/nested-loop fallback."""
    df = registry["join_using_full_outer_coalesce"].fn(spark, sf_dir)
    plan = plans.simple_plan(df)
    assert "FullOuter" in plan, plan[:3000]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    pushed = plans.pushed_filters(df)
    assert any("c_custkey" in p for p in pushed), pushed
    assert any("o_custkey" in p for p in pushed), pushed


def test_try_cast_audit_is_single_pass(spark, sf_dir, registry):
    """The parse audit is one map-side pass to a 6-group aggregate —
    no join, no window; the scan reads only the two source columns."""
    df = registry["try_cast_decimal_parse_audit"].fn(spark, sf_dir)
    plan = plans.simple_plan(df)
    assert "Join" not in plan, plan[:2000]
    assert "Window" not in plan, plan[:2000]
    cols = plans.scan_columns(df)
    assert cols <= {"o_orderkey", "o_totalprice"}, cols


def test_journey_paths_single_user_exchange(spark, sf_dir, registry):
    """The ranking window and the per-user path fold must share ONE
    user_id exchange (Catalyst reuses the window's partitioning for
    the groupBy); the top-10 is TakeOrderedAndProject, and no window
    runs unpartitioned."""
    df = registry["user_journey_paths_topk"].fn(spark, sf_dir)
    plan = plans.simple_plan(df)
    assert plans.has_take_ordered(df), plan[:2000]
    assert not plans.unpartitioned_windows(df)
    # one exchange for user_id (window + per-user fold share it), one
    # for the path groupBy; TakeOrdered adds no full-sort exchange
    assert plans.num_shuffles(df) <= 2, plan[:3000]


def test_hash_balance_audit_single_pass(spark, sf_dir, registry):
    """Bucket derivation is map-side; the per-bucket aggregate partial
    combines to <=16 groups; no join, no window; scan reads exactly
    the key column."""
    df = registry["hash_bucket_balance_audit"].fn(spark, sf_dir)
    plan = plans.simple_plan(df)
    assert "Join" not in plan, plan[:2000]
    assert "Window" not in plan, plan[:2000]
    assert plans.scan_columns(df) == {"l_orderkey"}, plans.scan_columns(df)


def test_asof_nearest_one_partitioned_window_pass(spark, sf_dir, registry):
    """Both asof directions (preceding-last, following-first) must ride
    the SAME user_id partitioning — one exchange, two frame passes, no
    join, no row expansion, no unpartitioned window."""
    df = registry["asof_join_nearest"].fn(spark, sf_dir)
    plan = plans.simple_plan(df)
    assert "Join" not in plan.replace("SortMergeJoin", "Join@"), plan[:3000]
    assert not plans.unpartitioned_windows(df)
    # union -> one user_id exchange (+ the output-contract sort)
    assert plans.num_shuffles(df) <= 2, plan[:3000]


def test_rolling_median_spine_broadcast(spark, sf_dir, registry):
    """The 7-day frame reconstruction must broadcast the daily spine
    (calendar-bounded), never shuffle-join or re-scan facts; no window
    over facts at all."""
    df = registry["rolling_median_7d_revenue"].fn(spark, sf_dir)
    plan = plans.simple_plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, (
        plan[:3000]
    )
    assert "Window" not in plan, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]


def test_having_scalar_is_one_row_broadcast(spark, sf_dir, registry):
    """The HAVING scalar must be ONE 1-row aggregate broadcast into the
    grouped table — no correlated re-evaluation, no re-scan joins
    beyond the broadcast cross; top-20 via TakeOrderedAndProject."""
    df = registry["having_above_global_avg"].fn(spark, sf_dir)
    plan = plans.simple_plan(df)
    assert plans.has_take_ordered(df), plan[:2000]
    assert "BroadcastNestedLoopJoin" in plan, plan[:3000]
    assert plans.scan_columns(df) <= {"o_custkey", "o_totalprice"}


def test_quantile_normalize_never_windows_facts(spark, sf_dir, registry):
    """The backbone rule: percent_rank derives from the domain-bounded
    count table; the only window partitions by source over DISTINCT
    length values, never fact rows; source totals broadcast."""
    df = registry["quantile_normalize_doc_length"].fn(spark, sf_dir)
    plan = plans.simple_plan(df)
    assert not plans.unpartitioned_windows(df)
    assert "BroadcastHashJoin" in plan, plan[:3000]
    cols = plans.scan_columns(df)
    assert cols <= {"source", "lang", "n_chars"}, cols


def test_float_group_key_single_pass(spark, sf_dir, registry):
    """Map-side key derivation, partial agg to <=4 groups — no join,
    no window; the scan reads only the two deriving columns."""
    df = registry["float_group_key_edges"].fn(spark, sf_dir)
    plan = plans.simple_plan(df)
    assert "Join" not in plan, plan[:2000]
    assert "Window" not in plan, plan[:2000]
    assert plans.scan_columns(df) <= {"l_orderkey", "l_quantity"}


def test_dedup_keep_best_no_text_shuffle(spark, sf_dir, registry):
    """Only the 16-byte fingerprint and n_chars may cross the shuffle:
    the ranking window partitions by fp; the text column must not
    appear in any exchange input (it is consumed map-side by md5)."""
    df = registry["dedup_keep_best_quality"].fn(spark, sf_dir)
    plan = plans.formatted_plan(df)
    assert not plans.unpartitioned_windows(df)
    import re
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "text" not in m.group(1), m.group(0)


def test_share_of_parent_no_global_window(spark, sf_dir, registry):
    """The grand total must be a 1-row broadcast cross, NOT an
    unpartitioned window; dims broadcast in the star join; the only
    window partitions by r_name over the bounded aggregate."""
    df = registry["share_of_parent_hierarchy"].fn(spark, sf_dir)
    plan = plans.simple_plan(df)
    assert not plans.unpartitioned_windows(df), plan[:3000]
    assert "BroadcastNestedLoopJoin" in plan, plan[:3000]
    assert "BroadcastHashJoin" in plan, plan[:3000]


def test_topk_ties_partitioned_window_narrow_scan(spark, sf_dir, registry):
    """The rank rides the group-key partitioning (never a global
    window); the scan reads exactly the two involved columns."""
    df = registry["topk_with_ties_per_group"].fn(spark, sf_dir)
    assert not plans.unpartitioned_windows(df)
    assert plans.scan_columns(df) == {"l_returnflag", "l_quantity"}


def test_interval_union_one_user_exchange(spark, sf_dir, registry):
    """All three window passes and the island aggregate must share ONE
    user_id exchange (same partitioning + sort); no join anywhere."""
    df = registry["interval_union_coverage"].fn(spark, sf_dir)
    plan = plans.simple_plan(df)
    assert "Join" not in plan, plan[:2000]
    assert not plans.unpartitioned_windows(df)
    assert plans.num_shuffles(df) <= 2, plan[:3000]


def test_interval_clamp_audit_single_pass(spark, sf_dir, registry):
    """Month-end clamp audit: pure map-side interval arithmetic into a
    31-group aggregate — no join, no window; the scan reads exactly the
    date column."""
    df = registry["interval_month_end_clamp_audit"].fn(spark, sf_dir)
    plan = plans.simple_plan(df)
    assert "Join" not in plan, plan[:2000]
    assert "Window" not in plan, plan[:2000]
    assert plans.scan_columns(df) == {"o_orderdate"}, plans.scan_columns(df)


def test_ts_parse_audit_single_pass(spark, sf_dir, registry):
    """TRY_CAST timestamp audit: one map-side pass to a 6-group
    aggregate; derived strings never shuffle wide (only the 6-group
    partials move)."""
    df = registry["try_to_timestamp_parse_audit"].fn(spark, sf_dir)
    plan = plans.simple_plan(df)
    assert "Join" not in plan, plan[:2000]
    assert "Window" not in plan, plan[:2000]
    assert plans.scan_columns(df) == {"event_id", "ts"}, plans.scan_columns(df)


def test_iso_week_audit_filter_pushed(spark, sf_dir, registry):
    """Year-boundary audit: the month/day window filter evaluates
    map-side against the single scanned column before the tiny
    (iso_year, iso_week) aggregate."""
    df = registry["iso_week_year_boundary_audit"].fn(spark, sf_dir)
    plan = plans.simple_plan(df)
    assert "Join" not in plan, plan[:2000]
    assert "Window" not in plan, plan[:2000]
    assert plans.scan_columns(df) == {"o_orderdate"}, plans.scan_columns(df)
    # the boundary-window predicate exists pre-aggregate (Filter node)
    assert "Filter" in plan, plan[:2000]


def test_calendar_grid_single_agg(spark, sf_dir, registry):
    """Truncation grid: one aggregate over (quarter, week) with the
    distinct-count riding the same grouping (Expand is fine — it's
    bounded by ~14 weeks/quarter); no join, no window."""
    df = registry["calendar_truncation_grid"].fn(spark, sf_dir)
    plan = plans.simple_plan(df)
    assert "Join" not in plan, plan[:2000]
    assert "Window" not in plan, plan[:2000]
    assert plans.scan_columns(df) == {"o_orderdate"}, plans.scan_columns(df)


def test_division_sign_audit_single_pass(spark, sf_dir, registry):
    """Sign-convention audit: map-side derivation into a 3-group
    aggregate; no join, no window; scan reads exactly the two
    deriving columns."""
    df = registry["integer_division_modulo_sign_audit"].fn(spark, sf_dir)
    plan = plans.simple_plan(df)
    assert "Join" not in plan, plan[:2000]
    assert "Window" not in plan, plan[:2000]
    assert plans.scan_columns(df) == {"l_orderkey", "l_linenumber"}, \
        plans.scan_columns(df)


def test_round_boundary_audit_single_pass(spark, sf_dir, registry):
    """Half-boundary audit: 9-group aggregate; the rounded columns are
    post-aggregate functions of the group key (no per-row rounding
    shuffles)."""
    df = registry["round_half_boundary_audit"].fn(spark, sf_dir)
    plan = plans.simple_plan(df)
    assert "Join" not in plan, plan[:2000]
    assert "Window" not in plan, plan[:2000]
    assert plans.scan_columns(df) == {"l_orderkey"}, plans.scan_columns(df)


def test_epoch_audit_single_pass(spark, sf_dir, registry):
    """Instant-arithmetic parity audit: rebased int64 micro-sums in a
    5-group aggregate; no join, no window; scan reads (ts, event_type)
    only."""
    df = registry["epoch_micros_span_audit"].fn(spark, sf_dir)
    plan = plans.simple_plan(df)
    assert "Join" not in plan, plan[:2000]
    assert "Window" not in plan, plan[:2000]
    assert plans.scan_columns(df) <= {"ts", "event_type"}, \
        plans.scan_columns(df)


def test_like_escape_audit_single_pass(spark, sf_dir, registry):
    """LIKE escape audit: StartsWith/Contains/LikeSimple matching
    map-side into a 5-group aggregate; no join, no window."""
    df = registry["like_escape_wildcard_audit"].fn(spark, sf_dir)
    plan = plans.simple_plan(df)
    assert "Join" not in plan, plan[:2000]
    assert "Window" not in plan, plan[:2000]
    assert plans.scan_columns(df) == {"o_orderkey", "o_orderpriority"}, \
        plans.scan_columns(df)


def test_null_ordering_audit_one_exchange(spark, sf_dir, registry):
    """Both null-placement window passes and the aggregate share the
    event_type partitioning — one exchange; no unpartitioned window."""
    df = registry["null_ordering_explicit_audit"].fn(spark, sf_dir)
    plan = plans.simple_plan(df)
    assert "Join" not in plan, plan[:2000]
    assert not plans.unpartitioned_windows(df)
    # one event_type exchange (windows + agg) + the output-order sort
    assert plans.num_shuffles(df) <= 2, plan[:3000]


def test_collation_audit_single_pass(spark, sf_dir, registry):
    """Collation audit: CASE projection to a 10-group aggregate; the
    output sort is the assertion, everything else map-side."""
    df = registry["binary_collation_rank_audit"].fn(spark, sf_dir)
    plan = plans.simple_plan(df)
    assert "Join" not in plan, plan[:2000]
    assert "Window" not in plan, plan[:2000]
    assert plans.scan_columns(df) == {"l_orderkey"}, plans.scan_columns(df)


def test_between_semantics_audit_single_pass(spark, sf_dir, registry):
    """BETWEEN audit: map-side predicate trio to a 3-group aggregate;
    no join, no window; scan reads exactly the three source columns."""
    df = registry["between_bounds_semantics_audit"].fn(spark, sf_dir)
    plan = plans.simple_plan(df)
    assert "Join" not in plan, plan[:2000]
    assert "Window" not in plan, plan[:2000]
    assert plans.scan_columns(df) == \
        {"l_returnflag", "l_quantity", "l_linenumber"}, \
        plans.scan_columns(df)


# --- round-15 decimal-semantics batch ---------------------------------------


def test_decimal_exact_sum_partial_aggregation(spark, sf_dir, registry):
    """Exact decimal sums must still run as partial/final hash
    aggregation (Spark sums decimals natively JVM-side — no UDF, no
    single-point collect): one agg exchange + the output sort, no
    joins, and the decimal arithmetic stays whole-stage-codegen
    eligible."""
    df = registry["decimal_exact_sum_audit"].fn(spark, sf_dir)
    plan = _final_plan(df)
    assert "HashAggregate" in plan, plan[:2000]
    kinds = plans.join_kinds(df)
    assert sum(kinds.values()) == 0, kinds
    assert plan.count("Exchange ") <= 2, plan[:3000]


def test_decimal_rescale_audit_map_side_shape(spark, sf_dir, registry):
    """The tie-value construction is a pure projection; the only
    shuffles are the 76-group aggregate and the output sort, and the
    rescale CASTs are computed from the group key post-aggregate (no
    second pass over the fact table)."""
    df = registry["decimal_rescale_halfup_audit"].fn(spark, sf_dir)
    plan = _final_plan(df)
    kinds = plans.join_kinds(df)
    assert sum(kinds.values()) == 0, kinds
    assert plan.count("Exchange ") <= 2, plan[:3000]


def test_engine_numeric_prune_entries_skip_files(spark, sf_dir, registry):
    """The engine-path numeric entries must PRUNE, not just answer:
    the equality conjunct (degenerate [7, 7] range) and the
    [50, 150) range each skip at least one of the three v-bracketed
    files through the SQL path's zone-map hook."""
    from miniodb_spark.seeding import numeric_prune_store

    eng = numeric_prune_store(spark, sf_dir)
    b = dict(eng.query_stats.get(
        "zonemap", {"queries": 0, "files_skipped": 0}))
    registry["engine_numeric_eq_prune_sql"].fn(spark, sf_dir)
    zs = dict(eng.query_stats["zonemap"])
    assert zs["queries"] == b.get("queries", 0) + 1
    assert zs["files_skipped"] >= b.get("files_skipped", 0) + 1, zs
    registry["engine_numeric_range_prune_sql"].fn(spark, sf_dir)
    zs2 = eng.query_stats["zonemap"]
    assert zs2["queries"] == zs["queries"] + 1
    assert zs2["files_skipped"] >= zs["files_skipped"] + 1, zs2


def test_engine_comma_join_pruned_plan(spark, sf_dir, registry):
    """Comma-join entry: the qualified id conjunct prunes exactly the
    one region file whose bracket sits below 'EUROPE' (region is a
    constant-size table, so the skip count is exact), and the join
    itself broadcasts — never a sort-merge over two tiny sides."""
    from miniodb_spark.seeding import comma_join_store

    eng = comma_join_store(spark, sf_dir)
    b = dict(eng.query_stats.get(
        "zonemap", {"queries": 0, "files_skipped": 0}))
    df = registry["engine_comma_join_pruned"].fn(spark, sf_dir)
    zs = eng.query_stats["zonemap"]
    assert zs["queries"] == b.get("queries", 0) + 1
    assert zs["files_skipped"] == b.get("files_skipped", 0) + 1, zs
    kinds = plans.join_kinds(df)
    assert kinds["sort_merge"] == 0, kinds


def test_engine_mutation_parity_state(spark, sf_dir, registry):
    """Mutation-parity entry: the surviving state has no duplicate ids
    (the insert-first update swept the old version; deletes left no
    tombstone rows), the updated record carries the new value, and the
    aggregate plan is a single partial/final pass — no join, no
    window."""
    from miniodb_spark.seeding import mutation_store

    df = registry["engine_mutation_parity"].fn(spark, sf_dir)
    plan = plans.simple_plan(df)
    assert "Join" not in plan, plan[:2000]
    assert "Window" not in plan, plan[:2000]
    eng = mutation_store(spark, sf_dir)
    rows = eng.query_df(
        "SELECT id, v FROM emut ORDER BY id").collect()
    ids = [r["id"] for r in rows]
    assert len(ids) == len(set(ids)) == 55
    by_id = {r["id"]: r["v"] for r in rows}
    assert by_id["e000003"] == 999
    for k in (10, 20, 30, 40, 50):
        assert f"e{k:06d}" not in by_id


def test_engine_time_travel_parity_state(spark, sf_dir, registry):
    """Time-travel entry: the v0 snapshot (queried AFTER the rewrites)
    holds all 60 original rows — the updated id carries its ORIGINAL
    value, the deleted ids are present — while the current-state entry
    sees the mutated 55. One store serves both (cached seeding)."""
    from miniodb_spark.seeding import mutation_store

    eng = mutation_store(spark, sf_dir)
    r0 = registry["engine_time_travel_parity"].fn(spark, sf_dir).collect()[0]
    rm = registry["engine_mutation_parity"].fn(spark, sf_dir).collect()[0]
    assert r0["n"] == 60 and rm["n"] == 55
    rows = eng.query_df(
        "SELECT id, v FROM emut",
        at_version=eng.seed_versions["emut"]).collect()
    by_id = {r["id"]: r["v"] for r in rows}
    assert len(by_id) == 60
    assert by_id["e000003"] != 999  # fixture v is floor(value) <= ~500
    for k in (10, 20, 30, 40, 50):
        assert f"e{k:06d}" in by_id


def test_int_cast_audit_single_pass(spark, sf_dir, registry):
    """Cast-semantics audit: pure map-side projections into a
    per-event_type aggregate — no join, no window, one exchange plus
    the output sort."""
    df = registry["numeric_int_cast_semantics_audit"].fn(spark, sf_dir)
    plan = plans.simple_plan(df)
    assert "Join" not in plan, plan[:2000]
    assert "Window" not in plan, plan[:2000]
    assert plans.num_shuffles(df) <= 2, plan[:3000]


def test_concat_substr_audit_single_pass(spark, sf_dir, registry):
    """concat-NULL / substr-edge audit: map-side projections into <=6
    (rf, ls) groups — no join, no window."""
    df = registry["concat_null_substr_edge_audit"].fn(spark, sf_dir)
    plan = plans.simple_plan(df)
    assert "Join" not in plan, plan[:2000]
    assert "Window" not in plan, plan[:2000]
    assert plans.num_shuffles(df) <= 2, plan[:3000]


def test_timestamp_diff_audit_single_pass(spark, sf_dir, registry):
    """Temporal-diff audit: map-side projections into per-event_type
    aggregates — no join, no window, and the off-by-one population is
    nonempty (the divergence is real in this fixture: some events sit
    between the reference's midnight and its time-of-day)."""
    df = registry["timestamp_diff_semantics_audit"].fn(spark, sf_dir)
    plan = plans.simple_plan(df)
    assert "Join" not in plan, plan[:2000]
    assert "Window" not in plan, plan[:2000]
    assert plans.num_shuffles(df) <= 2, plan[:3000]
    rows = df.collect()
    assert sum(r["n_gap"] for r in rows) > 0, rows


def test_round17_audits_single_pass(spark, sf_dir, registry):
    """r17 audit family plan gates: each is one map-side projection
    into a single partial/final aggregate — no join, no window, and
    every probe expression stays JVM-side (no Python eval node)."""
    for name in ("cast_suffix_grammar_audit",
                 "initcap_word_boundary_audit",
                 "sequence_format_semantics_audit",
                 "split_regex_limit_audit",
                 "variant_typed_extract"):
        df = registry[name].fn(spark, sf_dir)
        plan = plans.simple_plan(df)
        assert "Join" not in plan, (name, plan[:2000])
        assert "Window" not in plan, (name, plan[:2000])
        assert "BatchEvalPython" not in plan, (name, plan[:2000])
        assert "ArrowEvalPython" not in plan, (name, plan[:2000])
        assert plans.num_shuffles(df) <= 2, (name, plan[:3000])


def test_variant_extract_parses_once_per_access_chain(spark, sf_dir, registry):
    """variant_typed_extract's scale argument: the plan carries
    parse_json/variant_get expressions (the typed VARIANT path), not
    get_json_object string re-parses, and the scan reads only the
    two referenced columns."""
    df = registry["variant_typed_extract"].fn(spark, sf_dir)
    plan = plans.formatted_plan(df)
    assert "variant_get" in plan.lower(), plan[:2000]
    assert "get_json_object" not in plan.lower(), plan[:2000]
    cols = plans.scan_columns(df)
    assert cols <= {"event_type", "props"}, cols


def test_engine_ts_window_prune_skips_files(spark, sf_dir, registry):
    """engine_ts_window_prune_sql really prunes: the typed TIMESTAMP
    conjunction must skip 2 of the 3 day files (zone-map stats
    pinned), and the graded result matches the full-scan filter."""
    from miniodb_spark.seeding import ts_prune_store

    eng = ts_prune_store(spark, sf_dir if isinstance(sf_dir, str)
                         else str(sf_dir))
    before = dict(eng.query_stats.get(
        "zonemap", {"queries": 0, "files_skipped": 0}))
    df = registry["engine_ts_window_prune_sql"].fn(
        spark, sf_dir if isinstance(sf_dir, str) else str(sf_dir))
    assert df.count() == 10
    zs = eng.query_stats["zonemap"]
    assert zs["files_skipped"] >= before.get("files_skipped", 0) + 2, zs
