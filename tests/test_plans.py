"""Physical-plan assertions: scale-critical plan shapes must not regress.

These queries run at 100 TB only if Catalyst plans them the right way;
a silent fallback (global sort instead of top-k, shuffle join instead of
broadcast, Python UDF in the scoring path) is a performance bug even when
results stay correct.
"""

from __future__ import annotations

import pytest

from vector_database_api_spark import queries as q
from vector_database_api_spark.plans.audit import audit_plan, explain_str


@pytest.fixture(scope="module")
def audits(spark, sf_dir):
    names = [
        "knn_cosine_topk",
        "knn_filtered",
        "lsh_search_topk",
        "q1_pricing_summary",
        "q3_top_orders",
        "q5_nation_revenue",
        "q10_returned_items",
        "tfidf_top_terms",
        "simhash_near_dup",
    ]
    return {n: audit_plan(q.spark_queries()[n](spark, sf_dir)) for n in names}


def test_topk_is_take_ordered_not_global_sort(audits):
    """ORDER BY sim DESC LIMIT k must plan as TakeOrderedAndProject
    (per-partition heap + merge), never a full sort."""
    for name in (
        "knn_cosine_topk",
        "knn_filtered",
        "lsh_search_topk",
        "q3_top_orders",
        "q10_returned_items",
    ):
        assert audits[name]["take_ordered_topk"], name


def test_no_python_in_hot_paths(audits):
    """Vector math, scoring, filtering: all JVM expressions — zero
    Python/Arrow eval nodes in the scoring plans.  Exception: LSH hashing
    is deliberately an Arrow-batched pandas UDF (one BLAS matmul per
    batch) because Spark's higher-order functions are CodegenFallback —
    see lsh.srp_hash_udf; it must be the ONLY Python node in that plan.
    SimHash fingerprinting gets the same dispensation (dedup.simhash
    ``compute="udf"``: one NumPy pass per Arrow batch)."""
    allowed = {"lsh_search_topk": {"all_hashes"}, "simhash_near_dup": {"sig"}}
    for name, a in audits.items():
        if name in allowed:
            assert a["python_udf_names"] <= allowed[name], a["python_udf_names"]
        else:
            assert a["python_udfs"] == 0, name


def test_dimension_joins_broadcast(audits):
    """Query-vector and dimension joins broadcast; the fact side never
    shuffles for the join."""
    assert audits["knn_cosine_topk"]["broadcast_joins"] >= 2
    assert audits["q3_top_orders"]["broadcast_joins"] >= 2
    assert audits["q5_nation_revenue"]["broadcast_joins"] >= 4


def test_filters_reach_parquet_scan(spark, sf_dir):
    plan = explain_str(q.spark_queries()["point_lookup"](spark, sf_dir))
    assert "PushedFilters: [IsNotNull(doc_id), EqualTo(doc_id,42)]" in plan


def test_q6_all_predicates_pushed(spark, sf_dir):
    """Q6's four range predicates must all reach the parquet scan —
    the canonical pushdown proof (row groups skip via min/max stats)."""
    plan = explain_str(q.spark_queries()["q6_forecast_revenue"](spark, sf_dir))
    for frag in (
        "GreaterThanOrEqual(l_shipdate",
        "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount,0.05)",
        "LessThanOrEqual(l_discount,0.07)",
        "LessThan(l_quantity,24.0)",
    ):
        assert frag in plan, f"missing pushed filter {frag}"


def test_grouping_sets_single_expand_pass(spark, sf_dir):
    """GROUPING SETS must plan as one Expand + one aggregation pass, not
    one job per granularity."""
    plan = explain_str(q.spark_queries()["grouping_sets_lineitem"](spark, sf_dir))
    assert plan.count("Expand") >= 1
    # single scan of lineitem, not three (formatted explain prints each
    # node twice: once in the tree, once in the details section)
    assert plan.count("Scan parquet") <= 2


def test_q1_partial_aggregation(spark, sf_dir):
    """GroupBy aggregates must be partial (map-side combine) + final —
    two HashAggregate nodes around one exchange."""
    plan = explain_str(q.spark_queries()["q1_pricing_summary"](spark, sf_dir))
    assert plan.count("HashAggregate") >= 2


def test_column_pruning(spark, sf_dir):
    """A 2-column projection must not read all lineitem columns."""
    plan = explain_str(q.spark_queries()["q1_pricing_summary"](spark, sf_dir))
    assert "l_comment" not in plan  # not in the data, but guard anyway
    # ReadSchema in the scan should carry only needed columns
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, "no ReadSchema found"
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert cols <= {
        "l_returnflag",
        "l_linestatus",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_shipdate",
    }


def test_bucketed_tables_join_without_shuffle(spark, sf_dir, tmp_path):
    """Co-located joins via bucketing: two tables bucketed by the join key
    into the same bucket count sort-merge-join with ZERO exchanges — the
    layout that makes repeated big-table joins shuffle-free at 100 TB."""
    from vector_database_api_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    left = docs.select("doc_id", "source")
    right = docs.select("doc_id", "n_chars")
    for name, df in [("bkt_left", left), ("bkt_right", right)]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(8, "doc_id")
            .sortBy("doc_id")
            .option("path", str(tmp_path / name))
            .mode("overwrite")
            .saveAsTable(name)
        )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("bkt_left").join(spark.table("bkt_right"), "doc_id")
        plan = explain_str(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        for name in ("bkt_left", "bkt_right"):
            spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_new_tpch_joins_broadcast(spark, sf_dir):
    """q7/q8: every dimension leg broadcasts — lineitem shuffles only for
    the orders equi-join."""
    from vector_database_api_spark.plans.audit import audit_plan

    a7 = audit_plan(q.spark_queries()["q7_nation_volume"](spark, sf_dir))
    assert a7["broadcast_joins"] >= 4
    assert a7["python_udfs"] == 0
    a8 = audit_plan(q.spark_queries()["q8_market_share"](spark, sf_dir))
    assert a8["broadcast_joins"] >= 6
    assert a8["python_udfs"] == 0


def test_pagination_is_bounded_limit_not_full_sort(spark, sf_dir):
    """OFFSET+LIMIT must plan as TakeOrderedAndProject with offset (heap
    of offset+limit rows per partition), not a global sort."""
    plan = explain_str(q.spark_queries()["paginated_orders"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "Sort [" not in plan or "TakeOrdered" in plan


def test_trailing_range_window_single_shuffle(spark, sf_dir):
    """The RANGE-frame query needs exactly one exchange (hash by user_id)
    before the window sort."""
    from vector_database_api_spark.plans.audit import audit_plan

    a = audit_plan(q.spark_queries()["trailing_range_window"](spark, sf_dir))
    assert a["shuffles"] <= 2  # formatted explain may count AQE wrapper
    assert a["python_udfs"] == 0


def test_tpch_completion_plan_shapes(spark, sf_dir):
    """q2/q9/q16/q20/q21 (adapted TPC-H completion): every dimension leg
    broadcasts, nothing falls back to a Python UDF, and the decorrelated
    q21 pipeline keeps its shuffle count bounded (fact exchange reused
    across both aggregation levels)."""
    from vector_database_api_spark.plans.audit import audit_plan

    qs = q.spark_queries()
    a2 = audit_plan(qs["q2_min_cost_supplier"](spark, sf_dir))
    assert a2["broadcast_joins"] >= 4
    assert a2["take_ordered_topk"]  # ORDER BY + LIMIT 100 is a top-k
    a9 = audit_plan(qs["q9_product_profit"](spark, sf_dir))
    assert a9["broadcast_joins"] >= 3
    a16 = audit_plan(qs["q16_supplier_part_counts"](spark, sf_dir))
    assert a16["broadcast_joins"] >= 2  # anti-join + part join both broadcast
    a21 = audit_plan(qs["q21_late_sole_suppliers"](spark, sf_dir))
    assert a21["broadcast_joins"] >= 1
    assert a21["take_ordered_topk"]
    for audit in (a2, a9, a16, a21):
        assert audit["python_udfs"] == 0


def test_multigrain_rollup_single_expand_pass(spark, sf_dir):
    """time_rollup_multigrain must plan as one Expand + one aggregation
    exchange — the fact is scanned once for all three granularities."""
    from vector_database_api_spark.plans.audit import audit_plan, explain_str

    df = q.spark_queries()["time_rollup_multigrain"](spark, sf_dir)
    assert "Expand" in explain_str(df)
    a = audit_plan(df)
    assert a["shuffles"] <= 2
    assert a["python_udfs"] == 0
    assert a["pushed_filters"]  # user_id < 30 reaches the parquet scan


def test_runtime_bloom_filter_injected_on_selective_join(spark, sf_dir):
    """Runtime row-level filtering: a selective build side injects a
    bloom_filter_agg subquery whose might_contain() is pushed onto the
    probe-side scan — at 100 TB this skips most of the fact-table rows
    before the shuffle.  Thresholds are sized for petabyte scans, so the
    test lowers the application-side floor to observe the rewrite."""
    from pyspark.sql import functions as F

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        # force a shuffle join; broadcast joins don't need the bloom filter
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
            F.col("o_totalprice") > 400000
        )
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderstatus")
            .count()
        )
        plan = explain_str(j)
        assert "might_contain" in plan and "bloom_filter_agg" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_all_python_seams_are_arrow_batched(spark, sf_dir):
    """Every deliberate Python seam in the bench surface is Arrow-batched
    (ArrowEvalPython / mapInPandas) — zero row-at-a-time BatchEvalPython
    nodes anywhere, including the media SYNTHESIZERS (to_png /
    to_raw_gray / to_raw_pcm), which were the last row-wise UDFs until
    round 4."""
    for name in (
        "multimodal_png_roundtrip",
        "multimodal_audio_features",
        "multimodal_image_stats",
        "lsh_search_topk",
    ):
        a = audit_plan(q.spark_queries()[name](spark, sf_dir))
        assert a["row_python_udfs"] == 0, name


def test_window_partition_key_extraction(spark):
    """The window-skew gate's parser (plans/audit.py) reads the keys a
    physical Window node partitions by: partitioned, order-less
    partitioned, and GLOBAL (no partition spec -> one task for all
    input, reported as <global>) forms all print Arguments differently."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.range(10).withColumn("g", F.col("id") % 3)
    ranked = df.withColumn(
        "rn", F.row_number().over(Window.partitionBy("g").orderBy("id"))
    )
    assert audit_plan(ranked)["window_partition_keys"] == {"g"}
    unordered = df.withColumn("mx", F.max("id").over(Window.partitionBy("g")))
    assert audit_plan(unordered)["window_partition_keys"] == {"g"}
    glob = df.withColumn("rn", F.row_number().over(Window.orderBy("id")))
    assert audit_plan(glob)["window_partition_keys"] == {"<global>"}
    # literal ']' inside the window-function expression list (array
    # indexing + a HOF lambda): a non-greedy bracket regex truncates the
    # exprs group at the inner ']' and misreads the spec lists (r5
    # ADVICE); the depth-counter parser must still see partition key g
    arr = df.withColumn("a", F.array(F.col("id"), F.col("id") + 1))
    idxed = arr.withColumn(
        "s",
        F.max(
            F.col("a")[0] + F.expr("aggregate(a, 0L, (x, y) -> x + y)")
        ).over(Window.partitionBy("g")),
    )
    assert audit_plan(idxed)["window_partition_keys"] == {"g"}
    # multi-key partition spec with nested function calls in the order
    # spec: top-level comma split must not break inside parentheses
    multi = df.withColumn("h", F.col("id") % 2).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("g", "h").orderBy(F.abs(F.col("id") - 3))
        ),
    )
    assert audit_plan(multi)["window_partition_keys"] == {"g", "h"}


def test_window_salt_shard_marker(spark):
    """A window partitioned by (content_key, _salt) is sharded by
    construction (operators/skew.py::grouped_topk phase 1): the parser
    reports the allowlisted ``_salt`` marker ALONE, while the same
    content key without the salt still surfaces for the gate to fail."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = (
        spark.range(10)
        .withColumn("fingerprint", F.col("id") % 3)
        .withColumn("_salt", (F.col("id") % 4).cast("int"))
    )
    salted = df.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("fingerprint", "_salt").orderBy("id")
        ),
    )
    assert audit_plan(salted)["window_partition_keys"] == {"_salt"}
    plain = df.withColumn(
        "rn",
        F.row_number().over(Window.partitionBy("fingerprint").orderBy("id")),
    )
    assert audit_plan(plain)["window_partition_keys"] == {"fingerprint"}
    # r7 ADVICE: a window partitioned by _salt ALONE is not sharded —
    # per-task work is corpus/shards, linear in data — and must NOT be
    # blessed by column name alone; it reports a non-allowlisted marker
    bare = df.withColumn(
        "rn",
        F.row_number().over(Window.partitionBy("_salt").orderBy("id")),
    )
    assert audit_plan(bare)["window_partition_keys"] == {"<bare-salt>"}


def test_grouped_topk_plan_has_no_unsharded_window(spark, sf_dir):
    """grouped_topk's whole point: its only Window is the _salt-sharded
    phase-1 ranking; phase 2 is a combinable aggregate, not a window.
    The audit must therefore see exactly the ``_salt`` marker."""
    from vector_database_api_spark.operators.skew import grouped_topk
    from vector_database_api_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "event_id", "value"
    )
    a = audit_plan(grouped_topk(ev, "event_type", "value", "event_id", 5))
    assert a["window_partition_keys"] == {"_salt"}


def test_dedup_keep_first_plans_are_window_free(spark, sf_dir):
    """The keep-first family and the span doc-frequency profile must not
    plan a Window over an unbounded content key (hash / span / chunk
    text): window partitions are single-task and AQE never skew-splits
    them, so a giant duplicate group would serialize.  Rewritten round 5
    to combinable aggregates; this pins the shape."""
    for name in (
        "dedup_exact_keep_first",
        "window_dedup_rebuild",
        "curation_pipeline_summary",
        "span_dedup_by_source",
        "span_dedup_hot_spans",
    ):
        a = audit_plan(q.spark_queries()[name](spark, sf_dir))
        assert a["window_partition_keys"] == set(), name


def test_fusion_leg_plans_are_topk_and_python_free(spark, sf_dir):
    """The collected legs of coordinator-fusion queries (AUDIT_SUBPLANS)
    are the queries' only data-sized plans; each must be a distributed
    top-k — a global TakeOrderedAndProject, a per-qid ranking window
    over a DECLARED-bounded input (the batch-run shape, bound in
    queries.WINDOW_BOUNDS — enforced through the same
    window_key_violations gate plan_report runs, so a qid window with
    no declaration fails HERE too, not only in the manually-run tool;
    r9 review), or grouped_topk's _salt-sharded reduce (the r9
    dense-run shape) — with no row-wise Python, checked on live
    plans, not just the committed PLANS_AUDIT.md snapshot."""
    import tools.plan_report as PR

    for name, legs in q.AUDIT_SUBPLANS.items():
        for leg, fn in legs.items():
            a = audit_plan(fn(spark, sf_dir))
            wkeys = a["window_partition_keys"]
            per_group_topk = wkeys in ({"qid"}, {"_salt"})
            assert a["take_ordered_topk"] or per_group_topk, (name, leg)
            assert a["row_python_udfs"] == 0, (name, leg)
            assert wkeys in (set(), {"qid"}, {"_salt"}), (name, leg)
            assert (
                PR.window_key_violations(
                    f"{name}:{leg}", a["window_partition_specs"]
                )
                == []
            ), (name, leg, wkeys)


def test_hint_gate_catches_dropped_broadcast(spark):
    """Plant the r6 defect class — F.broadcast on the row-preserving
    LEFT side of a left outer join (an unsupported build side, so Spark
    silently drops the hint and logs a HintErrorLogger WARN) — and
    assert capture_hint_errors turns that silent fallback into a
    mechanical failure."""
    from pyspark.sql import functions as F

    from vector_database_api_spark.plans.audit import capture_hint_errors

    small = spark.range(10).withColumnRenamed("id", "x")
    big = spark.range(1000).withColumnRenamed("id", "y")
    with capture_hint_errors(spark) as errs:
        bad = F.broadcast(small).join(big, small.x == big.y, "left")
        explain_str(bad)
    assert any("not supported" in m for m in errs), errs


def test_hint_gate_clean_on_supported_broadcast(spark):
    """The legal shape — broadcast on the BUILD side (right of a left
    outer join) — must pass the gate AND actually plan as a broadcast
    join (no silent drop, no false positive)."""
    from pyspark.sql import functions as F

    from vector_database_api_spark.plans.audit import capture_hint_errors

    probe = spark.range(10).withColumnRenamed("id", "x")
    dim = spark.range(1000).withColumnRenamed("id", "y").limit(5)
    with capture_hint_errors(spark) as errs:
        good = probe.join(F.broadcast(dim), probe.x == dim.y, "left")
        plan = explain_str(good)
    assert errs == [], errs
    assert "Broadcast" in plan


def test_collapsed_topk_plan_build_is_hint_clean(spark, sf_dir):
    """The fixed collapsed_topk_by_near_dup (r6 verdict task 1) must
    build — including its collected top-50 leg — without any dropped
    hint, and the served join must be a BroadcastHashJoin building on
    the pruned components side."""
    from vector_database_api_spark.plans.audit import capture_hint_errors

    with capture_hint_errors(spark) as errs:
        df = q.spark_queries()["collapsed_topk_by_near_dup"](spark, sf_dir)
        plan = explain_str(df)
    assert errs == [], errs
    assert "BroadcastHashJoin" in plan


def test_window_gate_requires_declared_bound_for_qid(spark):
    """The boundedness-aware window gate (r8 verdict): qid/query_id/
    cluster_id windows are NOT blessed by key name — the r8 scale-killer
    class shipped exactly because they were.  An audit target whose plan
    windows over one of these keys passes only with a declared input
    bound in queries.WINDOW_BOUNDS; an unbounded plant is rejected."""
    import tools.plan_report as PR
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    # plant: a corpus-sized per-qid ranking window, no declaration
    df = spark.range(1000).select(
        (F.col("id") % 4).alias("qid"), F.col("id").alias("score")
    )
    planted = df.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("qid").orderBy(F.desc("score"))
        ),
    )
    wkeys = audit_plan(planted)["window_partition_keys"]
    assert wkeys == {"qid"}
    assert PR.window_key_violations("planted_query", wkeys) == [
        "window-over-undeclared-bound:qid"
    ]
    # the same keys pass WITH a declared bound...
    assert PR.window_key_violations("hybrid_batch_rrf_topk", {"qid"}) == []
    # ...but a declaration for one key does not bless others
    assert PR.window_key_violations("hybrid_batch_rrf_topk", {"cluster_id"}) == [
        "window-over-undeclared-bound:cluster_id"
    ]
    # structurally-bounded keys and the grouped_topk shard marker still
    # pass by name; content keys still fail outright
    assert PR.window_key_violations("anything", {"user_id", "_salt"}) == []
    assert PR.window_key_violations("anything", {"fingerprint"}) == [
        "window-over-unbounded-key:fingerprint"
    ]
    # r10: enumerable DIM keys are no longer blessed by name — per-key
    # input is N/|dim| (linear in corpus size), so an undeclared window
    # over them is rejected exactly like an undeclared qid window...
    for dim_key in (
        "source",
        "lang",
        "split",
        "o_orderpriority",
        "c_mktsegment",
        "s_nationkey",
        "n_name",
    ):
        assert dim_key not in PR.BOUNDED_WINDOW_KEYS, dim_key
        assert PR.window_key_violations("planted_query", {dim_key}) == [
            f"window-over-undeclared-bound:{dim_key}"
        ], dim_key
    # ...and pass only with a declared input bound (the two-phase
    # prefix-scan queries declare both the dim key and `_pid`)
    assert (
        PR.window_key_violations("sequence_packing_bins", {"source", "_pid"})
        == []
    )
    assert (
        PR.window_key_violations(
            "ranking_window_profile", {"c_mktsegment", "_pid"}
        )
        == []
    )
    # `_pid` itself is provenance-unprovable from the plan, so it too
    # needs a declaration
    assert PR.window_key_violations("planted_query", {"_pid"}) == [
        "window-over-undeclared-bound:_pid"
    ]
    # r10 co-key rule: partitionBy(a, b) is at least as fine as
    # partitionBy(a), so a spec CONTAINING a structurally bounded
    # unique-entity key is bounded by it — (doc_id, doc_id_b, diag)
    # <= one document's rows — while the same co-keys WITHOUT the
    # bounded entity key still fail
    assert (
        PR.window_key_violations("anything", {"doc_id", "doc_id_b", "diag"})
        == []
    )
    assert PR.window_key_violations("anything", {"doc_id_b", "diag"}) == [
        "window-over-unbounded-key:diag",
        "window-over-unbounded-key:doc_id_b",
    ]
    # ...and the rule is applied PER WINDOW SPEC, never to the union of
    # a plan's window keys: a bounded key in one window must not mask
    # an unbounded key in a different window of the same plan
    assert PR.window_key_violations(
        "anything", [("user_id",), ("fingerprint",)]
    ) == ["window-over-unbounded-key:fingerprint"]


def test_window_gate_evaluates_each_window_of_a_plan(spark):
    """Live-plan pin for the per-spec gate: a plan containing BOTH a
    user_id window and a content-key window must fail on the content
    key even though the flat key union contains the blessed user_id
    (the union would pass under the co-key rule — the masking hole
    found while introducing it in r10)."""
    import tools.plan_report as PR
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.range(100).select(
        (F.col("id") % 5).alias("user_id"),
        (F.col("id") % 7).alias("fingerprint"),
        F.col("id").alias("v"),
    )
    planted = df.withColumn(
        "r1",
        F.row_number().over(Window.partitionBy("user_id").orderBy("v")),
    ).withColumn(
        "r2",
        F.row_number().over(Window.partitionBy("fingerprint").orderBy("v")),
    )
    a = audit_plan(planted)
    assert ("fingerprint",) in a["window_partition_specs"]
    assert ("user_id",) in a["window_partition_specs"]
    assert a["window_partition_keys"] == {"user_id", "fingerprint"}
    assert PR.window_key_violations("planted", a["window_partition_specs"]) == [
        "window-over-unbounded-key:fingerprint"
    ]
    # every declared bound refers to a real registry query / audit leg,
    # and declares only keys the gate actually defers on
    registry = set(q.spark_queries()) | set(q.demo_queries())
    for name, bounds in q.WINDOW_BOUNDS.items():
        base = name.split(":")[0]
        assert base in registry, name
        if ":" in name:
            assert name.split(":", 1)[1] in q.AUDIT_SUBPLANS.get(base, {}), name
        assert set(bounds) <= PR.DECLARED_BOUND_KEYS, name
        assert all(v.strip() for v in bounds.values()), name
