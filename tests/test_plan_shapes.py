"""Physical-plan shape assertions — the scale claims in SCALE.md made
checkable: pushdown reaches the scan, dimensions broadcast, bucketed joins
don't exchange. Plus the catalog-maintenance statement surface
(SHOW/DESCRIBE/EXPLAIN/USE — SURVEY §2.B "catalog maintenance" row).
"""

from __future__ import annotations

import contextlib
import io

import pytest

from clickhouse_objects_analysis_spark.queries import QUERIES


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_filter_and_projection_reach_parquet_scan(spark, sf_dir):
    plan = plan_of(QUERIES["q1_pricing_summary"](spark, sf_dir))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # projection pruned: the scan must not read join keys it doesn't need
    assert "l_orderkey" not in plan.split("ReadSchema")[1].splitlines()[0]


def test_star_join_broadcasts_dimensions(spark, sf_dir):
    plan = plan_of(QUERIES["q5_local_supplier_volume"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_partitioned_sink_prunes_directories(spark, sf_dir):
    plan = plan_of(QUERIES["sink_partitioned_parquet"](spark, sf_dir))
    assert "PartitionFilters" in plan
    assert "o_orderpriority" in plan.split("PartitionFilters")[1].splitlines()[0]


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    df = QUERIES["bucketed_colocated_join"](spark, sf_dir)
    # Look only at the join subtree: the final orderBy legitimately
    # exchanges for the range partitioner, and the agg for its keys.
    plan = plan_of(df, "simple")
    join_region = plan.split("SortMergeJoin")
    assert len(join_region) >= 2, f"expected a SortMergeJoin:\n{plan}"
    below_join = join_region[-1]
    assert "Exchange" not in below_join, (
        f"bucketed join inputs must not shuffle:\n{below_join}"
    )


class TestCatalogStatements:
    """SHOW/DESCRIBE/EXPLAIN/USE + CREATE/DROP VIEW (SURVEY §2.B rows
    'DROP/TRUNCATE/.../DESCRIBE/SHOW/USE' and 'EXPLAIN')."""

    def test_show_tables_sees_registered_views(self, spark, sf_dir):
        QUERIES["scan_filter_project"](spark, sf_dir)  # registers views
        names = {r.tableName for r in spark.sql("SHOW TABLES").collect()}
        assert {"lineitem", "orders", "customer"} <= names

    def test_describe_reports_schema(self, spark, sf_dir):
        QUERIES["scan_filter_project"](spark, sf_dir)
        rows = {r.col_name: r.data_type for r in spark.sql("DESCRIBE lineitem").collect()}
        assert rows["l_orderkey"] == "bigint"
        assert rows["l_returnflag"] == "string"

    def test_explain_statement_runs(self, spark, sf_dir):
        QUERIES["scan_filter_project"](spark, sf_dir)
        out = spark.sql(
            "EXPLAIN EXTENDED SELECT l_returnflag, count(*) FROM lineitem GROUP BY 1"
        ).first()[0]
        assert "Parsed Logical Plan" in out and "Physical Plan" in out

    def test_truncate_and_alter_add_column(self, spark, sf_dir):
        QUERIES["scan_filter_project"](spark, sf_dir)
        import shutil

        warehouse = spark.conf.get(
            "spark.sql.warehouse.dir", "spark-warehouse"
        ).removeprefix("file:")
        spark.sql("DROP TABLE IF EXISTS t_catalog_ops")
        shutil.rmtree(f"{warehouse}/t_catalog_ops", ignore_errors=True)
        spark.sql(
            "CREATE TABLE t_catalog_ops USING parquet AS "
            "SELECT n_nationkey, n_name FROM nation"
        )
        assert spark.table("t_catalog_ops").count() == 25
        spark.sql("ALTER TABLE t_catalog_ops ADD COLUMNS (note string)")
        assert "note" in spark.table("t_catalog_ops").columns
        spark.sql("TRUNCATE TABLE t_catalog_ops")
        assert spark.table("t_catalog_ops").count() == 0
        spark.sql("DROP TABLE t_catalog_ops")

    def test_rename_table(self, spark, sf_dir):
        """RENAME TABLE (grammar list ClickHouseParser.py:1361) → ALTER
        TABLE ... RENAME TO; the data follows the new name."""
        QUERIES["scan_filter_project"](spark, sf_dir)
        import shutil

        warehouse = spark.conf.get(
            "spark.sql.warehouse.dir", "spark-warehouse"
        ).removeprefix("file:")
        for t in ("t_rename_src", "t_rename_dst"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
        spark.sql(
            "CREATE TABLE t_rename_src USING parquet AS "
            "SELECT r_regionkey, r_name FROM region"
        )
        spark.sql("ALTER TABLE t_rename_src RENAME TO t_rename_dst")
        names = {r.tableName for r in spark.sql("SHOW TABLES").collect()}
        assert "t_rename_dst" in names and "t_rename_src" not in names
        assert spark.table("t_rename_dst").count() == 5
        spark.sql("DROP TABLE t_rename_dst")

    def test_detach_attach_external_table(self, spark, sf_dir, tmp_path):
        """DETACH/ATTACH → drop + re-register an EXTERNAL table over the
        same files: DROP on an external table keeps the data (the CH
        DETACH contract), CREATE ... USING parquet LOCATION re-attaches."""
        QUERIES["scan_filter_project"](spark, sf_dir)
        loc = str(tmp_path / "t_attach_data")
        spark.sql("DROP TABLE IF EXISTS t_attach_demo")
        spark.sql(
            "CREATE TABLE t_attach_demo USING parquet "
            f"LOCATION '{loc}' AS SELECT n_nationkey, n_name FROM nation"
        )
        assert spark.table("t_attach_demo").count() == 25
        spark.sql("DROP TABLE t_attach_demo")  # DETACH: files survive
        names = {r.tableName for r in spark.sql("SHOW TABLES").collect()}
        assert "t_attach_demo" not in names
        spark.sql(
            f"CREATE TABLE t_attach_demo USING parquet LOCATION '{loc}'"
        )  # ATTACH: schema inferred from the surviving files
        assert spark.table("t_attach_demo").count() == 25
        spark.sql("DROP TABLE t_attach_demo")

    def test_create_use_drop_database_and_view(self, spark, sf_dir):
        QUERIES["scan_filter_project"](spark, sf_dir)
        spark.sql("CREATE DATABASE IF NOT EXISTS scratch_db")
        spark.sql("USE scratch_db")
        try:
            spark.sql(
                "CREATE OR REPLACE TEMP VIEW urgent AS "
                "SELECT * FROM orders WHERE o_orderpriority = '1-URGENT'"
            )
            n = spark.sql("SELECT count(*) AS n FROM urgent").first()["n"]
            assert n > 0
            spark.sql("DROP VIEW urgent")
        finally:
            spark.sql("USE default")
            spark.sql("DROP DATABASE IF EXISTS scratch_db")


class TestTypeSurfacePlans:
    """Plan shapes for the type-surface queries (queries/types_surface.py):
    the enum dictionary must broadcast, topK must map-side combine, and
    COLLATE's sort+limit must stay a TakeOrderedAndProject."""

    def test_enum_dictionary_broadcasts(self, spark, sf_dir):
        plan = plan_of(QUERIES["enum_decode"](spark, sf_dir))
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan

    def test_topk_frequent_partial_aggregates_before_exchange(self, spark, sf_dir):
        plan = plan_of(QUERIES["topk_frequent"](spark, sf_dir))
        # one row per (status, value) leaves the map side, not one per order
        assert "partial_count" in plan

    def test_collate_order_is_take_ordered(self, spark, sf_dir):
        plan = plan_of(QUERIES["collate_order"](spark, sf_dir))
        assert "TakeOrderedAndProject" in plan

    def test_nested_roundtrip_stays_jvm_side(self, spark, sf_dir):
        plan = plan_of(QUERIES["nested_type_roundtrip"](spark, sf_dir))
        # higher-order fns + arrays_zip must not fall back to Python
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_range_bin_join_avoids_nested_loop(spark, sf_dir):
    plan = plan_of(QUERIES["range_bin_join"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan


def test_q18_semi_join_broadcasts(spark, sf_dir):
    plan = plan_of(QUERIES["q18_large_volume_customer"](spark, sf_dir))
    # the qualifying-order set must reach both fact scans as a broadcast
    # semi filter, not a shuffled join
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


class TestRound2Plans:
    """Plan shapes for the round-2 operators (queries/llm_extras.py)."""

    def test_tfidf_broadcasts_vocab_and_count(self, spark, sf_dir):
        """The df table and scalar doc count must broadcast — only the
        per-occurrence (doc, term) aggregate may shuffle the big side."""
        plan = plan_of(QUERIES["tfidf_top_terms"](spark, sf_dir))
        assert plan.count("BroadcastHashJoin") >= 1
        assert "BroadcastNestedLoopJoin" in plan  # the 1-row count attach

    def test_stratified_sample_is_scan_plus_filter(self, spark, sf_dir):
        """Hash-based sampling must plan as scan + filter: no shuffle
        before the terminal sort, no Python workers."""
        plan = plan_of(
            QUERIES["stratified_sample_source"](spark, sf_dir), "simple"
        )
        assert "Exchange hashpartitioning" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEval" not in plan

    def test_vocab_terms_shuffle_is_per_term(self, spark, sf_dir):
        """The explode feeds a hash aggregate with map-side combine: the
        exchange must be on the term key (partial_count before it)."""
        plan = plan_of(QUERIES["vocab_top_terms"](spark, sf_dir), "simple")
        assert "partial_count" in plan or "partial" in plan.lower()

    def test_right_outer_broadcasts_small_side(self, spark, sf_dir):
        plan = plan_of(QUERIES["join_right_outer"](spark, sf_dir))
        assert "BroadcastHashJoin" in plan


class TestWave3Plans:
    """Plan shapes for the wave-3 operators (queries/llm_wave3.py)."""

    def test_decontaminate_broadcasts_eval_set(self, spark, sf_dir):
        """The eval shingle set is the only broadcast state; the train
        side must reach it through a broadcast join (never a sort-merge
        over document shingles)."""
        plan = plan_of(QUERIES["decontaminate_ngram_overlap"](spark, sf_dir))
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan

    def test_repetition_filter_is_map_only_before_sort(self, spark, sf_dir):
        """Per-doc Counter emits 4-int rows inside the map stage: no
        hash-partition exchange may appear (only the terminal range
        exchange for the ORDER BY)."""
        plan = plan_of(QUERIES["repetition_ngram_filter"](spark, sf_dir), "simple")
        assert "Exchange hashpartitioning" not in plan
        assert "MapInPandas" in plan

    def test_normalize_dedup_shuffles_hashes_only(self, spark, sf_dir):
        """The groupBy and join key is the 8-byte norm_hash; document text
        must not appear past the scan (pruned before the exchange)."""
        plan = plan_of(QUERIES["normalize_text_dedup"](spark, sf_dir))
        scan_schema = plan.split("ReadSchema")[1].splitlines()[0]
        assert "text" in scan_schema  # scan reads it...
        assert "lang" not in scan_schema  # ...but only the needed columns

    def test_split_assignment_is_map_side(self, spark, sf_dir):
        """Split assignment must be a codegen expression: no Python
        workers, no shuffle before the per-source aggregate."""
        plan = plan_of(QUERIES["train_val_test_split"](spark, sf_dir), "simple")
        assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
        assert plan.count("Exchange hashpartitioning") == 1  # the groupBy only

    def test_mixture_rebalance_broadcasts_rates(self, spark, sf_dir):
        """The per-source rate table is vocabulary-sized: the keep/drop
        pass must consume it via broadcast join."""
        plan = plan_of(QUERIES["mixture_rebalance_uniform"](spark, sf_dir))
        assert "BroadcastHashJoin" in plan

    def test_centroids_partial_aggregate_before_exchange(self, spark, sf_dir):
        """The (label, pos) integer sums must combine map-side so the
        shuffle carries at most labels x dims rows per task."""
        plan = plan_of(QUERIES["embedding_label_centroids"](spark, sf_dir), "simple")
        assert "partial" in plan.lower()

    def test_entropy_stays_jvm_side(self, spark, sf_dir):
        """The sorted-fold entropy is all codegen expressions — no Python
        workers anywhere in the plan."""
        plan = plan_of(QUERIES["char_entropy_quality"](spark, sf_dir), "simple")
        assert "BatchEvalPython" not in plan and "ArrowEval" not in plan

    def test_quality_report_joins_on_hash(self, spark, sf_dir):
        """Dup attribution joins on the 8-byte text hash; at this SF the
        dup-count side broadcasts (AQE may pick either side), and no
        nested-loop join may appear."""
        plan = plan_of(QUERIES["source_quality_report"](spark, sf_dir))
        assert "BroadcastNestedLoopJoin" not in plan


class TestBehavioralAggregates:
    """Plan shapes for the ClickHouse behavioral-aggregate family
    (queries/ch_aggregates.py)."""

    def test_funnel_is_one_sort_two_windows_no_python(self, spark, sf_dir):
        """The funnel DP must plan as Window nodes over one user_id sort —
        no Python workers, no self-joins of the event table."""
        plan = plan_of(QUERIES["window_funnel"](spark, sf_dir), "simple")
        assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
        assert "FlatMapGroupsInPandas" not in plan
        assert plan.count("Window") >= 2

    def test_sequence_match_no_self_join(self, spark, sf_dir):
        """The engine side must use the running-max window, not the
        oracle's EXISTS self-join."""
        plan = plan_of(QUERIES["sequence_match"](spark, sf_dir), "simple")
        assert "Window" in plan
        assert "SortMergeJoin" not in plan

    def test_retention_partial_aggregates(self, spark, sf_dir):
        """Two-level conditional-flag aggregation: flags combine map-side
        before the user_id exchange."""
        plan = plan_of(QUERIES["retention_cohort"](spark, sf_dir), "simple")
        assert "partial" in plan.lower()

    def test_sum_map_partial_aggregates(self, spark, sf_dir):
        plan = plan_of(QUERIES["sum_map_by_user"](spark, sf_dir), "simple")
        assert "partial" in plan.lower()


class TestWave4Plans:
    """Scale shapes for the wave-4 LLM ops + relational surface adds."""

    def test_exists_decorrelates_to_semi_anti_joins(self, spark, sf_dir):
        plan = plan_of(QUERIES["exists_subquery"](spark, sf_dir), "simple")
        assert "LeftSemi" in plan
        assert "LeftAnti" in plan
        assert "BroadcastNestedLoop" not in plan

    def test_pivot_is_single_pass_conditional_agg(self, spark, sf_dir):
        plan = plan_of(QUERIES["pivot_event_types"](spark, sf_dir), "simple")
        assert "pivotfirst" in plan
        # explicit value list → no extra distinct-values job, no join
        assert "Join" not in plan

    def test_gopher_rules_single_doc_shuffle_no_python(self, spark, sf_dir):
        plan = plan_of(QUERIES["gopher_quality_rules"](spark, sf_dir), "simple")
        assert "HashAggregate" in plan
        assert "Python" not in plan and "mapInPandas" not in plan

    def test_gopher_repetition_two_exchanges_no_window(self, spark, sf_dir):
        # r14 rewrite: array-side grams, both aggregations ride the one
        # doc_id exchange; the only other exchange is the output sort.
        # A Window or a Join reappearing means the rewrite regressed to
        # the posexplode + lead()/row_number + join-back shape.
        plan = plan_of(
            QUERIES["gopher_repetition_rules"](spark, sf_dir), "simple"
        )
        assert "Window" not in plan
        assert "Join" not in plan
        assert plan.count("Exchange") == 2, plan

    def test_boilerplate_scrub_token_stream_never_shuffles(
        self, spark, sf_dir
    ):
        # r14 rewrite: grams array-side, scrub/reassembly map-side; the
        # doc-keyed shuffle carries hit POSITIONS (the collect_list
        # agg), never the token stream, and no per-doc window sort or
        # token anti-join exists.
        plan = plan_of(
            QUERIES["boilerplate_span_scrub"](spark, sf_dir), "simple"
        )
        assert "Window" not in plan
        assert "LeftAnti" not in plan
        assert "collect_list" in plan

    def test_unigram_broadcasts_vocab(self, spark, sf_dir):
        plan = plan_of(
            QUERIES["unigram_logprob_quality"](spark, sf_dir), "simple"
        )
        assert "BroadcastHashJoin" in plan  # vocab-sized unigram table
        assert "SortMergeJoin" not in plan

    def test_knn_votes_stay_integer_and_broadcast_labels(self, spark, sf_dir):
        plan = plan_of(QUERIES["knn_classify"](spark, sf_dir), "simple")
        assert "BroadcastHashJoin" in plan  # labels side
        assert "SortMergeJoin" not in plan

    def test_running_difference_single_user_sort(self, spark, sf_dir):
        plan = plan_of(QUERIES["running_difference"](spark, sf_dir), "simple")
        assert plan.count("Window") == 1
        assert "Python" not in plan


class TestWave5Plans:
    """Scale shapes for the round-3 TPC-H adds + curation wave 5."""

    def test_q6_all_filters_reach_the_scan(self, spark, sf_dir):
        plan = plan_of(QUERIES["q6_forecast_revenue"](spark, sf_dir))
        pushed = plan.split("PushedFilters")[1].splitlines()[0]
        assert "l_shipdate" in pushed
        assert "l_discount" in pushed
        assert "l_quantity" in pushed
        assert "Join" not in plan  # scan→agg, nothing else

    def test_q10_broadcasts_nation_only_fact_join_shuffles(self, spark, sf_dir):
        plan = plan_of(QUERIES["q10_returned_items"](spark, sf_dir), "simple")
        assert "BroadcastHashJoin" in plan
        # returnflag filter must reach the lineitem scan
        full = plan_of(QUERIES["q10_returned_items"](spark, sf_dir))
        assert "EqualTo(l_returnflag,R)" in full

    def test_q14_q19_broadcast_part(self, spark, sf_dir):
        for name in ("q14_promo_effect", "q19_discounted_revenue"):
            plan = plan_of(QUERIES[name](spark, sf_dir), "simple")
            assert "BroadcastHashJoin" in plan, name
            assert "SortMergeJoin" not in plan, name
            # disjunctive predicate must NOT degrade the equi join
            assert "BroadcastNestedLoop" not in plan, name

    def test_q17_decorrelated_aggregate_joined_back(self, spark, sf_dir):
        plan = plan_of(QUERIES["q17_small_quantity_revenue"](spark, sf_dir), "simple")
        # one per-part aggregate (partial+final), no per-row subquery re-exec
        assert "HashAggregate" in plan
        assert "BroadcastNestedLoop" not in plan

    def test_q22_threshold_is_broadcast_not_recomputed(self, spark, sf_dir):
        plan = plan_of(QUERIES["q22_global_sales_opportunity"](spark, sf_dir), "simple")
        assert "LeftAnti" in plan  # never-ordered customers
        assert "BroadcastNestedLoop" in plan or "BroadcastHashJoin" in plan

    def test_pii_scrub_is_map_only_no_python(self, spark, sf_dir):
        plan = plan_of(QUERIES["pii_scrub"](spark, sf_dir), "simple")
        # regexp redaction is a pure map stage: the only Exchange is the
        # final global sort's range partitioner
        assert "Python" not in plan
        body = plan.split("Sort")[-1]
        assert "Exchange" not in body or "rangepartitioning" in body

    def test_source_cap_caps_map_side_before_shuffle(self, spark, sf_dir):
        plan = plan_of(QUERIES["source_cap"](spark, sf_dir), "simple")
        # Spark's WindowGroupLimit drops rows beyond the cap BEFORE the
        # shuffle (Partial) and again after (Final) — at 100 TB only ≤15
        # rows per source ever leave the map stage.
        assert "WindowGroupLimit" in plan and "Partial" in plan
        assert "Python" not in plan

    def test_winsorize_quantiles_broadcast_back(self, spark, sf_dir):
        plan = plan_of(QUERIES["winsorize_doclen"](spark, sf_dir), "simple")
        assert "BroadcastNestedLoop" in plan or "BroadcastHashJoin" in plan
        assert "Python" not in plan

    def test_moving_sum_window_and_collect_share_one_sort(self, spark, sf_dir):
        plan = plan_of(QUERIES["group_array_moving_sum"](spark, sf_dir), "simple")
        # one shuffle on user_id serves both the frame window and the
        # per-user collect — no second hashpartitioning exchange
        assert plan.count("hashpartitioning(user_id") == 1, plan
        assert "Python" not in plan

    def test_histogram_bounds_broadcast_back(self, spark, sf_dir):
        plan = plan_of(QUERIES["histogram_fixed_bins"](spark, sf_dir), "simple")
        assert "BroadcastNestedLoop" in plan or "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan


class TestR6Session2Plans:
    """Plan shapes for the round-6 continuation queries (tpch_fill,
    r6_wave2): the scale claims in their docstrings made checkable."""

    def test_q4_exists_is_semi_join_not_aggregate(self, spark, sf_dir):
        """EXISTS must compile to a LEFT SEMI hash join on the natural
        key — never a distinct+inner rewrite."""
        plan = plan_of(QUERIES["q4_order_priority"](spark, sf_dir))
        assert "LeftSemi" in plan

    def test_q21_shuffles_lineitem_once(self, spark, sf_dir):
        """The EXISTS + NOT EXISTS pair is folded into ONE per-order
        roll-up: lineitem appears once in the plan (the canonical form
        scans it three times), and the supplier dimension broadcasts."""
        plan = plan_of(QUERIES["q21_waiting_suppliers"](spark, sf_dir))
        assert plan.count("lineitem.parquet") == 1
        assert "BroadcastHashJoin" in plan

    def test_q16_not_in_is_broadcast_anti(self, spark, sf_dir):
        """The complained-supplier exclusion must be a broadcast LEFT
        ANTI (s_suppkey is non-null, NOT IN and ANTI agree)."""
        plan = plan_of(QUERIES["q16_supplier_cnt"](spark, sf_dir))
        assert "LeftAnti" in plan and "BroadcastHashJoin" in plan

    def test_gd_state_is_one_row_broadcast(self, spark, sf_dir):
        """Each GD step's (w, b) state attaches via a 1-row broadcast
        nested loop — the correct scalar-broadcast plan — and no step
        may fall back to a Python worker."""
        plan = plan_of(QUERIES["gd_linear_regression"](spark, sf_dir), "simple")
        assert plan.count("BroadcastNestedLoopJoin") == 3
        assert "Python" not in plan

    def test_cms_probe_broadcasts_sketch(self, spark, sf_dir):
        """The 4096-cell sketch is the build side of a broadcast join;
        the probe side is the dimension-sized top-10 fan-out."""
        plan = plan_of(QUERIES["cms_heavy_hitters"](spark, sf_dir))
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan

    def test_kmv_ranks_distinct_hashes_only(self, spark, sf_dir):
        """The window must rank the DISTINCT (type, hash) stream — a
        partial (map-side) dedup aggregate must sit below the exchange."""
        plan = plan_of(QUERIES["kmv_distinct_users"](spark, sf_dir), "simple")
        low = plan.lower()
        assert "window" in low
        assert "partial" in low  # map-side dedup before the shuffle

    def test_ngram_novelty_reads_documents_twice_no_gram_join(self, spark, sf_dir):
        """The r6 rewrite removed the gram-keyed join back: no join may
        remain except the doc-cardinality left join, and only ONE side
        explodes (the other reads the shingle-array SIZE)."""
        plan = plan_of(QUERIES["ngram_novelty"](spark, sf_dir), "simple")
        assert plan.count("Generate explode") == 1


class TestR7SessionPlans:
    """Plan shapes for the round-7 session additions: the scale claims
    in each docstring made checkable."""

    def test_unpivot_is_expand_with_pruned_scan(self, spark, sf_dir):
        plan = plan_of(QUERIES["unpivot_lineitem_metrics"](spark, sf_dir))
        assert "Expand" in plan  # one-scan melt, not a 4-way self-union
        read = plan.split("ReadSchema")[1].splitlines()[0]
        assert "l_orderkey" not in read  # only the 5 referenced columns

    def test_bloom_probe_is_broadcast(self, spark, sf_dir):
        plan = plan_of(QUERIES["bloom_semijoin_prune"](spark, sf_dir))
        # the <=2048-row filter table broadcasts to the probe side; the
        # lineitem stream must never sort-merge against it
        assert "BroadcastHashJoin" in plan

    def test_rrf_fusion_uses_take_ordered(self, spark, sf_dir):
        plan = plan_of(QUERIES["rrf_hybrid_retrieval"](spark, sf_dir))
        assert "TakeOrderedAndProject" in plan  # top-10 never global-sorts

    def test_pmi_broadcasts_vocab_tables(self, spark, sf_dir):
        plan = plan_of(QUERIES["bigram_pmi_top"](spark, sf_dir))
        assert plan.count("BroadcastHashJoin") >= 2  # u1 + u2 probes

    def test_hard_negatives_broadcast_queries_never_shuffle_corpus(
        self, spark, sf_dir
    ):
        plan = plan_of(QUERIES["hard_negative_mining"](spark, sf_dir))
        # 10-row query side broadcast as a nested-loop against the
        # label-mismatch predicate; the corpus streams map-side
        assert "BroadcastNestedLoopJoin" in plan
        assert "SortMergeJoin" not in plan

    def test_survivorship_scan_prunes_to_id_and_quality(self, spark, sf_dir):
        plan = plan_of(QUERIES["dedup_survivorship"](spark, sf_dir))
        # the singleton-completion LEFT join reads only (doc_id, n_chars)
        # from the corpus; the component side is statically unsized (a
        # localCheckpoint), so the broadcast decision is AQE's at runtime
        # — the static guarantee asserted here is the column pruning.
        read = plan.split("ReadSchema")[1].splitlines()[0]
        assert "doc_id" in read and "n_chars" in read
        assert "lang" not in read and "source" not in read

    def test_k_anonymity_raw_volume_stops_at_first_aggregate(
        self, spark, sf_dir
    ):
        plan = plan_of(QUERIES["k_anonymity_audit"](spark, sf_dir))
        # the k-sweep cross join must ride on the aggregated group
        # histogram, not the raw customer scan
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
        read = plan.split("ReadSchema")[1].splitlines()[0]
        assert "c_acctbal" not in read  # scan pruned to the two quasi-IDs


class TestRound8Plans:
    """Plan-shape guarantees for the round-8 session additions."""

    def test_grid_spatial_join_is_hash_join_on_cells(self, spark, sf_dir):
        # drive the operator directly: the registry query localCheckpoints
        # the pair stream, which hides the join inside a Scan ExistingRDD
        from clickhouse_objects_analysis_spark.operators.spatial import (
            grid_neighbor_pairs,
        )

        pts = spark.range(3000).selectExpr(
            "id AS pid", "id * 37 % 1000 AS x", "id * 91 % 1000 AS y"
        )
        plan = plan_of(grid_neighbor_pairs(pts, "pid", "x", "y", 40))
        # the 3x3 replication must meet the home rows in an equi join
        # on cell ids — never a cartesian / nested-loop pair scan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert (
            "SortMergeJoin" in plan
            or "ShuffledHashJoin" in plan
            or "BroadcastHashJoin" in plan
        )

    def test_markov_scoring_broadcasts_fitted_model(self, spark, sf_dir):
        plan = plan_of(QUERIES["markov_next_event_accuracy"](spark, sf_dir))
        # the |states|^2 fitted table reaches the test stream as a
        # broadcast, so scoring never shuffles the bigram stream twice
        assert "BroadcastHashJoin" in plan

    def test_join_skew_audit_totals_broadcast(self, spark, sf_dir):
        plan = plan_of(QUERIES["join_skew_audit"](spark, sf_dir))
        assert "BroadcastNestedLoopJoin Cross BuildRight" in plan  # 1-row totals
        read = plan.split("ReadSchema")[1].splitlines()[0]
        assert "l_suppkey" in read and "l_extendedprice" not in read

    def test_geo_surface_is_map_side_until_sort(self, spark, sf_dir):
        plan = plan_of(QUERIES["geo_function_surface"](spark, sf_dir))
        # one scan, no joins, no aggregates — the only exchange is the
        # final range partitioning for the ORDER BY
        assert "Join" not in plan
        assert plan.count("Exchange") <= 2  # rangepartitioning (+AQE read)

    def test_bpe_encode_no_udf_in_plan(self, spark, sf_dir):
        plan = plan_of(QUERIES["bpe_encode_apply"](spark, sf_dir))
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_isotonic_enumeration_rides_on_aggregate(self, spark, sf_dir):
        plan = plan_of(QUERIES["isotonic_calibration"](spark, sf_dir))
        # the cubic minimax joins run over the 20-row bucket aggregate —
        # the documents scan is pruned to the two needed columns
        read = plan.split("ReadSchema")[1].splitlines()[0]
        assert "n_chars" in read and "lang" in read and "text" not in read
