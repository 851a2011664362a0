"""Renderer behavioral parity suite.

Covers the same behavior matrix as the reference's renderer tests
(/root/reference/tests/test_mermaid_deps.py:12-155): happy-path structure,
each MermaidOptions knob, and every validation error — expressed as
parametrized tables over our clickhouse_objects_analysis_spark.plans.mermaid
implementation. Pure functions; no SparkSession needed.
"""

from __future__ import annotations

import pytest

from clickhouse_objects_analysis_spark.plans.mermaid import (
    MermaidDependencyGraphError,
    MermaidOptions,
    json_to_mermaid,
    loads_json_to_mermaid,
)

HOUSEHOLD_PAYLOAD = {
    "view_dependencies": {
        "test.v_car_inventory": ["test.car", "test.household", "test.human"],
        "test.v_city_household_flag_stats": ["test.v_household_flags"],
        "test.v_household_flags": [
            "test.car",
            "test.household",
            "test.household_member",
            "test.pet",
        ],
        "test.v_household_health_score": ["test.v_household_flags"],
        "test.v_household_roster": [
            "test.car",
            "test.household",
            "test.household_member",
            "test.pet",
        ],
    },
    "errors": {},
}

HOUSEHOLD_TABLES = {
    "test.car",
    "test.household",
    "test.household_member",
    "test.pet",
    "test.human",
}


class TestHappyPath:
    def test_structure_edges_and_classes(self):
        out = json_to_mermaid(HOUSEHOLD_PAYLOAD, HOUSEHOLD_TABLES)

        assert out.startswith("graph LR\n")
        assert '"' not in out  # node names are never quoted

        for edge_line in (
            "  test.car -.-> test.v_car_inventory\n",
            "  test.v_household_flags -.-> test.v_city_household_flag_stats\n",
            "  test.v_household_flags -.-> test.v_household_health_score\n",
        ):
            assert edge_line in out

        for node_line in (
            "  test.car:::chTable",
            "  test.household:::chTable",
            "  test.v_household_flags:::chView",
            "  test.v_household_health_score:::chView",
        ):
            assert node_line in out

    def test_trailing_newline_and_classdefs(self):
        out = json_to_mermaid(HOUSEHOLD_PAYLOAD, HOUSEHOLD_TABLES)
        assert out.endswith("\n")
        assert "classDef chTable" in out
        assert "classDef chView" in out


class TestOptions:
    @pytest.mark.parametrize("direction", ["LR", "TB", "RL", "BT"])
    def test_direction_sets_header(self, direction):
        out = json_to_mermaid(
            {"view_dependencies": {"a": ["b"]}},
            options=MermaidOptions(direction=direction),
        )
        assert out.startswith(f"graph {direction}\n")
        assert "  b -.-> a\n" in out

    @pytest.mark.parametrize(
        "dedupe, b_edges, c_edges",
        [(True, 1, 1), (False, 2, 1)],
        ids=["dedupe-on", "dedupe-off"],
    )
    def test_edge_dedup_toggle(self, dedupe, b_edges, c_edges):
        out = json_to_mermaid(
            {"view_dependencies": {"a": ["b", "b", "c"]}},
            options=MermaidOptions(dedupe_edges=dedupe),
        )
        assert out.count("  b -.-> a\n") == b_edges
        assert out.count("  c -.-> a\n") == c_edges

    @pytest.mark.parametrize(
        "include, expect_listed",
        [(True, True), (False, False)],
        ids=["isolated-on", "isolated-off"],
    )
    def test_isolated_node_toggle(self, include, expect_listed):
        out = json_to_mermaid(
            {"view_dependencies": {"a": ["b"], "lonely": []}},
            options=MermaidOptions(include_isolated_nodes=include),
        )
        assert "  b -.-> a\n" in out
        assert ("  lonely\n" in out) is expect_listed

    def test_edgeless_graph_still_lists_all_nodes(self):
        out = json_to_mermaid(
            {"view_dependencies": {"a": [], "b": []}},
            options=MermaidOptions(include_isolated_nodes=True),
        )
        assert out.startswith("graph LR\n")
        assert "  a\n" in out
        assert "  b\n" in out
        assert "-.->" not in out

    def test_null_deps_mean_no_edges(self):
        out = json_to_mermaid({"view_dependencies": {"a": None}})
        assert "  a\n" in out
        assert "-.->" not in out


class TestValidation:
    @pytest.mark.parametrize(
        "payload, message",
        [
            ({"errors": {}}, "Missing required key"),
            ({"view_dependencies": ["nope"]}, "must be a dictionary"),
            ({"view_dependencies": {123: ["a"]}}, "keys.*must be strings"),
            ({"view_dependencies": {"a": "b"}}, "must be a list"),
            ({"view_dependencies": {"a": ["b", 1]}}, "list of strings"),
        ],
        ids=[
            "missing-key",
            "deps-not-dict",
            "nonstring-view-key",
            "deps-not-list",
            "nonstring-dep",
        ],
    )
    def test_malformed_payload_raises(self, payload, message):
        with pytest.raises(MermaidDependencyGraphError, match=message):
            json_to_mermaid(payload)

    def test_bad_direction_raises(self):
        with pytest.raises(
            MermaidDependencyGraphError, match="direction must be one of"
        ):
            json_to_mermaid(
                {"view_dependencies": {"a": ["b"]}},
                options=MermaidOptions(direction="DIAGONAL"),
            )

    @pytest.mark.parametrize(
        "raw, message",
        [
            ("{ this is not json }", "Invalid JSON"),
            ('["not an object"]', "Top-level JSON must be an object"),
        ],
        ids=["invalid-json", "top-level-not-object"],
    )
    def test_string_entry_point_errors(self, raw, message):
        with pytest.raises(MermaidDependencyGraphError, match=message):
            loads_json_to_mermaid(raw)

    def test_string_entry_point_happy(self):
        out = loads_json_to_mermaid('{"view_dependencies": {"a": ["b"]}}')
        assert "  b -.-> a\n" in out
