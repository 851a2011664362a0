"""End-to-end test of the user entry point (A18 + A3): real catalog
objects → fetch_view_ddl → lineage → Mermaid file, reproducing the
reference README's household diagram shape (README.md:12-30)."""

from __future__ import annotations

import shutil

import pytest

from clickhouse_objects_analysis_spark.cli import fetch_view_ddl, main

DB = "hh_cli_test"
TABLES = ("household", "human", "car", "pet")

#: dep -> view edges of the README household diagram, re-created here.
EXPECTED_EDGES = [
    ("car", "v_car_inventory"),
    ("household", "v_car_inventory"),
    ("human", "v_car_inventory"),
    ("pet", "v_pet_ownership"),
    ("human", "v_human_profile"),
    ("v_car_inventory", "v_human_profile"),
]


@pytest.fixture()
def household_catalog(spark):
    spark.sql(f"DROP DATABASE IF EXISTS {DB} CASCADE")
    # A previous crashed run can leave warehouse files the in-memory
    # catalog has forgotten; CREATE TABLE then fails on the stale dir.
    shutil.rmtree(f"spark-warehouse/{DB}.db", ignore_errors=True)
    spark.sql(f"CREATE DATABASE {DB}")
    for t in TABLES:
        spark.sql(f"CREATE TABLE {DB}.{t} (id INT, name STRING) USING PARQUET")
    spark.sql(
        f"CREATE VIEW {DB}.v_car_inventory AS "
        f"SELECT c.id FROM {DB}.car c "
        f"JOIN {DB}.household h ON c.id = h.id "
        f"JOIN {DB}.human m ON m.id = c.id"
    )
    spark.sql(
        f"CREATE VIEW {DB}.v_pet_ownership AS SELECT id FROM {DB}.pet"
    )
    spark.sql(
        f"CREATE VIEW {DB}.v_human_profile AS "
        f"SELECT m.id FROM {DB}.human m "
        f"JOIN {DB}.v_car_inventory v ON v.id = m.id"
    )
    yield spark
    spark.sql(f"DROP DATABASE IF EXISTS {DB} CASCADE")


class TestFetchViewDdl:
    def test_permanent_view(self, household_catalog):
        ddl = fetch_view_ddl(household_catalog, DB, "v_pet_ownership")
        assert "pet" in ddl and "SELECT" in ddl.upper()

    def test_temp_view(self, spark):
        spark.sql(
            "CREATE OR REPLACE TEMP VIEW cli_tmp_v AS "
            "SELECT 1 AS x FROM range(1)"
        )
        ddl = fetch_view_ddl(spark, "", "cli_tmp_v")
        assert "range" in ddl
        spark.catalog.dropTempView("cli_tmp_v")

    def test_missing_view_raises(self, spark):
        with pytest.raises(RuntimeError, match="Could not fetch DDL"):
            fetch_view_ddl(spark, "", "definitely_not_a_view_xyz")


class TestMainEndToEnd:
    def test_household_diagram_shape(self, household_catalog, tmp_path):
        out = tmp_path / "nested" / "deps.mmd"
        main([str(out)])
        text = out.read_text()

        assert text.startswith("graph LR")
        for t in TABLES:
            assert f"{DB}.{t}:::chTable" in text
        for v in ("v_car_inventory", "v_pet_ownership", "v_human_profile"):
            assert f"{DB}.{v}:::chView" in text
        for dep, view in EXPECTED_EDGES:
            assert f"{DB}.{dep} -.-> {DB}.{view}" in text

    def test_errors_isolated_per_view(self, household_catalog, tmp_path):
        """A view whose DDL can't be parsed must not sink the run
        (reference :356-358 keeps going and records the error)."""
        from clickhouse_objects_analysis_spark.cli import views_to_payload

        views = [
            (DB, "v_pet_ownership", "VIEW"),
            (DB, "no_such_view_at_all", "VIEW"),
        ]
        payload = views_to_payload(household_catalog, views)
        assert payload["view_dependencies"][f"{DB}.v_pet_ownership"] == [
            f"{DB}.pet"
        ]
        assert f"{DB}.no_such_view_at_all" in payload["errors"]

    def test_write_edges_opt_in(self, spark, tmp_path, monkeypatch):
        """VIEW_DEPS_WRITE_EDGES surfaces MV TO destinations as distinct
        '==>' edges in the payload and the rendered diagram (the
        reference-visitor-parity opt-in); default payload is unchanged."""
        import clickhouse_objects_analysis_spark.cli as cli_mod
        from clickhouse_objects_analysis_spark.plans.mermaid import (
            json_to_mermaid,
        )

        mv_ddl = (
            "CREATE MATERIALIZED VIEW wdb.mv_agg TO wdb.dst "
            "ENGINE = SummingMergeTree() ORDER BY k AS "
            "SELECT k, count() AS c FROM wdb.src GROUP BY k"
        )
        monkeypatch.setattr(
            cli_mod, "fetch_view_ddl", lambda _s, _db, _n: mv_ddl
        )
        views = [("wdb", "mv_agg", "MaterializedView")]
        plain = cli_mod.views_to_payload(spark, views)
        assert "write_dependencies" not in plain
        assert plain["view_dependencies"]["wdb.mv_agg"] == ["wdb.src"]

        payload = cli_mod.views_to_payload(
            spark, views, include_write_edges=True
        )
        assert payload["view_dependencies"]["wdb.mv_agg"] == ["wdb.src"]
        assert payload["write_dependencies"]["wdb.mv_agg"] == ["wdb.dst"]
        mermaid = json_to_mermaid(payload, {"wdb.dst", "wdb.src"})
        assert "wdb.src -.-> wdb.mv_agg" in mermaid
        assert "wdb.mv_agg ==> wdb.dst" in mermaid
