"""SURVEY.md §2 inventory coverage: every operator ID the survey
declares must be represented in queries() (the driver gate) or in the
named pytest covering it (pipeline-level sinks/sources that have no
query form)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entry_mod

# §2 operator IDs → how they are covered.
QUERY_COVERED = {
    # §2.A
    "scan_csv",
    # §2.B
    "project_prune", "fn_strip_excel", "filter_notnull_date", "cast_date_coerce",
    "null_normalize", "cast_schema", "with_literal",
    # §2.C
    "join_geo", "join_channels", "join_agencies", "join_ttypes", "join_fact_fact",
    # §2.D
    "agg_min_scalar", "agg_min_windowed",
    # §2.E
    "win_row_number", "win_min_partition", "derive_is_new",
    # §2.F
    "sort_asc", "sort_desc", "limit_topk", "union_all", "concat_rows",
    # §2.G
    "fn_coalesce", "fn_case_eq", "fn_alias", "fn_isnotnull", "fn_date_cmp",
    "fn_date_lt_param", "fn_select_star",
    # §2.H
    "merge_time_window", "make_view", "view_retention", "view_transactions",
    "view_auto_optiom",
}

# Pipeline-level operators with no meaningful query form; covered by
# the named test(s).
TEST_COVERED = {
    "scan_excel": "tests/test_cleaning.py::test_xlsx_roundtrip_two_sheets_align_union"
    " / test_xlsx_reader_shared_strings_and_numbers /"
    " test_xlsx_date_styled_cells_convert_to_iso +"
    " tests/test_pipeline.py::test_excel_spec_end_to_end — pure-stdlib"
    " reader (sources/xlsx.py), no openpyxl dependency; also"
    " driver-verified (scan_excel green r2,r3)",
    "sink_csv": "tests/test_pipeline.py::test_run_file_then_incremental_merge (staging write)",
    "load_table": "tests/test_pipeline.py::test_run_file_then_incremental_merge",
    "source_event": "tests/test_pipeline.py::test_streaming_pipeline_available_now",
    "sink_message": "runner completion is synchronous; Pub/Sub out of engine scope (SURVEY §2.A)",
    "sink_error": "tests/test_pipeline.py::test_quarantine_on_bad_input",
    "drop_source": "tests/test_pipeline.py (consumed input removed)",
    "route_source": "tests/test_pipeline.py::test_spec_yaml_roundtrip_and_routing",
    "align_columns": "tests/test_cleaning.py::test_align_columns_union (+ queries() align_union)",
}


def test_every_survey_operator_id_is_covered():
    qs = set(entry_mod.queries())
    missing = QUERY_COVERED - qs
    assert not missing, f"SURVEY §2 ids missing from queries(): {missing}"


def test_alias_ids_share_oracles():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    for alias, impl in [("join_geo", "join_dim_miss"), ("win_min_partition", "agg_min_windowed"),
                        ("union_all", "align_union"), ("concat_rows", "align_union"),
                        ("make_view", "view_retention")]:
        assert qs[alias] is qs[impl] or alias == "make_view"
        assert oracles[alias] == oracles[impl]


def test_excel_adapter_is_stdlib_and_fails_loudly_on_garbage(spark, tmp_path):
    """scan_excel rides the pure-stdlib xlsx reader (sources/xlsx.py) —
    the engine must NOT depend on openpyxl at all, and a corrupt file
    must raise, not silently yield an empty frame."""
    import ast

    import pytest

    from awi_datapipelinepublic_spark.sources import readers, xlsx

    for mod in (readers, xlsx):
        tree = ast.parse(open(mod.__file__).read())
        imported = {
            n.name.split(".")[0]
            for node in ast.walk(tree)
            if isinstance(node, ast.Import)
            for n in node.names
        } | {
            node.module.split(".")[0]
            for node in ast.walk(tree)
            if isinstance(node, ast.ImportFrom) and node.module
        }
        assert "openpyxl" not in imported, f"{mod.__name__} imports openpyxl"

    fake = tmp_path / "ProductionRpt.xlsx"
    fake.write_bytes(b"PK\x03\x04 not really xlsx")
    with pytest.raises(Exception):
        readers.read_excel_sheets(spark, str(fake), ["Prime Production Report"], [])
