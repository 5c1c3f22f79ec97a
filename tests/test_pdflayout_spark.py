"""Spark-side integration of the PDF layout pass: the driver queries
pdf_layout / pdf_layout_boxes against their DuckDB oracles at sf0.001
(the same comparison the driver's correctness gate runs at sf0.01),
plus plan-shape checks on the boxes operator.
"""

import importlib.util
import os

import duckdb
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def entry():
    spec = importlib.util.spec_from_file_location(
        "spark_entry_for_layout_tests",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "__spark_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _oracle(entry, name):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')")
    return con.execute(entry.oracle_sql()[name]).df()


def _compare(spark_df, oracle_df):
    got = spark_df.toPandas()
    cols = sorted(oracle_df.columns)
    assert sorted(got.columns) == cols
    g = sorted(map(repr, got[cols].itertuples(index=False, name=None)))
    o = sorted(map(repr, oracle_df[cols].itertuples(index=False, name=None)))
    assert len(g) == len(o)
    assert g == o


def test_pdf_layout_matches_oracle(spark, entry):
    _compare(entry.q_pdf_layout(spark, SF_DIR), _oracle(entry, "pdf_layout"))


def test_pdf_layout_boxes_match_oracle(spark, entry):
    _compare(entry.q_pdf_layout_boxes(spark, SF_DIR),
             _oracle(entry, "pdf_layout_boxes"))


def test_boxes_plan_is_arrow_not_rowudf(spark, entry):
    """The layout operator must ride mapInPandas (Arrow batches), with
    no row-at-a-time BatchEvalPython in the plan."""
    import io
    from contextlib import redirect_stdout
    buf = io.StringIO()
    with redirect_stdout(buf):
        entry.q_pdf_layout_boxes(spark, SF_DIR).explain("formatted")
    plan = buf.getvalue()
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan
