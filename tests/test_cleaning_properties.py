"""Property tests (SURVEY.md §5): the cleaning grammar must be total —
any string input yields NULL or a value, never a crash (Spark 4 ANSI mode
makes this easy to get wrong: plain casts THROW on malformed input).

Hypothesis drives a single-column DataFrame through the full F1–F5
expression stack per batch of generated strings."""

from __future__ import annotations

import datetime
import re

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from occupation_wage_etl_spark.functions import cleaning

# text-ish strategy biased toward the dirty-cell grammar
dirty_cells = st.one_of(
    st.text(max_size=20),
    st.from_regex(r"\(\d{1,2}\)-", fullmatch=True),  # suppressed
    st.from_regex(r"\(\d?\)\$?[\d,]{1,12}(\.\d{1,3})?", fullmatch=True),
    st.from_regex(r"\d{1,2}/\d{4}", fullmatch=True),  # month-year-ish
    st.just(""),
    st.none(),
)


@pytest.fixture(scope="module")
def cell_runner(spark):
    def run(values, expr_fn):
        df = spark.createDataFrame([(v,) for v in values], "x string")
        return [r["y"] for r in df.select(expr_fn(F.col("x")).alias("y")).collect()]

    return run


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(dirty_cells, min_size=1, max_size=20))
def test_to_double_total(cell_runner, values):
    out = cell_runner(values, cleaning.to_double)
    for v, o in zip(values, out):
        assert o is None or isinstance(o, float)
        if v is not None and re.fullmatch(r"\(\d+\)-", v):
            assert o is None  # suppressed ⇒ NULL always


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(dirty_cells, min_size=1, max_size=20))
def test_to_long_total(cell_runner, values):
    out = cell_runner(values, cleaning.to_long)
    for o in out:
        assert o is None or isinstance(o, int)


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(dirty_cells, min_size=1, max_size=20))
def test_parse_month_year_total(cell_runner, values):
    out = cell_runner(values, cleaning.parse_month_year)
    for v, o in zip(values, out):
        assert o is None or isinstance(o, datetime.date)
        if o is not None:
            assert o.day == 1  # always month-start
            assert v is not None and re.fullmatch(r"(0[1-9]|1[0-2])/\d{4}", v)


def test_reference_examples_exact(cell_runner):
    """The FIXTURES.md §1 grammar, value-exact."""
    vals = ["()2,091,480", "(2)12,340", "(8)-", "()$26.61", "()$55,350", "(5)-", "x", None]
    assert cell_runner(vals, cleaning.to_double) == [
        2091480.0, 12340.0, None, 26.61, 55350.0, None, None, None,
    ]
    assert cell_runner(vals, cleaning.to_long) == [
        2091480, 12340, None, 26, 55350, None, None, None,
    ]


def test_int_cast_via_float(cell_runner):
    """Reference routes ints through to_numeric (float) first: '1234.0'
    must become 1234, not NULL (load_data.py:129-130)."""
    assert cell_runner(["1234.0", "()1,234.0"], cleaning.to_long) == [1234, 1234]


def test_column_name_rules():
    # P1 (load_data.py:92-103)
    assert cleaning.clean_oews_column_name("Employment(1)") == "employment"
    assert (
        cleaning.clean_oews_column_name("Employment percent relative standard error(3)")
        == "employment_percent_relative_std_error"
    )
    assert (
        cleaning.clean_oews_column_name("Occupation (SOC code)")
        == "occupation_soc_code"  # 'occupation' keeps its parenthetical
    )
    assert cleaning.clean_oews_column_name("Employment per 1,000 jobs()") == "employment_per_1000_jobs"
    # P2 (load_data.py:224-230)
    assert cleaning.clean_onet_column_name("O*NET-SOC Code") == "onet_soc_code"
    assert cleaning.clean_onet_column_name("Lower CI Bound") == "lower_ci_bound"
