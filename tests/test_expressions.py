"""Expression kernel tests: Kleene logic, null propagation, casts, date math
(reference src/executor/array_compute.rs:70-90, evaluator tests, and
conjunction/comparison function impls)."""

import numpy as np
import pytest

import sqlrs_tpu  # noqa: F401
from sqlrs_tpu.data import Column
from sqlrs_tpu.errors import TypeError_
from sqlrs_tpu.ops import elementwise as ew
from sqlrs_tpu.types import Interval, LogicalType as LT, ScalarValue


def col_bool(vals):
    return Column.from_scalars(
        LT.BOOLEAN, [ScalarValue(LT.BOOLEAN, v) for v in vals]
    )


def col_int(vals, t=LT.INTEGER):
    return Column.from_scalars(t, [ScalarValue(t, v) for v in vals])


def as_list(c):
    return c.to_pylist()


# T=True F=False N=NULL — kleene truth tables
def test_kleene_and():
    l = col_bool([True, True, True, False, False, None, None, False, None])
    r = col_bool([True, False, None, False, None, True, None, True, False])
    assert as_list(ew.kleene_and(l, r)) == [
        True, False, None, False, False, None, None, False, False,
    ]


def test_kleene_or():
    l = col_bool([True, True, True, False, False, None, None, False, None])
    r = col_bool([True, False, None, False, None, True, None, True, False])
    assert as_list(ew.kleene_or(l, r)) == [
        True, True, True, False, None, True, None, True, None,
    ]


def test_arithmetic_null_propagation():
    l = col_int([1, None, 3])
    r = col_int([10, 20, None])
    assert as_list(ew.arithmetic("+", LT.INTEGER, l, r)) == [11, None, None]


def test_integer_division_truncates_and_div_zero_null():
    l = col_int([7, -7, 5])
    r = col_int([2, 2, 0])
    assert as_list(ew.arithmetic("/", LT.INTEGER, l, r)) == [3, -3, None]


def test_string_comparison_via_ranks():
    a = Column.from_scalars(LT.VARCHAR, [ScalarValue.varchar(s) for s in ["1000", "abc", "b"]])
    b = Column.from_scalars(LT.VARCHAR, [ScalarValue.varchar(s) for s in ["20", "abd", "b"]])
    assert as_list(ew.compare(">", a, b)) == [False, False, False]
    assert as_list(ew.compare("<=", a, b)) == [True, True, True]
    assert as_list(ew.compare("=", a, b)) == [False, False, True]


def test_cast_narrowing_checked():
    c = col_int([100, 1481], t=LT.INTEGER)
    with pytest.raises(TypeError_):
        ew.cast_column(c, LT.UTINYINT)
    safe = ew.cast_column(c, LT.UTINYINT, safe=True)
    assert as_list(safe) == [100, None]


def test_cast_int_to_varchar_roundtrip():
    c = col_int([1, None, 42], t=LT.BIGINT)
    s = ew.cast_column(c, LT.VARCHAR)
    assert as_list(s) == ["1", None, "42"]


def test_date_plus_interval_day_and_month():
    days = Column.from_scalars(
        LT.DATE, [ScalarValue.date_from_string("2021-01-02")]
    )
    plus_day = ew.date_add_interval(days, Interval(raw_ms=86_400_000), 1)
    from sqlrs_tpu.utils.render import render_value

    assert render_value(LT.DATE, plus_day.to_pylist()[0]) == "2021-01-03"
    # month clamp: jan 31 + 1 month = feb 28
    jan31 = Column.from_scalars(LT.DATE, [ScalarValue.date_from_string("2021-01-31")])
    feb = ew.date_add_interval(jan31, Interval(months=1), 1)
    assert render_value(LT.DATE, feb.to_pylist()[0]) == "2021-02-28"


def test_date_minus_interval_day_reference_quirk():
    # the reference's arrow IntervalDayTime negation: -1 "day" shifts -2 days
    d = Column.from_scalars(LT.DATE, [ScalarValue.date_from_string("1998-12-01")])
    out = ew.date_add_interval(d, Interval(raw_ms=86_400_000), -1)
    from sqlrs_tpu.utils.render import render_value

    assert render_value(LT.DATE, out.to_pylist()[0]) == "1998-11-29"
