import pytest

import sqlrs_tpu  # noqa: F401  (jax config)
from sqlrs_tpu.errors import TypeError_
from sqlrs_tpu.types import (
    LogicalType as LT,
    ScalarValue,
    can_implicit_cast,
    implicit_cast_cost,
    max_logical_type,
)
from sqlrs_tpu.types.values import civil_from_days, date_str_to_days, days_from_civil


def test_max_logical_type_numeric_widening():
    assert max_logical_type(LT.INTEGER, LT.BIGINT) == LT.BIGINT
    assert max_logical_type(LT.INTEGER, LT.DOUBLE) == LT.DOUBLE
    assert max_logical_type(LT.FLOAT, LT.DOUBLE) == LT.DOUBLE
    assert max_logical_type(LT.TINYINT, LT.SMALLINT) == LT.SMALLINT


def test_max_logical_type_null_casts_to_anything():
    assert max_logical_type(LT.SQLNULL, LT.VARCHAR) == LT.VARCHAR
    assert max_logical_type(LT.DATE, LT.SQLNULL) == LT.DATE


def test_max_logical_type_signed_unsigned_upcast():
    # same-width signed/unsigned upcasts to the next wider signed type
    # (reference src/types_v2/types.rs:117-133)
    assert max_logical_type(LT.INTEGER, LT.UINTEGER) == LT.BIGINT
    assert max_logical_type(LT.SMALLINT, LT.USMALLINT) == LT.INTEGER
    assert max_logical_type(LT.TINYINT, LT.UTINYINT) == LT.SMALLINT
    assert max_logical_type(LT.BIGINT, LT.UBIGINT) == LT.DOUBLE


def test_max_logical_type_incomparable_raises():
    # what makes `select 'abc' > 10` a bind error
    with pytest.raises(TypeError_):
        max_logical_type(LT.VARCHAR, LT.INTEGER)
    with pytest.raises(TypeError_):
        max_logical_type(LT.DOUBLE, LT.VARCHAR)
    with pytest.raises(TypeError_):
        max_logical_type(LT.BOOLEAN, LT.INTEGER)


def test_implicit_cast_rules():
    assert can_implicit_cast(LT.UTINYINT, LT.SMALLINT)
    assert not can_implicit_cast(LT.DOUBLE, LT.FLOAT)
    assert not can_implicit_cast(LT.VARCHAR, LT.INTEGER)
    assert can_implicit_cast(LT.SQLNULL, LT.DATE)
    assert implicit_cast_cost(LT.INTEGER, LT.INTEGER) == 0
    assert implicit_cast_cost(LT.INTEGER, LT.BIGINT) == 1
    assert implicit_cast_cost(LT.BIGINT, LT.INTEGER) == -1


def test_integer_literal_typing_i32_first():
    assert ScalarValue.integer_literal(5).type == LT.INTEGER
    assert ScalarValue.integer_literal(2**40).type == LT.BIGINT


def test_cast_overflow_raises():
    v = ScalarValue.integer_literal(1481)
    with pytest.raises(TypeError_):
        v.cast_to(LT.UTINYINT)
    assert v.cast_to(LT.UTINYINT, safe=True).is_null


def test_civil_date_roundtrip():
    for s, days in [("1970-01-01", 0), ("1970-01-02", 1), ("1969-12-31", -1)]:
        assert date_str_to_days(s) == days
    for y, m, d in [(1998, 12, 1), (2021, 1, 2), (2000, 2, 29), (1900, 3, 1)]:
        assert civil_from_days(days_from_civil(y, m, d)) == (y, m, d)


def test_render_scalar():
    from sqlrs_tpu.utils.render import render_scalar

    assert str(ScalarValue.null()) == "NULL"
    assert render_scalar(ScalarValue.boolean(True)) == "true"
    assert render_scalar(ScalarValue.varchar("")) == "(empty)"
    assert render_scalar(ScalarValue.double(2.3)) == "2.3"
    assert render_scalar(ScalarValue.double(1100.2)) == "1100.2"
    assert render_scalar(ScalarValue.double(2.0)) == "2"
    assert render_scalar(ScalarValue(LT.FLOAT, 5.099999904632568)) == "5.1"
    assert render_scalar(ScalarValue.date_from_string("2021-01-03")) == "2021-01-03"
