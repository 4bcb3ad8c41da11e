"""Binder semantics tests (reference src/binder/mod.rs:78-293 inline tests:
ambiguity checks, join trees, alias handling; v2 bind_context behavior)."""

import pytest

import sqlrs_tpu
from sqlrs_tpu.binder.binder import Binder
from sqlrs_tpu.binder.expression import BoundColumnRef, BoundComparison
from sqlrs_tpu.errors import BinderError
from sqlrs_tpu.parser import parse_one
from sqlrs_tpu.plan import logical as L
from sqlrs_tpu.types import LogicalType as LT


@pytest.fixture()
def db():
    d = sqlrs_tpu.Database()
    d.run("create table t1(a int, b int, c int)")
    d.run("create table t2(a int, d int)")
    return d


def bind(db, sql):
    return Binder(db).bind(parse_one(sql))


def test_unqualified_ambiguous_column(db):
    with pytest.raises(BinderError, match="ambiguous"):
        bind(db, "select a from t1, t2")


def test_qualified_resolution(db):
    b = bind(db, "select t1.a, t2.a from t1, t2")
    assert b.names == ["a", "a"]
    assert b.types == [LT.INTEGER, LT.INTEGER]


def test_unknown_column_and_table(db):
    with pytest.raises(BinderError, match="not found"):
        bind(db, "select zzz from t1")
    with pytest.raises(BinderError, match="does not exist"):
        bind(db, "select * from zzz")


def test_join_tree_left_deep_with_key_extraction(db):
    b = bind(db, "select t1.a from t1 inner join t2 on t1.a=t2.a and t1.b > t2.d")
    joins = _find(b.plan, L.LogicalJoin)
    assert len(joins) == 1
    j = joins[0]
    assert len(j.on) == 1  # equi key extracted
    assert j.filter is not None  # residual non-equi kept
    assert isinstance(j.filter, BoundComparison)


def test_join_key_sides_normalized(db):
    # condition written right=left still normalizes to (left expr, right expr)
    b = bind(db, "select t1.a from t1 inner join t2 on t2.a=t1.a")
    j = _find(b.plan, L.LogicalJoin)[0]
    left_tables = {x.table_index for x in j.children[0].output_bindings()}
    assert j.on[0][0].binding.table_index in left_tables


def test_aggregate_rewrite_produces_agg_refs(db):
    b = bind(db, "select b, sum(a) from t1 group by b")
    aggs = _find(b.plan, L.LogicalAggregate)
    assert len(aggs) == 1
    proj = b.plan
    assert isinstance(proj, L.LogicalProjection)
    agg_idx = aggs[0].table_index
    for e in proj.exprs:
        assert isinstance(e, BoundColumnRef)
        assert e.binding.table_index == agg_idx


def test_where_rejects_aggregates(db):
    with pytest.raises(BinderError, match="not allowed in WHERE"):
        bind(db, "select a from t1 where sum(a) > 1")


def test_subquery_requires_alias(db):
    with pytest.raises(BinderError, match="alias"):
        bind(db, "select * from (select * from t1)")


def test_scalar_subquery_becomes_cross_join(db):
    b = bind(db, "select a, (select max(b) from t1) from t1")
    assert _find(b.plan, L.LogicalCrossJoin)


def test_comparison_type_coercion_inserted(db):
    d2 = sqlrs_tpu.Database()
    d2.run("create table x(a int, f double)")
    b = Binder(d2).bind(parse_one("select a > f from x"))
    cmp_expr = b.plan.exprs[0]
    # int side cast up to double
    assert cmp_expr.left.return_type() == LT.DOUBLE
    assert cmp_expr.right.return_type() == LT.DOUBLE


def test_incomparable_types_error(db):
    d2 = sqlrs_tpu.Database()
    d2.run("create table x(a int, s varchar)")
    with pytest.raises(BinderError):
        Binder(d2).bind(parse_one("select a > s from x"))


def test_insert_column_count_mismatch(db):
    with pytest.raises(BinderError, match="target columns"):
        bind(db, "insert into t1(a) values (1, 2)")


def test_values_type_widening(db):
    b = bind(db, "insert into t1(a, b, c) values (1, 2, 3), (null, 5.5, 9)")
    eg = _find(b.plan, L.LogicalExpressionGet)[0]
    assert eg.expr_types[0] == LT.INTEGER  # int + null
    assert eg.expr_types[1] == LT.DOUBLE  # int + double widened


def test_having_binds_above_aggregate(db):
    b = bind(db, "select b, sum(a) from t1 group by b having sum(a) > 10")
    filters = _find(b.plan, L.LogicalFilter)
    aggs = _find(b.plan, L.LogicalAggregate)
    assert filters and aggs
    # the having filter's child is the aggregate
    assert any(isinstance(f.children[0], L.LogicalAggregate) for f in filters)


def _find(plan, cls):
    out = [plan] if isinstance(plan, cls) else []
    for c in plan.children:
        out.extend(_find(c, cls))
    return out
