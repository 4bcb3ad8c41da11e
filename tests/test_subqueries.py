"""Subquery SQL surface: EXISTS / NOT EXISTS / IN / NOT IN (null-aware),
correlated scalar subqueries (decorrelated to grouped right joins), views,
CTEs, substring/concat — the TPC-H Q2/Q4/Q15/Q16/Q17/Q18/Q20/Q21/Q22 shapes.

The reference binds only FROM-alias and uncorrelated scalar subqueries
(reference src/binder/table/subquery.rs:84-140); this surface extends it.
"""

import numpy as np
import pytest

import sqlrs_tpu


@pytest.fixture()
def db():
    d = sqlrs_tpu.Database()
    d.run("create table o(okey int, ckey int, prio varchar)")
    d.run("insert into o values (1,1,'HI'),(2,1,'LO'),(3,2,'HI'),(4,3,'LO')")
    d.run("create table l(okey int, qty int)")
    d.run("insert into l values (1,5),(1,7),(2,1),(4,9)")
    return d


def test_exists_correlated(db):
    got = db.run_lines(
        "select okey from o where exists "
        "(select * from l where l.okey = o.okey and l.qty > 4)"
    )
    assert got == ["1", "4"]


def test_not_exists(db):
    got = db.run_lines(
        "select okey from o where not exists (select * from l where l.okey = o.okey)"
    )
    assert got == ["3"]


def test_in_subquery(db):
    got = db.run_lines(
        "select okey from o where okey in (select okey from l where qty > 2)"
    )
    assert got == ["1", "4"]


def test_not_in_subquery(db):
    got = db.run_lines(
        "select okey from o where okey not in (select okey from l)"
    )
    assert got == ["3"]


def test_not_in_null_aware(db):
    # any NULL on the inner side makes NOT IN unprovable for every row
    db.run("insert into l values (null, 2)")
    got = db.run_lines(
        "select okey from o where okey not in (select okey from l)"
    )
    assert got == []


def test_not_in_empty_inner(db):
    got = db.run_lines(
        "select okey from o where okey not in (select okey from l where qty > 100)"
    )
    assert got == ["1", "2", "3", "4"]


def test_in_grouped_having_inner(db):
    # Q18 shape: IN over an aggregated/HAVING subquery
    got = db.run_lines(
        "select okey from o where okey in "
        "(select okey from l group by okey having sum(qty) > 10)"
    )
    assert got == ["1"]


def test_exists_with_inequality_residual(db):
    # Q21 shape: equality + non-equality correlation
    db.run("create table li(pk int, sk int, qty int)")
    db.run("insert into li values (1,10,4),(1,10,6),(1,20,20),(2,10,10),(3,30,2)")
    got = db.run_lines(
        "select pk, sk from li l1 where exists "
        "(select * from li l2 where l2.pk = l1.pk and l2.sk <> l1.sk)"
    )
    assert got == ["1 10", "1 10", "1 20"]


def test_correlated_scalar_single_key(db):
    # Q17 shape: per-partkey avg threshold
    db.run("create table li(pk int, sk int, qty int)")
    db.run("insert into li values (1,10,4),(1,10,6),(1,20,20),(2,10,10),(3,30,2)")
    got = db.run_lines(
        "select sum(qty) from li where qty < "
        "(select 0.5 * avg(qty) from li l2 where l2.pk = li.pk)"
    )
    assert got == ["4"]


def test_correlated_scalar_two_keys(db):
    # Q20 shape: correlation on two columns
    db.run("create table li(pk int, sk int, qty int)")
    db.run("insert into li values (1,10,4),(1,10,6),(1,20,20),(2,10,10),(3,30,2)")
    got = db.run_lines(
        "select pk, sk from li l0 where qty > "
        "(select 0.5*sum(qty) from li l2 where l2.pk = l0.pk and l2.sk = l0.sk) "
        "and qty > 4"
    )
    assert got == ["1 10", "1 20", "2 10"]


def test_correlated_scalar_empty_group_is_null(db):
    # a group with no inner rows yields NULL -> comparison is unknown -> drop
    got = db.run_lines(
        "select okey from o where okey <= "
        "(select sum(qty) from l where l.okey = o.okey)"
    )
    # okey 3 has no l rows (NULL sum); 1<=12 yes, 2<=1 no, 4<=9 yes
    assert got == ["1", "4"]


def test_scalar_subquery_in_having(db):
    # Q11 shape: HAVING compares against an uncorrelated scalar subquery
    got = db.run_lines(
        "select ckey, sum(okey) from o group by ckey "
        "having sum(okey) > (select 0.8 * max(okey) from o)"
    )
    # threshold 0.8*4 = 3.2: sums are 3 (ckey1), 3 (ckey2), 4 (ckey3)
    assert got == ["3 4"]


def test_view_lifecycle(db):
    db.run("create view v1 (a, total) as select okey, sum(qty) from l group by okey")
    got = db.run_lines("select a, total from v1 where total = (select max(total) from v1)")
    assert got == ["1 12"]
    db.run("drop view v1")
    with pytest.raises(Exception):
        db.run("select * from v1")
    db.run("drop view if exists v1")  # no error


def test_cte(db):
    got = db.run_lines(
        "with rev (a, t) as (select okey, sum(qty) from l group by okey) "
        "select a from rev where t > 8 order by a"
    )
    assert got == ["1", "4"]


def test_substring_and_concat(db):
    got = db.run_lines(
        "select substring(prio from 1 for 1), prio || '!' from o order by okey"
    )
    assert got == ["H HI!", "L LO!", "H HI!", "L LO!"]


def test_substring_in_list(db):
    # Q22 shape
    got = db.run_lines(
        "select count(*) from o where substring(prio from 1 for 1) in ('H')"
    )
    assert got == ["2"]


def test_comma_join_becomes_hash_join(db):
    # plan shape: Filter(CrossJoin) with an equality must lower to a hash
    # join, preserving cross-join (left-major) emission order
    got = db.run_lines(
        "select o.okey, l.qty from o, l where o.okey = l.okey"
    )
    assert got == ["1 5", "1 7", "2 1", "4 9"]
    plan = db.explain("select o.okey from o, l where o.okey = l.okey")
    opt = plan.split("=== optimized_logical_plan ===")[1]
    assert "Join(inner" in opt and "CrossJoin" not in opt


def test_comma_join_oracle_random():
    rng = np.random.default_rng(7)
    from sqlrs_tpu.types import LogicalType as LT

    d = sqlrs_tpu.Database()
    a = rng.integers(0, 20, 200)
    b = rng.integers(0, 20, 150)
    v = rng.integers(-50, 50, 150)
    d.create_memory_table_numpy("ta", [("k", LT.BIGINT)], [a])
    d.create_memory_table_numpy("tb", [("k", LT.BIGINT), ("v", LT.BIGINT)], [b, v])
    got = d.run_lines(
        "select sum(tb.v) from ta, tb where ta.k = tb.k and tb.v > 0"
    )
    m = v > 0
    counts = np.bincount(a, minlength=20)
    exp = sum(int(v[i]) * counts[b[i]] for i in range(150) if m[i])
    assert got == [str(exp)]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_semi_anti_randomized_differential(seed):
    """Randomized EXISTS/NOT EXISTS/IN/NOT IN against numpy oracles,
    including NULL keys on both sides."""
    from sqlrs_tpu.types import LogicalType as LT

    rng = np.random.default_rng(seed)
    n_o, n_i = 300, 200
    o_k = rng.integers(0, 40, n_o)
    i_k = rng.integers(0, 40, n_i)
    o_null = rng.random(n_o) < 0.1
    i_null = rng.random(n_i) < 0.05
    db = sqlrs_tpu.Database()
    db.run("create table outer_t(k int, pos int)")
    db.run("create table inner_t(k int)")
    rows = ",".join(
        f"({'null' if o_null[i] else int(o_k[i])},{i})" for i in range(n_o)
    )
    db.run(f"insert into outer_t values {rows}")
    rows = ",".join(
        f"({'null' if i_null[i] else int(i_k[i])})" for i in range(n_i)
    )
    db.run(f"insert into inner_t values {rows}")

    inner_set = set(i_k[~i_null].tolist())
    inner_has_null = bool(i_null.any())

    got = db.run_lines(
        "select pos from outer_t where k in (select k from inner_t)")
    exp = [str(i) for i in range(n_o) if not o_null[i] and o_k[i] in inner_set]
    assert got == exp

    got = db.run_lines(
        "select pos from outer_t where k not in (select k from inner_t)")
    if inner_has_null:
        exp = []
    else:
        exp = [str(i) for i in range(n_o)
               if not o_null[i] and o_k[i] not in inner_set]
    assert got == exp

    got = db.run_lines(
        "select pos from outer_t o where exists "
        "(select * from inner_t i where i.k = o.k)")
    exp = [str(i) for i in range(n_o) if not o_null[i] and o_k[i] in inner_set]
    assert got == exp

    got = db.run_lines(
        "select pos from outer_t o where not exists "
        "(select * from inner_t i where i.k = o.k)")
    exp = [str(i) for i in range(n_o)
           if o_null[i] or o_k[i] not in inner_set]
    assert got == exp


def test_uncorrelated_exists(db):
    # uncorrelated EXISTS / NOT EXISTS: no equi keys at all
    assert db.run_lines(
        "select okey from o where exists (select 1 from l)"
    ) == ["1", "2", "3", "4"]
    assert db.run_lines(
        "select okey from o where not exists (select 1 from l)"
    ) == []
    assert db.run_lines(
        "select okey from o where exists (select 1 from l where qty > 100)"
    ) == []
    assert db.run_lines(
        "select okey from o where not exists (select 1 from l where qty > 100)"
    ) == ["1", "2", "3", "4"]


def test_correlated_not_in_three_valued():
    """Correlated NOT IN: NULL handling is per correlated GROUP, not global
    (x NOT IN S(l) with S(l) empty is TRUE even for NULL x; a NULL value in
    one group must not empty other groups)."""
    db = sqlrs_tpu.Database()
    db.run("create table t1(x int, k int)")
    db.run("create table t2(y int, k int)")
    db.run("insert into t1 values (1,1),(3,1),(10,1),(3,2),(7,9)")
    db.run("insert into t2 values (10,1),(11,1),(3,2),(null,2)")
    # k=1 group: {10,11} -> 1,3 kept, 10 dropped; k=2 group: {3,NULL} -> 3
    # dropped (matched); k=9 group empty -> 7 kept
    assert db.run_lines(
        "select x from t1 where x not in (select y from t2 where t2.k = t1.k)"
    ) == ["1", "3", "7"]
    # NULL probe: empty correlated group keeps the row, non-empty drops it
    db.run("insert into t1 values (null, 1), (null, 9)")
    assert db.run_lines(
        "select k from t1 where x not in (select y from t2 where t2.k = t1.k)"
    ) == ["1", "1", "9", "9"]
    # a NULL y inside the matching group makes that group's rows UNKNOWN
    assert db.run_lines(
        "select x from t1 where k = 2 and "
        "x not in (select y from t2 where t2.k = t1.k and y is not null)"
    ) == []  # 3 matches {3}
    db.run("insert into t1 values (99, 2)")
    assert db.run_lines(
        "select x from t1 where k = 2 and "
        "x not in (select y from t2 where t2.k = t1.k)"
    ) == []  # group {3, NULL}: 3 matched, 99 unknown


def test_correlated_not_in_oracle():
    """Randomized correlated NOT IN vs a row-at-a-time oracle."""
    rng = np.random.default_rng(11)
    n1, n2 = 120, 90
    x = rng.integers(0, 8, n1)
    k1 = rng.integers(0, 5, n1)
    xn = rng.random(n1) < 0.15
    y = rng.integers(0, 8, n2)
    k2 = rng.integers(0, 5, n2)
    yn = rng.random(n2) < 0.1
    db = sqlrs_tpu.Database()
    db.run("create table t1(x int, k int, pos int)")
    db.run("create table t2(y int, k int)")
    db.run("insert into t1 values " + ",".join(
        f"({'null' if xn[i] else int(x[i])},{int(k1[i])},{i})" for i in range(n1)))
    db.run("insert into t2 values " + ",".join(
        f"({'null' if yn[i] else int(y[i])},{int(k2[i])})" for i in range(n2)))
    exp = []
    for i in range(n1):
        group = [(None if yn[j] else int(y[j])) for j in range(n2) if k2[j] == k1[i]]
        if not group:
            exp.append(str(i))  # NOT IN over empty set is TRUE
            continue
        if xn[i] or None in group:
            continue  # UNKNOWN
        if int(x[i]) not in group:
            exp.append(str(i))
    got = db.run_lines(
        "select pos from t1 where x not in (select y from t2 where t2.k = t1.k)")
    assert got == exp


def test_view_does_not_capture_use_site_cte():
    db = sqlrs_tpu.Database()
    db.run("create table base(a int)")
    db.run("insert into base values (1),(2)")
    db.run("create view v as select a from base")
    # the use site's CTE named `base` must NOT leak into the view body
    assert db.run_lines(
        "with base(a) as (select 99) select a from v order by a"
    ) == ["1", "2"]
    # but the CTE itself still resolves where referenced directly
    assert db.run_lines(
        "with base(a) as (select 99) select a from base"
    ) == ["99"]


def test_correlation_edge_cases():
    """Combined/nested correlation shapes beyond the TPC-H set."""
    db = sqlrs_tpu.Database()
    db.run("create table a(x int, y int)")
    db.run("insert into a values (1,10),(2,20),(3,30)")
    db.run("create table b(x int, z int)")
    db.run("insert into b values (1,5),(1,6),(2,100),(3,1)")
    # correlated scalar + EXISTS in one WHERE
    assert db.run_lines(
        "select x from a where y > (select sum(z) from b where b.x = a.x) "
        "and exists (select * from b where b.x = a.x and z < 10)"
    ) == ["3"]
    # two-level nested correlation (inner correlates to the middle scope)
    assert db.run_lines(
        "select x from a where exists (select * from b where b.x = a.x and "
        "b.z > (select avg(z) from b b2 where b2.x = b.x))"
    ) == ["1"]
    # EXISTS whose subquery holds an uncorrelated scalar subquery
    assert db.run_lines(
        "select x from a where exists (select * from b where b.x = a.x and "
        "z > (select min(z) from b))"
    ) == ["1", "2"]
    # IN over an expression with correlation in the inner WHERE
    assert db.run_lines(
        "select x from a where y in (select z * 2 from b where b.x = a.x)"
    ) == ["1"]


def test_factor_or_common_plan_shape():
    """Q19 shape: the join equality repeated inside every OR disjunct must
    still produce an inner join (OR-common factoring)."""
    db = sqlrs_tpu.Database()
    db.run("create table f(k int, q int)")
    db.run("create table d(k int, size int)")
    db.run("insert into f values (1,5),(2,15)")
    db.run("insert into d values (1,3),(2,8)")
    sql = ("select count(*) from f, d where "
           "(f.k = d.k and q < 10 and size < 5) or (f.k = d.k and q >= 10 and size >= 5)")
    assert db.run_lines(sql) == ["2"]
    opt = db.explain(sql).split("=== optimized_logical_plan ===")[1]
    assert "Join(inner" in opt and "CrossJoin" not in opt
