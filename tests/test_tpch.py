"""TPC-H correctness: queries run through the SQL engine on dbgen-faithful
generated data (benchmarks/tpch_dbgen.py) and are value-checked against
independent pandas oracles (benchmarks/tpch_oracle.py).

Fast tier: a representative subset exercising the round-2 SQL surface
(EXISTS, IN-subquery, correlated scalar, view, NOT IN, substring).
Slow tier: the complete 22-query suite.
"""

import pytest

import sqlrs_tpu
from benchmarks import tpch, tpch_dbgen, tpch_oracle

SF = 0.002


@pytest.fixture(scope="module")
def db_tables():
    tables = tpch_dbgen.gen_tables(SF, seed=3)
    db = sqlrs_tpu.Database()
    tpch_dbgen.load_into(db, tables)
    return db, tables


def _check(db, tables, qn):
    got = tpch.run_query(db, qn)
    exp = tpch_oracle.ORACLES[qn](tables)
    issues = tpch.compare(got, exp, qn)
    assert not issues, issues[:5]


# the fast tier covers every round-2 SQL-surface feature:
# Q4 EXISTS, Q6 filter-agg, Q13 left-join residual + nested agg,
# Q15 view, Q16 NOT IN + count(distinct), Q17 correlated scalar,
# Q18 IN + having, Q22 substring + NOT EXISTS + scalar subquery
FAST = [4, 6, 13, 15, 16, 17, 18, 22]


@pytest.mark.parametrize("qn", FAST)
def test_tpch_fast(db_tables, qn):
    db, tables = db_tables
    _check(db, tables, qn)


@pytest.mark.slow
@pytest.mark.parametrize("qn", [q for q in range(1, 23) if q not in FAST])
def test_tpch_full(db_tables, qn):
    db, tables = db_tables
    _check(db, tables, qn)


@pytest.fixture(scope="module")
def dist_db_tables():
    tables = tpch_dbgen.gen_tables(SF, seed=3)
    db = sqlrs_tpu.Database(n_devices=8)
    tpch_dbgen.load_into(db, tables)
    return db, tables


# distributed tier: ALL 22 queries through Database(n_devices=8) must be
# bit-identical to the oracles (and hence to the single-device engine);
# covers sharded scan/filter/agg, the broadcast dist join, the distributed
# mark join, and the materialize-and-delegate seam
@pytest.mark.slow
@pytest.mark.parametrize("qn", list(range(1, 23)))
def test_tpch_distributed(dist_db_tables, qn):
    db, tables = dist_db_tables
    _check(db, tables, qn)


@pytest.fixture(scope="module")
def dist_shuffle_db_tables():
    """Forced shuffle-join policy: every eligible inner join repartitions
    both sides (parallel/dist_join.py) instead of replicating the build
    side — the strategy large-large joins (Q9/Q21 at scale) need."""
    tables = tpch_dbgen.gen_tables(SF, seed=3)
    db = sqlrs_tpu.Database(n_devices=8)
    db.dist_join_policy = "shuffle"
    tpch_dbgen.load_into(db, tables)
    return db, tables


@pytest.mark.slow
@pytest.mark.parametrize("qn", [5, 9, 21])
def test_tpch_distributed_shuffle_join(dist_shuffle_db_tables, qn):
    """The replicate-heavy join queries run with the shuffle-repartition
    strategy selected and stay bit-exact (VERDICT round-2 item 3)."""
    db, tables = dist_shuffle_db_tables
    _check(db, tables, qn)
    strategies = getattr(db, "last_join_strategies", [])
    assert any(s in ("shuffle", "salted") for s in strategies), strategies


@pytest.fixture(scope="module")
def db_tables_sf05():
    """SF 0.05: the smallest scale at which Q18's route has a non-empty
    semi-filtered dim side (BASELINE.md round 4)."""
    tables = tpch_dbgen.gen_tables(0.05, seed=3)
    db = sqlrs_tpu.Database()
    tpch_dbgen.load_into(db, tables)
    return db, tables


@pytest.mark.parametrize("qn", [3, 18])
def test_tpch_flagship_queries_route(db_tables_sf05, qn):
    """Round-4 VERDICT item 4: pin the REAL Q3/Q18 routing — a planner
    change that un-routes either flagship query fails here. Runs the
    actual query texts at SF 0.05 and asserts both the fused-route tag
    AND oracle equality."""
    db, tables = db_tables_sf05
    db.last_fused_routes = []
    got = tpch.run_query(db, qn)
    assert any(
        r.startswith("agg_join_firstapp") for r in db.last_fused_routes
    ), (qn, db.last_fused_routes)
    exp = tpch_oracle.ORACLES[qn](tables)
    issues = tpch.compare(got, exp, qn)
    assert not issues, issues[:5]
