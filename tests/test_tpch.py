"""TPC-H-shaped workload correctness: every query in benchmarks/tpch.py runs
through the SQL engine on generated data and the ones with numpy oracles are
value-checked. Guards the query shapes the 4-row slt fixtures can't: long
join chains (Q5), disjunctive multi-clause join predicates (Q19), CASE
aggregation over joins (Q12), LIKE ratio aggregates (Q14)."""

import numpy as np
import pytest

import sqlrs_tpu
from benchmarks import tpch


@pytest.fixture(scope="module")
def db_data():
    db = sqlrs_tpu.Database()
    data = tpch.gen_data(db, 5_000, seed=3)
    return db, data


@pytest.mark.parametrize("name", ["Q1", "Q3", "Q5", "Q6", "Q10", "Q12", "Q14", "Q19"])
def test_tpch_runs(db_data, name):
    db, _ = db_data
    lines = db.run_lines(getattr(tpch, name))
    assert isinstance(lines, list)
    if name in ("Q6", "Q14", "Q19"):
        assert len(lines) == 1
    elif name in ("Q3",):
        assert len(lines) <= 10
    elif name in ("Q10",):
        assert len(lines) <= 20


def test_q6_oracle(db_data):
    db, data = db_data
    got = float(db.run_lines(tpch.Q6)[0])
    exp = tpch.check_q6(data)
    assert abs(got - exp) < 1e-6 * max(abs(exp), 1)


def test_q14_oracle(db_data):
    db, data = db_data
    got = float(db.run_lines(tpch.Q14)[0])
    exp = tpch.check_q14(data)
    assert abs(got - exp) < 1e-9 * max(abs(exp), 1)


def test_q19_oracle(db_data):
    db, data = db_data
    got = float(db.run_lines(tpch.Q19)[0])
    exp = tpch.check_q19(data)
    assert abs(got - exp) < 1e-9 * max(abs(exp), 1)


def test_q5_oracle(db_data):
    db, data = db_data
    got = [ln.split() for ln in db.run_lines(tpch.Q5)]
    exp = tpch.check_q5(data)
    assert len(got) == len(exp)
    for (gn, gv), (en, ev) in zip(got, exp):
        assert gn == en
        assert abs(float(gv) - ev) < 1e-6 * max(abs(ev), 1)


def test_q1_oracle(db_data):
    db, data = db_data
    from sqlrs_tpu.types.values import date_str_to_days

    cut = date_str_to_days("1998-09-02")
    m = data["l_ship"] <= cut
    flag, status = data["l_flag"][m].astype(str), data["l_status"][m].astype(str)
    qty, price, disc = data["l_qty"][m], data["l_price"][m], data["l_disc"][m]
    lines = db.run_lines(tpch.Q1)
    seen = set()
    for ln in lines:
        f, s, sq, sp, srev, aq, ap, ad, cnt = ln.split()
        grp = (flag == f) & (status == s)
        seen.add((f, s))
        assert int(cnt) == int(grp.sum())
        assert abs(float(sq) - qty[grp].sum()) < 1e-9 * max(qty[grp].sum(), 1)
        exp_rev = (price[grp] * (1 - disc[grp])).sum()
        assert abs(float(srev) - exp_rev) < 1e-6 * max(abs(exp_rev), 1)
        assert abs(float(aq) - qty[grp].mean()) < 1e-9 * max(qty[grp].mean(), 1)
    assert seen == set(zip(flag, status))
