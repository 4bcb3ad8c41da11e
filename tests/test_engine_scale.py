"""Scaled randomized correctness: the full SQL engine vs a numpy oracle on
data sizes the 4-row slt fixtures can't exercise (hash chains, many groups,
skew, duplicate join keys)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import sqlrs_tpu
from sqlrs_tpu.data import DeviceBatch, Schema
from sqlrs_tpu.types import LogicalType as LT


@pytest.fixture(scope="module")
def db():
    rng = np.random.default_rng(11)
    n = 20_000
    d = sqlrs_tpu.Database()
    key = rng.integers(0, 500, n)
    val = rng.integers(-1000, 1000, n)
    nullmask = rng.random(n) < 0.1
    schema = Schema.of([("k", LT.BIGINT), ("v", LT.BIGINT)])
    batch = DeviceBatch.from_pydict(
        schema,
        {
            "k": [int(x) for x in key],
            "v": [None if m else int(x) for x, m in zip(val, nullmask)],
        },
    )
    d.create_memory_table("fact", batch)
    dim_ids = np.arange(0, 600, dtype=np.int64)  # 500 match + 100 unmatched
    names = [f"n{i}" for i in dim_ids]
    dschema = Schema.of([("id", LT.BIGINT), ("name", LT.VARCHAR)])
    d.create_memory_table(
        "dim",
        DeviceBatch.from_pydict(
            dschema, {"id": [int(x) for x in dim_ids], "name": names}
        ),
    )
    d._oracle = dict(key=key, val=val, null=nullmask)
    return d


def test_group_by_sums(db):
    lines = db.run_lines(
        "select k, count(*), count(v), sum(v), min(v), max(v) from fact group by k"
    )
    key, val, null = db._oracle["key"], db._oracle["val"], db._oracle["null"]
    got = {}
    for ln in lines:
        parts = ln.split()
        got[int(parts[0])] = parts[1:]
    assert len(got) == len(set(key.tolist()))
    for k in set(key.tolist()):
        sel = key == k
        live = sel & ~null
        exp = [
            str(sel.sum()),
            str(live.sum()),
            str(val[live].sum()) if live.any() else "NULL",
            str(val[live].min()) if live.any() else "NULL",
            str(val[live].max()) if live.any() else "NULL",
        ]
        assert got[k] == exp, k


def test_join_row_counts_and_sum(db):
    lines = db.run_lines(
        "select dim.name, count(*) from fact inner join dim on fact.k = dim.id"
        " group by dim.name"
    )
    key = db._oracle["key"]
    import collections

    exp = collections.Counter(int(k) for k in key)
    got = {ln.split()[0]: int(ln.split()[1]) for ln in lines}
    assert got == {f"n{k}": c for k, c in exp.items()}


def test_left_join_unmatched_count(db):
    lines = db.run_lines(
        "select count(*) from dim left join fact on dim.id = fact.k"
    )
    key = db._oracle["key"]
    import collections

    c = collections.Counter(int(k) for k in key)
    expected = sum(c.get(i, 1) for i in range(600))  # unmatched dims count 1
    assert lines == [str(expected)]


def test_order_by_limit_matches_numpy(db):
    lines = db.run_lines("select v from fact where v is not null order by v desc limit 5") \
        if False else db.run_lines("select v from fact order by v desc limit 5")
    val, null = db._oracle["val"], db._oracle["null"]
    live = np.sort(val[~null])[::-1][:5]
    # NULLs sort first in desc order per arrow defaults -> they occupy the top
    n_null = int(null.sum())
    if n_null >= 5:
        assert lines == ["NULL"] * 5
    else:
        assert lines == ["NULL"] * n_null + [str(x) for x in live[: 5 - n_null]]


def test_distinct_count(db):
    lines = db.run_lines("select count(distinct k) from fact")
    assert lines == [str(len(set(db._oracle["key"].tolist())))]


def test_scalar_subquery_scale(db):
    lines = db.run_lines(
        "select count(*) from fact where v >= (select max(v) from fact)"
    )
    val, null = db._oracle["val"], db._oracle["null"]
    assert lines == [str(int((val[~null] == val[~null].max()).sum()))]
