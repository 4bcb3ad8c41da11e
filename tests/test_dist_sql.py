"""SQL-level distributed execution: every query must render bit-identically
(row order included) between the single-device engine and the distributed
engine over the 8-device CPU mesh."""

import glob
import os

import pytest

import sqlrs_tpu
from sqlrs_tpu import Database

CSV_DIR = "/root/reference/tests/csv"


def _make_pair():
    db1 = Database()
    db8 = Database(n_devices=8)
    for db in (db1, db8):
        for path in sorted(glob.glob(os.path.join(CSV_DIR, "*.csv"))):
            name = os.path.splitext(os.path.basename(path))[0]
            db.create_csv_table(name, path)
    return db1, db8


@pytest.fixture(scope="module")
def dbs():
    return _make_pair()


QUERIES = [
    # scan / filter / project (zero-communication SPMD ops)
    "select * from employee",
    "select first_name, salary from employee where salary > 100",
    "select id, id + 1, -id from employee where last_name = 'Hopkins'",
    "select * from employee where salary is null",
    "select first_name from employee where state in ('CA', 'CO')",
    "select a from t1 where a between 1 and 2",
    # ungrouped aggregation (local partials + psum)
    "select sum(salary), count(*), count(salary), min(salary), max(salary), avg(salary) from employee",
    "select count(*) from employee where salary > 100",
    "select min(first_name), max(last_name) from employee",
    "select sum(salary) from employee where salary < 0",  # empty -> NULL
    # grouped aggregation (shard-local partials + all_gather merge);
    # first-appearance group order must match the single-device engine
    "select state, sum(salary) from employee group by state",
    "select state, count(*), count(salary), min(salary), max(salary), avg(salary) from employee group by state",
    "select last_name, state, sum(id) from employee group by last_name, state",
    "select state, min(first_name), max(first_name) from employee group by state",
    "select salary, count(*) from employee group by salary",  # NULL group key
    "select b, sum(a), max(c) from t1 group by b",
]


@pytest.mark.parametrize("sql", QUERIES)
def test_distributed_matches_single_device(dbs, sql):
    db1, db8 = dbs
    assert db8.run_lines(sql) == db1.run_lines(sql)


def test_distributed_ddl_dml_roundtrip():
    db = Database(n_devices=8)
    db.run("create table t(v int, w varchar)")
    db.run("insert into t values (1, 'a'), (2, 'b'), (3, null)")
    assert db.run_lines("select sum(v), count(w) from t") == ["6 2"]
    assert db.run_lines("select v from t where w = 'b'") == ["2"]
