"""Extended SQL surface: BETWEEN / IN / LIKE / IS NULL / CASE / EXTRACT.

Beyond reference parity (the reference's TPC-H scaffolding generates queries
needing these forms but has no runner, reference Makefile:46-70); semantics
follow Postgres/DuckDB: NULL operands yield NULL predicates (filtered out),
CASE conditions treat NULL as no-match."""

import pytest

import sqlrs_tpu


@pytest.fixture(scope="module")
def db():
    d = sqlrs_tpu.Database()
    d.run(
        """create table o(id int, status varchar, price double, d date);
        insert into o values
         (1, 'shipped', 10.5, '1995-03-15'), (2, 'pending', 20.0, '1996-07-01'),
         (3, 'shipped', 5.25, '1995-12-31'), (4, NULL, 7.0, '1997-01-01'),
         (5, 'cancelled', 100.0, '1995-06-30')"""
    )
    return d


CASES = [
    ("select id from o where price between 7 and 25", ["1", "2", "4"]),
    ("select id from o where price not between 7 and 25", ["3", "5"]),
    ("select id from o where id in (1, 3, 5)", ["1", "3", "5"]),
    ("select id from o where id not in (1, 3, 5)", ["2", "4"]),
    ("select id from o where status like 'ship%'", ["1", "3"]),
    ("select id from o where status like '%end%'", ["2"]),
    ("select id from o where status like '_ancelled'", ["5"]),
    # NULL status row excluded: NULL NOT LIKE ... is NULL, not true
    ("select id from o where status not like 'ship%'", ["2", "5"]),
    ("select id from o where status is null", ["4"]),
    ("select id from o where status is not null", ["1", "2", "3", "5"]),
    (
        "select id, case when price > 50 then 'big' when price > 10 then 'mid'"
        " else 'small' end from o",
        ["1 mid", "2 mid", "3 small", "4 small", "5 big"],
    ),
    ("select case status when 'shipped' then 1 else 0 end from o",
     ["1", "0", "1", "0", "0"]),
    # CASE without ELSE yields NULL
    ("select case when id = 1 then 7 end from o", ["7", "NULL", "NULL", "NULL", "NULL"]),
    ("select id from o where extract(year from d) = 1995", ["1", "3", "5"]),
    ("select extract(month from d), extract(day from d) from o where id = 1", ["3 15"]),
    ("select sum(case when status = 'shipped' then price else 0 end) from o", ["15.75"]),
    # like on an escape-worthy pattern: regex metachars must be literal
    ("select id from o where status like 'ship.ed'", []),
]


@pytest.mark.parametrize("sql,expected", CASES, ids=[c[0][:48] for c in CASES])
def test_extended_sql(db, sql, expected):
    assert db.run_lines(sql) == expected


def test_streaming_limit_touches_chunks_not_table():
    """LIMIT over a scan→filter pipeline must execute in bounded chunks
    (reference limit.rs:31-70 early-stops its pull stream): the profiled
    TableScan row counts stay O(limit-chunk), never O(table)."""
    import numpy as np

    import sqlrs_tpu
    from sqlrs_tpu.data import DeviceBatch, Schema
    from sqlrs_tpu.types import LogicalType as LT

    db = sqlrs_tpu.Database(profile=True)
    n = 300_000
    db.create_memory_table(
        "big",
        DeviceBatch.from_pydict(
            Schema.of([("a", LT.BIGINT)]), {"a": list(range(n))}
        ),
    )
    batches = db.run("select a from big where a % 2 = 0 limit 10")
    rows = [t[0] for b in batches for t in b.to_pylist()]
    assert rows == [0, 2, 4, 6, 8, 10, 12, 14, 16, 18]
    scanned = sum(
        s.rows_out
        for s in db.last_profile.ops
        if s.op.lstrip().startswith("TableScan")
    )
    assert 0 < scanned <= 4096, scanned

    # offset + exhaustion: limit window past the end of the table
    batches = db.run("select a from big where a < 5 limit 10 offset 3")
    rows = [t[0] for b in batches for t in b.to_pylist()]
    assert rows == [3, 4]
    # limit 0 keeps the schema and returns no rows
    (empty,) = db.run("select a from big limit 0")
    assert empty.num_rows == 0 and empty.schema.names == ["a"]


def test_chunked_residual_join_pairs():
    """When the pair set exceeds db.join_pair_budget and a residual filter
    gates the output, the join expands + filters in bounded chunks
    (executor._residual_pairs_chunked) — results must be bit-identical to
    the unchunked path, emission order included (left/full joins consume
    the surviving pair set downstream)."""
    import numpy as np

    import sqlrs_tpu

    rng = np.random.default_rng(5)
    n_l, n_r = 400, 700
    rows_l = ",".join(
        f"({int(k)},{int(v)})"
        for k, v in zip(rng.integers(0, 25, n_l), rng.integers(0, 100, n_l))
    )
    rows_r = ",".join(
        f"({int(k)},{int(v)})"
        for k, v in zip(rng.integers(0, 25, n_r), rng.integers(0, 100, n_r))
    )
    ddl = [
        "create table a(k int, x int)",
        "create table b(k int, y int)",
        f"insert into a values {rows_l}",
        f"insert into b values {rows_r}",
    ]
    qs = [
        "select * from a join b on a.k = b.k and a.x < b.y",
        "select a.k, sum(b.y) from a join b on a.k = b.k and a.x + b.y > 120"
        " group by a.k",
        "select count(*) from a left join b on a.k = b.k and a.x < b.y - 5",
    ]
    db_ref = sqlrs_tpu.Database()
    db_chunk = sqlrs_tpu.Database()
    db_chunk.join_pair_budget = 512  # ~11K pairs here -> many chunks
    for db in (db_ref, db_chunk):
        for s in ddl:
            db.run(s)
    for q in qs:
        assert db_chunk.run_lines(q) == db_ref.run_lines(q), q
