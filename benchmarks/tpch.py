"""TPC-H-shaped workload: data generator + representative queries.

The reference only scaffolds TPC-H (dbgen clone + query templates, no runner
— reference Makefile:46-70). Here the engine actually runs the query shapes:
a numpy dbgen-lite builds lineitem/orders/customer at a given scale, and the
queries below exercise the TPC-H patterns the engine supports (Q1 grouped
aggregation with date filter + CASE-free arithmetic, Q3 3-table join with
group/order/limit, Q6 selective filter aggregate).

Usage:
  python -m benchmarks.tpch [--rows 100000] [--check]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def gen_data(db, n_lineitem: int, seed: int = 0) -> dict:
    from sqlrs_tpu.data import DeviceBatch, Schema
    from sqlrs_tpu.types import LogicalType as LT
    from sqlrs_tpu.types.values import date_str_to_days

    rng = np.random.default_rng(seed)
    n_orders = max(n_lineitem // 4, 1)
    n_cust = max(n_orders // 10, 1)

    base = date_str_to_days("1992-01-01")
    span = date_str_to_days("1998-12-01") - base

    orders_key = np.arange(n_orders, dtype=np.int64)
    o_custkey = rng.integers(0, n_cust, n_orders)
    o_date = base + rng.integers(0, span, n_orders)

    l_orderkey = rng.integers(0, n_orders, n_lineitem)
    l_qty = rng.integers(1, 51, n_lineitem)
    l_price = np.round(rng.uniform(900, 105000, n_lineitem), 2)
    l_disc = np.round(rng.uniform(0, 0.1, n_lineitem), 2)
    l_tax = np.round(rng.uniform(0, 0.08, n_lineitem), 2)
    flags = np.array(["A", "N", "R"])
    l_flag = flags[rng.integers(0, 3, n_lineitem)]
    status = np.array(["O", "F"])
    l_status = status[rng.integers(0, 2, n_lineitem)]
    l_ship = base + rng.integers(0, span, n_lineitem)

    segs = np.array(["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE"])
    c_seg = segs[rng.integers(0, 5, n_cust)]

    def mk(schema_pairs, cols):
        schema = Schema.of(schema_pairs)
        return DeviceBatch.from_pydict(
            schema, {name: data for (name, _), data in zip(schema_pairs, cols)}
        )

    db.create_memory_table(
        "lineitem",
        mk(
            [
                ("l_orderkey", LT.BIGINT),
                ("l_quantity", LT.BIGINT),
                ("l_extendedprice", LT.DOUBLE),
                ("l_discount", LT.DOUBLE),
                ("l_tax", LT.DOUBLE),
                ("l_returnflag", LT.VARCHAR),
                ("l_linestatus", LT.VARCHAR),
                ("l_shipdate", LT.DATE),
            ],
            [
                [int(x) for x in l_orderkey],
                [int(x) for x in l_qty],
                [float(x) for x in l_price],
                [float(x) for x in l_disc],
                [float(x) for x in l_tax],
                list(l_flag),
                list(l_status),
                [int(x) for x in l_ship],
            ],
        ),
    )
    db.create_memory_table(
        "orders",
        mk(
            [
                ("o_orderkey", LT.BIGINT),
                ("o_custkey", LT.BIGINT),
                ("o_orderdate", LT.DATE),
            ],
            [
                [int(x) for x in orders_key],
                [int(x) for x in o_custkey],
                [int(x) for x in o_date],
            ],
        ),
    )
    db.create_memory_table(
        "customer",
        mk(
            [("c_custkey", LT.BIGINT), ("c_mktsegment", LT.VARCHAR)],
            [[int(x) for x in np.arange(n_cust)], list(c_seg)],
        ),
    )
    return dict(
        l_orderkey=l_orderkey, l_qty=l_qty, l_price=l_price, l_disc=l_disc,
        l_tax=l_tax, l_flag=l_flag, l_status=l_status, l_ship=l_ship,
        o_custkey=o_custkey, o_date=o_date, c_seg=c_seg, base=base,
    )


Q1 = """
select l_returnflag, l_linestatus,
       sum(l_quantity), sum(l_extendedprice),
       sum(l_extendedprice * (1 - l_discount)),
       avg(l_quantity), avg(l_extendedprice), avg(l_discount),
       count(*)
from lineitem
where l_shipdate <= date '1998-09-02'
group by l_returnflag, l_linestatus
order by l_returnflag, l_linestatus
"""

Q3 = """
select o_orderkey, sum(l_extendedprice * (1 - l_discount)) as revenue
from customer
inner join orders on c_custkey = o_custkey
inner join lineitem on l_orderkey = o_orderkey
where c_mktsegment = 'BUILDING' and o_orderdate < date '1995-03-15'
group by o_orderkey
order by revenue desc
limit 10
"""

Q6 = """
select sum(l_extendedprice * l_discount)
from lineitem
where l_shipdate >= date '1994-01-01'
  and l_shipdate < date '1995-01-01'
  and l_discount between 0.05 and 0.07
  and l_quantity < 24
"""


def check_q6(data) -> float:
    from sqlrs_tpu.types.values import date_str_to_days

    lo = date_str_to_days("1994-01-01")
    hi = date_str_to_days("1995-01-01")
    m = (
        (data["l_ship"] >= lo)
        & (data["l_ship"] < hi)
        & (data["l_disc"] >= 0.05)
        & (data["l_disc"] <= 0.07)
        & (data["l_qty"] < 24)
    )
    return float((data["l_price"][m] * data["l_disc"][m]).sum())


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=100_000)
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args(argv)

    import sqlrs_tpu

    db = sqlrs_tpu.Database()
    t0 = time.time()
    data = gen_data(db, args.rows)
    print(f"generated lineitem={args.rows} rows in {time.time()-t0:.1f}s")

    for name, sql in [("Q1", Q1), ("Q3", Q3), ("Q6", Q6)]:
        t0 = time.time()
        lines = db.run_lines(sql)
        dt = time.time() - t0
        print(f"{name}: {dt:.2f}s  {len(lines)} rows")
        for ln in lines[:4]:
            print("   ", ln)

    if args.check:
        got = float(db.run_lines(Q6)[0])
        exp = check_q6(data)
        assert abs(got - exp) < 1e-6 * max(abs(exp), 1), (got, exp)
        print("Q6 oracle check: OK")


if __name__ == "__main__":
    main()
