"""TPC-H-shaped workload: data generator + representative queries.

The reference only scaffolds TPC-H (dbgen clone + query templates, no runner
— reference Makefile:46-70). Here the engine actually runs the query shapes:
a numpy dbgen-lite builds lineitem/orders/customer/part at a given scale,
and the queries below exercise the TPC-H patterns the engine supports:
Q1 grouped aggregation with date filter, Q3 3-table join with
group/order/limit, Q6 selective filter aggregate, Q10 customer revenue
join+group, Q12 shipmode CASE aggregation over a join, Q14 promo revenue
ratio (LIKE + CASE + aggregate arithmetic).

Usage:
  python -m benchmarks.tpch [--rows 100000] [--check] [--devices N]

--devices N runs every query through the distributed engine
(Database(n_devices=N)) instead of the single-device one.
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
    n_part = max(n_lineitem // 50, 1)
    l_partkey = rng.integers(0, n_part, n_lineitem)
    modes = np.array(["MAIL", "SHIP", "AIR", "TRUCK", "RAIL"])
    l_shipmode = modes[rng.integers(0, 5, n_lineitem)]
    prios = np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"])
    o_prio = prios[rng.integers(0, 5, n_orders)]
    ptypes = np.array(
        ["PROMO BRUSHED", "PROMO PLATED", "STANDARD POLISHED", "ECONOMY ANODIZED",
         "MEDIUM BURNISHED", "SMALL PLATED"]
    )
    p_type = ptypes[rng.integers(0, 6, n_part)]

    segs = np.array(["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE"])
    c_seg = segs[rng.integers(0, 5, n_cust)]

    # supplier / nation / region dims (Q5); brand/container part attrs (Q19)
    n_supp = max(n_lineitem // 500, 1)
    nations = np.array(
        ["ALGERIA", "ARGENTINA", "BRAZIL", "CANADA", "EGYPT", "ETHIOPIA",
         "FRANCE", "GERMANY", "INDIA", "INDONESIA", "IRAN", "IRAQ", "JAPAN",
         "JORDAN", "KENYA", "MOROCCO", "MOZAMBIQUE", "PERU", "CHINA",
         "ROMANIA", "SAUDI ARABIA", "VIETNAM", "RUSSIA", "UNITED KINGDOM",
         "UNITED STATES"]
    )
    n_regionkey = np.array([0, 1, 1, 1, 4, 0, 3, 3, 2, 2, 4, 4, 2, 4, 0, 0,
                            0, 1, 2, 3, 4, 2, 3, 3, 1], dtype=np.int64)
    regions = np.array(["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"])
    s_nationkey = rng.integers(0, len(nations), n_supp)
    c_nationkey = rng.integers(0, len(nations), n_cust)
    l_suppkey = rng.integers(0, n_supp, n_lineitem)
    brands = np.array([f"Brand#{i}{j}" for i in range(1, 6) for j in range(1, 6)])
    p_brand = brands[rng.integers(0, len(brands), n_part)]
    containers = np.array(
        ["SM CASE", "SM BOX", "SM PACK", "SM PKG", "MED BAG", "MED BOX",
         "MED PKG", "MED PACK", "LG CASE", "LG BOX", "LG PACK", "LG PKG"]
    )
    p_container = containers[rng.integers(0, len(containers), n_part)]

    def mk(name, schema_pairs, cols):
        # columnar bulk ingest straight into the host table store — no
        # device round-trip; the device snapshot materializes on first scan
        db.create_memory_table_numpy(name, schema_pairs, cols)

    mk(
        "lineitem",
        [
            ("l_orderkey", LT.BIGINT),
            ("l_quantity", LT.BIGINT),
            ("l_extendedprice", LT.DOUBLE),
            ("l_discount", LT.DOUBLE),
            ("l_tax", LT.DOUBLE),
            ("l_returnflag", LT.VARCHAR),
            ("l_linestatus", LT.VARCHAR),
            ("l_shipdate", LT.DATE),
            ("l_partkey", LT.BIGINT),
            ("l_shipmode", LT.VARCHAR),
            ("l_suppkey", LT.BIGINT),
        ],
        [
            l_orderkey, l_qty, l_price, l_disc, l_tax,
            l_flag, l_status, l_ship, l_partkey, l_shipmode, l_suppkey,
        ],
    )
    mk(
        "orders",
        [
            ("o_orderkey", LT.BIGINT),
            ("o_custkey", LT.BIGINT),
            ("o_orderdate", LT.DATE),
            ("o_orderpriority", LT.VARCHAR),
        ],
        [orders_key, o_custkey, o_date, o_prio],
    )
    mk(
        "customer",
        [("c_custkey", LT.BIGINT), ("c_mktsegment", LT.VARCHAR),
         ("c_nationkey", LT.BIGINT)],
        [np.arange(n_cust), c_seg, c_nationkey],
    )
    mk(
        "part",
        [("p_partkey", LT.BIGINT), ("p_type", LT.VARCHAR),
         ("p_brand", LT.VARCHAR), ("p_container", LT.VARCHAR)],
        [np.arange(n_part), p_type, p_brand, p_container],
    )
    mk(
        "supplier",
        [("s_suppkey", LT.BIGINT), ("s_nationkey", LT.BIGINT)],
        [np.arange(n_supp), s_nationkey],
    )
    mk(
        "nation",
        [("n_nationkey", LT.BIGINT), ("n_name", LT.VARCHAR),
         ("n_regionkey", LT.BIGINT)],
        [np.arange(len(nations)), nations, n_regionkey],
    )
    mk(
        "region",
        [("r_regionkey", LT.BIGINT), ("r_name", LT.VARCHAR)],
        [np.arange(len(regions)), regions],
    )
    return dict(
        l_orderkey=l_orderkey, l_qty=l_qty, l_price=l_price, l_disc=l_disc,
        l_tax=l_tax, l_flag=l_flag, l_status=l_status, l_ship=l_ship,
        l_partkey=l_partkey, l_shipmode=l_shipmode, p_type=p_type,
        o_custkey=o_custkey, o_date=o_date, o_prio=o_prio, c_seg=c_seg,
        l_suppkey=l_suppkey, s_nationkey=s_nationkey, c_nationkey=c_nationkey,
        nations=nations, n_regionkey=n_regionkey, regions=regions,
        p_brand=p_brand, p_container=p_container, l_qty_=l_qty,
        base=base,
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


Q10 = """
select c_custkey, sum(l_extendedprice * (1 - l_discount)) as revenue, count(*)
from customer
inner join orders on c_custkey = o_custkey
inner join lineitem on l_orderkey = o_orderkey
where l_returnflag = 'R'
group by c_custkey
order by revenue desc
limit 20
"""

Q12 = """
select l_shipmode,
       sum(case when o_orderpriority = '1-URGENT' or o_orderpriority = '2-HIGH'
                then 1 else 0 end) as high_line_count,
       sum(case when o_orderpriority <> '1-URGENT' and o_orderpriority <> '2-HIGH'
                then 1 else 0 end) as low_line_count
from orders
inner join lineitem on o_orderkey = l_orderkey
where l_shipmode in ('MAIL', 'SHIP')
  and l_shipdate >= date '1994-01-01' and l_shipdate < date '1995-01-01'
group by l_shipmode
order by l_shipmode
"""

Q14 = """
select 100.00 * sum(case when p_type like 'PROMO%'
                         then l_extendedprice * (1 - l_discount) else 0.0 end)
       / sum(l_extendedprice * (1 - l_discount)) as promo_revenue
from lineitem
inner join part on l_partkey = p_partkey
where l_shipdate >= date '1995-09-01' and l_shipdate < date '1995-10-01'
"""


Q5 = """
select n_name, sum(l_extendedprice * (1 - l_discount)) as revenue
from customer
inner join orders on c_custkey = o_custkey
inner join lineitem on l_orderkey = o_orderkey
inner join supplier on l_suppkey = s_suppkey
inner join nation on s_nationkey = n_nationkey
inner join region on n_regionkey = r_regionkey
where c_nationkey = s_nationkey
  and r_name = 'ASIA'
  and o_orderdate >= date '1994-01-01' and o_orderdate < date '1995-01-01'
group by n_name
order by revenue desc
"""

Q19 = """
select sum(l_extendedprice * (1 - l_discount)) as revenue
from lineitem
inner join part on p_partkey = l_partkey
where (p_brand = 'Brand#12'
       and p_container in ('SM CASE', 'SM BOX', 'SM PACK', 'SM PKG')
       and l_quantity >= 1 and l_quantity <= 11
       and l_shipmode in ('AIR', 'TRUCK'))
   or (p_brand = 'Brand#23'
       and p_container in ('MED BAG', 'MED BOX', 'MED PKG', 'MED PACK')
       and l_quantity >= 10 and l_quantity <= 20
       and l_shipmode in ('AIR', 'TRUCK'))
   or (p_brand = 'Brand#34'
       and p_container in ('LG CASE', 'LG BOX', 'LG PACK', 'LG PKG')
       and l_quantity >= 20 and l_quantity <= 30
       and l_shipmode in ('AIR', 'TRUCK'))
"""


def check_q5(data):
    from sqlrs_tpu.types.values import date_str_to_days

    lo = date_str_to_days("1994-01-01")
    hi = date_str_to_days("1995-01-01")
    o_ok = (data["o_date"] >= lo) & (data["o_date"] < hi)
    s_nat = data["s_nationkey"][data["l_suppkey"]]
    c_nat = data["c_nationkey"][data["o_custkey"][data["l_orderkey"]]]
    asia = data["n_regionkey"][s_nat] == 2  # ASIA
    m = o_ok[data["l_orderkey"]] & (s_nat == c_nat) & asia
    rev = data["l_price"][m] * (1 - data["l_disc"][m])
    sums = np.bincount(s_nat[m], weights=rev, minlength=len(data["nations"]))
    out = [(data["nations"][i], sums[i]) for i in np.argsort(-sums) if sums[i] > 0]
    return out


def check_q19(data) -> float:
    pb = data["p_brand"][data["l_partkey"]].astype(str)
    pc = data["p_container"][data["l_partkey"]].astype(str)
    q = data["l_qty"]
    sm = np.isin(data["l_shipmode"].astype(str), ["AIR", "TRUCK"])
    m = sm & (
        ((pb == "Brand#12") & np.isin(pc, ["SM CASE", "SM BOX", "SM PACK", "SM PKG"])
         & (q >= 1) & (q <= 11))
        | ((pb == "Brand#23") & np.isin(pc, ["MED BAG", "MED BOX", "MED PKG", "MED PACK"])
           & (q >= 10) & (q <= 20))
        | ((pb == "Brand#34") & np.isin(pc, ["LG CASE", "LG BOX", "LG PACK", "LG PKG"])
           & (q >= 20) & (q <= 30))
    )
    return float((data["l_price"][m] * (1 - data["l_disc"][m])).sum())


def check_q14(data) -> float:
    from sqlrs_tpu.types.values import date_str_to_days

    lo = date_str_to_days("1995-09-01")
    hi = date_str_to_days("1995-10-01")
    m = (data["l_ship"] >= lo) & (data["l_ship"] < hi)
    rev = data["l_price"][m] * (1 - data["l_disc"][m])
    promo = np.char.startswith(
        data["p_type"][data["l_partkey"][m]].astype(str), "PROMO"
    )
    return float(100.0 * rev[promo].sum() / rev.sum())


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
    ap.add_argument("--devices", type=int, default=None,
                    help="run distributed over an N-device mesh")
    args = ap.parse_args(argv)

    import os
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        # env alone is not honored once the axon plugin is importable; the
        # config update must happen before first jax use (CLAUDE.md)
        import jax

        jax.config.update("jax_platforms", "cpu")

    import sqlrs_tpu

    db = sqlrs_tpu.Database(n_devices=args.devices)
    t0 = time.time()
    data = gen_data(db, args.rows)
    print(f"generated lineitem={args.rows} rows in {time.time()-t0:.1f}s")

    for name, sql in [("Q1", Q1), ("Q3", Q3), ("Q5", Q5), ("Q6", Q6),
                      ("Q10", Q10), ("Q12", Q12), ("Q14", Q14), ("Q19", Q19)]:
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
        got14 = float(db.run_lines(Q14)[0])
        exp14 = check_q14(data)
        assert abs(got14 - exp14) < 1e-9 * max(abs(exp14), 1), (got14, exp14)
        print("Q14 oracle check: OK")
        got19 = float(db.run_lines(Q19)[0])
        exp19 = check_q19(data)
        assert abs(got19 - exp19) < 1e-9 * max(abs(exp19), 1), (got19, exp19)
        print("Q19 oracle check: OK")
        got5 = [ln.split() for ln in db.run_lines(Q5)]
        exp5 = check_q5(data)
        assert len(got5) == len(exp5), (got5, exp5)
        for (gn, gv), (en, ev) in zip(got5, exp5):
            assert gn == en and abs(float(gv) - ev) < 1e-6 * max(abs(ev), 1), (
                (gn, gv), (en, ev))
        print("Q5 oracle check: OK")


if __name__ == "__main__":
    main()
