"""Per-query TPC-H oracles over the generated numpy columns (pandas).

Each oracle_qN(tables) returns the expected result as a list of tuples in
the engine's output column order — floats as float64, dates as epoch-day
ints, strings as str — computed independently of the engine (pandas
groupby/merge over the same arrays benchmarks/tpch_dbgen.py loaded).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _D(s: str) -> int:
    from sqlrs_tpu.types.values import date_str_to_days

    return date_str_to_days(s)


def frames(tables: dict) -> dict:
    return {k: pd.DataFrame(v) for k, v in tables.items()}


def _rows(df: pd.DataFrame) -> list[tuple]:
    return [tuple(r) for r in df.itertuples(index=False, name=None)]


def oracle_q1(t):
    l = t["lineitem"]
    m = l["l_shipdate"] <= _D("1998-12-01") - 90
    df = pd.DataFrame({k: l[k][m] for k in
                       ("l_returnflag", "l_linestatus", "l_quantity",
                        "l_extendedprice", "l_discount", "l_tax")})
    df["disc_price"] = df.l_extendedprice * (1 - df.l_discount)
    df["charge"] = df.disc_price * (1 + df.l_tax)
    g = df.groupby(["l_returnflag", "l_linestatus"], sort=True)
    out = g.agg(
        sum_qty=("l_quantity", "sum"),
        sum_base=("l_extendedprice", "sum"),
        sum_disc=("disc_price", "sum"),
        sum_charge=("charge", "sum"),
        avg_qty=("l_quantity", "mean"),
        avg_price=("l_extendedprice", "mean"),
        avg_disc=("l_discount", "mean"),
        cnt=("l_quantity", "size"),
    ).reset_index()
    return _rows(out)


def _q2_base(t):
    f = frames(t)
    ps, s, n, r, p = f["partsupp"], f["supplier"], f["nation"], f["region"], f["part"]
    eu = r[r.r_name == "EUROPE"]
    sn = s.merge(n, left_on="s_nationkey", right_on="n_nationkey").merge(
        eu, left_on="n_regionkey", right_on="r_regionkey")
    j = ps.merge(sn, left_on="ps_suppkey", right_on="s_suppkey")
    return j, p


def oracle_q2(t):
    j, p = _q2_base(t)
    minc = j.groupby("ps_partkey")["ps_supplycost"].min().rename("minc")
    pp = p[(p.p_size == 15) & p.p_type.str.endswith("BRASS")]
    out = j.merge(pp, left_on="ps_partkey", right_on="p_partkey")
    out = out.merge(minc, left_on="ps_partkey", right_index=True)
    out = out[out.ps_supplycost == out.minc]
    out = out.sort_values(
        ["s_acctbal", "n_name", "s_name", "p_partkey"],
        ascending=[False, True, True, True], kind="stable").head(100)
    return _rows(out[["s_acctbal", "s_name", "n_name", "p_partkey", "p_mfgr",
                      "s_address", "s_phone", "s_comment"]])


def oracle_q3(t):
    f = frames(t)
    c = f["customer"][f["customer"].c_mktsegment == "BUILDING"]
    o = f["orders"][f["orders"].o_orderdate < _D("1995-03-15")]
    l = f["lineitem"][f["lineitem"].l_shipdate > _D("1995-03-15")]
    j = c.merge(o, left_on="c_custkey", right_on="o_custkey").merge(
        l, left_on="o_orderkey", right_on="l_orderkey")
    j["rev"] = j.l_extendedprice * (1 - j.l_discount)
    g = j.groupby(["l_orderkey", "o_orderdate", "o_shippriority"]).rev.sum().reset_index()
    g = g.sort_values(["rev", "o_orderdate"], ascending=[False, True],
                      kind="stable").head(10)
    return _rows(g[["l_orderkey", "rev", "o_orderdate", "o_shippriority"]])


def oracle_q4(t):
    o, l = t["orders"], t["lineitem"]
    m = (o["o_orderdate"] >= _D("1993-07-01")) & (o["o_orderdate"] < _D("1993-10-01"))
    ok = np.unique(l["l_orderkey"][l["l_commitdate"] < l["l_receiptdate"]])
    sel = m & np.isin(o["o_orderkey"], ok)
    df = pd.DataFrame({"p": o["o_orderpriority"][sel]})
    g = df.groupby("p", sort=True).size().reset_index(name="n")
    return _rows(g)


def oracle_q5(t):
    f = frames(t)
    o = f["orders"]
    o = o[(o.o_orderdate >= _D("1994-01-01")) & (o.o_orderdate < _D("1995-01-01"))]
    r = f["region"][f["region"].r_name == "ASIA"]
    n = f["nation"].merge(r, left_on="n_regionkey", right_on="r_regionkey")
    s = f["supplier"].merge(n, left_on="s_nationkey", right_on="n_nationkey")
    j = f["lineitem"].merge(o, left_on="l_orderkey", right_on="o_orderkey")
    j = j.merge(f["customer"], left_on="o_custkey", right_on="c_custkey")
    j = j.merge(s, left_on="l_suppkey", right_on="s_suppkey")
    j = j[j.c_nationkey == j.s_nationkey]
    j["rev"] = j.l_extendedprice * (1 - j.l_discount)
    g = j.groupby("n_name").rev.sum().reset_index()
    g = g.sort_values("rev", ascending=False, kind="stable")
    return _rows(g[["n_name", "rev"]])


def oracle_q6(t):
    l = t["lineitem"]
    m = ((l["l_shipdate"] >= _D("1994-01-01")) & (l["l_shipdate"] < _D("1995-01-01"))
         & (l["l_discount"] >= 0.05) & (l["l_discount"] <= 0.07)
         & (l["l_quantity"] < 24))
    if not m.any():
        return [(None,)]  # SQL: SUM over zero rows is NULL
    return [(float((l["l_extendedprice"][m] * l["l_discount"][m]).sum()),)]


def _year_days(days: np.ndarray) -> np.ndarray:
    return (pd.to_datetime(days, unit="D", origin="1970-01-01")).year.values


def oracle_q7(t):
    f = frames(t)
    l = f["lineitem"]
    l = l[(l.l_shipdate >= _D("1995-01-01")) & (l.l_shipdate <= _D("1996-12-31"))]
    j = l.merge(f["supplier"], left_on="l_suppkey", right_on="s_suppkey")
    j = j.merge(f["orders"], left_on="l_orderkey", right_on="o_orderkey")
    j = j.merge(f["customer"], left_on="o_custkey", right_on="c_custkey")
    n = f["nation"][["n_nationkey", "n_name"]]
    j = j.merge(n.rename(columns={"n_nationkey": "k1", "n_name": "supp_nation"}),
                left_on="s_nationkey", right_on="k1")
    j = j.merge(n.rename(columns={"n_nationkey": "k2", "n_name": "cust_nation"}),
                left_on="c_nationkey", right_on="k2")
    m = ((j.supp_nation == "FRANCE") & (j.cust_nation == "GERMANY")) | (
        (j.supp_nation == "GERMANY") & (j.cust_nation == "FRANCE"))
    j = j[m].copy()
    j["l_year"] = _year_days(j.l_shipdate.values)
    j["volume"] = j.l_extendedprice * (1 - j.l_discount)
    g = j.groupby(["supp_nation", "cust_nation", "l_year"], sort=True).volume.sum()
    return _rows(g.reset_index())


def oracle_q8(t):
    f = frames(t)
    p = f["part"][f["part"].p_type == "ECONOMY ANODIZED STEEL"]
    o = f["orders"]
    o = o[(o.o_orderdate >= _D("1995-01-01")) & (o.o_orderdate <= _D("1996-12-31"))]
    j = f["lineitem"].merge(p, left_on="l_partkey", right_on="p_partkey")
    j = j.merge(f["supplier"], left_on="l_suppkey", right_on="s_suppkey")
    j = j.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    j = j.merge(f["customer"], left_on="o_custkey", right_on="c_custkey")
    n = f["nation"]
    r = f["region"][f["region"].r_name == "AMERICA"]
    n1 = n.merge(r, left_on="n_regionkey", right_on="r_regionkey")
    j = j.merge(n1[["n_nationkey"]], left_on="c_nationkey", right_on="n_nationkey")
    j = j.merge(n[["n_nationkey", "n_name"]].rename(
        columns={"n_nationkey": "k2", "n_name": "nation"}),
        left_on="s_nationkey", right_on="k2")
    j["o_year"] = _year_days(j.o_orderdate.values)
    j["volume"] = j.l_extendedprice * (1 - j.l_discount)
    j["bra"] = np.where(j.nation == "BRAZIL", j.volume, 0.0)
    g = j.groupby("o_year", sort=True).agg(b=("bra", "sum"), v=("volume", "sum"))
    g["share"] = g.b / g.v
    return _rows(g.reset_index()[["o_year", "share"]])


def oracle_q9(t):
    f = frames(t)
    p = f["part"][f["part"].p_name.str.contains("green")]
    j = f["lineitem"].merge(p[["p_partkey"]], left_on="l_partkey", right_on="p_partkey")
    j = j.merge(f["supplier"], left_on="l_suppkey", right_on="s_suppkey")
    j = j.merge(f["partsupp"], left_on=["l_partkey", "l_suppkey"],
                right_on=["ps_partkey", "ps_suppkey"])
    j = j.merge(f["orders"], left_on="l_orderkey", right_on="o_orderkey")
    j = j.merge(f["nation"], left_on="s_nationkey", right_on="n_nationkey")
    j["o_year"] = _year_days(j.o_orderdate.values)
    j["amount"] = j.l_extendedprice * (1 - j.l_discount) - j.ps_supplycost * j.l_quantity
    g = j.groupby(["n_name", "o_year"]).amount.sum().reset_index()
    g = g.sort_values(["n_name", "o_year"], ascending=[True, False], kind="stable")
    return _rows(g)


def oracle_q10(t):
    f = frames(t)
    o = f["orders"]
    o = o[(o.o_orderdate >= _D("1993-10-01")) & (o.o_orderdate < _D("1994-01-01"))]
    l = f["lineitem"][f["lineitem"].l_returnflag == "R"]
    j = f["customer"].merge(o, left_on="c_custkey", right_on="o_custkey")
    j = j.merge(l, left_on="o_orderkey", right_on="l_orderkey")
    j = j.merge(f["nation"], left_on="c_nationkey", right_on="n_nationkey")
    j["rev"] = j.l_extendedprice * (1 - j.l_discount)
    g = j.groupby(["c_custkey", "c_name", "c_acctbal", "c_phone", "n_name",
                   "c_address", "c_comment"]).rev.sum().reset_index()
    g = g.sort_values("rev", ascending=False, kind="stable").head(20)
    return _rows(g[["c_custkey", "c_name", "rev", "c_acctbal", "n_name",
                    "c_address", "c_phone", "c_comment"]])


def oracle_q11(t):
    f = frames(t)
    n = f["nation"][f["nation"].n_name == "GERMANY"]
    s = f["supplier"].merge(n, left_on="s_nationkey", right_on="n_nationkey")
    j = f["partsupp"].merge(s, left_on="ps_suppkey", right_on="s_suppkey")
    j["v"] = j.ps_supplycost * j.ps_availqty
    thresh = j.v.sum() * 0.0001
    g = j.groupby("ps_partkey").v.sum().reset_index()
    g = g[g.v > thresh].sort_values("v", ascending=False, kind="stable")
    return _rows(g)


def oracle_q12(t):
    f = frames(t)
    l = f["lineitem"]
    l = l[l.l_shipmode.isin(["MAIL", "SHIP"])
          & (l.l_commitdate < l.l_receiptdate) & (l.l_shipdate < l.l_commitdate)
          & (l.l_receiptdate >= _D("1994-01-01"))
          & (l.l_receiptdate < _D("1995-01-01"))]
    j = l.merge(f["orders"], left_on="l_orderkey", right_on="o_orderkey")
    hi = j.o_orderpriority.isin(["1-URGENT", "2-HIGH"])
    j = j.assign(hi=hi.astype(np.int64), lo=(~hi).astype(np.int64))
    g = j.groupby("l_shipmode", sort=True).agg(h=("hi", "sum"), lo=("lo", "sum"))
    return _rows(g.reset_index())


def oracle_q13(t):
    f = frames(t)
    o = f["orders"]
    o = o[~o.o_comment.str.contains("special.*requests", regex=True)]
    cnt = o.groupby("o_custkey").size()
    c = f["customer"][["c_custkey"]].copy()
    c["c_count"] = c.c_custkey.map(cnt).fillna(0).astype(np.int64)
    g = c.groupby("c_count").size().reset_index(name="custdist")
    g = g.sort_values(["custdist", "c_count"], ascending=[False, False],
                      kind="stable")
    return _rows(g[["c_count", "custdist"]])


def oracle_q14(t):
    f = frames(t)
    l = f["lineitem"]
    l = l[(l.l_shipdate >= _D("1995-09-01")) & (l.l_shipdate < _D("1995-10-01"))]
    j = l.merge(f["part"], left_on="l_partkey", right_on="p_partkey")
    rev = j.l_extendedprice * (1 - j.l_discount)
    promo = rev.where(j.p_type.str.startswith("PROMO"), 0.0)
    return [(float(100.0 * promo.sum() / rev.sum()),)]


def oracle_q15(t):
    f = frames(t)
    l = f["lineitem"]
    l = l[(l.l_shipdate >= _D("1996-01-01")) & (l.l_shipdate < _D("1996-04-01"))]
    rev = (l.l_extendedprice * (1 - l.l_discount)).groupby(l.l_suppkey).sum()
    mx = rev.max()
    top = rev[rev == mx].reset_index()
    top.columns = ["s_suppkey", "total_revenue"]
    s = f["supplier"].merge(top, on="s_suppkey")
    s = s.sort_values("s_suppkey", kind="stable")
    return _rows(s[["s_suppkey", "s_name", "s_address", "s_phone", "total_revenue"]])


def oracle_q16(t):
    f = frames(t)
    p = f["part"]
    p = p[(p.p_brand != "Brand#45")
          & ~p.p_type.str.startswith("MEDIUM POLISHED")
          & p.p_size.isin([49, 14, 23, 45, 19, 3, 36, 9])]
    bad = f["supplier"][f["supplier"].s_comment.str.contains(
        "Customer.*Complaints", regex=True)].s_suppkey
    ps = f["partsupp"][~f["partsupp"].ps_suppkey.isin(bad)]
    j = ps.merge(p, left_on="ps_partkey", right_on="p_partkey")
    g = j.groupby(["p_brand", "p_type", "p_size"]).ps_suppkey.nunique().reset_index(
        name="cnt")
    g = g.sort_values(["cnt", "p_brand", "p_type", "p_size"],
                      ascending=[False, True, True, True], kind="stable")
    return _rows(g[["p_brand", "p_type", "p_size", "cnt"]])


def oracle_q17(t):
    f = frames(t)
    l = f["lineitem"]
    p = f["part"][(f["part"].p_brand == "Brand#23")
                  & (f["part"].p_container == "MED BOX")]
    avg02 = 0.2 * l.groupby("l_partkey").l_quantity.mean()
    j = l.merge(p[["p_partkey"]], left_on="l_partkey", right_on="p_partkey")
    j = j.merge(avg02.rename("thresh"), left_on="l_partkey", right_index=True)
    j = j[j.l_quantity < j.thresh]
    if len(j) == 0:
        return [(None,)]  # SUM over zero rows is NULL (then /7.0 stays NULL)
    return [(float(j.l_extendedprice.sum() / 7.0),)]


def oracle_q18(t):
    f = frames(t)
    l = f["lineitem"]
    big = l.groupby("l_orderkey").l_quantity.sum()
    big = big[big > 300].index
    o = f["orders"][f["orders"].o_orderkey.isin(big)]
    j = f["customer"].merge(o, left_on="c_custkey", right_on="o_custkey")
    j = j.merge(l, left_on="o_orderkey", right_on="l_orderkey")
    g = j.groupby(["c_name", "c_custkey", "o_orderkey", "o_orderdate",
                   "o_totalprice"]).l_quantity.sum().reset_index(name="sq")
    g = g.sort_values(["o_totalprice", "o_orderdate"], ascending=[False, True],
                      kind="stable").head(100)
    return _rows(g[["c_name", "c_custkey", "o_orderkey", "o_orderdate",
                    "o_totalprice", "sq"]])


def oracle_q19(t):
    f = frames(t)
    j = f["lineitem"].merge(f["part"], left_on="l_partkey", right_on="p_partkey")
    sm = j.l_shipmode.isin(["AIR", "AIR REG"]) & (
        j.l_shipinstruct == "DELIVER IN PERSON")
    c1 = ((j.p_brand == "Brand#12")
          & j.p_container.isin(["SM CASE", "SM BOX", "SM PACK", "SM PKG"])
          & (j.l_quantity >= 1) & (j.l_quantity <= 11)
          & (j.p_size >= 1) & (j.p_size <= 5))
    c2 = ((j.p_brand == "Brand#23")
          & j.p_container.isin(["MED BAG", "MED BOX", "MED PKG", "MED PACK"])
          & (j.l_quantity >= 10) & (j.l_quantity <= 20)
          & (j.p_size >= 1) & (j.p_size <= 10))
    c3 = ((j.p_brand == "Brand#34")
          & j.p_container.isin(["LG CASE", "LG BOX", "LG PACK", "LG PKG"])
          & (j.l_quantity >= 20) & (j.l_quantity <= 30)
          & (j.p_size >= 1) & (j.p_size <= 15))
    m = sm & (c1 | c2 | c3)
    if not m.any():
        return [(None,)]  # SUM over zero rows is NULL
    rev = (j.l_extendedprice * (1 - j.l_discount))[m].sum()
    return [(float(rev),)]


def oracle_q20(t):
    f = frames(t)
    forest = f["part"][f["part"].p_name.str.startswith("forest")].p_partkey
    l = f["lineitem"]
    l = l[(l.l_shipdate >= _D("1994-01-01")) & (l.l_shipdate < _D("1995-01-01"))]
    half = 0.5 * l.groupby(["l_partkey", "l_suppkey"]).l_quantity.sum()
    ps = f["partsupp"][f["partsupp"].ps_partkey.isin(forest)].copy()
    key = list(zip(ps.ps_partkey, ps.ps_suppkey))
    thr = half.reindex(key).values
    ok = ps[(~np.isnan(thr)) & (ps.ps_availqty > np.nan_to_num(thr))]
    sup = f["supplier"].merge(
        f["nation"][f["nation"].n_name == "CANADA"],
        left_on="s_nationkey", right_on="n_nationkey")
    sup = sup[sup.s_suppkey.isin(ok.ps_suppkey)]
    sup = sup.sort_values("s_name", kind="stable")
    return _rows(sup[["s_name", "s_address"]])


def oracle_q21(t):
    f = frames(t)
    l = f["lineitem"]
    late = l[l.l_receiptdate > l.l_commitdate]
    # per orderkey: number of distinct suppliers overall and late
    nsup = l.groupby("l_orderkey").l_suppkey.nunique()
    nsup_late = late.groupby("l_orderkey").l_suppkey.nunique()
    o = f["orders"][f["orders"].o_orderstatus == "F"]
    s = f["supplier"].merge(
        f["nation"][f["nation"].n_name == "SAUDI ARABIA"],
        left_on="s_nationkey", right_on="n_nationkey")
    j = late.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    j = j.merge(s, left_on="l_suppkey", right_on="s_suppkey")
    # exists: order has another supplier; not exists: no OTHER supplier late
    j["ns"] = j.l_orderkey.map(nsup)
    j["nl"] = j.l_orderkey.map(nsup_late).fillna(0)
    # this row's supplier is late, so "another supplier was late" iff nl > 1
    j = j[(j.ns > 1) & (j.nl == 1)]
    g = j.groupby("s_name").size().reset_index(name="numwait")
    g = g.sort_values(["numwait", "s_name"], ascending=[False, True],
                      kind="stable").head(100)
    return _rows(g)


def oracle_q22(t):
    f = frames(t)
    c = f["customer"].copy()
    codes = ["13", "31", "23", "29", "30", "18", "17"]
    c["cc"] = c.c_phone.str[:2]
    base = c[c.cc.isin(codes)]
    avg = base[base.c_acctbal > 0.0].c_acctbal.mean()
    has_order = np.unique(t["orders"]["o_custkey"])
    sel = base[(base.c_acctbal > avg) & ~base.c_custkey.isin(has_order)]
    g = sel.groupby("cc", sort=True).agg(
        n=("c_custkey", "size"), tot=("c_acctbal", "sum")).reset_index()
    return _rows(g)


ORACLES = {
    1: oracle_q1, 2: oracle_q2, 3: oracle_q3, 4: oracle_q4, 5: oracle_q5,
    6: oracle_q6, 7: oracle_q7, 8: oracle_q8, 9: oracle_q9, 10: oracle_q10,
    11: oracle_q11, 12: oracle_q12, 13: oracle_q13, 14: oracle_q14,
    15: oracle_q15, 16: oracle_q16, 17: oracle_q17, 18: oracle_q18,
    19: oracle_q19, 20: oracle_q20, 21: oracle_q21, 22: oracle_q22,
}
