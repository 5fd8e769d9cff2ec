"""TPC-H-like workload: synthetic lineitem/orders/customer tables and
Q1/Q3/Q5-shaped/Q6 queries end-to-end through the SQL engine.

NOT official TPC-H (no dbgen, uniform synthetic data) — a workload with
the same operator shapes: multi-way joins, date filters, grouped
aggregates over expressions, ORDER BY + LIMIT.

Usage: python benchmarks/tpch.py [--scale 0.1] [--verify]
  --scale 1.0 ≈ 6M lineitem rows (like SF1); default 0.25
  --verify    cross-check every query against pandas (slow at scale)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("DFTPU_X64", "0")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def gen_tables(scale: float, seed: int = 0):
    """Synthetic TPC-H-shaped tables as numpy column dicts."""
    rng = np.random.default_rng(seed)
    n_li = int(6_000_000 * scale)
    n_ord = max(int(1_500_000 * scale), 1)
    n_cust = max(int(150_000 * scale), 1)
    day0 = int(np.datetime64("1992-01-01", "D").astype(np.int64))
    day1 = int(np.datetime64("1998-12-01", "D").astype(np.int64))

    n_part = max(int(200_000 * scale), 1)
    n_supp = max(int(10_000 * scale), 1)

    orders = {
        "o_orderkey": np.arange(n_ord, dtype=np.int32),
        # top ~5% of custkeys place no orders: NOT EXISTS (q22) and
        # LEFT-JOIN zero-count (q13) shapes stay non-trivial at any scale
        "o_custkey": rng.integers(0, max(int(n_cust * 0.95), 1), n_ord).astype(
            np.int32
        ),
        "o_orderdate": rng.integers(day0, day1, n_ord).astype("datetime64[D]"),
        "o_shippriority": rng.integers(0, 2, n_ord).astype(np.int32),
        "o_orderpriority": rng.choice(
            np.array(
                ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
            ),
            n_ord,
        ),
    }
    commit = rng.integers(day0, day1 + 60, n_li)
    lineitem = {
        "l_orderkey": rng.integers(0, n_ord, n_li).astype(np.int32),
        "l_partkey": rng.integers(0, n_part, n_li).astype(np.int32),
        "l_suppkey": rng.integers(0, n_supp, n_li).astype(np.int32),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float32),
        "l_extendedprice": (rng.random(n_li, dtype=np.float32) * 100000).round(2),
        # float64: decimal literals like 0.05 then compare exactly on the
        # CPU (x64) path and consistently f32-vs-f32 on TPU; an f32
        # column against an f64 literal is the classic 0.07f32 > 0.07
        # boundary trap (engine coerces to the supertype, f64)
        "l_discount": rng.integers(0, 11, n_li) / 100,
        "l_tax": rng.integers(0, 9, n_li) / 100,
        "l_returnflag": rng.choice(np.array(["A", "N", "R"]), n_li),
        "l_linestatus": rng.choice(np.array(["F", "O"]), n_li),
        "l_shipdate": rng.integers(day0, day1 + 90, n_li).astype("datetime64[D]"),
        "l_commitdate": commit.astype("datetime64[D]"),
        "l_receiptdate": (commit + rng.integers(-15, 46, n_li)).astype(
            "datetime64[D]"
        ),
        "l_shipmode": rng.choice(
            np.array(["MAIL", "SHIP", "AIR", "TRUCK", "RAIL"]), n_li
        ),
    }
    segments = np.array(
        ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    )
    nations = np.array([f"NATION_{i:02d}" for i in range(25)])
    customer = {
        "c_custkey": np.arange(n_cust, dtype=np.int32),
        "c_mktsegment": rng.choice(segments, n_cust),
        "c_nation": rng.choice(nations, n_cust),
    }
    part = {
        "p_partkey": np.arange(n_part, dtype=np.int32),
        "p_type": rng.choice(
            np.array(
                [
                    "PROMO BRUSHED", "PROMO PLATED", "STANDARD POLISHED",
                    "MEDIUM BURNISHED", "ECONOMY ANODIZED", "SMALL PLATED",
                ]
            ),
            n_part,
        ),
        "p_brand": rng.choice(
            np.array([f"Brand#{i}" for i in range(1, 6)]), n_part
        ),
        "p_container": rng.choice(
            np.array(
                ["SM CASE", "SM BOX", "MED BAG", "MED BOX", "LG CASE", "LG BOX"]
            ),
            n_part,
        ),
        "p_size": rng.integers(1, 51, n_part).astype(np.int32),
        # supply-cost stand-in (q9's ps_supplycost without a partsupp
        # table; profit = price*(1-disc) - p_cost*qty)
        "p_cost": (rng.random(n_part, dtype=np.float32) * 100).round(2),
    }
    return lineitem, orders, customer, part


Q1 = """
SELECT l_returnflag, l_linestatus,
       SUM(l_quantity), SUM(l_extendedprice),
       SUM(l_extendedprice * (1 - l_discount)),
       SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)),
       AVG(l_quantity), AVG(l_extendedprice), AVG(l_discount),
       COUNT(l_quantity)
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

Q3 = """
SELECT o_orderkey, SUM(l_extendedprice * (1 - l_discount)) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < DATE '1995-03-15'
  AND l_shipdate > DATE '1995-03-15'
GROUP BY o_orderkey
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""

Q5ish = """
SELECT c_nation, SUM(l_extendedprice * (1 - l_discount)) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE o_orderdate >= DATE '1994-01-01' AND o_orderdate < DATE '1995-01-01'
GROUP BY c_nation
ORDER BY revenue DESC
"""

Q6 = """
SELECT SUM(l_extendedprice * l_discount)
FROM lineitem
WHERE l_shipdate >= DATE '1994-01-01' AND l_shipdate < DATE '1995-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""

Q10ish = """
SELECT c_custkey, c_nation, SUM(l_extendedprice * (1 - l_discount)) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE o_orderdate >= DATE '1993-10-01' AND o_orderdate < DATE '1994-01-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_nation
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""

Q12ish = """
SELECT l_shipmode,
       SUM(CASE WHEN o_shippriority = 1 THEN 1 ELSE 0 END) AS high_line_count,
       SUM(CASE WHEN o_shippriority <> 1 THEN 1 ELSE 0 END) AS low_line_count
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipmode IN ('MAIL', 'SHIP')
  AND l_shipdate >= DATE '1994-01-01' AND l_shipdate < DATE '1995-01-01'
GROUP BY l_shipmode
ORDER BY l_shipmode
"""

Q18ish = """
SELECT o_orderkey, SUM(l_quantity) AS total_qty
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderkey
HAVING SUM(l_quantity) > 220
ORDER BY total_qty DESC, o_orderkey
LIMIT 100
"""

Q4ish = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= DATE '1993-07-01' AND o_orderdate < DATE '1993-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_commitdate < l_receiptdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

Q13ish = """
WITH high AS (SELECT o_custkey, o_orderkey FROM orders WHERE o_shippriority = 1)
SELECT c_count, COUNT(*) AS custdist
FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN high ON c_custkey = o_custkey
      GROUP BY c_custkey) co
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""

Q14ish = """
SELECT 100.0 * SUM(CASE WHEN p_type LIKE 'PROMO%'
                        THEN l_extendedprice * (1 - l_discount)
                        ELSE 0 END)
       / SUM(l_extendedprice * (1 - l_discount)) AS promo_revenue
FROM lineitem, part
WHERE l_partkey = p_partkey
  AND l_shipdate >= DATE '1995-09-01' AND l_shipdate < DATE '1995-10-01'
"""

Q16ish = """
SELECT p_brand, p_type, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM part JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN (1, 14, 23, 45)
  AND l_suppkey NOT IN (SELECT l_suppkey FROM lineitem
                       WHERE l_quantity > 49 AND l_extendedprice > 99000)
GROUP BY p_brand, p_type
ORDER BY supplier_cnt DESC, p_brand, p_type
LIMIT 20
"""

Q17ish = """
SELECT SUM(l_extendedprice) / 7.0 AS avg_yearly
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND p_brand = 'Brand#2' AND p_container = 'MED BOX'
  AND l_quantity < (SELECT 0.5 * AVG(l_quantity) FROM lineitem l2
                    WHERE l2.l_partkey = p_partkey)
"""

Q19ish = """
SELECT SUM(l_extendedprice * (1 - l_discount)) AS revenue
FROM lineitem, part
WHERE p_partkey = l_partkey AND (
      (p_brand = 'Brand#1' AND p_container IN ('SM CASE', 'SM BOX')
       AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
   OR (p_brand = 'Brand#2' AND p_container IN ('MED BAG', 'MED BOX')
       AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
   OR (p_brand = 'Brand#3' AND p_container IN ('LG CASE', 'LG BOX')
       AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15))
"""

Q20ish = """
SELECT c_nation, COUNT(*) AS cnt
FROM customer
WHERE c_custkey IN (
    SELECT o_custkey FROM orders WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem WHERE l_shipdate >= DATE '1998-06-01'))
GROUP BY c_nation
ORDER BY c_nation
"""

Q21ish = """
SELECT o_shippriority, COUNT(*) AS cnt
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_receiptdate > l_commitdate)
  AND NOT EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipmode = 'AIR')
GROUP BY o_shippriority
ORDER BY o_shippriority
"""

Q22ish = """
SELECT SUBSTR(c_nation, 8, 1) AS cntrycode, COUNT(*) AS numcust
FROM customer
WHERE SUBSTR(c_nation, 8, 1) IN ('0', '1', '2')
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY cntrycode
ORDER BY cntrycode
"""

Q2ish = """
SELECT p_partkey, l_suppkey, l_extendedprice
FROM part, lineitem
WHERE p_partkey = l_partkey AND p_type LIKE 'PROMO%'
  AND l_extendedprice = (SELECT MIN(l2.l_extendedprice) FROM lineitem l2
                         WHERE l2.l_partkey = p_partkey)
ORDER BY l_extendedprice, p_partkey, l_suppkey
LIMIT 10
"""

Q7ish = """
SELECT c_nation, EXTRACT(YEAR FROM o_orderdate) AS o_year,
       SUM(l_extendedprice * (1 - l_discount)) AS volume
FROM customer, orders, lineitem
WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
  AND (c_nation = 'NATION_01' OR c_nation = 'NATION_02')
  AND l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1997-01-01'
GROUP BY c_nation, o_year
ORDER BY c_nation, o_year
"""

Q8ish = """
SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
       SUM(CASE WHEN c_nation = 'NATION_03'
                THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
       / SUM(l_extendedprice * (1 - l_discount)) AS mkt_share
FROM customer, orders, lineitem
WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
  AND o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1997-01-01'
GROUP BY o_year
ORDER BY o_year
"""

Q9ish = """
SELECT c_nation, EXTRACT(YEAR FROM o_orderdate) AS o_year,
       SUM(l_extendedprice * (1 - l_discount) - p_cost * l_quantity) AS profit
FROM customer, orders, lineitem, part
WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
  AND p_partkey = l_partkey
GROUP BY c_nation, o_year
ORDER BY c_nation, o_year DESC
LIMIT 40
"""

Q11ish = """
SELECT l_partkey, SUM(l_extendedprice * l_quantity) AS value
FROM lineitem
GROUP BY l_partkey
HAVING SUM(l_extendedprice * l_quantity) >
       (SELECT SUM(l_extendedprice * l_quantity) * 0.000006 FROM lineitem)
ORDER BY value DESC, l_partkey
LIMIT 20
"""

Q15ish = """
WITH revenue AS (
  SELECT l_suppkey, SUM(l_extendedprice * (1 - l_discount)) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
  GROUP BY l_suppkey)
SELECT l_suppkey, total_revenue
FROM revenue
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY l_suppkey
"""

QUERIES = {
    "q1": Q1, "q2ish": Q2ish, "q3": Q3, "q4ish": Q4ish, "q5ish": Q5ish,
    "q6": Q6, "q7ish": Q7ish, "q8ish": Q8ish, "q9ish": Q9ish,
    "q10ish": Q10ish, "q11ish": Q11ish, "q12ish": Q12ish, "q13ish": Q13ish,
    "q14ish": Q14ish, "q15ish": Q15ish, "q16ish": Q16ish, "q17ish": Q17ish,
    "q18ish": Q18ish, "q19ish": Q19ish, "q20ish": Q20ish, "q21ish": Q21ish,
    "q22ish": Q22ish,
}


def pandas_reference(name, lineitem, orders, customer, part=None):
    import pandas as pd

    li = pd.DataFrame(lineitem)
    od = pd.DataFrame(orders)
    cu = pd.DataFrame(customer)
    pt = None if part is None else pd.DataFrame(part)
    if name == "q1":
        f = li[li.l_shipdate <= np.datetime64("1998-09-02")].copy()
        f["disc"] = f.l_extendedprice * (1 - f.l_discount)
        f["charge"] = f.disc * (1 + f.l_tax)
        g = f.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sq=("l_quantity", "sum"), sp=("l_extendedprice", "sum"),
            sd=("disc", "sum"), sc=("charge", "sum"),
            aq=("l_quantity", "mean"), ap=("l_extendedprice", "mean"),
            ad=("l_discount", "mean"), n=("l_quantity", "count"),
        )
        return g.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)
    if name == "q3":
        m = cu[cu.c_mktsegment == "BUILDING"].merge(
            od[od.o_orderdate < np.datetime64("1995-03-15")],
            left_on="c_custkey", right_on="o_custkey",
        ).merge(
            li[li.l_shipdate > np.datetime64("1995-03-15")],
            left_on="o_orderkey", right_on="l_orderkey",
        )
        m["rev"] = m.l_extendedprice * (1 - m.l_discount)
        g = m.groupby("o_orderkey", as_index=False).rev.sum()
        return g.sort_values(["rev", "o_orderkey"], ascending=[False, True]).head(10).reset_index(drop=True)
    if name == "q5ish":
        m = cu.merge(
            od[
                (od.o_orderdate >= np.datetime64("1994-01-01"))
                & (od.o_orderdate < np.datetime64("1995-01-01"))
            ],
            left_on="c_custkey", right_on="o_custkey",
        ).merge(li, left_on="o_orderkey", right_on="l_orderkey")
        m["rev"] = m.l_extendedprice * (1 - m.l_discount)
        g = m.groupby("c_nation", as_index=False).rev.sum()
        return g.sort_values("rev", ascending=False).reset_index(drop=True)
    if name == "q6":
        f = li[
            (li.l_shipdate >= np.datetime64("1994-01-01"))
            & (li.l_shipdate < np.datetime64("1995-01-01"))
            & (li.l_discount >= 0.05)
            & (li.l_discount <= 0.07)
            & (li.l_quantity < 24)
        ]
        return float((f.l_extendedprice * f.l_discount).sum())
    if name == "q10ish":
        m = cu.merge(
            od[
                (od.o_orderdate >= np.datetime64("1993-10-01"))
                & (od.o_orderdate < np.datetime64("1994-01-01"))
            ],
            left_on="c_custkey", right_on="o_custkey",
        ).merge(
            li[li.l_returnflag == "R"],
            left_on="o_orderkey", right_on="l_orderkey",
        )
        m["rev"] = m.l_extendedprice * (1 - m.l_discount)
        g = m.groupby(["c_custkey", "c_nation"], as_index=False).rev.sum()
        return (
            g.sort_values(["rev", "c_custkey"], ascending=[False, True])
            .head(20).reset_index(drop=True)
        )
    if name == "q12ish":
        f = li[
            li.l_shipmode.isin(["MAIL", "SHIP"])
            & (li.l_shipdate >= np.datetime64("1994-01-01"))
            & (li.l_shipdate < np.datetime64("1995-01-01"))
        ].merge(od, left_on="l_orderkey", right_on="o_orderkey")
        f["hi"] = (f.o_shippriority == 1).astype(int)
        f["lo"] = (f.o_shippriority != 1).astype(int)
        g = f.groupby("l_shipmode", as_index=False).agg(
            hi=("hi", "sum"), lo=("lo", "sum")
        )
        return g.sort_values("l_shipmode").reset_index(drop=True)
    if name == "q18ish":
        g = (
            li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
            .groupby("o_orderkey", as_index=False).l_quantity.sum()
        )
        g = g[g.l_quantity > 220]
        return (
            g.sort_values(["l_quantity", "o_orderkey"], ascending=[False, True])
            .head(100).reset_index(drop=True)
        )
    if name == "q4ish":
        ok = li[li.l_commitdate < li.l_receiptdate].l_orderkey.unique()
        f = od[
            (od.o_orderdate >= np.datetime64("1993-07-01"))
            & (od.o_orderdate < np.datetime64("1993-10-01"))
            & od.o_orderkey.isin(ok)
        ]
        g = f.groupby("o_orderpriority", as_index=False).size()
        return g.sort_values("o_orderpriority").reset_index(drop=True)
    if name == "q13ish":
        high = od[od.o_shippriority == 1]
        m = cu.merge(
            high, left_on="c_custkey", right_on="o_custkey", how="left"
        )
        g1 = m.groupby("c_custkey", as_index=False).agg(
            c_count=("o_orderkey", "count")
        )
        g = g1.groupby("c_count", as_index=False).size()
        return g.sort_values(
            ["size", "c_count"], ascending=[False, False]
        ).reset_index(drop=True)
    if name == "q14ish":
        f = li[
            (li.l_shipdate >= np.datetime64("1995-09-01"))
            & (li.l_shipdate < np.datetime64("1995-10-01"))
        ].merge(pt, left_on="l_partkey", right_on="p_partkey")
        rev = f.l_extendedprice * (1 - f.l_discount)
        promo = rev[f.p_type.str.startswith("PROMO")].sum()
        return float(100.0 * promo / rev.sum())
    if name == "q16ish":
        bad = li[(li.l_quantity > 49) & (li.l_extendedprice > 99000)].l_suppkey.unique()
        m = pt.merge(li, left_on="p_partkey", right_on="l_partkey")
        f = m[
            (m.p_brand != "Brand#1")
            & m.p_size.isin([1, 14, 23, 45])
            & ~m.l_suppkey.isin(bad)
        ]
        g = f.groupby(["p_brand", "p_type"], as_index=False).l_suppkey.nunique()
        return (
            g.sort_values(
                ["l_suppkey", "p_brand", "p_type"],
                ascending=[False, True, True],
            )
            .head(20).reset_index(drop=True)
        )
    if name == "q17ish":
        halfavg = li.groupby("l_partkey").l_quantity.mean() * 0.5
        m = li.merge(
            pt[(pt.p_brand == "Brand#2") & (pt.p_container == "MED BOX")],
            left_on="l_partkey", right_on="p_partkey",
        )
        f = m[m.l_quantity < m.l_partkey.map(halfavg)]
        return float(f.l_extendedprice.sum() / 7.0)
    if name == "q19ish":
        m = li.merge(pt, left_on="l_partkey", right_on="p_partkey")
        c1 = (
            (m.p_brand == "Brand#1")
            & m.p_container.isin(["SM CASE", "SM BOX"])
            & m.l_quantity.between(1, 11) & m.p_size.between(1, 5)
        )
        c2 = (
            (m.p_brand == "Brand#2")
            & m.p_container.isin(["MED BAG", "MED BOX"])
            & m.l_quantity.between(10, 20) & m.p_size.between(1, 10)
        )
        c3 = (
            (m.p_brand == "Brand#3")
            & m.p_container.isin(["LG CASE", "LG BOX"])
            & m.l_quantity.between(20, 30) & m.p_size.between(1, 15)
        )
        f = m[c1 | c2 | c3]
        return float((f.l_extendedprice * (1 - f.l_discount)).sum())
    if name == "q20ish":
        lk = li[li.l_shipdate >= np.datetime64("1998-06-01")].l_orderkey.unique()
        ck = od[od.o_orderkey.isin(lk)].o_custkey.unique()
        f = cu[cu.c_custkey.isin(ck)]
        g = f.groupby("c_nation", as_index=False).size()
        return g.sort_values("c_nation").reset_index(drop=True)
    if name == "q21ish":
        late = li[li.l_receiptdate > li.l_commitdate].l_orderkey.unique()
        air = li[li.l_shipmode == "AIR"].l_orderkey.unique()
        f = od[od.o_orderkey.isin(late) & ~od.o_orderkey.isin(air)]
        g = f.groupby("o_shippriority", as_index=False).size()
        return g.sort_values("o_shippriority").reset_index(drop=True)
    if name == "q2ish":
        pmin = li.groupby("l_partkey").l_extendedprice.min()
        m = li.merge(
            pt[pt.p_type.str.startswith("PROMO")],
            left_on="l_partkey", right_on="p_partkey",
        )
        f = m[m.l_extendedprice == m.l_partkey.map(pmin)]
        return (
            f[["p_partkey", "l_suppkey", "l_extendedprice"]]
            .sort_values(["l_extendedprice", "p_partkey", "l_suppkey"])
            .head(10).reset_index(drop=True)
        )
    if name == "q7ish":
        m = cu[cu.c_nation.isin(["NATION_01", "NATION_02"])].merge(
            od, left_on="c_custkey", right_on="o_custkey"
        ).merge(
            li[
                (li.l_shipdate >= np.datetime64("1995-01-01"))
                & (li.l_shipdate < np.datetime64("1997-01-01"))
            ],
            left_on="o_orderkey", right_on="l_orderkey",
        )
        m["o_year"] = m.o_orderdate.dt.year
        m["volume"] = m.l_extendedprice * (1 - m.l_discount)
        g = m.groupby(["c_nation", "o_year"], as_index=False).volume.sum()
        return g.sort_values(["c_nation", "o_year"]).reset_index(drop=True)
    if name == "q8ish":
        m = cu.merge(
            od[
                (od.o_orderdate >= np.datetime64("1995-01-01"))
                & (od.o_orderdate < np.datetime64("1997-01-01"))
            ],
            left_on="c_custkey", right_on="o_custkey",
        ).merge(li, left_on="o_orderkey", right_on="l_orderkey")
        m["o_year"] = m.o_orderdate.dt.year
        m["vol"] = m.l_extendedprice * (1 - m.l_discount)
        m["nat"] = np.where(m.c_nation == "NATION_03", m.vol, 0.0)
        g = m.groupby("o_year", as_index=False).agg(
            nat=("nat", "sum"), vol=("vol", "sum")
        )
        g["mkt_share"] = g.nat / g.vol
        return g[["o_year", "mkt_share"]].sort_values("o_year").reset_index(
            drop=True
        )
    if name == "q9ish":
        m = cu.merge(od, left_on="c_custkey", right_on="o_custkey").merge(
            li, left_on="o_orderkey", right_on="l_orderkey"
        ).merge(pt, left_on="l_partkey", right_on="p_partkey")
        m["o_year"] = m.o_orderdate.dt.year
        m["profit"] = (
            m.l_extendedprice * (1 - m.l_discount) - m.p_cost * m.l_quantity
        )
        g = m.groupby(["c_nation", "o_year"], as_index=False).profit.sum()
        return (
            g.sort_values(["c_nation", "o_year"], ascending=[True, False])
            .head(40).reset_index(drop=True)
        )
    if name == "q11ish":
        v = li.assign(v=li.l_extendedprice * li.l_quantity)
        g = v.groupby("l_partkey", as_index=False).v.sum()
        thr = float(v.v.sum()) * 0.000006
        g = g[g.v > thr]
        return (
            g.sort_values(["v", "l_partkey"], ascending=[False, True])
            .head(20).reset_index(drop=True)
        )
    if name == "q15ish":
        f = li[
            (li.l_shipdate >= np.datetime64("1996-01-01"))
            & (li.l_shipdate < np.datetime64("1996-04-01"))
        ].assign(rev=lambda d: d.l_extendedprice * (1 - d.l_discount))
        g = f.groupby("l_suppkey", as_index=False).rev.sum()
        g = g[g.rev == g.rev.max()]
        return g.sort_values("l_suppkey").reset_index(drop=True)
    if name == "q22ish":
        # .assign AFTER filtering re-expands an empty frame to the
        # series' index (pandas alignment quirk) — assign first
        cu2 = cu.assign(cc=cu.c_nation.str[7:8])
        withord = od.o_custkey.unique()
        f = cu2[cu2.cc.isin(["0", "1", "2"]) & ~cu2.c_custkey.isin(withord)]
        g = f.groupby("cc", as_index=False).size()
        return g.sort_values("cc").reset_index(drop=True)
    raise ValueError(name)


def verify(name, res, lineitem, orders, customer, part=None, rel=2e-3):
    """Tolerance compare against pandas (f32 reductions vs f64).
    Positional columns — duplicate auto-derived column names make the
    to_pylist dicts lossy for Q1's repeated SUM(expr) items."""
    ref = pandas_reference(name, lineitem, orders, customer, part)
    if isinstance(ref, float):  # scalar-result queries (q6/q14/q17/q19)
        got = res.column_values(0)[0]
        if got is None:
            # SQL SUM over zero rows is NULL; pandas renders 0.0/NaN
            assert ref == 0.0 or np.isnan(ref), (name, got, ref)
            return
        assert abs(got - ref) <= rel * max(1.0, abs(ref)), (name, got, ref)
        return
    assert res.num_rows == len(ref), (name, res.num_rows, len(ref))
    cols = [res.column_values(j) for j in range(res.num_columns)]
    for i in range(res.num_rows):
        for j in range(res.num_columns):
            g, r = cols[j][i], ref.iloc[i, j]
            if isinstance(g, str):
                assert g == r, (name, i, j, g, r)
            elif hasattr(g, "year") or g is None:
                continue
            else:
                assert abs(float(g) - float(r)) <= rel * max(1.0, abs(float(r))), (
                    name, i, j, g, r)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=0.25)
    ap.add_argument("--verify", action="store_true")
    ap.add_argument("--queries", default=",".join(QUERIES))
    args = ap.parse_args()

    import datafusion_tpu as df

    lineitem, orders, customer, part = gen_tables(args.scale)
    ctx = df.ExecutionContext()
    t0 = time.time()
    ctx.register_table("lineitem", df.Table.from_pydict(lineitem))
    ctx.register_table("orders", df.Table.from_pydict(orders))
    ctx.register_table("customer", df.Table.from_pydict(customer))
    ctx.register_table("part", df.Table.from_pydict(part))
    print(
        f"[tpch] scale={args.scale} lineitem={len(lineitem['l_orderkey']):,} "
        f"rows, load {time.time()-t0:.1f}s", file=sys.stderr,
    )

    out = []
    for name in args.queries.split(","):
        sql = QUERIES[name]
        t0 = time.time()
        res = ctx.sql(sql)
        cold = time.time() - t0
        t0 = time.time()
        res = ctx.sql(sql)
        warm = time.time() - t0
        entry = {
            "query": name,
            "rows": res.num_rows,
            "warm_s": round(warm, 4),
            "cold_s": round(cold, 2),
        }
        if args.verify:
            verify(name, res, lineitem, orders, customer, part)
            entry["verified"] = True
        out.append(entry)
        print(json.dumps(entry), flush=True)
    print(json.dumps({"tpch": out}))


if __name__ == "__main__":
    main()
