#!/usr/bin/env python3
"""Replicate a driver-generated testdata dir K-fold with shifted keys,
producing a larger scale factor for full-precision gate sweeps (the
driver ships sf0.001/0.01/0.1; the money-sum erosion analysis in
SURVEY.md §5 predicts behavior at sf1+, and this builds the dataset to
CHECK that prediction with Verify + selfcheck before the driver can
trip over it).

Key consistency: every foreign key family shifts by the same per-copy
offset (orderkey in orders+lineitem, custkey in customer+orders, part/
supp keys in part/supplier+lineitem, user/event ids in events, doc and
vec ids in documents/embeddings), so join/agg semantics at the bigger
scale mirror the originals. region/nation stay as-is (dimensions).
Copy 0 is byte-identical to the source rows, so sf-invariant queries
(vec_id < 10 probes, etc.) keep their anchors.

Usage: python3 scale_testdata.py /root/testdata/sf0.1 /tmp/sf1 10
"""
import sys

import duckdb


def main(src: str, dst: str, k: int) -> None:
    con = duckdb.connect()
    con.execute(f"CREATE TABLE copies AS SELECT range AS i FROM range({k})")
    # per-family offsets: > max key in the source so copies never collide
    offs = {}
    for fam, table, col in [
        ("order", "orders", "o_orderkey"), ("cust", "customer", "c_custkey"),
        ("part", "part", "p_partkey"), ("supp", "supplier", "s_suppkey"),
        ("event", "events", "event_id"), ("user", "events", "user_id"),
        ("doc", "documents", "doc_id"), ("vec", "embeddings", "vec_id"),
    ]:
        offs[fam] = con.execute(
            f"SELECT max({col}) + 1 FROM '{src}/{table}.parquet'").fetchone()[0]

    def shift(col, fam):
        return f"{col} + i * {offs[fam]} AS {col}"

    plans = {
        "region": None,
        "nation": None,
        "customer": [shift("c_custkey", "cust"), "c_name", "c_nationkey",
                     "c_acctbal", "c_mktsegment"],
        "supplier": [shift("s_suppkey", "supp"), "s_name", "s_nationkey", "s_acctbal"],
        "part": [shift("p_partkey", "part"), "p_name", "p_brand", "p_type",
                 "p_size", "p_retailprice"],
        "orders": [shift("o_orderkey", "order"), shift("o_custkey", "cust"),
                   "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"],
        "lineitem": [shift("l_orderkey", "order"), shift("l_partkey", "part"),
                     shift("l_suppkey", "supp"), "l_linenumber", "l_quantity",
                     "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
                     "l_linestatus", "l_shipdate"],
        "events": [shift("event_id", "event"), "ts", shift("user_id", "user"),
                   "event_type", "value", "props"],
        "documents": [shift("doc_id", "doc"), "text", "lang", "source", "n_chars"],
        "embeddings": [shift("vec_id", "vec"), "embedding", "label"],
    }
    import os
    os.makedirs(dst, exist_ok=True)
    for table, cols in plans.items():
        if cols is None:
            con.execute(f"COPY (SELECT * FROM '{src}/{table}.parquet') "
                        f"TO '{dst}/{table}.parquet' (FORMAT PARQUET)")
        else:
            sel = ", ".join(cols)
            con.execute(
                f"COPY (SELECT {sel} FROM '{src}/{table}.parquet' CROSS JOIN copies) "
                f"TO '{dst}/{table}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{dst}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
