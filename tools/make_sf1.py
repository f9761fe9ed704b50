"""Synthesize an sf1 fixture (10x sf0.1) for the scale validation run.

The driver provides sf0.001/0.01/0.1 only; the 100 TB story is argued
from plan shapes verified at sf0.1. This script manufactures one more
order of magnitude so the slowest queries get an empirical
no-super-linear-blowup data point (VERDICT r4 item 6).

Construction: 10 key-shifted copies of every sf0.1 table. Foreign keys
shift by the SAME per-table base on both sides (l_orderkey and
o_orderkey both by max(o_orderkey)), so each copy joins exactly like
the original — cardinalities, join fan-outs and group counts all scale
linearly by design, which is precisely the property the validation
wants to test the ENGINE against. Content columns are perturbed so
content-addressed operators see new material rather than 10 exact
duplicates of everything: document text gets a per-copy suffix token,
embeddings are cyclically rotated by the copy index (norm- and
distribution-preserving), timestamps shift by one second per copy.
Dimension tables (region, nation) stay as-is.

Writes to /tmp/sf1 (outside the read-only /root/testdata). ~1 min.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
#: key-shifted copies of sf0.1: 10 -> sf1 (default), 100 -> sf10 for
#: the two-orders-of-magnitude datapoint on the linear scale paths
COPIES = int(sys.argv[2]) if len(sys.argv) > 2 else 10

#: table -> (key columns to shift, base expression table for each key)
SHIFTS = {
    "customer": {"c_custkey": "customer.c_custkey",
                 "c_nationkey": None},
    "supplier": {"s_suppkey": "supplier.s_suppkey",
                 "s_nationkey": None},
    "part": {"p_partkey": "part.p_partkey"},
    "orders": {"o_orderkey": "orders.o_orderkey",
               "o_custkey": "customer.c_custkey"},
    "lineitem": {"l_orderkey": "orders.o_orderkey",
                 "l_partkey": "part.p_partkey",
                 "l_suppkey": "supplier.s_suppkey"},
    "events": {"user_id": "events.user_id"},
    "documents": {"doc_id": "documents.doc_id"},
    "embeddings": {"vec_id": "embeddings.vec_id"},
}


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents",
              "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SRC}/{t}.parquet'")

    bases: dict[str, int] = {}

    def base(expr: str) -> int:
        if expr not in bases:
            tbl, col = expr.split(".")
            bases[expr] = con.execute(
                f"SELECT MAX({col}) + 1 FROM {tbl}").fetchone()[0]
        return bases[expr]

    for t in ("region", "nation"):
        con.execute(f"COPY (SELECT * FROM {t}) TO "
                    f"'{DST}/{t}.parquet' (FORMAT PARQUET)")
        print(t, "copied (dim)")

    for t, shifts in SHIFTS.items():
        cols = [r[0] for r in
                con.execute(f"DESCRIBE SELECT * FROM {t}").fetchall()]
        types = {r[0]: r[1] for r in
                 con.execute(f"DESCRIBE SELECT * FROM {t}").fetchall()}
        sel = []
        for c in cols:
            if c in shifts and shifts[c] is not None:
                sel.append(f"{c} + i.i * {base(shifts[c])} AS {c}")
            elif t == "documents" and c == "text":
                # new shingles/fingerprints per copy, minimal length drift
                sel.append("CASE WHEN i.i = 0 THEN text ELSE "
                           "text || ' c' || i.i END AS text")
            elif t == "embeddings" and c == "embedding":
                # cyclic rotation by copy index: same norm, same value
                # distribution, different vector -> no planted exact dups
                et = types[c]
                sel.append(
                    "CAST(CASE WHEN i.i = 0 THEN embedding ELSE "
                    "list_concat(embedding[(i.i % len(embedding)) + 1:],"
                    " embedding[1:(i.i % len(embedding))]) END "
                    f"AS {et}) AS {c}")
            elif types[c].startswith("TIMESTAMP") :
                sel.append(f"{c} + i.i * INTERVAL 1 SECOND AS {c}")
            else:
                sel.append(c)
        q = (f"COPY (SELECT {', '.join(sel)} FROM {t}, "
             f"(SELECT unnest(generate_series(0, {COPIES - 1})) AS i) i) "
             f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
        con.execute(q)
        n = con.execute(
            f"SELECT COUNT(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
        print(t, "->", n, "rows")


if __name__ == "__main__":
    main()
