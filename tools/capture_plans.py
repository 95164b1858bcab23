"""Capture `.explain("formatted")` for declared queries into
plans/r11/<name>_<tag>.txt (the optimization-round deliverable).

Usage: python tools/capture_plans.py <tag> <query> [query...]
Runs each queries() entry (building its fixtures at sf0.01, same as the
oracle gate) and writes the formatted plan of the returned DataFrame.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out_dir = os.path.join(REPO, "plans", os.environ.get("PLANS_ROUND", "r12"))
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as E
    from flink_table_store_spark.session import get_spark

    spark = get_spark("capture-plans")
    qs = E.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
