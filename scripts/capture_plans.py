"""Capture .explain("formatted") for declared queries into plans/<tag>/.

Usage: python scripts/capture_plans.py <tag_suffix> <query> [query ...]
Writes plans/$SPARK_GRAFT_PLANS_TAG (default r15)/<query>_<tag_suffix>.txt  (tag_suffix: before|after)

Uses sf0.01 (plan shape is scale-independent; store-backed queries build
their stores in a temp warehouse exactly like the driver does).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    import __spark_entry__ as E
    from spark_indexedrdd_spark.session import get_spark

    spark = get_spark(app_name="capture_plans")
    qs = E.queries()
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", os.environ.get("SPARK_GRAFT_PLANS_TAG", "r15"),
    )
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = qs[name](spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
