"""Dump `explain("formatted")` for named registered queries (or bench
overrides) to <outdir>/<name>_<tag>.txt — the judge-checkable plan
evidence for optimization rounds.

Usage: python tools/dump_plans.py <outdir> <tag> <query> [query ...]

Each query executes once (noop sink) first so AQE-finalized shapes and
cache materializations are in place, then the lazy plan is explained.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from elb_log_to_mysql_spark.queries import QUERIES  # noqa: E402
from elb_log_to_mysql_spark.session import build_session  # noqa: E402


def main() -> None:
    outdir, tag = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)
    spark = build_session(app_name="dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    import bench

    for name in names:
        fn = bench.OVERRIDES.get(name, QUERIES[name])
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
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
