#!/usr/bin/env python
"""Round-6 profiling harness (bench.py is frozen for measurement —
this file exists for guide-§1 isolation work: per-query timing with
job labels, ``noop``-sink runs that compute every column, and
``explain("formatted")`` capture for plans/r06/).

Usage:
    python bench_extra.py --sf /root/testdata/sf1.0 \
        --queries lang_id,embedding_knn --repeats 3 \
        [--mode count|noop] [--explain plans/r06 --suffix before]

Prints one JSON line: {"mode": ..., "queries": {name: [sec, ...]}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--cpus", default=os.environ.get(
        "SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--queries", default="")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--mode", choices=["count", "noop"], default="count")
    ap.add_argument("--explain", default="",
                    help="directory to write <q>_<suffix>.txt plans")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--warm", action="store_true",
                    help="one untimed warm run per query first")
    args = ap.parse_args()

    from westa_ocr_spark.registry import QUERIES
    from westa_ocr_spark.session import get_spark

    spark = get_spark(
        app_name="westa_bench_extra",
        master=f"local[{args.cpus}]",
        max_partition_bytes=4 * 1024 * 1024,
    )
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")

    names = (
        [q.strip() for q in args.queries.split(",") if q.strip()]
        or list(QUERIES)
    )
    out: dict[str, list[float]] = {}
    for name in names:
        fn, _ = QUERIES[name]
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            df = fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                f"{args.explain}/{name}_{args.suffix}.txt", "w"
            ) as f:
                f.write(plan)
        if args.warm:
            spark.sparkContext.setJobDescription(f"warm:{name}")
            fn(spark, args.sf).count()
        runs = []
        for i in range(args.repeats):
            spark.sparkContext.setJobDescription(f"{name}#{i}")
            t0 = time.time()
            df = fn(spark, args.sf)
            if args.mode == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            runs.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = runs
    print(json.dumps({"mode": args.mode, "sf": args.sf, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
