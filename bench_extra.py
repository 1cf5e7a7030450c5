#!/usr/bin/env python
"""Per-query isolation bench (guide §1.4): times individual registry queries
with the noop sink at a chosen scale factor, optionally dumping
``.explain("formatted")`` to a file per query. Supplementary tooling only —
the frozen ``bench.py`` remains the measured artifact.

Usage:
  python bench_extra.py [--sf DIR] [--reps N] [--explain-dir DIR] q1 q2 ...
  python bench_extra.py --all          # every HEADLINE query
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
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from crawling_infrastructure_spark.operators.corpus import release_checkpoints
    from crawling_infrastructure_spark.plans.queries import QUERIES
    from crawling_infrastructure_spark.session import get_spark
    from bench import HEADLINE_QUERIES

    from bench import PhaseInterference

    names = HEADLINE_QUERIES if args.all else args.names
    spark = get_spark(app_name="bench_extra", cpus=args.cpus)
    out: dict[str, list[float]] = {}
    meta: dict[str, list[dict]] = {}
    for name in names:
        walls = []
        meta[name] = []
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            ph = PhaseInterference()
            t0 = time.time()
            df = QUERIES[name](spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t0, 3))
            meta[name].append(ph.finish())
            release_checkpoints()
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            df = QUERIES[name](spark, args.sf)
            with open(os.path.join(args.explain_dir, f"{name}.txt"), "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
            release_checkpoints()
        out[name] = walls
        print(json.dumps({name: walls, "interference": meta[name]}), flush=True)
    print(json.dumps({"sf": args.sf, "walls": out, "min": {k: min(v) for k, v in out.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()
