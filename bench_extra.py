"""Extra benchmark tooling for the optimization rounds (bench.py is
FROZEN for driver measurement — this file is for the builder's own
isolation runs; cite its numbers in OPTIMIZATION_r06.md).

Usage:
  python bench_extra.py --queries semantic_dedup,curation_verdict \
      --sf-dir /root/testdata/sf1.0 --passes 2 [--noop] [--explain plans/r06 --tag before]

Timing methodology matches bench.py (df.count() per pass, clearCache
between passes) unless --noop is given, which uses the noop sink from
the optimization guide §1.4 so every column of every row is computed.
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
    ap.add_argument("--queries", required=True,
                    help="comma-separated query names, or 'headline'")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--noop", action="store_true",
                    help="time a noop-sink write instead of count()")
    ap.add_argument("--explain", default="",
                    help="directory to write <query>_<tag>.txt explain files")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--cores", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from causalre_spark.plans.entry_queries import QUERIES
    from causalre_spark.session import get_spark

    if args.queries == "headline":
        from bench import HEADLINE
        names = list(HEADLINE)
    else:
        names = [q.strip() for q in args.queries.split(",") if q.strip()]

    spark = get_spark(app="bench_extra", cores=args.cores)
    samples: dict[str, list[float]] = {n: [] for n in names}
    rows: dict[str, int] = {}
    for p in range(args.passes):
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            df = QUERIES[name](spark, args.sf_dir)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
                n = -1
            else:
                n = df.count()
            dt = round(time.time() - t0, 3)
            samples[name].append(dt)
            rows[name] = n
            print(f"# pass {p + 1}/{args.passes} {name}: {n} rows in {dt}s",
                  file=sys.stderr)
            spark.sparkContext.setJobDescription(None)
        spark.catalog.clearCache()

    if args.explain:
        os.makedirs(args.explain, exist_ok=True)
        for name in names:
            df = QUERIES[name](spark, args.sf_dir)
            path = os.path.join(args.explain, f"{name}_{args.tag}.txt")
            with open(path, "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
            print(f"# wrote {path}", file=sys.stderr)
        spark.catalog.clearCache()

    spark.stop()
    print(json.dumps({
        "sf_dir": args.sf_dir,
        "mode": "noop" if args.noop else "count",
        "queries_min": {n: min(ts) for n, ts in samples.items()},
        "samples": samples,
        "rows": rows,
    }))


if __name__ == "__main__":
    main()
