"""Multi-executor scaling evidence via Spark local-cluster mode.

The north rule asks for the job at two CLUSTER sizes (N vs 4N
executors). local[N] proves compute-parallelism scaling but runs one
JVM with in-process shuffles; `local-cluster[E,C,M]` launches E real
standalone Worker JVMs with C cores and M MiB each — separate executor
processes, real netty shuffle transfers, real serialization — the
closest a single box gets to a multi-executor cluster. This tool runs
the full pages->triples pipeline at 1 executor vs 4 executors (same
total 2->8 cores as the local-mode legs) and reports throughput +
scaling efficiency.

Usage:
  python tools/cluster_scaling.py [--pages 100000] [--out FILE]

Each leg runs in its own subprocess (a local-cluster master cannot be
re-created inside a JVM that already ran a local master).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def leg(n_exec: int, cores_per_exec: int, mem_mb: int, corpus: str) -> dict:
    """One local-cluster leg: full pipeline over the corpus."""
    from causalre_spark.pipeline import run_pipeline
    from causalre_spark.session import get_spark

    # local-cluster needs SPARK_HOME so workers can find launch scripts
    import pyspark

    os.environ.setdefault("SPARK_HOME", os.path.dirname(pyspark.__file__))
    master = f"local-cluster[{n_exec},{cores_per_exec},{mem_mb}]"
    os.environ["MASTER"] = master  # get_spark honors a provided master
    spark = get_spark(
        app=f"cluster_scale_{n_exec}x{cores_per_exec}",
        extra_conf={
            "spark.master": master,
            "spark.executor.memory": f"{mem_mb}m",
            "spark.sql.shuffle.partitions":
                os.environ.get("SPARK_GRAFT_SCALE_SHUFFLE", "8"),
        })
    pages = spark.read.parquet(corpus).persist()
    pages.agg({"html": "count"}).collect()
    n_pages = pages.count()
    warm = run_pipeline(spark, pages.limit(2000), verify_extraction=False)
    warm["triples"].count()
    spark.catalog.clearCache()
    pages.persist()
    pages.agg({"html": "count"}).collect()
    timings: dict = {}
    t0 = time.time()
    res = run_pipeline(spark, pages, verify_extraction=False,
                       timings=timings)
    n_triples = res["triples"].count()
    secs = time.time() - t0
    n_execs_seen = len([
        e for e in spark.sparkContext._jsc.sc().statusTracker()
        .getExecutorInfos()]) - 1  # minus the driver row
    spark.stop()
    return {
        "master": master, "executors_seen": n_execs_seen,
        "n_pages": n_pages, "n_triples": n_triples,
        "secs": round(secs, 2),
        "extract_secs": timings.get("docs_secs"),
        "docs_per_sec": round(n_pages / secs, 2),
    }


def _child(n_exec: int, cores: int, mem: int, corpus: str) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--leg",
         "--execs", str(n_exec), "--cores", str(cores),
         "--mem", str(mem), "--corpus", corpus],
        capture_output=True, text=True, cwd=REPO, timeout=3600,
        env={**os.environ, "PYTHONPATH": REPO},
    )
    if out.returncode != 0:
        print(out.stderr[-4000:], file=sys.stderr)
        raise RuntimeError(f"local-cluster leg ({n_exec} execs) failed")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--leg", action="store_true")
    ap.add_argument("--execs", type=int, default=1)
    ap.add_argument("--cores", type=int, default=2)
    ap.add_argument("--mem", type=int, default=4096)
    ap.add_argument("--pages", type=int, default=int(
        os.environ.get("SPARK_GRAFT_CLUSTER_PAGES", "100000")))
    ap.add_argument("--corpus", type=str, default="")
    ap.add_argument("--repeats", type=int, default=int(
        os.environ.get("SPARK_GRAFT_CLUSTER_REPEATS", "2")))
    ap.add_argument("--out", type=str,
                    default=os.path.join(REPO, "BENCH", "CLUSTER.json"))
    args = ap.parse_args()

    if args.leg:
        print(json.dumps(leg(args.execs, args.cores, args.mem, args.corpus)))
        return 0

    from causalre_spark.session import get_spark

    spark = get_spark(app="cluster_gen", cores=8)
    from bench import _materialize_corpus

    corpus = _materialize_corpus(spark, args.pages, partitions=32)
    spark.stop()

    # 1 executor x 2 cores  vs  4 executors x 2 cores (N vs 4N
    # executors, the north rule's shape). INTERLEAVED fixed-count pairs,
    # min per leg — same estimator discipline as bench.py.
    lo_runs, hi_runs = [], []
    for _ in range(args.repeats):
        lo_runs.append(_child(1, 2, 6144, corpus))
        hi_runs.append(_child(4, 2, 6144, corpus))
    lo = min(lo_runs, key=lambda r: r["secs"])
    hi = min(hi_runs, key=lambda r: r["secs"])
    eff = (lo["secs"] / hi["secs"]) / 4
    result = {
        "low": lo, "high": hi,
        "efficiency": round(eff, 3),
        "all_runs": {"low": lo_runs, "high": hi_runs},
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
