"""SparkSession factory tuned for this pipeline.

Local-mode defaults match the sandbox (local[32], 128 GiB); on a real
cluster the same builder is driven by spark-submit confs instead. AQE is
on for skew-join splitting and post-shuffle coalescing; Arrow batches
are size-capped so encoder UDF inner loops stay dense (input_hint).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from causalre_spark.config import DEFAULT_CONFIG, PipelineConfig


def get_spark(
    app: str = "causalre_spark",
    cores: int | None = None,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    extra_conf: dict | None = None,
) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # One BLAS thread per Python worker: N workers x K BLAS threads
    # oversubscribes the executor (measured 27% per-doc slowdown in the
    # encoder UDF from OpenBLAS coordination alone on tiny matmuls —
    # the model's arrays are far below multi-thread break-even). Local
    # mode: workers fork from this process, inheriting the env;
    # clusters: executorEnv carries it to every executor JVM.
    for var in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS",
                "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    # Under spark-submit the master (and cluster sizing) comes from the
    # submit command; hard-coding .master() here would silently hijack a
    # real cluster back to local mode. Only default to local[cores] when
    # no master was provided.
    from pyspark import SparkConf

    b = SparkSession.builder
    # spark-submit surfaces --master as spark.master in the defaults
    # conf (cluster deployments) or as the MASTER env var (the pip
    # distribution's launcher); either way, leave it alone.
    if not (os.environ.get("MASTER") or SparkConf().contains("spark.master")):
        b = b.master(f"local[{cores}]")
    # HotSpot refuses to JIT methods over 8000 bytecode bytes
    # (DontCompileHugeMethods, on by default): Catalyst's generated
    # whole-stage methods for wide literal chains (unrolled dot
    # products, k-means assignment argmax, PQ distance tables) exceed
    # that and would run in the BYTECODE INTERPRETER forever — measured
    # 25x on the SemDeDup pair stage (51 s -> 2 s warm at 10x bench
    # scale). Janino's own 64 KB limit still bounds method size; letting
    # the JIT compile what Janino accepted is strictly better than
    # interpreting it. Merged (not overwritten) with caller-supplied
    # java options; executors on a real cluster get the same flag.
    _jit_flag = "-XX:-DontCompileHugeMethods"
    extra_conf = dict(extra_conf or {})
    for opt_key in ("spark.driver.extraJavaOptions",
                    "spark.executor.extraJavaOptions"):
        supplied = extra_conf.pop(opt_key, None)
        extra_conf[opt_key] = (f"{supplied} {_jit_flag}" if supplied
                               else _jit_flag)
    b = (
        b.appName(app)
        .config("spark.sql.shuffle.partitions", str(max(cfg.shuffle_partitions, cores)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Spark 4.x implements upper/lower/initcap under UTF8_BINARY via
        # ICU by default; the FIRST use in each executor JVM triggers
        # CollationAwareUTF8String.<clinit>, which builds a per-codepoint
        # title-case table through ICU — measured 4+ MINUTES of
        # single-threaded CPU on this VM (thread dump: UCharacter
        # .toTitleCase inside <clinit>, all other tasks blocked on the
        # class-init monitor). That one-time stall lands in whatever
        # stage first touches lower() — here the linking tail — and
        # reads as a serial scaling bottleneck. JVM case mapping is
        # Unicode-correct, locale-invariant, and agrees with the frozen
        # Python (str.lower) and DuckDB twins on the normalizer's
        # domain; the oracle/parity suites gate that equivalence.
        .config("spark.sql.icu.caseMappings.enabled", "false")
        # columnar-cache compression runs DictionaryEncoding
        # .gatherCompressibilityStats over every cached string column:
        # one UTF8String.clone + boxed HashMap op PER ROW, interpreted.
        # Thread dumps of the scaling leg showed a single cache-build
        # task burning 25+ min in exactly these frames on the persisted
        # linking intermediates (high-cardinality short strings), made
        # worse by this VM's ~60-100 MB/s page-population rate. Our
        # caches are short-lived working sets on a 128 GiB box — build
        # speed matters, the ~2x size saving does not.
        .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(cfg.arrow_max_records))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.python.worker.reuse", "true")
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
        .config("spark.executorEnv.OMP_NUM_THREADS", "1")
        .config("spark.executorEnv.MKL_NUM_THREADS", "1")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
