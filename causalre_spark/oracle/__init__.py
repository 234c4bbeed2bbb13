from causalre_spark.oracle.pipeline import oracle_pipeline  # noqa: F401
