from causalre_spark.model import core  # noqa: F401
