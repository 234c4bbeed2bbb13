from causalre_spark.functions.hashing import (  # noqa: F401
    HEX_DIGITS,
    md5_long,
    md5_long_sql,
    minhash_sql,
)
