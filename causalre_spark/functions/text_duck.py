"""DuckDB-dialect twins of the portable SQL fragments.

DuckDB's regexp_replace replaces only the first match unless passed the
'g' flag, while Spark SQL always replaces globally — so the normalize
expression needs a dialect twin (same output, different spelling).
"""

NORMALIZE_SQL_DUCK = (
    "trim(regexp_replace(regexp_replace(lower({x}), '[^a-z0-9 ]+', ' ', 'g'),"
    " ' +', ' ', 'g'))"
)
