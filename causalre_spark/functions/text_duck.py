"""DuckDB-dialect twins of the portable SQL fragments.

DuckDB string literals do NOT treat backslash as an escape (unlike
Spark SQL), so the punctuation set is quoted differently; the computed
values are identical across Spark SQL / DuckDB / Python
(functions.text.normalize).
"""

from causalre_spark.functions.text import PUNCT, _SPACES, _sql_quote

NORMALIZE_SQL_DUCK = (
    "coalesce(array_to_string(list_filter(string_split(translate(lower({x}), "
    + _sql_quote(PUNCT, backslash_escapes=False).replace("{", "{{").replace("}", "}}")
    + f", '{_SPACES}'), ' '), s -> s != ''), ' '), '')"
)
