"""Column-expression helper library — plain expression builders, no Catalyst
rules needed (SURVEY.md §4). Everything here compiles to built-in JVM-side
expressions; zero Python UDFs on the hot path (SURVEY.md §2.10)."""

from itdb_spark.functions.core import (  # noqa: F401
    decode_location,
    m3u_line,
    ms_to_hms,
    portable_hash64,
    sanitize_filename,
    stars,
)
from itdb_spark.functions.text import (  # noqa: F401
    char_ngrams,
    quality_score,
    stopword_ratio,
    tokens,
)
