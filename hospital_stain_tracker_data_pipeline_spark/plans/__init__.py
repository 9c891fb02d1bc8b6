"""Named query plans over the driver fixtures.

``catalog.CATALOG`` maps query name → QuerySpec(spark_fn, oracle_sql).
These back ``__spark_entry__.queries()`` / ``oracle_sql()`` — one entry
per operator in SURVEY.md §2 plus the large-scale training-data
extensions (dedup, similarity search, text analysis, multimodal).
"""

from .catalog import CATALOG, QuerySpec  # noqa: F401
