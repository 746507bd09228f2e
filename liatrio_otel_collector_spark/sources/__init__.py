from .sequences import (  # noqa: F401
    SEVERITIES,
    SOURCES,
    duckdb_sequences_cte,
    enrich_dim,
    duckdb_enrich_dim_cte,
    rows_for_sf,
    sequences,
)
from .tables import load_table, load_tables  # noqa: F401
