"""Sources & sinks: parquet/CSV/JSON/ORC read/write, bucketed tables,
SQL view registry."""

from linqonsteroids_spark.sources.formats import (  # noqa: F401
    read_csv,
    read_json,
    read_orc,
    write_csv,
    write_json,
    write_orc,
)
from linqonsteroids_spark.sources.parquet import (  # noqa: F401
    register_views,
    write_bucketed_table,
    write_parquet,
)
