"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference CDC streaming pipeline
(AnkitDB9/streaming-pipeline---Spark-Stream-and-kafla-for-cassendra).

One engine, two surfaces (SURVEY.md §7):

* **batch SQL analytics** — a declared-query registry
  (:mod:`.plans.registry`) over parquet tables, executed with the
  DataFrame API so Catalyst gets full pushdown/pruning/AQE;
* **structured streaming** — CDC-envelope decode, enrichment,
  watermarked event-time aggregation, multi-sink fan-out and an
  upsert lake sink (:mod:`.streaming`).

Everything is stock Spark; no custom Catalyst rules are needed
(SURVEY.md §4). The hot path never uses row-at-a-time Python UDFs —
built-in functions first, Arrow-vectorized pandas UDFs where Python
is unavoidable.
"""

from .session import get_session, stop_session
from .sources.tables import TABLES, load_table, load_tables, register_views

__version__ = "0.1.0"

__all__ = [
    "get_session",
    "stop_session",
    "TABLES",
    "load_table",
    "load_tables",
    "register_views",
    "__version__",
]
