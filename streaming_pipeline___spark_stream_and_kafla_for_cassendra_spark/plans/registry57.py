"""Round-5 registry additions, batch 44 — physical-layout surface:
bucketed tables and exchange-free co-located joins.

Same contract as ``registry.py``. Imported at the bottom of
``registry.py``.

Bucketing is the storage-side half of the shuffle story this engine
is built around: every other join in the catalog either broadcasts
the small side or pays one hash exchange per side, but a fact table
that is WRITTEN bucketed on its join key is joined exchange-free on
every subsequent read — at 100 TB that converts the dominant
recurring cost (re-shuffling the same fact table for every query) to
a one-time write-side cost. The reference's lake sink
(multi_source_streaming_processor.py:260-292) writes Hudi tables
keyed by record key but never exploits co-location; this row
demonstrates the Spark-native layout contract end to end: bucketBy
write → catalog round-trip → merge join with ZERO exchange on either
side (pinned by ``tests/test_plan_lint.py::test_bucketed_join_is_
exchange_free``).

The builder writes real bucketed tables (8 buckets, sortBy the key)
to a temp location, so its cost is execution not plan shape — tagged
``bucketed-write``, which the catalog-wide plan lint and
``tools/plan_sweep.py`` treat as exec-at-build.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from .registry import _register, _t

_N_BUCKETS = 8


@_register(
    "bucketed_join_exchange_free",
    """
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_orders,
           floor(sum(o_totalprice) * 100 + 0.5) / 100 AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    "Bucketed co-located join (the 100 TB shuffle-elimination "
    "contract): orders and customer are WRITTEN as 8-bucket tables "
    "on their join key (bucketBy + sortBy through the session "
    "catalog), then merge-joined — the bucketed scans satisfy the "
    "join's distribution requirement so NEITHER side exchanges "
    "(plan-pinned in tests/test_plan_lint.py; the only shuffle left "
    "is the final per-segment aggregate). Revenue uses the stable "
    "floor-to-cents fold so the DuckDB twin matches bit-for-bit",
    ("join", "storage", "layout", "bucketed-write", "tpch"),
)
def bucketed_join_exchange_free(spark, sf_dir):
    import re

    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    # STABLE per-(sf, session) location + session-unique table names:
    # a fresh mkdtemp per invocation leaked orders+customer copies on
    # every bench sweep (DROP TABLE on an external table keeps the
    # data dir), and fixed global names race if two sessions share a
    # metastore. Overwrite-in-place at a deterministic path instead.
    sf_tag = re.sub(r"[^A-Za-z0-9]+", "_", os.path.abspath(sf_dir)).strip("_")
    app_tag = re.sub(
        r"[^A-Za-z0-9]+", "_", spark.sparkContext.applicationId
    ).strip("_")
    base = os.path.join(
        tempfile.gettempdir(), f"bucketed_join_{sf_tag}_{app_tag}"
    )
    t_orders = f"bkt_orders_{app_tag}"
    t_customer = f"bkt_customer_{app_tag}"
    for name in (t_orders, t_customer):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    (
        o.write.bucketBy(_N_BUCKETS, "o_custkey")
        .sortBy("o_custkey")
        .option("path", os.path.join(base, "orders"))
        .mode("overwrite")
        .saveAsTable(t_orders)
    )
    (
        c.write.bucketBy(_N_BUCKETS, "c_custkey")
        .sortBy("c_custkey")
        .option("path", os.path.join(base, "customer"))
        .mode("overwrite")
        .saveAsTable(t_customer)
    )
    ob = spark.table(t_orders)
    cb = spark.table(t_customer)
    return (
        ob.hint("merge")
        .join(cb, ob.o_custkey == cb.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            (F.floor(F.sum("o_totalprice") * 100 + F.lit(0.5)) / 100)
            .cast("double")
            .alias("revenue"),
        )
    )
