"""Shared plan-lint vocabulary (round 6).

ONE home for the tag sets, plan-marker regexes, and allowlists that
``tools/plan_sweep.py`` and ``tests/test_plan_lint.py`` both consume
— the two scanners drifted in round 5 (duplicated tag set, one
regex anchored and one not), which is exactly the class of bug a
lint should not have.

Markers (red flags at 100 TB no matter the query):

* ``ROW_UDF_RE`` — a row-at-a-time Python UDF entered a plan
  (``BatchEvalPython``); the catalog's contract is
  Arrow-vectorized-or-JVM only.
* ``CARTESIAN_RE`` — a non-broadcast cross join materialized
  (numbered operator anchor; the broadcast variant plans as
  BroadcastNestedLoopJoin and is fine for tiny build sides).
* ``SINGLE_PARTITION_RE`` — an ``Exchange SinglePartition``: one hot
  partition absorbs the whole input (the r3 supplier_scorecard
  regression class). Allowlisted per-query where the exchanged
  relation is PROVABLY tiny (a global scalar/top-k reduction or a
  day-grain series of at most a few thousand aggregated rows).
"""

from __future__ import annotations

import re

# Tags whose builders EXECUTE work (stream runs, lake writes, index
# builds) — their cost is execution, not plan shape; each is audited
# individually in PLANS.md and by the streaming sweep mode.
EXEC_AT_BUILD_TAGS: frozenset[str] = frozenset(
    {
        "streaming",
        "lake",
        "ivm",
        "materialized-view",
        "index",
        "scd2",
        "time-travel",
        "kappa",
        "backfill",
        "bucketed-write",
    }
)

# Builders that execute HEAVY computation at build time (driver-side
# trainers / gates that .collect() inside the builder) even though
# their tags are batch — the catalog-wide lint skips them so a lint
# run stays O(plan), and they are plan-audited individually. Keep in
# sync with the builders' own docstrings (ADVICE r5 item #4).
HEAVY_BUILDERS: frozenset[str] = frozenset(
    {
        "als_rmse_floor",  # full ALS training via .first()
        "semantic_dedup_net_invariant",  # .collect()/.count() at build
        "knn_classify_embeddings",  # emb.count() at build
        "lsh_blocking_quality",  # stratum count at build
        "pca_project_embeddings",  # driver eigensolve at build
        "pca_variance_match_floor",  # driver eigensolve at build
        "als_recommend_parts",  # full ALS training at build
        # cost-based mining pre-flight runs a histogram aggregate at
        # build when armed with a candidate budget (dedup family):
        "ngram_jaccard_pairs",
        "near_dup_clusters",
        "near_dup_canonical_docs",
        "dedup_keep_best_documents",
        "dedup_survivorship_audit",
        # r9: the BPE queries serve the trainer through the shared-leg
        # cache — a cache miss trains the 25-round merge table at
        # build (the als_* rows above already behaved this way); their
        # executed plans are linted by the --heavy sweep instead:
        "bpe_merges_documents",
        "bpe_token_counts_documents",
        "tokenizer_fertility_by_lang",
        # round 8: bounded-graph / enum-state iterations moved to a
        # guarded driver loop — the builder collects a LIMIT/enum-
        # bounded table and runs the fact scan at build time:
        "markov_conversion_probability",
        "percolation_hub_removal",
        "textrank_keywords_documents",
        "pagerank_nation_trade",
        "bfs_nation_hops",
        "label_propagation_nations",
        "betweenness_centrality_nations",
        "modularity_communities_nations",
        "max_coverage_doc_selection",
    }
)

ROW_UDF_RE = re.compile(r"\(\d+\) BatchEvalPython")
CARTESIAN_RE = re.compile(r"\(\d+\) CartesianProduct")
SINGLE_PARTITION_RE = re.compile(r"Exchange SinglePartition")

# Queries whose Exchange SinglePartition is a PROVABLY-TINY global
# reduction (scalar aggregates, global top-k windows over pre-
# aggregated day/series rows, CI order statistics). Each entry names
# why the exchanged relation stays small at ANY input scale — the
# shuffled rows are outputs of an upstream aggregation whose
# cardinality is bounded by the key universe (days, buckets, k),
# not by fact rows.
SINGLE_PARTITION_ALLOWLIST: dict[str, str] = {}


def count_markers(plan: str) -> dict[str, int]:
    return {
        "row_udf": len(ROW_UDF_RE.findall(plan)),
        "cartesian": len(CARTESIAN_RE.findall(plan)),
        "single_partition": len(SINGLE_PARTITION_RE.findall(plan)),
    }
