"""Round-3 registry additions, batch 18 — greedy max-coverage
document selection (submodular curation) and a Johnson-Lindenstrauss
random-projection distortion audit.

Same contract as ``registry.py``. Imported at the bottom of
``registry.py``.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from .registry import _register, _t

_MC_ROUNDS = 10


def _maxcov_oracle(rounds: int = _MC_ROUNDS) -> str:
    """Unrolled greedy max-coverage: per round one anti-join gain
    count, one deterministic argmax (gain desc, doc asc), one
    coverage union. Gains are integers, so the pick is exact."""
    head = """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS l
      FROM documents
    ),
    dt AS MATERIALIZED (
      -- coverage universe = TRIGRAMS: the fixture vocabulary is a
      -- few dozen words, so unigram coverage saturates in one pick;
      -- trigram coverage exposes the real diminishing-returns curve
      SELECT DISTINCT doc_id, tok FROM (
        SELECT doc_id,
               unnest(list_transform(
                 generate_series(1, greatest(len(l) - 2, 0)),
                 i -> array_to_string(l[i:i + 2], ' '))) AS tok
        FROM toks
      )
    ),
    vocab AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v FROM dt),
    cov0 AS (SELECT CAST(NULL AS VARCHAR) AS tok WHERE FALSE)"""
    layers = []
    for r in range(1, rounds + 1):
        layers.append(f"""
    gain{r} AS (
      SELECT d.doc_id, CAST(count(*) AS BIGINT) AS gain
      FROM dt d LEFT JOIN cov{r - 1} c ON c.tok = d.tok
      WHERE c.tok IS NULL
      GROUP BY 1
    ),
    pick{r} AS MATERIALIZED (
      SELECT doc_id, gain FROM gain{r}
      ORDER BY gain DESC, doc_id ASC LIMIT 1
    ),
    cov{r} AS MATERIALIZED (
      SELECT tok FROM cov{r - 1}
      UNION
      SELECT d.tok FROM dt d JOIN pick{r} p ON p.doc_id = d.doc_id
    )""")
    finals = " UNION ALL ".join(
        f"SELECT {r} AS round, p.doc_id, p.gain, "
        f"(SELECT CAST(count(*) AS BIGINT) FROM cov{r}) AS covered "
        f"FROM pick{r} p"
        for r in range(1, rounds + 1)
    )
    return (
        head
        + ","
        + ",".join(layers)
        + f"""
    SELECT f.round, f.doc_id, f.gain, f.covered, vocab.v AS vocab_size
    FROM ({finals}) f CROSS JOIN vocab
    """
    )


@_register(
    "max_coverage_doc_selection",
    _maxcov_oracle(),
    f"Greedy max-coverage document selection ({_MC_ROUNDS} rounds) — "
    "submodular data curation: pick the document covering the most "
    "not-yet-covered TRIGRAMS (the fixture unigram vocabulary is "
    "tiny, so trigrams are the honest universe), repeat — the facility-"
    "location greedy with the classic (1-1/e) guarantee, which is "
    "how instruction-tuning sets and eval suites pick maximally-"
    "informative examples under a budget. Per round ONE anti-join "
    "gain count (shuffle keyed on token), one integer argmax (gain "
    "desc, doc asc — exact, no float scores), one coverage union; "
    "emits the greedy trajectory (pick, marginal gain, cumulative "
    "coverage vs vocabulary size) whose diminishing-returns curve "
    "IS the submodularity certificate the test suite asserts. The "
    "set-cover companion to `kcenter_coreset_embeddings` (geometric "
    "diversity) and `mmr_diverse_representatives` (relevance-"
    "diversity tradeoff).",
    ("ml-data", "curation", "iterative", "documents"),
)
def max_coverage_doc_selection(spark, sf_dir):
    from ..operators.scale import spread_for_compute

    d = _t(spark, sf_dir, "documents")
    # The trigram explode+distinct inherits the scan's single split
    # on the fixture (2.3 s serialized tokenize, round 8); spread
    # before the expensive expression work, no-op at scale.
    toks = spread_for_compute(d.select("doc_id", "text")).select(
        "doc_id",
        F.filter(
            F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda x: x != ""
        ).alias("l"),
    )
    idx = F.sequence(F.lit(1), F.greatest(F.size("l") - 2, F.lit(0)))
    dt = (
        toks.select(
            "doc_id",
            F.explode(
                F.transform(
                    idx,
                    lambda i: F.array_join(F.slice(F.col("l"), i, 3), " "),
                )
            ).alias("tok"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    vocab_size = dt.select("tok").distinct().count()
    # Greedy state lives on the driver: the covered-token set grows
    # by at most one document's trigrams per round (rounds × doc
    # length — bounded regardless of corpus size), while the
    # corpus-sized (doc, trigram) table stays distributed. This
    # replaces the old per-round union+distinct+checkpoint+count
    # chain (~6 stage-jobs/round, measured round 8) with one gain
    # aggregate and one picked-doc token fetch per round; the
    # cumulative coverage count is len() of the driver set — the
    # same number the old covered.count() action recomputed.
    spark = dt.sparkSession
    covered_set: set[str] = set()
    picks_rows = []
    for r in range(1, _MC_ROUNDS + 1):
        if not covered_set:
            gain = dt.groupBy("doc_id").agg(F.count("*").alias("gain"))
        else:
            cov_df = spark.createDataFrame(
                spark.sparkContext.parallelize(
                    [(t,) for t in covered_set],
                    max(1, len(covered_set) // 100_000 + 1),
                ),
                "tok string",
            )
            gain = (
                dt.join(F.broadcast(cov_df), "tok", "left_anti")
                .groupBy("doc_id")
                .agg(F.count("*").alias("gain"))
            )
        # ONE action per round (r9): broadcast-join the argmax doc
        # back onto dt so the pick and its full token list arrive in
        # the same collect — the separate token-fetch action doubled
        # the round count's scheduling cost (46 jobs profiled).
        top1 = gain.orderBy(
            F.col("gain").desc(), F.col("doc_id").asc()
        ).limit(1)
        rows = (
            dt.join(F.broadcast(top1), "doc_id")
            .select("doc_id", "gain", "tok")
            .collect()
        )
        if not rows:
            # all trigrams covered before _MC_ROUNDS picks (degenerate
            # corpora): emit fewer rows, like the pre-r8 DataFrame
            # form did, instead of IndexError (ADVICE r8)
            break
        covered_set.update(row["tok"] for row in rows)
        picks_rows.append(
            (
                r,
                rows[0]["doc_id"],
                rows[0]["gain"],
                len(covered_set),
                vocab_size,
            )
        )
    return spark.createDataFrame(
        picks_rows,
        "round int, doc_id long, gain long, covered long, "
        "vocab_size long",
    )


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss random-projection distortion audit (64 -> 8 dims)
# ---------------------------------------------------------------------------

_JL_K = 8
_JL_DIM = 64
_JL_SEED = 47
_JL_MAT = (
    np.random.default_rng(_JL_SEED).standard_normal((_JL_DIM, _JL_K))
    / np.sqrt(_JL_K)
)

_JL_MAT_SQL = (
    "["
    + ", ".join(
        "[" + ", ".join(f"{float(_JL_MAT[i][j])!r}::DOUBLE" for j in range(_JL_K)) + "]"
        for i in range(_JL_DIM)
    )
    + "]"
)


def _jl_proj_sql(vec: str, j: int) -> str:
    return (
        f"list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform(generate_series(1, {_JL_DIM}), "
        f"i -> CAST({vec}[i] AS DOUBLE) * m.mat[i][{j + 1}])), "
        f"(a, b) -> a + b)"
    )


@_register(
    "random_projection_distortion",
    f"""
    WITH m AS (SELECT {_JL_MAT_SQL} AS mat),
    pairs AS (
      SELECT a.vec_id, a.embedding AS ea, b.embedding AS eb
      FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
    ),
    dists AS (
      SELECT vec_id,
             list_reduce(list_prepend(0.0::DOUBLE,
               list_transform(generate_series(1, {_JL_DIM}),
                 i -> (CAST(ea[i] AS DOUBLE) - CAST(eb[i] AS DOUBLE))
                      * (CAST(ea[i] AS DOUBLE) - CAST(eb[i] AS DOUBLE)))),
               (a, b) -> a + b) AS d_orig,
             list_reduce(list_prepend(0.0::DOUBLE, [
                 {", ".join(
                     f"({_jl_proj_sql('ea', j)} - {_jl_proj_sql('eb', j)})"
                     f" * ({_jl_proj_sql('ea', j)} - {_jl_proj_sql('eb', j)})"
                     for j in range(_JL_K))}]),
               (a, b) -> a + b) AS d_proj
      FROM pairs CROSS JOIN m
    ),
    ratios AS (
      SELECT least(CAST(floor(d_proj / d_orig * 10) AS BIGINT), 29)
               AS bucket,
             CAST(floor(d_proj / d_orig * 1000000 + 0.5) AS BIGINT)
               AS ratio_micro
      FROM dists WHERE d_orig > 0
    )
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(ratio_micro) AS BIGINT) AS sum_ratio_micro
    FROM ratios GROUP BY 1
    """,
    f"Johnson-Lindenstrauss distortion audit for a {_JL_DIM}->"
    f"{_JL_K} Gaussian random projection (seed {_JL_SEED}, matrix "
    "materialized as full-precision literals into BOTH engines — "
    "the seeded-constant replication pattern): for every "
    "consecutive-id embedding pair, the squared-distance ratio "
    "projected/original is computed with sequential per-dimension "
    "folds (bit-identical), quantized to micro units, and "
    "histogrammed in 0.1-wide buckets — the measurement that says "
    "whether 8 dims preserve enough geometry before you run the "
    "cheap-distance tier of the ANN stack on projected vectors. "
    "Scan-local matrix multiply (the matrix is a compile-time "
    "constant, never a join); one self-join on adjacent ids for "
    "the pair set.",
    ("ml-data", "projection", "embeddings"),
)
def random_projection_distortion(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id"), F.col("embedding").alias("ea"))
    b = emb.select(
        (F.col("vec_id") - 1).alias("vec_id"), F.col("embedding").alias("eb")
    )
    pairs = a.join(b, "vec_id")

    def dot_diff_sq(j):
        col_j = F.array(*[F.lit(float(_JL_MAT[i][j])) for i in range(_JL_DIM)])

        def proj(vec):
            return F.aggregate(
                F.zip_with(
                    vec, col_j, lambda x, y: x.cast("double") * y
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )

        diff = proj(F.col("ea")) - proj(F.col("eb"))
        return diff * diff

    d_orig = F.aggregate(
        F.zip_with(
            F.col("ea"),
            F.col("eb"),
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    d_proj = F.aggregate(
        F.array(*[dot_diff_sq(j) for j in range(_JL_K)]),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    dists = pairs.select(
        d_orig.alias("d_orig"), d_proj.alias("d_proj")
    ).filter(F.col("d_orig") > 0)
    ratios = dists.select(
        F.least(
            F.floor(F.col("d_proj") / F.col("d_orig") * 10).cast("long"),
            F.lit(29),
        ).alias("bucket"),
        F.floor(F.col("d_proj") / F.col("d_orig") * 1000000 + F.lit(0.5))
        .cast("long")
        .alias("ratio_micro"),
    )
    return ratios.groupBy("bucket").agg(
        F.count("*").alias("n_pairs"),
        F.sum("ratio_micro").cast("long").alias("sum_ratio_micro"),
    )
