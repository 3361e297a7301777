"""Round-3 registry additions, batch 28 — Soundex phonetic blocking
(the algorithm generated as identical folds in both engines) and
A/A-test calibration across 20 seeded splits.

Same contract as ``registry.py``. Imported at the bottom of
``registry.py``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import _register, _t

# ---------------------------------------------------------------------------
# Soundex phonetic blocking over part-name head words
# ---------------------------------------------------------------------------

_SDX_CLASSES = {
    1: "bfpv",
    2: "cgjkqsxz",
    3: "dt",
    4: "l",
    5: "mn",
    6: "r",
}
_SDX_CODE = {c: d for d, cs in _SDX_CLASSES.items() for c in cs}

def _sdx_code_sql(expr: str) -> str:
    return (
        f"CASE {expr} "
        + " ".join(
            f"WHEN '{c}' THEN {d}" for c, d in sorted(_SDX_CODE.items())
        )
        + " WHEN 'h' THEN -1 WHEN 'w' THEN -1 ELSE 0 END"
    )


@_register(
    "soundex_blocking_parts",
    f"""
    WITH words AS (
      SELECT p_partkey,
             list_filter(string_split_regex(lower(p_name), '[^a-z]+'),
                         x -> x <> '')[1] AS w
      FROM part
    ),
    coded AS (
      SELECT p_partkey, w,
             list_transform(
               list_transform(generate_series(2, length(w)),
                 i -> substr(w, CAST(i AS INTEGER), 1)),
               c -> [CAST({_sdx_code_sql("c")} AS BIGINT),
                     CAST(0 AS BIGINT), CAST(0 AS BIGINT),
                     CAST(0 AS BIGINT), CAST(0 AS BIGINT)]) AS xs,
             CAST({_sdx_code_sql("substr(w, 1, 1)")} AS BIGINT)
               AS first_code
      FROM words WHERE length(w) >= 1
    ),
    folded AS (
      -- acc = [prev_code, d1, d2, d3, filled]; American Soundex:
      -- h/w (-1) keep prev, vowels (0) reset prev, a new nonzero
      -- code different from prev appends (max 3 digits)
      SELECT p_partkey, w, first_code,
             list_reduce(
               list_prepend([greatest(first_code, CAST(0 AS BIGINT)),
                             CAST(0 AS BIGINT), CAST(0 AS BIGINT),
                             CAST(0 AS BIGINT), CAST(0 AS BIGINT)], xs),
               (acc, x) -> [
                 CASE WHEN x[1] = -1 THEN acc[1] ELSE x[1] END,
                 CASE WHEN x[1] > 0 AND x[1] <> acc[1] AND acc[5] = 0
                      THEN x[1] ELSE acc[2] END,
                 CASE WHEN x[1] > 0 AND x[1] <> acc[1] AND acc[5] = 1
                      THEN x[1] ELSE acc[3] END,
                 CASE WHEN x[1] > 0 AND x[1] <> acc[1] AND acc[5] = 2
                      THEN x[1] ELSE acc[4] END,
                 CASE WHEN x[1] > 0 AND x[1] <> acc[1]
                           AND acc[5] < 3
                      THEN acc[5] + 1 ELSE acc[5] END
               ]) AS st
      FROM coded
    ),
    keyed AS (
      SELECT p_partkey,
             upper(substr(w, 1, 1)) || CAST(st[2] AS VARCHAR)
               || CAST(st[3] AS VARCHAR) || CAST(st[4] AS VARCHAR)
               AS sdx
      FROM folded
    ),
    blocks AS (
      SELECT sdx, CAST(count(*) AS BIGINT) AS block_size,
             CAST(count(DISTINCT p_partkey) AS BIGINT) AS n_parts
      FROM keyed GROUP BY 1
    )
    SELECT sdx, block_size, n_parts,
           CAST(block_size * (block_size - 1) / 2 AS BIGINT)
             AS candidate_pairs
    FROM blocks WHERE block_size >= 2
    """,
    "Soundex phonetic blocking over part-name head words — the "
    "record-linkage blocking key that survives TYPOS exact keys "
    "miss (American Soundex: first letter + 3 consonant-class "
    "digits, h/w transparent, vowels reset — the whole algorithm "
    "GENERATED as an identical 5-slot integer fold in both "
    "engines, since DuckDB ships no soundex). Emits every block "
    "of >=2 names with its candidate-pair budget — the blocking "
    "stage that feeds `part_name_edit_distance_pairs`-style "
    "verification, quadratic only within phonetic buckets (the "
    "same contract as the LSH/gram blocking tiers). Scan-local "
    "key derivation; one shuffle on the 4-char key.",
    ("linkage", "phonetic", "blocking", "part"),
)
def soundex_blocking_parts(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    w = F.element_at(
        F.filter(
            F.split(F.lower(F.col("p_name")), "[^a-z]+"), lambda x: x != ""
        ),
        1,
    )
    words = p.select("p_partkey", w.alias("w")).filter(
        F.length("w") >= 1
    )

    def code_of(c):
        expr = F.when(c == "b", 1)
        for ch, d in sorted(_SDX_CODE.items()):
            if ch != "b":
                expr = expr.when(c == ch, d)
        return expr.when(c == "h", -1).when(c == "w", -1).otherwise(0)

    xs = F.transform(
        F.sequence(F.lit(2), F.length("w")),
        lambda i: code_of(F.col("w").substr(i, F.lit(1))).cast("long"),
    )
    first_code = code_of(F.col("w").substr(1, 1)).cast("long")
    init = F.struct(
        F.greatest(first_code, F.lit(0).cast("long")).alias("prev"),
        F.lit(0).cast("long").alias("d1"),
        F.lit(0).cast("long").alias("d2"),
        F.lit(0).cast("long").alias("d3"),
        F.lit(0).cast("long").alias("filled"),
    )

    def step(acc, x):
        appends = (x > 0) & (x != acc["prev"])
        return F.struct(
            F.when(x == -1, acc["prev"]).otherwise(x).alias("prev"),
            F.when(appends & (acc["filled"] == 0), x)
            .otherwise(acc["d1"])
            .alias("d1"),
            F.when(appends & (acc["filled"] == 1), x)
            .otherwise(acc["d2"])
            .alias("d2"),
            F.when(appends & (acc["filled"] == 2), x)
            .otherwise(acc["d3"])
            .alias("d3"),
            F.when(appends & (acc["filled"] < 3), acc["filled"] + 1)
            .otherwise(acc["filled"])
            .alias("filled"),
        )

    st = F.aggregate(xs, init, step)
    sdx = F.concat(
        F.upper(F.col("w").substr(1, 1)),
        st["d1"].cast("string"),
        st["d2"].cast("string"),
        st["d3"].cast("string"),
    )
    keyed = words.select("p_partkey", sdx.alias("sdx"))
    blocks = keyed.groupBy("sdx").agg(
        F.count("*").alias("block_size"),
        F.countDistinct("p_partkey").alias("n_parts"),
    )
    return blocks.filter(F.col("block_size") >= 2).select(
        "sdx",
        F.col("block_size").cast("long").alias("block_size"),
        F.col("n_parts").cast("long").alias("n_parts"),
        F.expr("CAST(block_size * (block_size - 1) / 2 AS BIGINT)").alias(
            "candidate_pairs"
        ),
    )


# ---------------------------------------------------------------------------
# A/A-test calibration: the null distribution of the z statistic
# ---------------------------------------------------------------------------

_AA_SALTS = [f"aa-{i}" for i in range(20)]


def _aa_z_sql(salt: str) -> str:
    g = (
        f"substr(md5('{salt}:' || CAST(user_id AS VARCHAR)), 1, 1)"
        " IN ('0','1','2','3','4','5','6','7')"
    )
    return f"""
      SELECT '{salt}' AS salt,
             CAST(count(*) FILTER (WHERE {g}) AS BIGINT) AS na,
             CAST(coalesce(sum(conv) FILTER (WHERE {g}), 0) AS BIGINT)
               AS xa,
             CAST(count(*) FILTER (WHERE NOT ({g})) AS BIGINT) AS nb,
             CAST(coalesce(sum(conv) FILTER (WHERE NOT ({g})), 0)
                  AS BIGINT) AS xb
      FROM u"""


@_register(
    "aa_test_calibration",
    f"""
    WITH u AS (
      SELECT user_id,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS conv
      FROM events GROUP BY 1
    ),
    splits AS ({" UNION ALL ".join(_aa_z_sql(s) for s in _AA_SALTS)})
    SELECT salt, na, xa, nb, xb,
           CASE WHEN xa + xb > 0 AND xa + xb < na + nb THEN
             floor((xa / CAST(na AS DOUBLE) - xb / CAST(nb AS DOUBLE))
                   / sqrt(((xa + xb) / CAST(na + nb AS DOUBLE))
                          * (1 - (xa + xb) / CAST(na + nb AS DOUBLE))
                          * (1.0 / na + 1.0 / nb))
                   * 1000000 + 0.5) / 1000000.0
           END AS z_stat,
           CASE WHEN xa + xb > 0 AND xa + xb < na + nb THEN
             abs((xa / CAST(na AS DOUBLE) - xb / CAST(nb AS DOUBLE))
                 / sqrt(((xa + xb) / CAST(na + nb AS DOUBLE))
                        * (1 - (xa + xb) / CAST(na + nb AS DOUBLE))
                        * (1.0 / na + 1.0 / nb))) > 1.96
           END AS false_positive
    FROM splits
    """,
    "A/A-test calibration — the experiment-hygiene check every "
    "platform runs before trusting its A/B stack: the SAME "
    "two-proportion z statistic as `two_proportion_ztest_ab`, "
    "computed across 20 different seeded md5 user splits where NO "
    "effect exists by construction; roughly 1 in 20 should cross "
    "|z| > 1.96, and systematic excess means the unit of "
    "randomization or the variance formula is wrong. All 20 "
    "splits hash the user rollup in one pass per split over the "
    "same tiny user table; counts exact, divisions pinned.",
    ("ml-eval", "ab-test", "calibration", "events"),
)
def aa_test_calibration(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv")
    ).localCheckpoint(eager=False)
    out = None
    for salt in _AA_SALTS:
        g = F.substring(
            F.md5(
                F.concat(
                    F.lit(f"{salt}:"), F.col("user_id").cast("string")
                ).cast("binary")
            ),
            1,
            1,
        ).isin(*"01234567")
        s = u.agg(
            F.sum(F.when(g, 1).otherwise(0)).alias("na"),
            F.coalesce(
                F.sum(F.when(g, F.col("conv")).otherwise(0)), F.lit(0)
            ).alias("xa"),
            F.sum(F.when(~g, 1).otherwise(0)).alias("nb"),
            F.coalesce(
                F.sum(F.when(~g, F.col("conv")).otherwise(0)), F.lit(0)
            ).alias("xb"),
        ).select(F.lit(salt).alias("salt"), "na", "xa", "nb", "xb")
        out = s if out is None else out.unionAll(s)
    pa = F.col("xa") / F.col("na").cast("double")
    pb = F.col("xb") / F.col("nb").cast("double")
    pp = (F.col("xa") + F.col("xb")) / (F.col("na") + F.col("nb")).cast(
        "double"
    )
    z = (pa - pb) / F.sqrt(
        pp * (1 - pp) * (1.0 / F.col("na") + 1.0 / F.col("nb"))
    )
    valid = (F.col("xa") + F.col("xb") > 0) & (
        F.col("xa") + F.col("xb") < F.col("na") + F.col("nb")
    )
    return out.select(
        "salt",
        F.col("na").cast("long").alias("na"),
        F.col("xa").cast("long").alias("xa"),
        F.col("nb").cast("long").alias("nb"),
        F.col("xb").cast("long").alias("xb"),
        F.when(
            valid, F.floor(z * 1000000 + F.lit(0.5)) / 1000000.0
        ).alias("z_stat"),
        F.when(valid, F.abs(z) > 1.96).alias("false_positive"),
    )
