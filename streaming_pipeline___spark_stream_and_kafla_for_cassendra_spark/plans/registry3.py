"""Round-2 (cont.) registry additions — spatial bucketed joins,
two-sample inference, readability scoring, and web-markup cleaning.

Same contract as ``registry.py``: DataFrame builder + DuckDB oracle,
column names/types aligned, floats pinned by identical expression
order over exact integers. Imported at the bottom of ``registry.py``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.text import (
    HTML_ENTITIES,
    MARKUP_PATTERNS,
    flesch_columns,
    strip_markup,
)
from .registry import _register, _t


def _r6(col):
    return F.floor(col * 1000000 + F.lit(0.5)) / F.lit(1000000.0)


# ---------------------------------------------------------------------------
# Spatial: grid-bucketed radius self-join
# ---------------------------------------------------------------------------

_SPATIAL_R = 1500  # radius AND grid cell size, integer units
_SPATIAL_R2 = _SPATIAL_R * _SPATIAL_R


@_register(
    "spatial_radius_join_customers",
    f"""
    WITH pts AS (
      SELECT c_custkey AS id,
             ((c_custkey % 100000) * (c_custkey % 100000) * 7919
              + c_custkey * 48271) % 100000 AS x,
             ((c_custkey % 100000) * (c_custkey % 100000) * 104729
              + c_custkey * 69621) % 100000 AS y
      FROM customer
    )
    SELECT a.id AS id_a, b.id AS id_b,
           CAST((a.x - b.x) * (a.x - b.x)
              + (a.y - b.y) * (a.y - b.y) AS BIGINT) AS dist_sq
    FROM pts a JOIN pts b ON a.id < b.id
    WHERE (a.x - b.x) * (a.x - b.x)
        + (a.y - b.y) * (a.y - b.y) <= {_SPATIAL_R2}
    """,
    "Spatial radius self-join WITHOUT a cross product: points land in "
    f"an r={_SPATIAL_R} grid, the left side fans out to its 3x3 "
    "neighbor cells, and candidates meet in ONE hash equi-join on the "
    "cell key; each qualifying pair is emitted exactly once (the "
    "right row's home cell is unique) so no post-join distinct is "
    "needed. The oracle states the O(n^2) truth. Coordinates are "
    "synthesized deterministically (LCG-style integer mix) so both "
    "engines see identical points; distance compares are pure integer "
    "arithmetic. At 100 TB the plan is a scan + one shuffle sized by "
    "9x the points, never points^2.",
    ("spatial", "join", "scale"),
)
def spatial_radius_join_customers(spark, sf_dir):
    # reduce custkey mod 1e5 BEFORE squaring: k²·104729 stays well
    # under int64 at any scale factor (raw custkey² overflowed past
    # ~sf100, where Spark wraps silently but DuckDB errors)
    k = F.col("c_custkey") % 100000
    pts = (
        _t(spark, sf_dir, "customer")
        .select(
            F.col("c_custkey").alias("id"),
            ((k * k * 7919 + F.col("c_custkey") * 48271) % 100000).alias("x"),
            ((k * k * 104729 + F.col("c_custkey") * 69621) % 100000).alias("y"),
        )
    )
    r = F.lit(_SPATIAL_R)
    home = pts.withColumn("cx", (F.col("x") / r).cast("long")).withColumn(
        "cy", (F.col("y") / r).cast("long")
    )
    # left side fans out to the 3x3 neighborhood; right side stays in
    # its home cell -> every close pair shares exactly one (cell) key
    probe = (
        home.withColumn("dx", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("dy", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .select(
            F.col("id").alias("id_a"),
            F.col("x").alias("xa"),
            F.col("y").alias("ya"),
            (F.col("cx") + F.col("dx")).alias("jcx"),
            (F.col("cy") + F.col("dy")).alias("jcy"),
        )
    )
    build = home.select(
        F.col("id").alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        F.col("cx").alias("jcx"),
        F.col("cy").alias("jcy"),
    )
    d2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    return (
        probe.join(build, ["jcx", "jcy"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(d2 <= F.lit(_SPATIAL_R2))
        .select("id_a", "id_b", d2.cast("long").alias("dist_sq"))
    )


# ---------------------------------------------------------------------------
# Welch two-sample t-test per event type vs the 'view' control
# ---------------------------------------------------------------------------

@_register(
    "welch_ttest_value_by_type",
    """
    WITH s AS (
      SELECT event_type,
             count(*) AS n,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS s1,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)
                      * CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS s2
      FROM events
      WHERE value IS NOT NULL
      GROUP BY 1
    ),
    m AS (
      SELECT event_type, n, s1, s2,
             s1 / n AS mu,
             (s2 - s1 * (s1 / n)) / (n - 1) AS var
      FROM s WHERE n > 1
    )
    SELECT t.event_type AS event_type,
           CAST(t.n AS BIGINT) AS n_obs,
           CAST(c.n AS BIGINT) AS n_ctrl,
           floor((t.mu - c.mu) * 1000000 + 0.5) / 1000000.0 AS mean_diff_cents,
           floor((t.mu - c.mu) / sqrt(t.var / t.n + c.var / c.n)
                 * 1000000 + 0.5) / 1000000.0 AS t_stat,
           floor((t.var / t.n + c.var / c.n) * (t.var / t.n + c.var / c.n)
                 / ((t.var / t.n) * (t.var / t.n) / (t.n - 1)
                    + (c.var / c.n) * (c.var / c.n) / (c.n - 1))
                 * 10000 + 0.5) / 10000.0 AS welch_df
    FROM m t JOIN m c ON c.event_type = 'view'
    WHERE t.event_type <> 'view'
    """,
    "Welch two-sample t-test (unequal variances) of each event type's "
    "value against the 'view' control: mean, variance, t statistic "
    "and Welch-Satterthwaite df — all derived from EXACT integer-cent "
    "sums (n, sum, sum-of-squares) collected in ONE map-side-combined "
    "scan, then a broadcast of the types-sized stats table against "
    "its control row. Cross-engine bit-equality holds because every "
    "double is produced by the same IEEE expression over the same "
    "integers. (Note: sum-of-squares in BIGINT is exact to ~2^63; at "
    "larger scales the same plan runs on DECIMAL(38,0).)",
    ("stats", "agg", "events"),
)
def welch_ttest_value_by_type(spark, sf_dir):
    e = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    cents = F.floor(F.col("value") * 100).cast("long")
    s = (
        e.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(cents).alias("s1"),
            F.sum(cents * cents).alias("s2"),
        )
        .filter(F.col("n") > 1)
        .withColumn("mu", F.col("s1") / F.col("n"))
        .withColumn(
            "var",
            (F.col("s2") - F.col("s1") * (F.col("s1") / F.col("n")))
            / (F.col("n") - 1),
        )
    )
    t = s.filter(F.col("event_type") != "view")
    c = s.filter(F.col("event_type") == "view").select(
        F.col("n").alias("cn"), F.col("mu").alias("cmu"), F.col("var").alias("cvar")
    )
    se2 = F.col("var") / F.col("n") + F.col("cvar") / F.col("cn")
    df_num = se2 * se2
    df_den = (F.col("var") / F.col("n")) * (F.col("var") / F.col("n")) / (
        F.col("n") - 1
    ) + (F.col("cvar") / F.col("cn")) * (F.col("cvar") / F.col("cn")) / (
        F.col("cn") - 1
    )
    return (
        t.crossJoin(F.broadcast(c))
        .select(
            "event_type",
            F.col("n").cast("long").alias("n_obs"),
            F.col("cn").cast("long").alias("n_ctrl"),
            _r6(F.col("mu") - F.col("cmu")).alias("mean_diff_cents"),
            _r6((F.col("mu") - F.col("cmu")) / F.sqrt(se2)).alias("t_stat"),
            (F.floor(df_num / df_den * 10000 + F.lit(0.5)) / F.lit(10000.0)).alias(
                "welch_df"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Flesch readability per document
# ---------------------------------------------------------------------------

@_register(
    "readability_flesch_documents",
    """
    WITH c AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS INTEGER)
               AS n_words,
             CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS INTEGER)
               AS n_sentences,
             CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS INTEGER)
               AS n_syllables
      FROM documents
    )
    SELECT doc_id, n_words, n_sentences, n_syllables,
           CASE WHEN n_words > 0 THEN
             floor((206.835 - 1.015 * (n_words / n_sentences)
                            - 84.6 * (n_syllables / n_words))
                   * 10000 + 0.5) / 10000.0
           END AS flesch,
           CASE WHEN n_words > 0 THEN
             floor((0.39 * (n_words / n_sentences)
                    + 11.8 * (n_syllables / n_words) - 15.59)
                   * 10000 + 0.5) / 10000.0
           END AS grade_level
    FROM c
    """,
    "Flesch reading-ease + Flesch-Kincaid grade level per document: "
    "word/sentence/vowel-group counts from three regexp_extract_all "
    "passes (scan-local codegen, zero shuffle), scores as pure IEEE "
    "arithmetic over those integers — the classic readability quality "
    "gate for pre-training corpora, bit-exact against the oracle.",
    ("text-quality", "documents"),
)
def readability_flesch_documents(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    w, s, sy = flesch_columns("text")
    base = d.select(
        "doc_id",
        w.alias("n_words"),
        s.alias("n_sentences"),
        sy.alias("n_syllables"),
    )
    wps = F.col("n_words") / F.col("n_sentences")
    spw = F.col("n_syllables") / F.col("n_words")
    r4 = lambda c: F.floor(c * 10000 + F.lit(0.5)) / F.lit(10000.0)  # noqa: E731
    return base.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        F.when(
            F.col("n_words") > 0,
            r4(F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw),
        ).alias("flesch"),
        F.when(
            F.col("n_words") > 0,
            r4(F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59)),
        ).alias("grade_level"),
    )


# ---------------------------------------------------------------------------
# HTML/markup stripping round-trip
# ---------------------------------------------------------------------------

def _strip_markup_sql(expr: str) -> str:
    """DuckDB twin of strip_markup, generated from the SAME pattern
    tables so the two engines cannot drift."""
    out = expr
    for pattern in MARKUP_PATTERNS:
        p = pattern.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', ' ', 'g')"
    for entity, repl in HTML_ENTITIES:
        e = entity.replace("'", "''")
        r = repl.replace("'", "''")
        out = f"replace({out}, '{e}', '{r}')"
    return f"trim(regexp_replace({out}, '\\s+', ' ', 'g'))"


_HTML_WRAP_SQL = (
    "'<html><body onload=\"x()\"><h1>Doc ' || CAST(doc_id AS VARCHAR) || "
    "'</h1><script type=\"text/javascript\">var x = 1 < 2;</script>"
    "<style>p { color: red; }</style><p class=\"body\">' || text || "
    "'</p><!-- trailing comment --><div>&amp; &lt;escaped&gt; "
    "&quot;quoted&quot; &#39;tick&#39;&nbsp;end</div></body></html>'"
)


@_register(
    "html_strip_documents",
    f"""
    SELECT doc_id,
           CAST(length(clean) AS INTEGER) AS clean_len,
           md5(clean) AS clean_hash,
           substr(clean, 1, 32) AS head
    FROM (
      SELECT doc_id, {_strip_markup_sql(_HTML_WRAP_SQL)} AS clean
      FROM documents
    )
    """,
    "Web-corpus markup removal: documents are wrapped in a "
    "deterministic HTML shell (tags, a script block whose CONTENT "
    "must vanish, a style block, comments, entities), then cleaned by "
    "the strip_markup chain — script/style+content removal, comment "
    "and tag stripping, entity decode, whitespace collapse — entirely "
    "as scan-local regexp codegen. The oracle replays the identical "
    "pattern tables (generated from the same constants), verifying "
    "byte-equality via md5.",
    ("text-cleaning", "documents"),
)
def html_strip_documents(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    html = F.concat(
        F.lit('<html><body onload="x()"><h1>Doc '),
        F.col("doc_id").cast("string"),
        F.lit('</h1><script type="text/javascript">var x = 1 < 2;</script>'),
        F.lit('<style>p { color: red; }</style><p class="body">'),
        F.col("text"),
        F.lit("</p><!-- trailing comment --><div>&amp; &lt;escaped&gt; "),
        F.lit("&quot;quoted&quot; &#39;tick&#39;&nbsp;end</div></body></html>"),
    )
    clean = strip_markup(html)
    return d.select(
        "doc_id",
        F.length(clean).alias("clean_len"),
        F.md5(clean.cast("binary")).alias("clean_hash"),
        F.substring(clean, 1, 32).alias("head"),
    )


# ---------------------------------------------------------------------------
# Streaming as-of enrichment (persistent latest-state store)
# ---------------------------------------------------------------------------

@_register(
    "streaming_asof_enrich_purchases",
    """
    SELECT p.event_id AS purchase_id,
           p.user_id  AS user_id,
           p.ts       AS purchase_ts,
           v.ts       AS view_ts,
           v.event_id AS view_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
    "Streaming as-of enrichment — the per-fact 'latest prior state "
    "row' join Spark's stream-stream join cannot express (max-over-"
    "matches is not append-safe): purchases and views flow as ONE "
    "tagged-union stream through foreachBatch; each batch as-of joins "
    "its facts against (compacted latest-state ∪ batch views) and "
    "folds new state, with batch-id idempotent writes + commit "
    "ledger. The availableNow run equals the DuckDB ASOF LEFT JOIN "
    "truth exactly; multi-batch ordered replay is covered in "
    "tests/test_streaming_asof.py",
    ("streaming", "asof", "join", "stateful"),
)
def streaming_asof_enrich_purchases(spark, sf_dir):
    import os as _os
    import tempfile

    from ..sources.tables import load_events_stream
    from ..streaming.asof import AsofEnrichView, write_streams_to_asof_enrich

    stream = load_events_stream(spark, sf_dir)
    facts = stream.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    updates = stream.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id"
    )
    base = tempfile.mkdtemp(prefix="asof_enrich_")
    view = AsofEnrichView(
        path=_os.path.join(base, "v"),
        on=("user_id",),
        left_ts="ts",
        right_ts="ts",
    )
    q = write_streams_to_asof_enrich(
        facts,
        updates,
        view,
        checkpoint_root=_os.path.join(base, "ck"),
        available_now=True,
    )
    from .registry import _await_stream

    _await_stream(q, 300)
    return view.read(spark).select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("ts_right").alias("view_ts"),
        F.col("event_id_right").alias("view_id"),
    )


# ---------------------------------------------------------------------------
# CUPED variance-reduced A/B estimate
# ---------------------------------------------------------------------------

@_register(
    "cuped_adjusted_ab_events",
    """
    WITH u AS (
      SELECT user_id,
             CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
                       IN ('0','1','2','3','4','5','6','7')
                  THEN 'A' ELSE 'B' END AS grp,
             CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16'
                           THEN CAST(floor(value * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS x,
             CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                           THEN CAST(floor(value * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS y
      FROM events
      WHERE value IS NOT NULL
      GROUP BY 1, 2
    ),
    g AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM u
    ),
    t AS (
      SELECT n, sx / n AS mean_x_all,
             (sxy - sx * (sy / n)) / (sxx - sx * (sx / n)) AS theta
      FROM g
    ),
    p AS (
      SELECT grp,
             CAST(count(*) AS BIGINT) AS n_g,
             CAST(sum(x) AS BIGINT) AS sx_g,
             CAST(sum(y) AS BIGINT) AS sy_g,
             CAST(sum(x * x) AS BIGINT) AS sxx_g,
             CAST(sum(x * y) AS BIGINT) AS sxy_g,
             CAST(sum(y * y) AS BIGINT) AS syy_g
      FROM u GROUP BY 1
    )
    SELECT grp,
           n_g AS n_users,
           floor((sy_g / n_g) * 10000 + 0.5) / 10000.0 AS mean_y_cents,
           floor(((sy_g / n_g) - theta * ((sx_g / n_g) - mean_x_all))
                 * 10000 + 0.5) / 10000.0 AS mean_y_adj_cents,
           floor(theta * 1000000 + 0.5) / 1000000.0 AS theta,
           floor((1 - (((syy_g - sy_g * (sy_g / n_g)) / (n_g - 1))
                       - 2 * theta * ((sxy_g - sx_g * (sy_g / n_g)) / (n_g - 1))
                       + theta * theta * ((sxx_g - sx_g * (sx_g / n_g)) / (n_g - 1)))
                     / ((syy_g - sy_g * (sy_g / n_g)) / (n_g - 1)))
                 * 1000000 + 0.5) / 1000000.0 AS var_reduction
    FROM p CROSS JOIN t
    ORDER BY grp
    """,
    "CUPED variance reduction for A/B experiments (Deng et al., "
    "WSDM'13): users hash-split 50/50 by md5, pre-period value sum is "
    "the covariate, theta = cov(x,y)/var(x) fitted on ALL users from "
    "EXACT integer-cent moment sums (one users-sized aggregate), and "
    "each arm reports raw vs CUPED-adjusted post-period means plus "
    "the achieved variance-reduction ratio. Two shuffles total (user "
    "rollup, then a 2-group moment aggregate); the theta row "
    "broadcasts back. Every double comes from the same IEEE "
    "expression over the same integers on both engines.",
    ("stats", "ab-testing", "events"),
)
def cuped_adjusted_ab_events(spark, sf_dir):
    e = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    cents = F.floor(F.col("value") * 100).cast("long")
    cut = F.lit("2024-01-16").cast("timestamp")
    grp = F.when(
        F.substring(F.md5(F.col("user_id").cast("string").cast("binary")), 1, 1).isin(
            *"01234567"
        ),
        "A",
    ).otherwise("B")
    u = (
        e.groupBy("user_id")
        .agg(
            F.first(grp).alias("grp"),
            F.sum(F.when(F.col("ts") < cut, cents).otherwise(F.lit(0))).alias("x"),
            F.sum(F.when(F.col("ts") >= cut, cents).otherwise(F.lit(0))).alias("y"),
        )
    )
    g = u.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x").cast("decimal(20,0)") * F.col("x")).alias("sxx"),
        F.sum(F.col("x").cast("decimal(20,0)") * F.col("y")).alias("sxy"),
    ).select(
        (F.col("sx") / F.col("n")).alias("mean_x_all"),
        (
            (F.col("sxy") - F.col("sx") * (F.col("sy") / F.col("n")))
            / (F.col("sxx") - F.col("sx") * (F.col("sx") / F.col("n")))
        ).alias("theta"),
    )
    p = u.groupBy("grp").agg(
        F.count("*").alias("n_g"),
        F.sum("x").alias("sx_g"),
        F.sum("y").alias("sy_g"),
        F.sum(F.col("x").cast("decimal(20,0)") * F.col("x")).alias("sxx_g"),
        F.sum(F.col("x").cast("decimal(20,0)") * F.col("y")).alias("sxy_g"),
        F.sum(F.col("y").cast("decimal(20,0)") * F.col("y")).alias("syy_g"),
    )
    r4 = lambda c: F.floor(c * 10000 + F.lit(0.5)) / F.lit(10000.0)  # noqa: E731
    mean_y = F.col("sy_g") / F.col("n_g")
    mean_x = F.col("sx_g") / F.col("n_g")
    var_y = (F.col("syy_g") - F.col("sy_g") * (F.col("sy_g") / F.col("n_g"))) / (
        F.col("n_g") - 1
    )
    cov_g = (F.col("sxy_g") - F.col("sx_g") * (F.col("sy_g") / F.col("n_g"))) / (
        F.col("n_g") - 1
    )
    var_x = (F.col("sxx_g") - F.col("sx_g") * (F.col("sx_g") / F.col("n_g"))) / (
        F.col("n_g") - 1
    )
    th = F.col("theta")
    var_adj = var_y - 2 * th * cov_g + th * th * var_x
    return (
        p.crossJoin(F.broadcast(g))
        .select(
            "grp",
            F.col("n_g").alias("n_users"),
            r4(mean_y).alias("mean_y_cents"),
            r4(mean_y - th * (mean_x - F.col("mean_x_all"))).alias(
                "mean_y_adj_cents"
            ),
            _r6(th).alias("theta"),
            _r6(F.lit(1) - var_adj / var_y).alias("var_reduction"),
        )
    )


# ---------------------------------------------------------------------------
# Out-of-vocabulary rate vs the corpus top-1000 vocabulary
# ---------------------------------------------------------------------------

@_register(
    "oov_rate_documents",
    """
    WITH tok AS (
      SELECT doc_id, unnest(list_filter(
               string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> ''))
             AS token
      FROM documents
    ),
    vocab AS (
      SELECT token FROM (
        SELECT token, row_number() OVER (ORDER BY count(*) DESC, token ASC) AS rk
        FROM tok GROUP BY token
      ) WHERE rk <= 1000
    )
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(count(*) FILTER (WHERE v.token IS NULL) AS BIGINT) AS n_oov,
           floor(count(*) FILTER (WHERE v.token IS NULL) / count(*)
                 * 1000000 + 0.5) / 1000000.0 AS oov_rate
    FROM tok t LEFT JOIN vocab v USING (token)
    GROUP BY t.doc_id
    """,
    "Out-of-vocabulary rate per document against the corpus's own "
    "top-1000 token vocabulary (count-desc, token-asc deterministic "
    "tie order) — the tokenizer-coverage / domain-shift signal used "
    "to gate pre-training shards. Plan: one token-count aggregate "
    "sized by the vocabulary, broadcast back over the exploded scan, "
    "one per-doc re-aggregate. Vocabulary selection is a LOSSLESS "
    "two-stage top-k (per-partition top-1000 under the same tie "
    "order, then a merge window over ≤ partitions×1000 survivors) — "
    "no single-partition sort of the full distinct-token table. The "
    "token stream shuffles at most once; the vocab table is KB-sized "
    "at any corpus size.",
    ("text-quality", "documents", "vocab"),
)
def oov_rate_documents(spark, sf_dir):
    from pyspark.sql import Window

    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
                lambda t: t != "",
            )
        ).alias("token"),
    )
    # two-stage top-k: each partition keeps its own top-1000 under
    # the SAME (count desc, token asc) order — any global top-1000
    # member is a partition top-1000 member, so the prune is
    # lossless — then the final window ranks ≤ #partitions×1000
    # survivors, never the corpus vocabulary
    counts = tok.groupBy("token").agg(F.count("*").alias("n"))
    pw = Window.partitionBy("_pid").orderBy(F.desc("n"), F.asc("token"))
    pruned = (
        counts.withColumn("_pid", F.spark_partition_id())
        .withColumn("_prk", F.row_number().over(pw))
        .filter(F.col("_prk") <= 1000)
        .drop("_pid", "_prk")
    )
    w = Window.orderBy(F.desc("n"), F.asc("token"))
    vocab = (
        pruned.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 1000)
        .select("token", F.lit(True).alias("in_vocab"))
    )
    joined = tok.join(F.broadcast(vocab), "token", "left")
    n_oov = F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            n_oov.alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            _r6(F.col("n_oov") / F.col("n_tokens")).alias("oov_rate"),
        )
    )


# ---------------------------------------------------------------------------
# Write-time contract enforcement: quarantined rows + fired rules
# ---------------------------------------------------------------------------

@_register(
    "contract_quarantine_events",
    """
    SELECT event_id,
           array_to_string(
             list_filter(
               [CASE WHEN value IS NULL OR value < 1 THEN 'value_min' END,
                CASE WHEN event_type = 'error' THEN 'no_errors' END],
               x -> x IS NOT NULL),
             '|') AS violated
    FROM events
    WHERE (value IS NULL OR value < 1) OR event_type = 'error'
    """,
    "Write-time constraint enforcement (Delta CHECK / Hudi pre-commit "
    "validator analogue): enforce() splits the batch into clean vs "
    "quarantine with ONE shared scan-local projection of fired-rule "
    "names — this query returns the dead-letter side (row id + which "
    "rules fired, pipe-joined in declaration order). Zero shuffle; "
    "quarantine volume scales with the violation rate, not the table.",
    ("quality", "contract", "events"),
)
def contract_quarantine_events(spark, sf_dir):
    from ..operators.quality import enforce

    e = _t(spark, sf_dir, "events")
    _clean, quarantine = enforce(
        e,
        {
            "value_min": F.col("value").isNull() | (F.col("value") < 1),
            "no_errors": F.col("event_type") == "error",
        },
    )
    return quarantine.select(
        "event_id", F.array_join("_violated", "|").alias("violated")
    )


# ---------------------------------------------------------------------------
# STL-lite seasonal decomposition of daily revenue
# ---------------------------------------------------------------------------

@_register(
    "stl_decompose_daily_revenue",
    """
    WITH daily AS (
      SELECT o_orderdate AS day,
             CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev
      FROM orders GROUP BY 1
    ),
    ma AS (
      SELECT day, rev,
             CAST(sum(rev) OVER w AS BIGINT) AS sum7,
             CAST(count(*) OVER w AS BIGINT) AS cnt7,
             CAST((CAST(day AS DATE) - DATE '1992-01-01') % 7 AS INTEGER) AS wd
      FROM daily
      WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    det AS (
      SELECT *, CASE WHEN cnt7 = 7 THEN 7 * rev - sum7 END AS detr_s
      FROM ma
    ),
    seas AS (
      SELECT wd,
             CAST(sum(detr_s) AS BIGINT) / count(detr_s) AS seasonal_s
      FROM det WHERE detr_s IS NOT NULL GROUP BY wd
    )
    SELECT d.day AS day,
           d.rev AS rev_cents,
           CASE WHEN d.cnt7 = 7 THEN
             floor(d.sum7 / 7 * 10000 + 0.5) / 10000.0 END AS trend,
           floor(s.seasonal_s / 7 * 10000 + 0.5) / 10000.0 AS seasonal,
           CASE WHEN d.detr_s IS NOT NULL THEN
             floor((d.detr_s - s.seasonal_s) / 7 * 10000 + 0.5) / 10000.0
           END AS resid
    FROM det d JOIN seas s USING (wd)
    """,
    "STL-lite seasonal decomposition of the daily revenue series: "
    "trend = centered 7-row moving average, weekly seasonal = per-"
    "weekday mean of the detrended series, residual = remainder — "
    "computed entirely from EXACT integers (detrended values scaled "
    "by 7 stay integral: 7*rev - sum7), so every emitted double is "
    "one pinned IEEE expression on both engines. Plan: one fact-keyed "
    "rollup to a days-sized series; the centered-MA window, weekday "
    "aggregate (7 rows) and joins all run on days, never facts.",
    ("timeseries", "stl", "orders"),
)
def stl_decompose_daily_revenue(spark, sf_dir):
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100).cast("long")
    daily = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(cents).alias("rev")
    )
    w = Window.orderBy("day").rowsBetween(-3, 3)
    ma = daily.select(
        "day",
        "rev",
        F.sum("rev").over(w).alias("sum7"),
        F.count("*").over(w).alias("cnt7"),
        (F.datediff(F.col("day"), F.lit("1992-01-01").cast("date")) % 7)
        .cast("int")
        .alias("wd"),
    )
    det = ma.withColumn(
        "detr_s", F.when(F.col("cnt7") == 7, 7 * F.col("rev") - F.col("sum7"))
    )
    seas = (
        det.filter(F.col("detr_s").isNotNull())
        .groupBy("wd")
        .agg(
            (F.sum("detr_s") / F.count("detr_s")).alias("seasonal_s"),
        )
    )
    r4 = lambda c: F.floor(c * 10000 + F.lit(0.5)) / F.lit(10000.0)  # noqa: E731
    return det.join(F.broadcast(seas), "wd").select(
        "day",
        F.col("rev").alias("rev_cents"),
        F.when(F.col("cnt7") == 7, r4(F.col("sum7") / 7)).alias("trend"),
        r4(F.col("seasonal_s") / 7).alias("seasonal"),
        F.when(
            F.col("detr_s").isNotNull(),
            r4((F.col("detr_s") - F.col("seasonal_s")) / 7),
        ).alias("resid"),
    )


# ---------------------------------------------------------------------------
# Log-rank test: time-to-purchase, cohort A vs B
# ---------------------------------------------------------------------------

@_register(
    "logrank_time_to_purchase_ab",
    """
    WITH per_user AS (
      SELECT user_id,
             CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
                       IN ('0','1','2','3','4','5','6','7')
                  THEN 'A' ELSE 'B' END AS grp,
             min(CASE WHEN event_type = 'view' THEN ts END) AS t0,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_ev,
             max(ts) AS t_last
      FROM events GROUP BY 1, 2
    ),
    subjects AS (
      SELECT grp,
             CASE WHEN t_ev IS NOT NULL AND t_ev >= t0
                  THEN floor(epoch(t_ev) / 3600) - floor(epoch(t0) / 3600)
                  ELSE floor(epoch(t_last) / 3600) - floor(epoch(t0) / 3600)
             END AS dur_h,
             CASE WHEN t_ev IS NOT NULL AND t_ev >= t0 THEN 1 ELSE 0 END
               AS observed
      FROM per_user WHERE t0 IS NOT NULL
    ),
    n_by AS (
      SELECT CAST(count(*) FILTER (WHERE grp = 'A') AS BIGINT) AS na,
             CAST(count(*) FILTER (WHERE grp = 'B') AS BIGINT) AS nb
      FROM subjects
    ),
    at_t AS (
      SELECT dur_h AS t,
             CAST(sum(CASE WHEN grp = 'A' THEN observed ELSE 0 END) AS BIGINT) AS d1,
             CAST(sum(CASE WHEN grp = 'B' THEN observed ELSE 0 END) AS BIGINT) AS d2,
             CAST(count(*) FILTER (WHERE grp = 'A') AS BIGINT) AS l1,
             CAST(count(*) FILTER (WHERE grp = 'B') AS BIGINT) AS l2
      FROM subjects GROUP BY 1
    ),
    risk AS (
      SELECT t, d1, d2,
             na - coalesce(sum(l1) OVER (ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n1t,
             nb - coalesce(sum(l2) OVER (ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n2t
      FROM at_t CROSS JOIN n_by
    ),
    terms AS (
      SELECT t, d1,
             (d1 + d2) * (n1t / (n1t + n2t)) AS term_e,
             CASE WHEN (n1t + n2t) > 1 THEN
               (d1 + d2) * (n1t / (n1t + n2t)) * (1 - n1t / (n1t + n2t))
               * (((n1t + n2t) - (d1 + d2)) / ((n1t + n2t) - 1))
             ELSE 0.0 END AS term_v
      FROM risk WHERE d1 + d2 > 0
    ),
    arrs AS (
      SELECT CAST(sum(d1) AS BIGINT) AS o1,
             list_reduce(list_prepend(0.0, list(term_e ORDER BY t)),
                         (a, x) -> a + x) AS e1,
             list_reduce(list_prepend(0.0, list(term_v ORDER BY t)),
                         (a, x) -> a + x) AS v
      FROM terms
    )
    SELECT na AS n_a, nb AS n_b, o1 AS observed_a,
           floor(e1 * 10000 + 0.5) / 10000.0 AS expected_a,
           floor((o1 - e1) * (o1 - e1) / v * 1000000 + 0.5) / 1000000.0
             AS chi2
    FROM arrs CROSS JOIN n_by
    """,
    "Log-rank (Mantel–Cox) test comparing time-to-purchase survival "
    "between the md5 A/B user cohorts, right-censored like the "
    "Kaplan–Meier query: per pooled event time the hypergeometric "
    "expectation d_t·n1t/nt and variance accumulate via LEFT-TO-RIGHT "
    "folds over the time-sorted term arrays, so both engines add the "
    "same exact-integer-derived doubles in the same order (the "
    "repo-standard determinism discipline for order-sensitive float "
    "sums). Only the per-user rollup touches facts; risk sets, terms "
    "and the fold are all hours-sized.",
    ("survival", "stats", "ab-testing", "events"),
)
def logrank_time_to_purchase_ab(spark, sf_dir):
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    grp = F.when(
        F.substring(F.md5(F.col("user_id").cast("string").cast("binary")), 1, 1).isin(
            *"01234567"
        ),
        "A",
    ).otherwise("B")
    per_user = e.groupBy("user_id").agg(
        F.first(grp).alias("grp"),
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t0"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_ev"),
        F.max("ts").alias("t_last"),
    )
    observed = F.col("t_ev").isNotNull() & (F.col("t_ev") >= F.col("t0"))
    hours = lambda a, b: (  # noqa: E731
        F.floor(F.col(b).cast("timestamp").cast("long") / 3600)
        - F.floor(F.col(a).cast("timestamp").cast("long") / 3600)
    ).cast("long")
    subjects = per_user.filter(F.col("t0").isNotNull()).select(
        "grp",
        F.when(observed, hours("t0", "t_ev"))
        .otherwise(hours("t0", "t_last"))
        .alias("dur_h"),
        observed.cast("int").alias("observed"),
    )
    n_by = subjects.agg(
        F.sum(F.when(F.col("grp") == "A", 1).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("grp") == "B", 1).otherwise(0)).alias("nb"),
    )
    at_t = subjects.groupBy(F.col("dur_h").alias("t")).agg(
        F.sum(F.when(F.col("grp") == "A", F.col("observed")).otherwise(0)).alias("d1"),
        F.sum(F.when(F.col("grp") == "B", F.col("observed")).otherwise(0)).alias("d2"),
        F.sum(F.when(F.col("grp") == "A", 1).otherwise(0)).alias("l1"),
        F.sum(F.when(F.col("grp") == "B", 1).otherwise(0)).alias("l2"),
    )
    prior = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    risk = at_t.crossJoin(F.broadcast(n_by)).select(
        "t",
        "d1",
        "d2",
        (F.col("na") - F.coalesce(F.sum("l1").over(prior), F.lit(0))).alias("n1t"),
        (F.col("nb") - F.coalesce(F.sum("l2").over(prior), F.lit(0))).alias("n2t"),
    )
    nt = F.col("n1t") + F.col("n2t")
    dt = F.col("d1") + F.col("d2")
    share = F.col("n1t") / nt
    terms = risk.filter(dt > 0).select(
        "t",
        "d1",
        (dt * share).alias("term_e"),
        F.when(
            nt > 1,
            dt * share * (1 - share) * ((nt - dt) / (nt - 1)),
        )
        .otherwise(F.lit(0.0))
        .alias("term_v"),
    )
    folded = terms.agg(
        F.sum("d1").alias("o1"),
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct(F.col("t"), F.col("term_e").alias("v")))
            ),
            F.lit(0.0),
            lambda a, x: a + x["v"],
        ).alias("e1"),
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct(F.col("t"), F.col("term_v").alias("v")))
            ),
            F.lit(0.0),
            lambda a, x: a + x["v"],
        ).alias("v"),
    )
    r4 = lambda c: F.floor(c * 10000 + F.lit(0.5)) / F.lit(10000.0)  # noqa: E731
    return folded.crossJoin(F.broadcast(n_by)).select(
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.col("o1").cast("long").alias("observed_a"),
        r4(F.col("e1")).alias("expected_a"),
        _r6((F.col("o1") - F.col("e1")) * (F.col("o1") - F.col("e1")) / F.col("v")).alias(
            "chi2"
        ),
    )


# ---------------------------------------------------------------------------
# Array set-operations census (head vs tail token windows)
# ---------------------------------------------------------------------------

@_register(
    "array_set_ops_census",
    """
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    ab AS (
      SELECT doc_id,
             list_slice(toks, 1, 12) AS a,
             list_slice(toks, greatest(len(toks) - 11, 1), len(toks)) AS b
      FROM t
    )
    SELECT doc_id,
           CAST(len(a) AS INTEGER)                                AS n_head,
           CAST(len(list_distinct(a)) AS INTEGER)                 AS n_head_distinct,
           CAST(len(list_distinct(list_concat(a, b))) AS INTEGER) AS n_union,
           CAST(len(list_distinct(list_filter(a, x -> list_contains(b, x))))
                AS INTEGER)                                       AS n_intersect,
           CAST(len(list_distinct(list_filter(a, x -> NOT list_contains(b, x))))
                AS INTEGER)                                       AS n_except
    FROM ab
    """,
    "Array set-operation census: head vs tail 12-token windows per "
    "document pushed through array_union / array_intersect / "
    "array_except / array_distinct / slice — all scan-local Catalyst "
    "HOFs (zero shuffle), emitted as cardinalities so the oracle is "
    "order-insensitive (both engines dedup, only sizes compare).",
    ("functions", "arrays", "documents"),
)
def array_set_ops_census(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda x: x != ""
    )
    base = d.select("doc_id", toks.alias("toks"))
    a = F.slice(F.col("toks"), 1, 12)
    b_start = F.greatest(F.size("toks") - 11, F.lit(1))
    b = F.slice(F.col("toks"), b_start, F.lit(12))
    ab = base.select("doc_id", a.alias("a"), b.alias("b"))
    return ab.select(
        "doc_id",
        F.size("a").alias("n_head"),
        F.size(F.array_distinct("a")).alias("n_head_distinct"),
        F.size(F.array_union("a", "b")).alias("n_union"),
        F.size(F.array_intersect("a", "b")).alias("n_intersect"),
        F.size(F.array_except("a", "b")).alias("n_except"),
    )


# ---------------------------------------------------------------------------
# Date functions census #2 (calendar navigation family)
# ---------------------------------------------------------------------------

@_register(
    "date_functions_census2",
    """
    SELECT CAST(quarter(d) AS INTEGER)        AS qtr,
           CAST(weekofyear(d) AS INTEGER)     AS iso_week,
           CAST(dayofyear(d) AS INTEGER)      AS doy,
           last_day(d)                        AS month_end,
           CAST(d + INTERVAL 3 MONTH AS DATE) AS plus_3m,
           CAST(count(*) AS BIGINT)           AS n_orders
    FROM (SELECT CAST(o_orderdate AS DATE) AS d FROM orders)
    GROUP BY 1, 2, 3, 4, 5
    """,
    "Calendar-navigation function census over order dates: quarter, "
    "ISO week, day-of-year, last_day (month end), add_months with "
    "end-of-month clamping (Jan 31 + 1m = Feb 28 on BOTH engines, "
    "probed) — grouped so the result is dates-sized. Scan-local "
    "expressions; the aggregate is the only exchange.",
    ("functions", "dates", "orders"),
)
def date_functions_census2(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return (
        o.select(
            F.quarter(d).alias("qtr"),
            F.weekofyear(d).alias("iso_week"),
            F.dayofyear(d).alias("doy"),
            F.last_day(d).alias("month_end"),
            F.add_months(d, 3).alias("plus_3m"),
        )
        .groupBy("qtr", "iso_week", "doy", "month_end", "plus_3m")
        .agg(F.count("*").alias("n_orders"))
    )
