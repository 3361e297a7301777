"""Text-analysis column library (training-data pipeline ops).

Everything is built-in Catalyst expressions (split/filter/transform/
aggregate higher-order functions) — no Python in the hot path, so
these run inside whole-stage codegen and scale linearly with a plain
scan: no shuffle is ever introduced by a per-document score.

Ops: tokenization, token/char stats, stopword & punctuation quality
signals, word n-gram shingles, content fingerprints, and an n-gram
language-ID heuristic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny multilingual stopword sets for the langid heuristic (public
# knowledge). The score for a language is the fraction of tokens that
# are in its stopword set.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es", "se", "no"),
    "de": ("der", "die", "das", "und", "in", "den", "von", "zu", "mit", "ist"),
    "fr": ("le", "la", "de", "et", "les", "des", "en", "un", "du", "est"),
    "zh": ("的", "是", "不", "了", "在", "人", "有", "我", "他", "这"),
}

DEFAULT_STOPWORDS = LANG_STOPWORDS["en"]


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (lowercased, empty tokens dropped)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(c), r"\s+"), lambda t: t != "")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text)).cast("int")


def bpe_ish_token_count(text: Column | str) -> Column:
    """Sub-word-ish token estimate: split on whitespace AND
    punctuation AND letter/digit boundaries — a cheap, deterministic
    proxy for a BPE tokenizer's piece count."""
    c = F.col(text) if isinstance(text, str) else text
    pieces = F.split(c, r"[\s\p{Punct}]+|(?<=\p{L})(?=\p{N})|(?<=\p{N})(?=\p{L})")
    return F.size(F.filter(pieces, lambda t: t != "")).cast("int")


def stopword_ratio(
    text: Column | str, stopwords: tuple[str, ...] = DEFAULT_STOPWORDS
) -> Column:
    toks = tokens(text)
    stops = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    return stops / F.greatest(F.size(toks), F.lit(1))


def punct_ratio(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    no_punct = F.regexp_replace(c, r"\p{Punct}", "")
    return (F.length(c) - F.length(no_punct)) / F.greatest(
        F.length(c), F.lit(1)
    )


def quality_bucket(
    text: Column | str, stopwords: tuple[str, ...] = DEFAULT_STOPWORDS
) -> Column:
    """Coarse quality label from length + stopword signals — the
    shape of a Gopher/C4-style quality filter."""
    n = token_count(text)
    ratio = stopword_ratio(text, stopwords)
    return (
        F.when(n < 5, F.lit("too_short"))
        .when(ratio > 0.5, F.lit("boilerplate"))
        .otherwise(F.lit("ok"))
    )


def word_ngrams(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles (space-joined).

    ANSI-safe: documents with fewer than ``n`` tokens yield an empty
    array (``element_at`` would raise under ANSI mode, Spark 4's
    default, so the short-doc branch never indexes).

    Prefer :func:`shingle_rows` for bulk corpora — Catalyst does not
    CSE inside HOF lambdas, so this expression re-tokenizes per
    element.
    """
    toks = tokens(text)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.try_element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def shingle_rows(df, id_col: str, text_col: str, n: int = 3, spread: bool = True):
    """Exploded distinct word n-gram shingles as (id, gram) rows with a
    deterministic 64-bit gram key.

    One Arrow-batched mapInPandas pass: the expression-level
    :func:`word_ngrams` is kept for column-level use, but Catalyst
    does not common-subexpression-eliminate inside higher-order-
    function lambdas, so the expression form re-tokenizes the document
    per element — orders of magnitude slower on real corpora. Here
    tokenization happens once per document; downstream joins carry
    (long, long) rows. The closure is self-contained (workers may not
    have this package on sys.path).

    ``spread=False`` skips the round-robin pre-repartition for
    consumers whose downstream is exchange-bound rather than
    shingle-CPU-bound (the r8 prefix-filter residual: the spread
    exchange feeds straight into several keyed shuffles that repay
    none of it).
    """
    from pyspark.sql import functions as SF
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        [StructField("_id", LongType()), StructField("gram", LongType())]
    )
    nn = n

    def gen(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            ids, hashes = [], []
            for doc_id, text in zip(pdf["_id"], pdf["_text"]):
                toks = [t for t in (text or "").lower().split() if t]
                grams = {
                    " ".join(toks[i : i + nn])
                    for i in range(max(len(toks) - nn + 1, 0))
                }
                for g in grams:
                    ids.append(doc_id)
                    hashes.append(
                        int.from_bytes(
                            hashlib.md5(g.encode()).digest()[:8],
                            "big",
                            signed=True,
                        )
                    )
            yield pd.DataFrame({"_id": ids, "gram": hashes})

    from ..operators.scale import spread_for_compute

    projected = df.select(
        SF.col(id_col).alias("_id"), SF.col(text_col).alias("_text")
    )
    if spread:
        projected = spread_for_compute(projected)
    return projected.mapInPandas(gen, out_schema)


def content_fingerprint(text: Column | str) -> Column:
    """Normalized-content MD5: lowercase, collapse whitespace.
    Stable across engines (used as the exact-dedup key)."""
    c = F.col(text) if isinstance(text, str) else text
    normalized = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    return F.md5(normalized.cast("binary"))


def lang_id_heuristic(text: Column | str) -> Column:
    """Stopword-vote language ID: the language whose stopword set
    covers the largest fraction of tokens; 'und' when nothing hits."""
    toks = tokens(text)
    n = F.greatest(F.size(toks), F.lit(1))
    scored = F.array(
        *[
            F.struct(
                (F.size(F.filter(toks, lambda t: t.isin(*sw))) / n).alias("score"),
                F.lit(lang).alias("lang"),
            )
            for lang, sw in LANG_STOPWORDS.items()
        ]
    )
    best = F.array_max(scored)
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


# PII patterns (public, standard shapes): email, NANP-style phone
# number, IPv4. Order matters — emails first so their digit runs are
# not half-eaten by the phone pattern.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{2,3}[-.]\d{3}[-.]\d{3,4}[-.]\d{4}\b", "<PHONE>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
)


def pii_scrub(text: Column | str) -> Column:
    """Redact common PII shapes from free text.

    A chain of `regexp_replace` calls — pure Catalyst codegen, so the
    scrub is a scan-local map with zero shuffle at any corpus size.
    The patterns are deliberately conservative (high precision): a
    100 TB pre-training scrub wants no false merges of ordinary
    numerics into <PHONE>.
    """
    c = F.col(text) if isinstance(text, str) else text
    for pattern, token in PII_PATTERNS:
        c = F.regexp_replace(c, pattern, token)
    return c


def compression_ratio(df, text_col: str = "text", id_col: str = "doc_id"):
    """Per-document zlib compression ratio — the cheap
    repetition/entropy proxy used by large-corpus quality filters
    (highly repetitive or templated documents compress far below
    typical prose; near-random text barely compresses).

    One Arrow-batched ``mapInPandas`` pass (DEFLATE is not
    expressible in Catalyst expressions), compression level pinned
    for determinism. Zero shuffles: the ratio is a scan-local map at
    any corpus size. Output: (id, n_chars, compressed_bytes, ratio).
    """
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("n_chars", LongType()),
            StructField("compressed_bytes", LongType()),
            StructField("compression_ratio", DoubleType()),
        ]
    )

    def fn(batches):
        # imports inside the closure: pickled by value, so the worker
        # needs no importable repo module (foreign-cwd safe)
        import zlib

        import pandas as pd

        for pdf in batches:
            texts = pdf[text_col].astype(str)
            comp = [len(zlib.compress(t.encode("utf-8"), 6)) for t in texts]
            n = texts.str.len().astype("int64")
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "n_chars": n,
                    "compressed_bytes": pd.Series(comp, index=pdf.index, dtype="int64"),
                    "compression_ratio": [
                        round(c / max(int(l), 1), 6) for c, l in zip(comp, n)
                    ],
                }
            )

    return df.select(id_col, text_col).mapInPandas(fn, schema)


# ---------------------------------------------------------------------------
# Markup stripping (web-corpus cleaning)
# ---------------------------------------------------------------------------

# Ordered strip chain. Block elements whose CONTENT must go too
# (script/style) come first, then comments, then any remaining tag.
# (?s) lets .*? cross newlines; both Java regex (Spark) and RE2
# (DuckDB) support it, so one pattern list serves both engines.
MARKUP_PATTERNS: tuple[str, ...] = (
    r"(?s)<script[^>]*>.*?</script>",
    r"(?s)<style[^>]*>.*?</style>",
    r"(?s)<!--.*?-->",
    r"<[^>]+>",
)

# Entity decode map — &amp; LAST so freshly-decoded ampersands cannot
# re-trigger earlier entities ("&amp;lt;" decodes to "&lt;" the
# string, not "<").
HTML_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def strip_markup(text: Column | str) -> Column:
    """HTML/markup removal for web-scraped corpora: drop script/style
    blocks with their content, strip comments and tags, decode the
    common entities, collapse whitespace.

    Pure `regexp_replace`/`replace` chain — scan-local Catalyst
    codegen, zero shuffle at any corpus size (the CCNet/RefinedWeb
    extraction stage re-expressed as columnar expressions).
    """
    c = F.col(text) if isinstance(text, str) else text
    for pattern in MARKUP_PATTERNS:
        c = F.regexp_replace(c, pattern, " ")
    for entity, repl in HTML_ENTITIES:
        c = F.replace(c, F.lit(entity), F.lit(repl))
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def flesch_columns(text: Column | str) -> tuple[Column, Column, Column]:
    """(n_words, n_sentences, n_syllables) for Flesch readability.

    Words = alphabetic runs; sentences = terminal-punctuation runs
    (min 1); syllables = vowel-group runs (the standard cheap proxy).
    All three are regexp_extract_all counts — identical semantics in
    DuckDB, so readability scores are oracle-checkable bit-exact.
    """
    c = F.col(text) if isinstance(text, str) else text
    low = F.lower(c)
    n_words = F.size(F.regexp_extract_all(low, F.lit(r"[a-z]+"), F.lit(0)))
    n_sentences = F.greatest(
        F.size(F.regexp_extract_all(c, F.lit(r"[.!?]+"), F.lit(0))), F.lit(1)
    )
    n_syllables = F.size(F.regexp_extract_all(low, F.lit(r"[aeiouy]+"), F.lit(0)))
    return n_words, n_sentences, n_syllables
