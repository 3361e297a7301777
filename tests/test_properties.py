"""Property-based tests (hypothesis) for the pure lattice/threshold
logic that the distributed operators rely on."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.sampling import (
    fraction_threshold_hex,
)
from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.sources.evolution import (
    merge_struct_types,
)

ATOMS = [IntegerType(), LongType(), DoubleType(), StringType()]


@st.composite
def schemas(draw):
    names = draw(
        st.lists(
            st.sampled_from("abcdefgh"), min_size=1, max_size=6, unique=True
        )
    )
    return StructType(
        [StructField(n, draw(st.sampled_from(ATOMS))) for n in names]
    )


@given(st.floats(0, 1), st.floats(0, 1))
@settings(max_examples=300, deadline=None)
def test_sampling_thresholds_monotone(f1, f2):
    """f1 ≤ f2 ⇒ thr(f1) ≤ thr(f2) lexicographically — which makes
    sample(f1) ⊆ sample(f2) for any key set (nested samples)."""
    lo, hi = sorted([f1, f2])
    assert fraction_threshold_hex(lo) <= fraction_threshold_hex(hi)


@given(schemas())
@settings(max_examples=200, deadline=None)
def test_schema_merge_idempotent(s):
    assert merge_struct_types(s, s).fieldNames() == s.fieldNames()
    assert [f.dataType for f in merge_struct_types(s, s).fields] == [
        f.dataType for f in s.fields
    ]


@given(schemas(), schemas())
@settings(max_examples=200, deadline=None)
def test_schema_merge_covers_both_sides_or_raises(a, b):
    """When the merge succeeds it contains every field of both inputs
    at a type each side's data can be cast into (same or widened)."""
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.sources.evolution import (
        SchemaEvolutionError,
        _WIDENING_ORDER,
    )

    try:
        m = merge_struct_types(a, b)
    except SchemaEvolutionError:
        shared = set(a.fieldNames()) & set(b.fieldNames())
        flips = any(
            (a[n].dataType != b[n].dataType)
            and not (
                a[n].dataType in _WIDENING_ORDER
                and b[n].dataType in _WIDENING_ORDER
            )
            for n in shared
        )
        assert flips  # only incompatible shared fields may raise
        return
    names = set(m.fieldNames())
    assert set(a.fieldNames()) | set(b.fieldNames()) <= names
    for src in (a, b):
        for f in src.fields:
            t = m[f.name].dataType
            assert t == f.dataType or (
                f.dataType in _WIDENING_ORDER
                and t in _WIDENING_ORDER
                and _WIDENING_ORDER.index(t)
                >= _WIDENING_ORDER.index(f.dataType)
            )


@given(schemas(), schemas())
@settings(max_examples=100, deadline=None)
def test_schema_merge_stable_under_repeat(a, b):
    """merge(merge(a,b), b) == merge(a,b): replaying the same new
    generation never changes the evolved schema (restart-safe)."""
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.sources.evolution import (
        SchemaEvolutionError,
    )

    try:
        m1 = merge_struct_types(a, b)
    except SchemaEvolutionError:
        return
    assert merge_struct_types(m1, b) == m1


# ---------------------------------------------------------------------------
# CEP state-machine encoding (match_recognize_funnel_users)
# ---------------------------------------------------------------------------

def _cep_fold(codes):
    """Integer-encoded fold exactly as the Spark/DuckDB queries run it."""
    a = 0
    for x in codes:
        s = a % 3
        if x == 3 and s == 2:
            a = (a // 3 + 1) * 3
        elif x == 2 and s == 1:
            a = a - s + 2
        elif x == 1 and s == 0:
            a = a - s + 1
    return a // 3


def _cep_reference(codes):
    """Straightforward non-overlapping v→c→p matcher."""
    count, state = 0, 0
    for x in codes:
        if state == 0 and x == 1:
            state = 1
        elif state == 1 and x == 2:
            state = 2
        elif state == 2 and x == 3:
            count += 1
            state = 0
    return count


@given(st.lists(st.integers(0, 3), max_size=300))
@settings(max_examples=300, deadline=None)
def test_cep_integer_encoding_equals_reference_matcher(codes):
    assert _cep_fold(codes) == _cep_reference(codes)


@given(st.lists(st.integers(0, 3), max_size=120))
@settings(max_examples=200, deadline=None)
def test_cep_count_bounded_and_monotone_under_append(codes):
    c = _cep_fold(codes)
    assert 0 <= c <= len(codes) // 3 + 1
    # appending events can never reduce completed funnels
    assert _cep_fold(codes + [1, 2, 3]) >= c + 0
    assert _cep_fold(codes + [1, 2, 3]) >= _cep_fold(codes)


# ---------------------------------------------------------------------------
# Weighted median (weighted_median_price_by_brand rewrite)
# ---------------------------------------------------------------------------

def _weighted_median(pairs):
    """The query's definition: first value whose cumulative weight
    (ascending value order) reaches half the total."""
    pairs = sorted(pairs)
    tot = sum(w for _, w in pairs)
    cum = 0
    for v, w in pairs:
        cum += w
        if cum >= tot / 2:
            return v
    return pairs[-1][0]


@given(
    st.lists(
        st.tuples(st.integers(0, 1000), st.integers(1, 50)),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=300, deadline=None)
def test_weighted_median_properties(pairs):
    m = _weighted_median(pairs)
    values = [v for v, _ in pairs]
    assert min(values) <= m <= max(values)
    tot = sum(w for _, w in pairs)
    below = sum(w for v, w in pairs if v < m)
    at_or_below = sum(w for v, w in pairs if v <= m)
    # the defining inequalities of a weighted median
    assert below < tot / 2 or below == 0
    assert at_or_below >= tot / 2
    # replicating every pair leaves the median unchanged
    assert _weighted_median(pairs * 2) == m
