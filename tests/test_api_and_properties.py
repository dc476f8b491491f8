"""Reference-shaped API facade tests + hypothesis property tests for
the float-bit surgery over the float32 domain (SURVEY §5.2)."""

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from vector_database_watermarking_spark import api
from vector_database_watermarking_spark.functions import bits

f32 = st.floats(
    min_value=-1e6,
    max_value=1e6,
    allow_nan=False,
    allow_infinity=False,
    width=32,
)


@given(f32)
@settings(max_examples=300, deadline=None)
def test_float_to_bin_roundtrip_float32_domain(x):
    b = bits.float_to_bin(x)
    assert set(b) <= {"0", "1", "."} and b.count(".") == 1
    back = bits.bin_to_float(b)
    assert math.isclose(back, abs(x), rel_tol=1e-12, abs_tol=1e-300)


@given(f32, st.integers(min_value=0, max_value=1))
@settings(max_examples=200, deadline=None)
def test_embed_sets_extractable_bit_or_shortens(x, wm_bit):
    """Embedding then extracting through float32 storage returns the
    embedded bit except in the documented expansion-shortening edge
    case (which the A2 majority vote absorbs)."""
    vec = [float(np.float32(x))] * 4
    vid = "123456789"
    skip = frozenset()
    new = bits.embed_bit(vec, wm_bit, vid, skip)
    new32 = [float(np.float32(v)) for v in new]
    got = bits.extract_bit(new32, vid, skip)
    if got != wm_bit:
        # only legal when the write shortened/lengthened the expansion
        h = bits.compat_md5_int(vid)
        pos = h % len(vec)
        assert len(bits.float_to_bin(new32[pos])) != len(bits.float_to_bin(vec[pos]))


def test_api_facade_roundtrip(spark, sf_dir):
    data = api.load_data(spark, sf_dir, num_samples=400)
    assert data.count() == 400
    wm_df, L, carriers, orig, ai = api.watermark_embedding_by_ai(
        data, strength=0.7, th=1.0, watermark="10101", random_seed=20
    )
    assert L == 5
    assert api.BER("10101", api.watermark_extraction(wm_df, L, random_seed=20)) == 0.0
    # attacks through the facade
    survivors = api.adaptive_dele(wm_df, 0.2, ai)
    assert survivors.count() == 400 - math.ceil(400 * 0.2)
    inserted = api.adaptive_insertion(wm_df, 0.1)
    assert inserted.count() == 400 + math.ceil(400 * 0.1)


def test_api_scpw_and_tabularmark(spark, sf_dir):
    data = api.load_data(spark, sf_dir)
    wm_df, L, carriers, _ = api.scpw_watermark_embedding(
        data, top_k=3, strength=0.7, position=10, standard_e=0.1, watermark="101"
    )
    assert api.scpw_watermark_extraction(wm_df, 3, L, 10) == "101"
    wm2, keys = api.tabularmark_embed(data, nw=80, p=4.0, k=3, position=5)
    res = api.tabularmark_detect(data, wm2, keys, p=4.0, k=3, position=5)
    assert res["detected"]


# ---- repetition-feature properties (pure-python mirror of the fold) ----

_words = st.lists(
    st.sampled_from(["a", "b", "cc", "dd", "e"]), min_size=1, max_size=24
)


@given(_words)
@settings(max_examples=25, deadline=None)
def _check_repetition_property(words):
    """The sorted-run fold must equal the true unigram mode count, and
    every ratio must live in (0, 1]."""
    from collections import Counter

    from vector_database_watermarking_spark.operators import text as T

    spark = _check_repetition_property._spark
    df = spark.createDataFrame([(1, " ".join(words))], ["doc_id", "text"])
    r = T.repetition_features(df).head()
    n = len(words)
    c = Counter(words)
    assert r["n_tokens"] == n
    assert r["top_unigram_frac"] == round(max(c.values()) / n, 6)
    assert r["distinct_ratio"] == round(len(c) / n, 6)
    bigrams = [f"{a} {b}" for a, b in zip(words, words[1:])]
    want_dup = round(1 - len(set(bigrams)) / len(bigrams), 6) if bigrams else 0.0
    assert r["dup_bigram_frac"] == want_dup
    assert 0 < r["distinct_ratio"] <= 1 and 0 < r["top_unigram_frac"] <= 1
    assert 0 <= r["dup_bigram_frac"] < 1


def test_repetition_bounds_and_mode_property(spark):
    # hand the session to the hypothesis-driven check (hypothesis
    # functions cannot take pytest fixtures directly)
    _check_repetition_property._spark = spark
    _check_repetition_property()


def test_readme_query_count_matches_registry():
    """README's coverage numbers are the map the next round works
    from — pin them to the live registry so they can't drift."""
    import re
    from pathlib import Path

    from vector_database_watermarking_spark.registry import QUERIES

    readme = Path(__file__).resolve().parents[1] / "README.md"
    counts = {
        int(m) for m in re.findall(r"\((\d+) (?:oracle-backed )?queries", readme.read_text())
    }
    counts |= {
        int(m) for m in re.findall(r"checks all (\d+) locally", readme.read_text())
    }
    assert counts == {len(QUERIES)}, (
        f"README claims {sorted(counts)} queries but the registry has "
        f"{len(QUERIES)} — update README.md"
    )


@given(f32, st.integers(0, 1), st.integers(0, 10**12))
@settings(max_examples=400, deadline=None)
def test_bit_surgery_fast_tier_matches_string_tier(x, wm_bit, vid_num):
    """The integer fast tier (O(1) per value) must be bit-identical to
    the string-expansion reference tier on the whole float32 domain —
    including the sub-2^-27 carriers where the fast tier falls back."""
    vec = [x, 1.5, -0.25, 3.0, 0.0, -2.75, 0.5, 8.0]
    skip = frozenset({1, 5})
    vid = str(vid_num)
    assert bits.embed_bit_fast(vec, wm_bit, vid, skip) == bits.embed_bit(
        vec, wm_bit, vid, skip
    )
    assert bits.extract_bit_fast(vec, vid, skip) == bits.extract_bit(
        vec, vid, skip
    )


@given(st.floats(min_value=1.401298464324817e-45, max_value=9.99999993922529e-09, allow_nan=False, width=32),
       st.integers(0, 1), st.integers(0, 10**12))
@settings(max_examples=200, deadline=None)
def test_bit_surgery_fast_tier_tiny_carrier_domain(x, wm_bit, vid_num):
    """Dense coverage of the denormal/tiny-carrier region where the
    expansion exceeds the 53-bit significand and the fast tier must
    defer to the string tier."""
    vec = [0.0] * 8
    vec[3] = x
    skip = frozenset({0})
    vid = str(vid_num)
    assert bits.embed_bit_fast(vec, wm_bit, vid, skip) == bits.embed_bit(
        vec, wm_bit, vid, skip
    )
    assert bits.extract_bit_fast(vec, vid, skip) == bits.extract_bit(
        vec, vid, skip
    )


def test_grade_window_and_oracle_invariants():
    """The rotation ledger's structural contract (validated by hand
    every rotation until now): 50 graded slots ending at the robustness
    grid, no duplicate or unregistered names, and README's
    zero-no-oracle claim — every registered query carries an oracle."""
    from vector_database_watermarking_spark.registry import _GRADE_ORDER, QUERIES

    assert len(_GRADE_ORDER) == len(set(_GRADE_ORDER)), "duplicate names"
    assert len(_GRADE_ORDER) == len(QUERIES), "ledger out of sync"
    assert _GRADE_ORDER.index("a14_robustness_mini") + 1 == 50, (
        "graded window must stay exactly 50 slots ending at the grid"
    )
    assert set(_GRADE_ORDER) == set(QUERIES), "unregistered ledger entry"
    missing = [n for n, q in QUERIES.items() if not q.oracle]
    assert missing == [], f"queries without oracles: {missing}"
