"""Hypothesis property tests for the round-3 text kernels."""

from hypothesis import given, settings
from hypothesis import strategies as st

from open_thoughts_ray.ops.boilerplate import doc_lines
from open_thoughts_ray.ops.bpe import EOW, bpe_encode, merges_from_word_counts
from open_thoughts_ray.ops.math_answers import answers_match, extract_boxed

token = st.text(alphabet="abcdefgh", min_size=1, max_size=5)
text = st.lists(token, min_size=0, max_size=40).map(" ".join)


@given(text, st.integers(min_value=1, max_value=9))
@settings(max_examples=200, deadline=None)
def test_doc_lines_roundtrip(t, k):
    """Chunked lines rejoined with ' ' reconstruct the text exactly —
    the boilerplate no-op identity."""
    assert " ".join(doc_lines(t, k)) == t


@given(st.lists(st.tuples(token, st.integers(1, 50)), min_size=1,
                max_size=12),
       st.integers(min_value=0, max_value=8))
@settings(max_examples=100, deadline=None)
def test_bpe_encode_lossless(word_counts, n_merges):
    """BPE segmentation is lossless: joined tokens == word + EOW for
    every trained merge list and every word (seen or unseen)."""
    counts = dict(word_counts)
    merges = merges_from_word_counts(counts, n_merges)
    for w in list(counts)[:5] + ["unseen", "zz"]:
        assert "".join(bpe_encode(w, merges)) == w + EOW


@given(st.text(alphabet="ab{}\\ 123dexfr", max_size=60))
@settings(max_examples=300, deadline=None)
def test_extract_boxed_never_crashes(s):
    """Brace matching survives arbitrary junk (unbalanced braces,
    trailing backslashes) and always returns a string."""
    out = extract_boxed(s)
    assert isinstance(out, str)


@given(st.integers(-10**6, 10**6), st.integers(1, 999))
@settings(max_examples=200, deadline=None)
def test_answers_match_fraction_decimal_consistency(num, den):
    """a/b always matches its own exact decimal when one exists, and
    matching is symmetric."""
    frac = f"{num}/{den}"
    assert answers_match(frac, frac)
    assert answers_match(frac, f"\\frac{{{num}}}{{{den}}}")
    assert answers_match(f"\\frac{{{num}}}{{{den}}}", frac)
