"""Property-based tests (hypothesis) over the pure decode semantics —
the fiddly order-sensitive logic gets fuzzed, not just example-tested."""

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from openie_with_entities_spark.corpus import make_turn_text
from openie_with_entities_spark.evaluate import Ext, binary_linient_tuple_match
from openie_with_entities_spark.extract.labeler import (
    MAX_OIE_DEPTH,
    conj_label_matrix,
    oie_label_matrix,
)
from openie_with_entities_spark.functions.decode import (
    SENTINELS,
    decode_coordinations,
    decode_extractions,
    split_by_coordinations,
)
from openie_with_entities_spark.oracle import segment_text

words = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd")),
    min_size=1,
    max_size=8,
)
label_rows = st.lists(
    st.lists(st.integers(0, 5), min_size=1, max_size=20),
    min_size=1,
    max_size=3,
)


@given(st.lists(words, min_size=1, max_size=15), label_rows)
@settings(max_examples=200, deadline=None)
def test_coordination_decode_never_crashes_and_spans_valid(tokens, rows):
    tokens = tokens + SENTINELS
    n = len(tokens)
    rows = [r[:n] + [0] * (n - len(r)) for r in rows]
    coords = decode_coordinations(rows)
    for cc, c in coords.items():
        if c is None:
            continue
        assert c.cc == cc
        assert len(c.spans) >= 2
        assert c.spans[0][1] < cc < c.spans[-1][0]
        for (s, e) in c.spans:
            assert 0 <= s <= e < n
    # splitting valid coords never crashes and emits only real tokens
    texts, conj_words, idx = split_by_coordinations(coords, tokens)
    for sent in idx:
        assert all(0 <= i < n for i in sent)
    assert len(texts) == len(idx)


@given(st.integers(0, 10**9))
@settings(max_examples=100, deadline=None)
def test_labelers_produce_decodable_output(seed):
    rng = random.Random(seed)
    text = make_turn_text(rng)
    for sent in segment_text(text):
        tokens = sent.split() + SENTINELS
        if len(tokens) > 100:
            continue
        conj_rows = conj_label_matrix(tokens)
        assert all(len(r) == len(tokens) for r in conj_rows)
        rows, confs = oie_label_matrix(tokens)
        assert len(rows) == len(confs) <= MAX_OIE_DEPTH
        exts = decode_extractions(rows, tokens, confs)
        for (a1, rel, a2, conf) in exts:
            assert a1 and rel  # validity filter holds
            assert 0.0 < conf <= 1.0
            for t in SENTINELS:  # sentinels never leak into triple text
                assert t not in a1 and t not in rel and t not in a2
        # dedup: keys unique
        keys = [(a1, a2, r) for (a1, r, a2, _) in exts]
        assert len(keys) == len(set(keys))


@given(st.integers(0, 10**9))
@settings(max_examples=100, deadline=None)
def test_segmentation_reassembles(seed):
    rng = random.Random(seed)
    text = make_turn_text(rng)
    assert " ".join(segment_text(text)) == text


@given(
    st.lists(words, min_size=1, max_size=6),
    st.lists(words, min_size=1, max_size=6),
    st.lists(words, min_size=0, max_size=6),
    st.lists(words, min_size=1, max_size=6),
)
@settings(max_examples=200, deadline=None)
def test_matcher_bounds_and_self_match(rel, a1, a2, other):
    g = Ext(" ".join(rel), [" ".join(a1), " ".join(a2)])
    p = Ext(" ".join(other), [" ".join(a1), " ".join(a2)])
    for ext in (g, p):
        prec, rec = binary_linient_tuple_match(g, ext)
        assert 0.0 <= prec <= 1.0 and 0.0 <= rec <= 1.0
    # exact self-match (no '.' tokens in these alphabets) is perfect
    assert binary_linient_tuple_match(g, Ext(g.pred, list(g.args))) == [1.0, 1.0]
