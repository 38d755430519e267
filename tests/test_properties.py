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


def _brute_jaccard(texts, k=15, threshold=0.5):
    """Pure-Python brute force twin of ngram_jaccard_pairs."""
    sets = {
        i: {t[j : j + k] for j in range(max(len(t) - k + 1, 1))}
        for i, t in enumerate(texts)
    }
    out = set()
    for a in sets:
        for b in sets:
            if a >= b:
                continue
            inter = len(sets[a] & sets[b])
            jac = round(inter / (len(sets[a]) + len(sets[b]) - inter), 4)
            if jac >= threshold:
                out.add((a, b, jac))
    return out


def test_jaccard_prefix_filter_exactness_fuzz(spark):
    """The df-ordered prefix filter must lose NO true pair: fuzzed corpora
    mixing near-duplicates, shared boilerplate, and short docs, checked
    against pure-Python brute force at two thresholds."""
    rng = random.Random(99)
    alphabet = "abcdef "
    for trial in range(3):
        base = [
            "".join(rng.choice(alphabet) for _ in range(rng.randint(16, 60)))
            for _ in range(10)
        ]
        texts = list(base)
        # near-duplicates (mutate one char), exact dup, shared boilerplate
        texts.append(base[0][:-1] + "x")
        texts.append(base[1])
        boiler = "SHARED-BOILERPLATE"
        texts.append(boiler + base[2])
        texts.append(boiler + base[3])
        docs = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        from openie_with_entities_spark.operators.docops import (
            ngram_jaccard_pairs,
        )

        for t in (0.5, 0.8, 0.9):
            got = {
                (r.doc_a, r.doc_b, r.jaccard)
                for r in ngram_jaccard_pairs(docs, threshold=t).collect()
            }
            want = _brute_jaccard(texts, threshold=t)
            assert got == want, (trial, t, got ^ want)


def test_snap_objects_equals_python_twin_fuzz(spark):
    """Token-suffix snapping fuzz: random arg2 phrases mixing gazetteer
    names, punctuation, and noise — the Spark equi-join must match a
    pure-Python reimplementation of the longest-suffix rule."""
    import re as _re

    from openie_with_entities_spark.corpus import alias_dict, gazetteer_rows
    from openie_with_entities_spark.linking import snap_objects

    best = {}
    for r in gazetteer_rows():
        sf = r["surface_form"]
        if sf and (sf not in best or r["canonical_name"] > best[sf]):
            best[sf] = max(best.get(sf, ""), r["canonical_name"])

    def norm(s):
        return _re.sub(" +", " ", _re.sub(r"[^\w\s]", "", s.lower())).strip()

    def py_snap(rel, arg2):
        toks = [t for t in arg2.split(" ") if t]
        matches = []
        for j in range(1, min(4, max(len(toks), 1)) + 1):
            suffix = norm(" ".join(toks[-j:])) if toks else ""
            if suffix and suffix in best:
                prefix = " ".join(toks[: len(toks) - j]).strip()
                matches.append((len(suffix), suffix, best[suffix], prefix))
        if not matches:
            return rel, arg2
        _, sf, cn, prefix = max(matches)
        return (rel + " " + prefix if prefix else rel), cn

    rng = random.Random(5)
    names = ["Acme Corp", "Alan Turing", "Paris", "Tim Berners-Lee", "megacorp"]
    fillers = ["the", "board", "of", "sunny", ",", ".", "visited", ""]
    rows = []
    for i in range(40):
        n = rng.randint(1, 6)
        parts = [rng.choice(fillers + names) for _ in range(n)]
        arg2 = " ".join(p for p in parts if p != "")
        rows.append(("c", 0, i, 0, 0, "X", "did", arg2 or "x", 0.5))
    ddl = (
        "conv_id string, turn_idx int, sent_idx int, split_idx int, "
        "ext_idx int, arg1 string, rel string, arg2 string, confidence double"
    )
    t = spark.createDataFrame(rows, ddl)
    got = {
        r.sent_idx: (r.rel_snapped, r.arg2_snapped)
        for r in snap_objects(t, alias_dict(spark)).collect()
    }
    for row in rows:
        i, rel, arg2 = row[2], row[6], row[7]
        assert got[i] == py_snap(rel, arg2), (arg2, got[i], py_snap(rel, arg2))


phrase = st.lists(words, min_size=1, max_size=4).map(" ".join)


@given(phrase, phrase, phrase, phrase, phrase, phrase)
@settings(max_examples=200, deadline=None)
def test_matcher_family_invariants(gr, ga1, ga2, pr, pa1, pa2):
    """Fuzz the whole matcher family: tuple matchers stay in [0,1]²,
    binary matchers return bool, self-match behaves per documented
    semantics, and no variant crashes on arbitrary word content."""
    from openie_with_entities_spark.evaluate import (
        MATCHERS,
        _as_pr,
        simple_tuple_match,
        tuple_match,
    )

    g, p = Ext(gr, [ga1, ga2]), Ext(pr, [pa1, pa2])
    for name, fn in MATCHERS.items():
        if name == "bertscore":
            continue
        out = fn(g, p)
        pr_, rc_ = _as_pr(out)
        assert 0.0 <= pr_ <= 1.0 and 0.0 <= rc_ <= 1.0, (name, out)
    # self-match: linient-family and simple give full credit; strict gives
    # full credit unless a part is stopword-empty... no — strict voids only
    # on zero OVERLAP, impossible against itself for non-empty parts
    assert simple_tuple_match(g, g) == [1.0, 1.0]
    assert tuple_match(g, g) == [1.0, 1.0]


@given(phrase, phrase, phrase)
@settings(max_examples=100, deadline=None)
def test_binary_symmetric_matchers(a, b, c):
    from openie_with_entities_spark.evaluate import bow_match, pred_match

    x, y = Ext(a, [b, c]), Ext(c, [a, b])
    assert bow_match(x, y) == bow_match(y, x)
    assert pred_match(x, y) == pred_match(y, x)


@given(st.lists(phrase, min_size=1, max_size=3),
       st.lists(phrase, min_size=1, max_size=3))
@settings(max_examples=100, deadline=None)
def test_ss_recall_never_exceeds_sm(golds, preds):
    """'ss' (greedy 1-1) recall numerator is bounded by 'sm' (per-gold
    max): a prediction can credit at most one gold under ss."""
    from openie_with_entities_spark.evaluate import sentence_contributions

    g = [Ext("rel " + x, [x, x + " tail"]) for x in golds]
    p = [Ext("rel " + x, [x, x + " tail"], 0.5) for x in preds]
    sm = sentence_contributions(g, p, [0.5], strategy="sm")
    ss = sentence_contributions(g, p, [0.5], strategy="ss")
    assert ss[0][2] <= sm[0][2] + 1e-9
    # precision identical between strategies
    assert ss[0][0] == sm[0][0] and ss[0][1] == sm[0][1]
