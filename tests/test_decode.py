"""Unit tests for the pure decode semantics (the trickiest ports:
/root/reference/metric.py:204-248, data.py:624-807, model.py:554-593)."""

from openie_with_entities_spark.functions.decode import (
    SENTINELS,
    decode_coordinations,
    decode_extractions,
    decode_triple,
    normalize_quotes,
    split_by_coordinations,
)
from openie_with_entities_spark.extract.labeler import (
    conj_label_matrix,
    oie_label_matrix,
)


def toks(s):
    return s.split() + SENTINELS


def split_sentence(s):
    tokens = toks(s)
    coords = decode_coordinations(conj_label_matrix(tokens))
    texts, conj_words, idx = split_by_coordinations(coords, tokens)
    clean = [t.split("[unused1]")[0].strip() for t in texts]
    return clean, conj_words


class TestCoordinationDecode:
    def test_simple_cp(self):
        # A and B: spans (0,0),(2,2), cc=1  → labels 2 3 1 0
        coords = decode_coordinations([[2, 3, 1, 0]])
        assert list(coords) == [1]
        c = coords[1]
        assert c.cc == 1 and c.spans == ((0, 0), (2, 2))

    def test_unclosed_phrase_is_dropped(self):
        # no trailing 0 → coordination never closes
        coords = decode_coordinations([[2, 3, 1]])
        assert coords == {}

    def test_dangling_cc(self):
        coords = decode_coordinations([[0, 3, 0]])
        assert coords == {1: None}

    def test_cc_outside_spans_rejected(self):
        # cc before first span end
        coords = decode_coordinations([[3, 2, 1, 1, 0]])
        assert 0 not in coords or coords[0] is None

    def test_multi_conjunct_with_seps(self):
        # A , B and C → 2 4 1 3 1 0
        coords = decode_coordinations([[2, 4, 1, 3, 1, 0]])
        c = coords[3]
        assert c.spans == ((0, 0), (2, 2), (4, 4))


class TestSplit:
    def test_three_way_split(self):
        clean, conj_words = split_sentence(
            "Ada Lovelace , Alan Turing and Grace Hopper visited Paris ."
        )
        assert clean == [
            "Ada Lovelace visited Paris .",
            "Alan Turing visited Paris .",
            "Grace Hopper visited Paris .",
        ]
        assert conj_words == ["Ada Lovelace", "Alan Turing", "Grace Hopper"]

    def test_nor_never_splits(self):
        clean, _ = split_sentence("Ada Lovelace nor Alan Turing visited Paris .")
        assert clean == []

    def test_ampersand_never_splits(self):
        clean, _ = split_sentence("Acme Corp & Globex sued Hooli .")
        assert clean == []

    def test_unbreakable_context(self):
        clean, _ = split_sentence("the distance between Paris and Berlin increased .")
        assert clean == []

    def test_no_coordination(self):
        clean, conj_words = split_sentence("Ada Lovelace visited Paris .")
        assert clean == [] and conj_words == []

    def test_nested_coordinations_two_depths(self):
        # "A and B or C ran ." with the outer coordination at depth 0
        # (spans A | B-or-C) and the inner at depth 1 (B | C) — exercises
        # the containment tree + BFS levels (/root/reference/data.py:696-783)
        words = "A and B or C ran .".split() + SENTINELS
        matrix = [
            [2, 3, 1, 1, 1, 0, 0, 0, 0, 0],  # outer: (0,0),(2,4) cc=1
            [0, 0, 2, 3, 1, 0, 0, 0, 0, 0],  # inner: (2,2),(4,4) cc=3
        ]
        coords = decode_coordinations(matrix)
        texts, conj_words, _ = split_by_coordinations(coords, words)
        clean = [t.split("[unused1]")[0].strip() for t in texts]
        assert sorted(clean) == ["A ran .", "B ran .", "C ran ."]
        assert conj_words == ["A", "B or C", "B", "C"]

    def test_two_independent_coordinations(self):
        clean, _ = split_sentence(
            "Ada Lovelace and Alan Turing visited Paris and Berlin ."
        )
        # 2 × 2 conjunct combinations
        assert len(clean) == 4
        assert "Ada Lovelace visited Paris ." in clean
        assert "Alan Turing visited Berlin ." in clean


class TestTripleDecode:
    def test_basic(self):
        tokens = toks("Ada Lovelace founded Acme Corp .")
        labels = [1, 1, 2, 3, 3, 0, 0, 0, 0]
        assert decode_triple(labels, tokens) == (
            "Ada Lovelace",
            "founded",
            "Acme Corp",
        )

    def test_rel_case_2(self):
        tokens = toks("Ada Lovelace chairman of Acme Corp .")
        # [unused2] labeled REL → "is chairman of"
        labels = [1, 1, 2, 0, 3, 3, 0, 0, 2, 0]
        assert decode_triple(labels, tokens) == (
            "Ada Lovelace",
            "is chairman of",
            "Acme Corp",
        )

    def test_loc_time_folds_into_arg2(self):
        tokens = toks("Ada Lovelace founded Acme Corp in Paris .")
        labels = [1, 1, 2, 3, 3, 4, 4, 0, 0, 0, 0]
        assert decode_triple(labels, tokens) == (
            "Ada Lovelace",
            "founded",
            "Acme Corp in Paris",
        )

    def test_depth_stop_and_dedup(self):
        tokens = toks("a b c")
        matrix = [
            [1, 2, 3, 0, 0, 0],
            [1, 2, 3, 0, 0, 0],  # duplicate → dropped
            [0, 0, 0, 0, 0, 0],  # stop
            [1, 2, 0, 0, 0, 0],  # unreachable
        ]
        exts = decode_extractions(matrix, tokens, [0.9, 0.8, 0.7, 0.6])
        assert exts == [("a", "b", "c", 0.9)]

    def test_empty_arg1_or_rel_filtered(self):
        tokens = toks("a b c")
        matrix = [[0, 2, 3, 0, 0, 0], [1, 0, 3, 0, 0, 0]]
        assert decode_extractions(matrix, tokens, [0.9, 0.8]) == []


class TestLabelerContracts:
    def test_oie_simple_svo(self):
        tokens = toks("Ada Lovelace founded Acme Corp .")
        rows, confs = oie_label_matrix(tokens)
        assert len(rows) == 1 and len(confs) == 1
        exts = decode_extractions(rows, tokens, confs)
        assert exts[0][:3] == ("Ada Lovelace", "founded", "Acme Corp")

    def test_quote_normalization(self):
        assert normalize_quotes("’ “ ”") == "' '' ''"


class TestRelCases:
    def test_rel_case_from(self):
        tokens = toks("Ada founder from Paris .")
        rows, confs = oie_label_matrix(tokens)
        exts = decode_extractions(rows, tokens, confs)
        assert exts[0][:3] == ("Ada", "is founder from", "Paris")

    def test_rel_case_bare(self):
        tokens = toks("Ada a director .")
        rows, confs = oie_label_matrix(tokens)
        exts = decode_extractions(rows, tokens, confs)
        assert exts[0][:3] == ("Ada", "is director", "")


def test_coordination_seps_collected():
    """Label-4 separators land in Coordination.seps (the reference collects
    them at metric.py:241; its gold files populate them) without affecting
    equality/matching or splitting."""
    from openie_with_entities_spark.functions.decode import (
        decode_coordinations,
        split_by_coordinations,
    )

    # "A , B and C went"  → spans (0,0),(2,2),(4,4), cc=3, sep at 1
    labels = [[2, 4, 1, 3, 1, 0]]
    coords = decode_coordinations(labels)
    assert list(coords) == [3]
    assert coords[3].seps == (1,)
    assert coords[3].spans == ((0, 0), (2, 2), (4, 4))
    words = ["A", ",", "B", "and", "C", "went"]
    texts, _, _ = split_by_coordinations(coords, words)
    assert sorted(texts) == ["A went", "B went", "C went"]


def test_underformed_phrase_survives_none_label():
    """Reference parity (metric.py:217-227): cp clears only on SUCCESSFUL
    registration, so a phrase with one conjunct survives an intervening
    NONE and keeps accumulating — [2,1,0,1,3,1,0] registers one
    coordination at cc=4 spanning the gap."""
    from openie_with_entities_spark.functions.decode import (
        decode_coordinations,
    )

    coords = decode_coordinations([[2, 1, 0, 1, 3, 1, 0]])
    assert set(coords) == {4}
    c = coords[4]
    assert c.spans == ((0, 1), (3, 3), (5, 5))

    # a fresh CP_START still replaces an under-formed phrase
    coords2 = decode_coordinations([[2, 1, 0, 2, 1, 3, 1, 0]])
    assert set(coords2) == {5}
    assert coords2[5].spans == ((3, 4), (6, 6))
