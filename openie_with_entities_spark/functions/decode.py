"""Pure decode semantics shared by the Spark UDF stages and the sequential
oracle: coordination decoding, coordination-driven sentence splitting, and
label-sequence → triple decoding.

These functions re-express (from scratch, in our own structure) the exact
observable behavior of the reference:

  * ``decode_coordinations``   ≙ get_coords, /root/reference/metric.py:204-248
  * ``split_by_coordinations`` ≙ coords_to_sentences + get_tree + is_parent +
                                 get_sentences + remove_unbreakable_conjuncts,
                                 /root/reference/data.py:624-807
  * ``decode_triple``          ≙ process_extraction, /root/reference/model.py:554-593
  * ``extraction_key``         ≙ contains_extraction equality,
                                 /root/reference/model.py:595-599

They are deliberately plain Python over one sentence's tokens/labels: each
runs inside a pandas batch in ``mapInPandas`` where per-sentence span logic
is cheap relative to the (batched) model call, exactly as in the reference.

Conventions: a label matrix is ``list[list[int]]`` (depths × tokens).
Conjunction labels: {NONE:0, CP:1, CP_START:2, CC:3, SEP:4, OTHERS:5}
(/root/reference/data.py:410-412). OIE labels: {NONE:0, ARG1:1, REL:2,
ARG2:3, LOC_TIME:4, TYPE:5} (/root/reference/data.py:407-409).
"""

from __future__ import annotations

from dataclasses import dataclass

SENTINELS = ["[unused1]", "[unused2]", "[unused3]"]
SENTINEL_SUFFIX = " [unused1] [unused2] [unused3]"

# Words that forbid splitting a coordination appearing after them
# (semantics of /root/reference/data.py:786-807).
UNBREAKABLE_WORDS = frozenset(
    [
        "between", "among", "sum", "total", "addition", "amount", "value",
        "aggregate", "gross", "mean", "median", "average", "center",
        "equidistant", "middle",
    ]
)

# Coordinators whose coordinations are never split (/root/reference/data.py:630).
NO_SPLIT_CCS = ("nor", "&")


@dataclass(frozen=True)
class Coordination:
    """A coordination: cc token index + conjunct spans (inclusive) +
    separator token indices (label 4, typically commas between conjuncts).

    Parity note: the reference's Coordination carries ``seps``
    (/root/reference/metric.py:71-95) and its gold label files populate
    them, but ``get_coords`` collects label-4 indices only to DROP them at
    construction (/root/reference/metric.py:221,235-241 — ``seps`` never
    passed). We keep what the decoder collected, which matches the class's
    intended gold-file semantics; equality/matching ignores seps in both
    engines (reference __eq__, metric.py:114-120), so eval results are
    unaffected."""

    cc: int
    spans: tuple[tuple[int, int], ...]
    depth: int = 0
    seps: tuple[int, ...] = ()

    def __post_init__(self):
        object.__setattr__(self, "spans", tuple(sorted(self.spans)))
        object.__setattr__(self, "seps", tuple(self.seps))


def normalize_quotes(s: str) -> str:
    """Curly→ASCII quote normalization (/root/reference/data.py:429-432)."""
    return s.replace("’", "'").replace("”", "''").replace("“", "''")


# --------------------------------------------------------------------------
# Coordination decoding (label matrix → {cc_index: Coordination|None})
# --------------------------------------------------------------------------


def decode_coordinations(label_matrix: list[list[int]]) -> dict[int, Coordination | None]:
    """State machine over per-depth conjunction labels.

    A coordination closes (and registers, keyed by its cc index) when a
    NONE/CP_START label arrives while ≥2 conjunct spans are collected and the
    cc sits strictly between the first span's end and the last span's start.
    An UNDER-FORMED phrase (too few conjuncts, or no valid cc yet) survives
    a NONE label and keeps accumulating — the reference clears ``cp`` only
    inside the successful-registration branch (metric.py:217-227), so
    labels like [2,1,0,1,3,1,0] still register one coordination spanning
    the gap; a fresh CP_START always replaces it. A CC label with no open
    phrase registers a dangling ``None`` marker. Later depths may overwrite
    the same cc key. Insertion order is significant downstream (it drives
    split ordering) and follows close-time order per depth.
    """
    coords: dict[int, Coordination | None] = {}
    for depth, labels in enumerate(label_matrix):
        phrase: dict | None = None
        open_span = False
        span_start = -1
        for i, lab in enumerate(labels):
            if lab != 1 and open_span and phrase is not None:
                open_span = False
                phrase["spans"].append((span_start, i - 1))
            if lab in (0, 2) and phrase is not None:
                spans = phrase["spans"]
                if len(spans) >= 2 and spans[0][1] < phrase["cc"] < spans[-1][0]:
                    coords[phrase["cc"]] = Coordination(
                        phrase["cc"], tuple(spans), depth, tuple(phrase["seps"])
                    )
                    phrase = None
            if lab == 1:
                if not open_span:
                    open_span, span_start = True, i
            elif lab == 2:
                phrase = {"cc": -1, "spans": [], "seps": []}
                open_span, span_start = True, i
            elif lab == 3:
                if phrase is not None:
                    phrase["cc"] = i
                else:
                    coords[i] = None
            elif lab == 4 and phrase is not None:
                # separator (comma between conjuncts) — collected exactly as
                # the reference's cp['seps'] (/root/reference/metric.py:241)
                phrase["seps"].append(i)
            # lab 5 (others) carries no span state we need.
    return coords


# --------------------------------------------------------------------------
# Coordination-driven sentence splitting
# --------------------------------------------------------------------------


def _contains(parent: Coordination, child: Coordination) -> bool:
    lo, hi = child.spans[0][0], child.spans[-1][-1]
    return any(s <= lo and e >= hi for (s, e) in parent.spans)


def _containment_tree(coords: dict[int, Coordination]):
    """roots + direct-children mapping of the span-containment forest.

    Children lists are first computed transitively, then pruned so each
    node keeps only its *closest* ancestor: lists are processed smallest
    first and their members removed from every larger list.
    """
    keys = list(coords)
    kid_lists: dict[int, list[int]] = {
        cc: [k for k in keys if _contains(coords[cc], coords[k])] for cc in keys
    }
    ordered = sorted(kid_lists.values(), key=len)  # stable; shares list objects
    for i, kids in enumerate(ordered):
        for child in kids:
            for later in ordered[i + 1 :]:
                if child in later:
                    later.remove(child)
    parent: dict[int, int] = {}
    for cc in keys:
        for child in kid_lists[cc]:
            parent[child] = cc
    roots = [cc for cc in keys if cc not in parent]
    return roots, kid_lists


def _drop_unbreakable(coords: dict[int, Coordination], words: list[str]) -> None:
    """Remove coordinations preceded (within the inter-coordination window)
    by an 'unbreakable' word like *between*/*sum* — splitting them would
    change meaning."""
    if not coords:  # hot path: don't scan/lower every word for nothing
        return
    marks = [i for i, w in enumerate(words) if w.lower() in UNBREAKABLE_WORDS]
    doomed = set()
    window_start = 0
    for cc, coord in coords.items():
        window_end = coord.spans[0][0] - 1
        if any(window_start <= m <= window_end for m in marks):
            doomed.add(cc)
        window_start = coord.spans[-1][-1] + 1
    for cc in doomed:
        coords.pop(cc)


def _apply_level(
    sentences: list[list[int]],
    level: list[int],
    coords: dict[int, Coordination],
    n_words: int,
) -> None:
    """Rewrite the working sentence set with one BFS level of coordinations:
    each affected sentence is replaced by one copy per conjunct, keeping
    token indices inside that conjunct or outside the coordination's span."""
    for cc in level:
        spans = coords[cc].spans
        lo, hi = spans[0][0], spans[-1][-1]
        if not sentences:
            fresh = [list(range(s, e + 1)) for (s, e) in spans]
            for sent in fresh:
                sent.extend(i for i in range(n_words) if i < lo or i > hi)
            sentences.extend(fresh)
        else:
            to_add: list[list[int]] = []
            to_remove: list[list[int]] = []
            for sent in sentences:
                if spans[0][0] in sent:
                    sent.sort()
                    for (s, e) in spans:
                        to_add.append(
                            [i for i in sent if s <= i <= e or i < lo or i > hi]
                        )
                    to_remove.append(sent)
            for sent in to_remove:
                sentences.remove(sent)
            sentences.extend(to_add)


def split_by_coordinations(
    coords: dict[int, Coordination | None], words: list[str]
) -> tuple[list[str], list[str], list[list[int]]]:
    """Split a sentence into simple sentences along its coordinations.

    Returns (split_sentence_texts, conjunct_words, index_lists). Empty
    results mean "no split" — callers treat the original sentence as its
    own (single) split.
    """
    if not coords:  # the overwhelmingly common no-coordination sentence
        return [], [], []
    live = {k: v for k, v in coords.items() if v is not None}
    live = {k: v for k, v in live.items() if words[v.cc] not in NO_SPLIT_CCS}
    _drop_unbreakable(live, words)

    conj_words = [
        " ".join(words[s : e + 1]) for v in live.values() for (s, e) in v.spans
    ]
    if not live:
        return [], conj_words, []

    roots, kids = _containment_tree(live)
    sentences: list[list[int]] = []
    level = list(roots)
    while level:
        _apply_level(sentences, level, live, len(words))
        level = [child for cc in level for child in kids[cc]]

    texts = [" ".join(words[i] for i in sorted(sent)) for sent in sentences]
    return texts, conj_words, sentences


# --------------------------------------------------------------------------
# OIE label sequence → triple
# --------------------------------------------------------------------------


def decode_triple(
    labels: list[int], tokens: list[str], fold_loc_time: bool = True
) -> tuple[str, str, str]:
    """One extraction depth's labels → (arg1, rel, arg2).

    Sentinel tokens ([unusedK]) never contribute text; a REL label on one
    selects the copular rel case: 1 → 'is X', 2 → 'is X of', 3 → 'is X from'.
    LOC/TIME tokens are folded into arg2 (the reference's default, i.e.
    --no_lt unset).
    """
    arg1: list[str] = []
    rel: list[str] = []
    arg2: list[str] = []
    loc_time: list[str] = []
    rel_case = 0
    for tok, lab in zip(tokens, labels):
        if lab == 0:
            # a NONE label contributes nothing whether or not the token is
            # a sentinel — skip before the substring scan (hot path)
            continue
        if "[unused" in tok:
            if lab == 2:
                rel_case = int(tok[len("[unused") : -1])
            continue
        if lab == 1:
            arg1.append(tok)
        elif lab == 2:
            rel.append(tok)
        elif lab == 3:
            arg2.append(tok)
        elif lab == 4:
            loc_time.append(tok)
    rel_s = " ".join(rel).strip()
    if rel_case == 1:
        rel_s = "is " + rel_s
    elif rel_case == 2:
        rel_s = "is " + rel_s + " of"
    elif rel_case == 3:
        rel_s = "is " + rel_s + " from"
    arg1_s = " ".join(arg1).strip()
    arg2_s = " ".join(arg2).strip()
    if fold_loc_time:
        arg2_s = (arg2_s + " " + " ".join(loc_time).strip()).strip()
    return arg1_s, rel_s, arg2_s


def decode_extractions(
    label_matrix: list[list[int]],
    tokens: list[str],
    confidences: list[float],
) -> list[tuple[str, str, str, float]]:
    """All depths of one sentence → deduped (arg1, rel, arg2, confidence).

    Mirrors the reference's write loop: stop at the first all-zero depth,
    keep only extractions with non-empty arg1 and rel, dedup on the
    arg1+arg2+rel string key at insert time (first depth wins).
    """
    out: list[tuple[str, str, str, float]] = []
    seen: set[str] = set()
    for depth, labels in enumerate(label_matrix):
        if sum(labels) == 0:
            break
        arg1, rel, arg2 = decode_triple(labels, tokens)
        if arg1 == "" or rel == "":
            continue
        key = extraction_key(arg1, arg2, rel)
        if key not in seen:
            seen.add(key)
            out.append((arg1, rel, arg2, confidences[depth]))
    return out


def extraction_key(arg1: str, arg2: str, rel: str) -> str:
    """Equality key for extraction dedup: args joined then pred."""
    return f"{arg1} {arg2} {rel}"
