"""SPICE replacement: semantic-proposition F1 without CoreNLP.

The reference's SPICE shells out to Java jars with a Stanford dependency
parser (`misc/coco-caption/pycocoevalcap/spice/spice.py:18,72`); those jars
are external downloads.  This is a from-scratch, dependency-free semantic
tuple scorer over the same definition SPICE uses: parse each caption into a
set of propositions — objects, (object, attribute) pairs, (subject,
relation, object) triples — and F1 the candidate set against the union of
the reference sets.

The parser is a rule-based chunker tuned to caption English ("a man riding a
horse on the beach"): determiners drop, prepositions/gerunds/copulas pivot
relations, pre-nominal non-relation words attach as attributes.  DIVERGENCE
from SPICE-the-jar: no dependency parse and no WordNet synset matching —
scores correlate with SPICE but are not identical (documented; the reference
as shipped cannot run SPICE either without external downloads).
"""
from __future__ import annotations

from typing import Dict, List, Set, Tuple

import numpy as np

DETERMINERS = set("a an the this that these those his her its their some any "
                  "every each no one two three four five several many".split())
COPULAS = set("is are was were be been being".split())
PREPOSITIONS = set("in on at by with of to from near under over behind above "
                   "beside between through across against along around into "
                   "onto up down inside outside next".split())
CONJ = set("and or while".split())


def _is_relation_word(w: str) -> bool:
    return w in PREPOSITIONS or w.endswith("ing")


def parse_tuples(caption: str) -> Set[Tuple[str, ...]]:
    """Caption -> set of semantic tuples."""
    words = [w for w in caption.split() if w and w not in DETERMINERS]
    # segment into noun-phrase chunks separated by relation words
    tuples: Set[Tuple[str, ...]] = set()
    chunks: List[List[str]] = [[]]
    pivots: List[str] = []
    for w in words:
        if w in COPULAS or w in CONJ:
            continue
        if _is_relation_word(w) and chunks[-1]:
            pivots.append(w)
            chunks.append([])
        else:
            chunks[-1].append(w)

    heads = []
    for chunk in chunks:
        if not chunk:
            heads.append(None)
            continue
        head = chunk[-1]
        heads.append(head)
        tuples.add((head,))
        for attr in chunk[:-1]:
            tuples.add((head, attr))

    for i, rel in enumerate(pivots):
        if i < len(heads) - 1 and heads[i] and heads[i + 1]:
            tuples.add((heads[i], rel, heads[i + 1]))
        elif heads[i]:          # dangling relation acts as attribute-ish
            tuples.add((heads[i], rel))
    return tuples


def spice_sentence(candidate: str, refs: List[str]) -> dict:
    cand = parse_tuples(candidate)
    ref: Set[Tuple[str, ...]] = set()
    for r in refs:
        ref |= parse_tuples(r)
    tp = len(cand & ref)
    p = tp / len(cand) if cand else 0.0
    r = tp / len(ref) if ref else 0.0
    f = 2 * p * r / (p + r) if (p + r) > 0 else 0.0
    return {"All": {"f": f, "pr": p, "re": r, "tp": tp,
                    "fp": len(cand) - tp, "fn": len(ref) - tp}}


def compute_spice(gts: Dict, res: Dict):
    """(mean F, per-image F array, per-image detail dicts) — the triple
    COCOEvalCap expects from Spice.compute_score (eval.py:86-90)."""
    assert list(gts.keys()) == list(res.keys())
    details = [spice_sentence(res[k][0], gts[k]) for k in gts]
    fs = np.asarray([d["All"]["f"] for d in details])
    return float(np.mean(fs)), fs, details
