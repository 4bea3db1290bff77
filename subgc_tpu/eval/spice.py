"""SPICE replacement: semantic-proposition F1 without CoreNLP.

The reference's SPICE shells out to Java jars with a Stanford dependency
parser (`misc/coco-caption/pycocoevalcap/spice/spice.py:18,72`); those jars
are external downloads.  This is a from-scratch, dependency-free semantic
tuple scorer over the same definition SPICE uses: parse each caption into a
set of propositions — objects, (object, attribute) pairs, (subject,
relation, object) triples — and F1 the candidate set against the union of
the reference sets.

The parser is a rule-based chunker tuned to caption English ("a man riding a
horse on the beach"): determiners drop, prepositions/gerunds pivot
relations, copulas predicate attributes onto the preceding head ("the car
is red" -> (car, red)), pre-nominal non-relation words attach as
attributes, and all tuple words are lemma-normalized (the jar lemmatizes
its scene-graph tuples, so "two cars" matches "a car").  DIVERGENCE from
SPICE-the-jar: no dependency parse and no WordNet synset matching — scores
correlate with SPICE but are not identical (documented; the reference as
shipped cannot run SPICE either without external downloads).
"""
from __future__ import annotations

from typing import Dict, List, Set, Tuple

import numpy as np

from ..utils.lemma import _KEEP_ING, lemmatize

DETERMINERS = set("a an the this that these those his her its their some any "
                  "every each no one two three four five several many".split())
# expletive/pronoun subjects carry no scene content ("there is a dog...")
EXPLETIVES = set("there it they he she we you i".split())
COPULAS = set("is are was were be been being".split())
PREPOSITIONS = set("in on at by with of to from near under over behind above "
                   "beside between through across against along around into "
                   "onto up down inside outside next".split())
CONJ = set("and or while".split())
_BE = "__be__"
_NONE = "__none__"


def _is_relation_word(w: str) -> bool:
    # -ing nouns that are scene objects (building, painting, railing...)
    # must not pivot relations — reuse the lemmatizer's catalog
    return w in PREPOSITIONS or (w.endswith("ing") and w not in _KEEP_ING)


def _rel_lemma(w: str) -> str:
    # relation phrases ("looking at") lemmatize word-wise
    return " ".join(lemmatize(p) if p.endswith("ing") else p
                    for p in w.split())


def parse_tuples(caption: str) -> Set[Tuple[str, ...]]:
    """Caption -> set of lemmatized semantic tuples."""
    words = [w for w in caption.split()
             if w and w not in DETERMINERS and w not in EXPLETIVES]
    # segment into noun-phrase chunks separated by relation/copula pivots
    chunks: List[List[str]] = [[]]
    pivots: List[str] = []
    for w in words:
        if w in CONJ:
            # a conjunction after a predicate starts a NEW clause ("the car
            # is red and the bus is blue"): close the predicate chunk so the
            # next subject is not swallowed as an attribute of the first
            if pivots and pivots[-1] == _BE and chunks[-1]:
                pivots.append(_NONE)
                chunks.append([])
            continue
        if w in COPULAS:
            if chunks[-1]:
                pivots.append(_BE)
                chunks.append([])
            continue
        if _is_relation_word(w):
            if chunks[-1]:
                pivots.append(w)
                chunks.append([])
                continue
            if pivots and pivots[-1] == _BE:
                # "man is wearing hat": the copula introduces a relation,
                # not a predicate chunk — the relation takes the pivot slot
                pivots[-1] = w
                continue
            if pivots and pivots[-1] != _NONE:
                # consecutive relation words form one phrase ("looking at")
                pivots[-1] = pivots[-1] + " " + w
                continue
        chunks[-1].append(w)

    # predicate chunks ("is red") fold into the preceding chunk's head
    n = len(chunks)
    owner = list(range(n))
    is_pred = [False] * n
    for i, piv in enumerate(pivots):
        if piv == _BE and i + 1 < n:
            owner[i + 1] = owner[i]
            is_pred[i + 1] = True

    tuples: Set[Tuple[str, ...]] = set()
    heads: List[str] = []
    for idx, chunk in enumerate(chunks):
        if not chunk or is_pred[idx]:
            heads.append(None)
            continue
        lemmas = [lemmatize(w) for w in chunk]
        head = lemmas[-1]
        heads.append(head)
        tuples.add((head,))
        for attr in lemmas[:-1]:
            tuples.add((head, attr))

    def eff_head(i):
        return heads[owner[i]]

    for idx, chunk in enumerate(chunks):
        if is_pred[idx] and chunk and eff_head(idx):
            for w in chunk:
                tuples.add((eff_head(idx), lemmatize(w)))

    for i, rel in enumerate(pivots):
        if rel == _BE or rel == _NONE:
            continue
        if i < n - 1 and eff_head(i) and eff_head(i + 1):
            tuples.add((eff_head(i), _rel_lemma(rel), eff_head(i + 1)))
        elif eff_head(i):       # dangling relation acts as attribute-ish
            tuples.add((eff_head(i), _rel_lemma(rel)))
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
