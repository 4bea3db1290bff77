"""METEOR/SPICE fidelity quantification (VERDICT r1 item 2).

Three layers:
1. analytic pin — tiny cases whose METEOR scores are hand-derived from the
   algorithm spec (alignment -> P/R -> Fmean -> fragmentation penalty), and
   SPICE cases whose tuple sets are unambiguous;
2. drift pin — every score on the 250-pair corpus must equal the value in
   tests/data/metric_validation.json exactly (regenerate deliberately via
   tools/gen_metric_validation.py after intentional changes);
3. oracle bound — correlation/error vs nltk's independent meteor_score
   implementation (exact+stem, WordNet stubbed: its data is an external
   download, like the reference's jar data,
   misc/coco-caption/pycocoevalcap/meteor/meteor.py:15,23-25) must stay
   within the measured bounds.
"""
import json
import os

import numpy as np
import pytest

from subgc_tpu.eval.meteor import meteor_sentence
from subgc_tpu.eval.spice import parse_tuples, spice_sentence

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data",
                    "metric_validation.json")


@pytest.fixture(scope="module")
def corpus():
    with open(DATA) as f:
        return json.load(f)


# ---------------------------------------------------------------- analytic

def test_meteor_hand_derived():
    # perfect match, 3 words: P=R=1, Fmean=1, chunks=1, matches=3
    # penalty = 0.5*(1/3)^3 = 1/54 -> score = 53/54
    assert meteor_sentence("the cat sat", ["the cat sat"]) == \
        pytest.approx(53 / 54, abs=1e-12)
    # fully scrambled 3 words: 3 matches in 3 chunks -> max penalty 0.5
    assert meteor_sentence("cat the sat", ["the cat sat"]) == \
        pytest.approx(0.5, abs=1e-12)
    # single stem-stage match (weight 0.6): P=R=0.6, Fmean=0.6,
    # frag=1/1 -> penalty 0.5 -> 0.3
    assert meteor_sentence("cats", ["cat"]) == pytest.approx(0.3, abs=1e-12)
    # matched (Banerjee/Lavie) config: same case with weight 1.0 -> 0.5
    assert meteor_sentence("cats", ["cat"], stage_weights=[1.0, 1.0]) == \
        pytest.approx(0.5, abs=1e-12)
    # synonym stage (weight 0.8): "large"~"big"; m = 1+1+0.8 = 2.8 over 3
    # words both sides -> Fmean = 2.8/3, chunks=1 of 3 -> penalty 1/54
    assert meteor_sentence("a large dog", ["a big dog"]) == \
        pytest.approx((2.8 / 3) * (53 / 54), abs=1e-12)
    # no match at all
    assert meteor_sentence("blue bird", ["red fish"]) == 0.0


def test_spice_hand_derived():
    assert parse_tuples("a red car on the road") == {
        ("car",), ("car", "red"), ("road",), ("car", "on", "road")}
    # identical tuple sets -> F=1
    assert spice_sentence("a red car on the road",
                          ["the red car is on a road"])["All"]["f"] == \
        pytest.approx(1.0)
    # cand {(car,), (car,blue)} vs ref 4 tuples: tp=1, P=1/2, R=1/4 -> F=1/3
    assert spice_sentence("a blue car",
                          ["a red car on the road"])["All"]["f"] == \
        pytest.approx(1 / 3, abs=1e-12)
    # copula predicates attributes onto the subject head (SPICE semantics)
    assert parse_tuples("the car is red") == {("car",), ("car", "red")}
    # lemma normalization: plural/inflected surface forms share tuples
    assert spice_sentence("two cars on the road",
                          ["a car on a road"])["All"]["f"] == \
        pytest.approx(1.0)
    assert parse_tuples("a man is wearing a hat") == {
        ("man",), ("hat",), ("man", "wear", "hat")}
    # expletive subjects carry no scene content
    assert parse_tuples("there is a dog on the grass") == {
        ("dog",), ("grass",), ("dog", "on", "grass")}
    # conjoined copula clauses keep separate subjects
    assert parse_tuples("the car is red and the bus is blue") == {
        ("car",), ("car", "red"), ("bus",), ("bus", "blue")}
    # -ing nouns are objects, not relations; relation phrases merge
    assert parse_tuples("a man looking at a painting") == {
        ("man",), ("painting",), ("man", "look at", "painting")}


# ------------------------------------------------------------------- drift

def test_meteor_drift_pin(corpus):
    for pair, pinned in zip(corpus["corpus"], corpus["meteor_ours"]):
        assert meteor_sentence(pair["hyp"], pair["refs"]) == \
            pytest.approx(pinned, abs=1e-9), pair


def test_meteor_matched_drift_pin(corpus):
    for pair, pinned in zip(corpus["corpus"], corpus["meteor_matched"]):
        assert meteor_sentence(pair["hyp"], pair["refs"],
                               stage_weights=[1.0, 1.0]) == \
            pytest.approx(pinned, abs=1e-9), pair


def test_spice_drift_pin(corpus):
    for pair, pinned in zip(corpus["corpus"], corpus["spice_ours"]):
        assert spice_sentence(pair["hyp"], pair["refs"])["All"]["f"] == \
            pytest.approx(pinned, abs=1e-9), pair


# ------------------------------------------------------------ oracle bound

def test_meteor_oracle_bounds(corpus):
    nltk_meteor = pytest.importorskip("nltk.translate.meteor_score")

    class _NoWordnet:
        def synsets(self, word):
            return []

    wn = _NoWordnet()
    oracle = np.array([
        nltk_meteor.meteor_score([r.split() for r in pair["refs"]],
                                 pair["hyp"].split(), wordnet=wn)
        for pair in corpus["corpus"]])
    # the oracle itself must not drift (nltk version change would show here)
    np.testing.assert_allclose(oracle, corpus["meteor_nltk_oracle"],
                               atol=1e-9)

    matched = np.asarray(corpus["meteor_matched"])
    d = np.abs(matched - oracle)
    # measured at generation (beam alignment): r=0.9932, mean|d|=0.0060,
    # 225/250 exact, and ours >= nltk on ALL 250 — every disagreement is
    # nltk's first-occurrence greedy finding more chunks than our
    # (max-matches, min-chunks) beam, i.e. ours is jar-closer
    assert np.corrcoef(matched, oracle)[0, 1] >= 0.99
    assert d.mean() <= 0.008
    assert (d < 1e-9).sum() >= 215
    assert (matched >= oracle - 1e-9).all()

    shipped = np.asarray(corpus["meteor_ours"])
    # shipped config adds METEOR-1.5 stage weights + the synonym stage;
    # measured r=0.9655, mean|d|=0.0290
    assert np.corrcoef(shipped, oracle)[0, 1] >= 0.95
    assert np.abs(shipped - oracle).mean() <= 0.035
