"""Scorer parity vs the reference's vendored (pure-Python) coco-caption
scorers, plus sanity properties for the reimplemented Java-jar metrics."""
import os
import sys

import numpy as np
import pytest

from subgc_tpu.eval.bleu import compute_bleu
from subgc_tpu.eval.cider import PairwiseCider, compute_cider
from subgc_tpu.eval.meteor import meteor_sentence
from subgc_tpu.eval.rouge import compute_rouge
from subgc_tpu.eval.spice import parse_tuples, spice_sentence
from subgc_tpu.eval.stemmer import porter_stem
from subgc_tpu.eval.tokenizer import ptb_tokenize_sentence, tokenize

VENDOR = "/root/reference/misc/coco-caption"


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.RandomState(0)
    vocab = ("man woman dog cat ball park street red blue small walking "
             "sitting riding a the on in with near is").split()
    gts, res = {}, {}
    for i in range(25):
        gts[i] = [" ".join(rng.choice(vocab, rng.randint(5, 12)))
                  for _ in range(5)]
        # hypothesis: perturbed copy of a reference (realistic overlap)
        base = gts[i][rng.randint(5)].split()
        for _ in range(rng.randint(0, 4)):
            base[rng.randint(len(base))] = str(rng.choice(vocab))
        res[i] = [" ".join(base)]
    return gts, res


@pytest.fixture(scope="module")
def vendored():
    if not os.path.isdir(VENDOR):
        pytest.skip("vendored coco-caption not available")
    # two vendored pycocoevalcap trees exist (this one + the consensus-
    # reranking external copy); make sure THIS one resolves
    for mod in list(sys.modules):
        if mod.startswith("pycocoevalcap"):
            del sys.modules[mod]
    sys.path.insert(0, VENDOR)
    from pycocoevalcap.bleu.bleu import Bleu
    from pycocoevalcap.cider.cider import Cider
    from pycocoevalcap.rouge.rouge import Rouge
    return Bleu, Cider, Rouge


def test_bleu_matches_vendored(corpus, vendored):
    gts, res = corpus
    Bleu, _, _ = vendored
    ref_score, ref_scores, ref_material = Bleu(4).compute_score(gts, res)
    my_score, my_scores, my_material = compute_bleu(gts, res)
    np.testing.assert_allclose(my_score, ref_score, rtol=1e-12)
    np.testing.assert_allclose(my_scores, ref_scores, rtol=1e-12)
    for key in ["testlen", "reflen"]:
        np.testing.assert_allclose(my_material[key], ref_material[key])
    for key in ["guess", "correct"]:
        np.testing.assert_allclose(my_material[key], ref_material[key])


def test_cider_matches_vendored(corpus, vendored):
    gts, res = corpus
    _, Cider, _ = vendored
    ref_mean, ref_scores = Cider().compute_score(gts, res)
    my_mean, my_scores = compute_cider(gts, res)
    np.testing.assert_allclose(my_mean, ref_mean, rtol=1e-10)
    np.testing.assert_allclose(my_scores, ref_scores, rtol=1e-10)


def test_rouge_matches_vendored(corpus, vendored):
    gts, res = corpus
    _, _, Rouge = vendored
    ref_mean, ref_scores = Rouge().compute_score(gts, res)
    my_mean, my_scores = compute_rouge(gts, res)
    np.testing.assert_allclose(my_mean, ref_mean, rtol=1e-12)
    np.testing.assert_allclose(my_scores, ref_scores, rtol=1e-12)


def test_pairwise_cider_consistency():
    train = [["a man riding a horse", "a man on a horse"],
             ["a dog in the park", "a small dog running"]]
    pc = PairwiseCider(train)
    same = pc.score("a man riding a horse", "a man riding a horse")
    diff = pc.score("a man riding a horse", "a small dog running")
    assert same > diff >= 0.0


def test_tokenizer_basic():
    assert ptb_tokenize_sentence("A man, riding; a horse.") == \
        ["a", "man", ",", "riding", ";", "a", "horse", "."]
    # bracket tokens survive lowercased: the jar's -lowerCase output never
    # matches the wrapper's case-sensitive "-LRB-" strip (ptbtokenizer.py:24,69)
    out = tokenize({1: [{"caption": "A man, riding (fast) a horse."}]})
    assert out[1] == ["a man riding -lrb- fast -rrb- a horse"]
    out = tokenize({1: [{"caption": "It's a dog's day"}]})
    assert out[1] == ["it 's a dog 's day"]


def test_porter_stem():
    assert porter_stem("running") == "run"
    assert porter_stem("horses") == "hors"
    assert porter_stem("caresses") == "caress"
    assert porter_stem("relational") == "relat"
    assert porter_stem("sky") == "sky"


def test_meteor_properties():
    refs = ["a man riding a horse on the beach"]
    perfect = meteor_sentence("a man riding a horse on the beach", refs)
    partial = meteor_sentence("a man rides a horse", refs)
    bad = meteor_sentence("blue bird flies overhead quickly", refs)
    assert perfect > partial > bad
    assert perfect > 0.9
    assert bad == 0.0
    # stem stage: "rides"/"riding" both stem to "ride"
    assert meteor_sentence("a man rides", ["a man riding"]) > \
        meteor_sentence("a man walks", ["a man riding"])


def test_spice_tuples():
    t = parse_tuples("a young man riding a brown horse on the beach")
    assert ("man",) in t and ("horse",) in t and ("beach",) in t
    assert ("man", "young") in t and ("horse", "brown") in t
    # tuples are lemma-normalized like the jar's (riding -> ride)
    assert ("man", "ride", "horse") in t
    assert ("horse", "on", "beach") in t
    d = spice_sentence("a young man riding a horse",
                       ["a young man riding a horse on the beach"])
    assert 0 < d["All"]["f"] <= 1.0
    assert spice_sentence("a young man riding a horse",
                          ["a young man riding a horse"])["All"]["f"] == 1.0
