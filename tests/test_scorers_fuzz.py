"""Scorer bit-parity fuzz vs the vendored coco-caption implementations.

tests/test_scorers.py pins one seeded corpus; this file sweeps seeds and
the edge cases where scorer reimplementations usually diverge: identical
hypothesis/reference, zero n-gram overlap, one-word sentences, very long
sentences, duplicated references, and brevity-penalty length ties.
"""
import os
import sys

import numpy as np
import pytest

from subgc_tpu.eval.bleu import compute_bleu
from subgc_tpu.eval.cider import compute_cider
from subgc_tpu.eval.rouge import compute_rouge

VENDOR = "/root/reference/misc/coco-caption"

VOCAB = ("man woman dog cat ball park street red blue small walking "
         "sitting riding a the on in with near is tree car sky").split()


@pytest.fixture(scope="module")
def vendored():
    if not os.path.isdir(VENDOR):
        pytest.skip("vendored coco-caption not available")
    for mod in list(sys.modules):
        if mod.startswith("pycocoevalcap"):
            del sys.modules[mod]
    sys.path.insert(0, VENDOR)
    from pycocoevalcap.bleu.bleu import Bleu
    from pycocoevalcap.cider.cider import Cider
    from pycocoevalcap.rouge.rouge import Rouge
    return Bleu, Cider, Rouge


def _rand_corpus(seed):
    rng = np.random.RandomState(seed)
    gts, res = {}, {}
    for i in range(15):
        mode = i % 5
        if mode == 0:       # identical hyp == first ref
            refs = [" ".join(rng.choice(VOCAB, rng.randint(4, 10)))
                    for _ in range(4)]
            hyp = refs[0]
        elif mode == 1:     # zero overlap (disjoint tokens)
            refs = [" ".join(rng.choice(VOCAB[:10], rng.randint(4, 9)))
                    for _ in range(3)]
            hyp = " ".join(rng.choice(VOCAB[12:], rng.randint(4, 9)))
        elif mode == 2:     # one-word sentences
            refs = [str(rng.choice(VOCAB)) for _ in range(5)]
            hyp = str(rng.choice(VOCAB))
        elif mode == 3:     # long sentences + duplicated reference
            long = " ".join(rng.choice(VOCAB, 30))
            refs = [long, long,
                    " ".join(rng.choice(VOCAB, rng.randint(5, 30)))]
            hyp = " ".join(rng.choice(VOCAB, rng.randint(20, 35)))
        else:               # brevity-penalty length tie: |hyp| == |ref|
            n = rng.randint(5, 12)
            refs = [" ".join(rng.choice(VOCAB, n)) for _ in range(3)]
            hyp = " ".join(rng.choice(VOCAB, n))
        gts[i] = refs
        res[i] = [hyp]
    return gts, res


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
def test_scorers_match_vendored_fuzz(vendored, seed):
    Bleu, Cider, Rouge = vendored
    gts, res = _rand_corpus(seed)

    ref_b, ref_bs, _ = Bleu(4).compute_score(gts, res)
    my_b, my_bs, _ = compute_bleu(gts, res)
    np.testing.assert_allclose(my_b, ref_b, rtol=1e-10)
    np.testing.assert_allclose(my_bs, ref_bs, rtol=1e-10)

    ref_c, ref_cs = Cider().compute_score(gts, res)
    my_c, my_cs = compute_cider(gts, res)
    np.testing.assert_allclose(my_c, ref_c, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(my_cs, ref_cs, rtol=1e-10, atol=1e-12)

    ref_r, ref_rs = Rouge().compute_score(gts, res)
    my_r, my_rs = compute_rouge(gts, res)
    np.testing.assert_allclose(my_r, ref_r, rtol=1e-10)
    np.testing.assert_allclose(my_rs, ref_rs, rtol=1e-10)
