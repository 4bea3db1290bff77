"""Optimizer-update parity and pairwise-CIDEr parity vs reference code."""
import os
import sys

import numpy as np
import pytest
import jax.numpy as jnp

REF = "/root/reference"
CR_PATH = os.path.join(REF, "misc/consensus_reranking/external/coco-caption")


def test_adam_update_matches_torch():
    """optax.adam == torch.optim.Adam for one step on identical grads
    (the train step's optimizer, misc/utils.py:234-235 settings)."""
    import optax
    import torch

    rng = np.random.RandomState(0)
    p0 = rng.randn(7, 5).astype("f")
    g = rng.randn(7, 5).astype("f")
    lr, b1, b2, eps = 5e-4, 0.9, 0.999, 1e-8

    tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    topt = torch.optim.Adam([tp], lr=lr, betas=(b1, b2), eps=eps)
    for _ in range(3):
        topt.zero_grad()
        tp.grad = torch.from_numpy(g.copy())
        topt.step()

    opt = optax.adam(lr, b1=b1, b2=b2, eps=eps)
    params = jnp.asarray(p0)
    state = opt.init(params)
    for _ in range(3):
        upd, state = opt.update(jnp.asarray(g), state, params)
        params = optax.apply_updates(params, upd)

    np.testing.assert_allclose(np.asarray(params), tp.detach().numpy(),
                               rtol=1e-5, atol=1e-7)


@pytest.fixture(scope="module")
def ref_pair_cider():
    if not os.path.isdir(CR_PATH):
        pytest.skip("reference external coco-caption unavailable")
    # don't let the other vendored pycocoevalcap tree shadow this one
    for mod in list(sys.modules):
        if mod.startswith("pycocoevalcap"):
            del sys.modules[mod]
    sys.path.insert(0, CR_PATH)
    from pycocoevalcap.cider.cider_scorer_compute_sentence import CiderScorer
    return CiderScorer


def test_pairwise_cider_matches_reference(ref_pair_cider):
    """PairwiseCider == the reference's compute_cider_sen_pair under the
    same document-frequency corpus (consensus reranking's scorer)."""
    from subgc_tpu.eval.cider import PairwiseCider

    rng = np.random.RandomState(3)
    vocab = "man woman dog cat ball park street red blue a the on in".split()
    docs = [[" ".join(rng.choice(vocab, rng.randint(4, 9)))
             for _ in range(3)] for _ in range(15)]

    scorer = ref_pair_cider()
    for doc in docs:
        scorer += (doc[0], doc)
    scorer.compute_doc_freq()

    pc = PairwiseCider(docs)
    for _ in range(10):
        hyp = " ".join(rng.choice(vocab, rng.randint(4, 9)))
        ref = " ".join(rng.choice(vocab, rng.randint(4, 9)))
        want = scorer.compute_cider_sen_pair(hyp, ref)
        got = pc.score(hyp, ref)
        np.testing.assert_allclose(got, want, rtol=1e-10)
