"""Loss-criterion and text-decode parity vs the reference's misc/utils.py."""
import os
import sys

import numpy as np
import pytest
import jax.numpy as jnp

from subgc_tpu.train.loss import (label_smoothing_loss, language_model_loss,
                                  reward_loss)
from subgc_tpu.utils.text import decode_sequence

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_utils():
    if not os.path.isdir(REF):
        pytest.skip("reference tree unavailable")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import misc.utils as u
    return u


def test_language_model_criterion_parity(ref_utils):
    import torch
    rng = np.random.RandomState(0)
    S, T, V = 6, 10, 20
    logits = rng.randn(S, T, V).astype("f")
    lp = np.log(np.exp(logits) / np.exp(logits).sum(-1, keepdims=True))
    tgt = rng.randint(0, V, (S, T + 2))
    mask = (rng.rand(S, T + 2) > 0.3).astype("f")
    want = ref_utils.LanguageModelCriterion()(
        torch.from_numpy(lp), torch.from_numpy(tgt), torch.from_numpy(mask))
    got = language_model_loss(jnp.asarray(lp), jnp.asarray(tgt),
                              jnp.asarray(mask))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)


def test_reward_criterion_parity(ref_utils):
    import torch
    rng = np.random.RandomState(1)
    S, T = 5, 12
    lp = -np.abs(rng.randn(S, T)).astype("f")
    seq = rng.randint(0, 9, (S, T))
    seq[:, -3:] = 0
    reward = rng.randn(S, T).astype("f")
    want = ref_utils.RewardCriterion()(
        torch.from_numpy(lp), torch.from_numpy(seq),
        torch.from_numpy(reward))
    got = reward_loss(jnp.asarray(lp), jnp.asarray(seq), jnp.asarray(reward))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)

    # gpn-augmented variant (utils.py:103-108)
    gpn = np.abs(rng.randn(S)).astype("f")
    want2 = ref_utils.RewardCriterion()(
        torch.from_numpy(lp), torch.from_numpy(seq),
        torch.from_numpy(reward), gpn_loss=torch.from_numpy(gpn))
    got2 = reward_loss(jnp.asarray(lp), jnp.asarray(seq),
                       jnp.asarray(reward), gpn_loss=jnp.asarray(gpn))
    np.testing.assert_allclose(float(got2), float(want2), rtol=1e-6)


def test_label_smoothing_parity(ref_utils):
    import torch
    rng = np.random.RandomState(2)
    S, T, V = 4, 8, 15
    logits = rng.randn(S, T, V).astype("f")
    lp = np.log(np.exp(logits) / np.exp(logits).sum(-1, keepdims=True))
    tgt = rng.randint(0, V, (S, T + 2))
    mask = (rng.rand(S, T + 2) > 0.2).astype("f")
    crit = ref_utils.LabelSmoothing(smoothing=0.1)
    want = crit(torch.from_numpy(lp), torch.from_numpy(tgt),
                torch.from_numpy(mask))
    got = label_smoothing_loss(jnp.asarray(lp), jnp.asarray(tgt),
                               jnp.asarray(mask), smoothing=0.1)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_decode_sequence_parity(ref_utils, monkeypatch):
    import torch
    vocab = {str(i): w for i, w in
             enumerate(["man", "dog", "park", "the", "in", "walks"], start=1)}
    seq = np.array([[1, 6, 4, 3, 2, 0, 5],     # stops at 0
                    [1, 6, 4, 3, 0, 0, 0],     # ends with 'the' (bad ending)
                    [0, 1, 2, 0, 0, 0, 0]])    # empty
    for flag in ["0", "1"]:
        monkeypatch.setenv("REMOVE_BAD_ENDINGS", flag)
        want = ref_utils.decode_sequence(vocab, torch.from_numpy(seq))
        got = decode_sequence(vocab, seq)
        assert got == want, (flag, got, want)
