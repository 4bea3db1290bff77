"""Noam schedule, plateau controller, optimistic restore + vocab remap."""
import numpy as np
import pytest

from subgc_tpu.train.checkpoint import optimistic_restore
from subgc_tpu.train.optim import ReduceLROnPlateau, noam_schedule


def test_noam_schedule():
    s = noam_schedule(model_size=512, factor=1.0, warmup=4000)
    # rises during warmup, peaks at warmup, then decays ~ step^-0.5
    assert float(s(100)) < float(s(1000)) < float(s(4000))
    assert float(s(16000)) == pytest.approx(float(s(4000)) / 2.0, rel=1e-5)


def test_plateau_controller():
    c = ReduceLROnPlateau(factor=0.5, patience=2)
    for v in [1.0, 0.9, 0.8]:
        assert c.step(v) == 1.0
    # stall 3 epochs (patience 2) -> halve
    assert c.step(0.8) == 1.0
    assert c.step(0.8) == 1.0
    assert c.step(0.8) == 0.5
    # improvement resets
    assert c.step(0.4) == 0.5


def test_optimistic_restore_vocab_remap():
    cur = {"decoder": {"embed": np.zeros((6, 4)),
                       "logit": {"w": np.zeros((3, 6)),
                                 "b": np.zeros(6)},
                       "other": {"w": np.ones((2, 2))}}}
    old = {"decoder": {"embed": np.arange(8 * 4).reshape(8, 4).astype(float),
                       "logit": {"w": np.arange(3 * 8).reshape(3, 8).astype(float),
                                 "b": np.arange(8).astype(float)},
                       "other": {"w": np.full((2, 2), 7.0)}}}
    # new vocab index -> old index (or -1)
    wm = np.array([0, 2, -1, 5, 1, -1])
    out = optimistic_restore(cur, old, word_mapping=wm, verbose=False)
    np.testing.assert_array_equal(out["decoder"]["other"]["w"],
                                  np.full((2, 2), 7.0))
    np.testing.assert_array_equal(out["decoder"]["embed"][0],
                                  old["decoder"]["embed"][0])
    np.testing.assert_array_equal(out["decoder"]["embed"][3],
                                  old["decoder"]["embed"][5])
    np.testing.assert_array_equal(out["decoder"]["embed"][2], np.zeros(4))
    np.testing.assert_array_equal(out["decoder"]["logit"]["w"][:, 1],
                                  old["decoder"]["logit"]["w"][:, 2])
    np.testing.assert_array_equal(out["decoder"]["logit"]["b"][4],
                                  old["decoder"]["logit"]["b"][1])


def test_optimistic_restore_missing_keys():
    cur = {"a": {"w": np.zeros(3)}, "b": {"w": np.ones(2)}}
    old = {"a": {"w": np.full(3, 5.0)}}
    out = optimistic_restore(cur, old, verbose=False)
    np.testing.assert_array_equal(out["a"]["w"], np.full(3, 5.0))
    np.testing.assert_array_equal(out["b"]["w"], np.ones(2))
