"""Parallel-fixpoint NMS == sequential greedy NMS, exactly.

The parallel variant (gpn.py::subgraph_nms parallel=True) computes the
full-NMS keep set as the fixpoint of the suppression recurrence instead of
confirming one keep per iteration; these tests fuzz it against the default
sequential loop on overlap-heavy instances (long suppression chains, score
ties, invalid rows, keep-list truncation) — outputs must match bit-exactly.
"""
import numpy as np
import jax.numpy as jnp

from subgc_tpu.config import ModelConfig
from subgc_tpu.models.gpn import subgraph_nms


def _case(rng, cfg, S):
    N = cfg.obj_num
    oi = np.full((S, N), N - 1, np.int32)
    am = np.zeros((S, N), np.float32)
    for s in range(S):
        pool = rng.randint(4, 12)   # small node pool -> heavy overlap
        n = rng.randint(2, min(8, pool + 1))
        oi[s, :n] = rng.choice(pool, n, replace=False)
        am[s, :n] = 1
    scores = rng.rand(S).astype(np.float32)
    valid = rng.rand(S) > 0.1
    if not valid.any():
        valid[0] = True
    return oi, am, scores, valid


def test_parallel_nms_matches_sequential():
    cfg = ModelConfig()
    rng = np.random.RandomState(0)
    for trial in range(25):
        S = int(rng.choice([8, 16, 64]))
        thres = float(rng.choice([0.2, 0.55, 0.75, 0.95]))
        max_keep = int(rng.choice([1, 3, 10, S]))
        oi, am, scores, valid = _case(rng, cfg, S)
        if trial % 3 == 0:
            scores[: S // 2] = scores[0]        # tie block
        args = (jnp.asarray(scores), jnp.asarray(oi), jnp.asarray(am),
                jnp.asarray(valid), cfg, thres, max_keep)
        ki_s, kv_s = subgraph_nms(*args, parallel=False)
        ki_p, kv_p = subgraph_nms(*args, parallel=True)
        np.testing.assert_array_equal(np.asarray(kv_s), np.asarray(kv_p),
                                      err_msg=f"trial {trial} keep_valid")
        np.testing.assert_array_equal(np.asarray(ki_s), np.asarray(ki_p),
                                      err_msg=f"trial {trial} keep_ind")


def test_parallel_nms_suppression_chain():
    """A->B->C chain: A kills B, B (dead) cannot kill C — the resurrection
    case that distinguishes greedy NMS from one-shot suppression."""
    cfg = ModelConfig()
    N = cfg.obj_num
    # A={0,1}, B={1,2}, C={2,3}: IoU(A,B)=IoU(B,C)=1/3, IoU(A,C)=0
    oi = np.full((3, N), N - 1, np.int32)
    am = np.zeros((3, N), np.float32)
    for i, nodes in enumerate([(0, 1), (1, 2), (2, 3)]):
        oi[i, :2] = nodes
        am[i, :2] = 1
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    args = (jnp.asarray(scores), jnp.asarray(oi), jnp.asarray(am),
            jnp.ones((3,), bool), cfg, 0.3, 3)
    for par in (False, True):
        ki, kv = subgraph_nms(*args, parallel=par)
        assert np.asarray(kv).tolist() == [True, True, False]
        assert np.asarray(ki).tolist()[:2] == [0, 2]    # A and C kept
