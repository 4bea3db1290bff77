"""The M-RNN-style large sub-graph fan-out path (gpn_max_subg ~ bucket)."""
import numpy as np
import jax
import jax.numpy as jnp

from subgc_tpu.config import EvalConfig
from subgc_tpu.graph import SceneGraph, SubgraphSet
from subgc_tpu.models import subgc
from subgc_tpu.models.params import init_params
from subgc_tpu.decode import greedy


def test_large_bucket_greedy(tiny_cfg, rng_np):
    """bucket=192, keep up to 150, greedy decode — the Sub_GC_MRNN shape
    (test.sh:13: beam 1, NMS .55, max 1000) at reduced scale."""
    cfg = tiny_cfg
    params, state = init_params(jax.random.PRNGKey(0), cfg,
                                n_obj_names=30, n_pred_names=10)
    bucket = 192
    N, K = cfg.obj_num, cfg.rel_num
    graph = SceneGraph(
        obj_fmap=jnp.asarray(rng_np.rand(1, N, cfg.att_feat_size), jnp.float32),
        obj_dist=jnp.asarray(rng_np.rand(1, N, cfg.num_obj_classes), jnp.float32),
        rel_ind=jnp.asarray(rng_np.randint(0, 10, (1, K, 2)), jnp.int32),
        pred_dist=jnp.asarray(rng_np.rand(1, K, cfg.num_rel_classes), jnp.float32))
    oi = np.full((bucket, N), N - 1, np.int32)
    am = np.zeros((bucket, N), np.float32)
    n_real = 160
    for s in range(bucket):
        n = rng_np.randint(2, 8)
        oi[s, :n] = rng_np.choice(10, n, replace=False)
        am[s, :n] = 1
    valid = np.arange(bucket) < n_real
    am[~valid] = 0
    am[~valid, 0] = 1
    subs = SubgraphSet(jnp.asarray(oi),
                       jnp.asarray(np.full((bucket, K), K - 1, np.int32)),
                       jnp.asarray(am), jnp.asarray(valid))

    ecfg = EvalConfig(beam_size=1, gpn_nms_thres=0.55, gpn_max_subg=150)
    enc = subgc.encode_image(params, state, graph, subs, cfg, ecfg)
    kept = int(np.asarray(enc.keep_valid).sum())
    assert 1 <= kept <= 150
    # kept indices are real sub-graphs in ascending original order
    ki = np.asarray(enc.keep_ind)[:kept]
    assert (np.diff(ki) > 0).all()
    assert (ki < n_real).all()
    # with a low threshold many heavily-overlapping random sets suppress
    out = greedy.sample(params, enc.feats, cfg, ecfg, jax.random.PRNGKey(1))
    assert out.seq.shape[0] == enc.keep_ind.shape[0]

    # NMS exactness vs a direct python replication of the reference sweep.
    # scores in original order: NMS at threshold 2.0 keeps every valid
    # sub-graph in ascending order, so enc2.scores aligns with indices 0..n-1
    enc2 = subgc.encode_image(params, state, graph, subs, cfg,
                              EvalConfig(beam_size=1, gpn_nms_thres=2.0,
                                         gpn_max_subg=bucket))
    n2 = int(np.asarray(enc2.keep_valid).sum())
    full_scores = np.full(bucket, -np.inf, np.float64)
    full_scores[np.asarray(enc2.keep_ind)[:n2]] = np.asarray(enc2.scores)[:n2]
    # python greedy NMS (gpn.py:108-138 semantics)
    s_all = np.where(valid, full_scores, -np.inf)
    order = np.argsort(-s_all, kind="stable")
    sets = [frozenset(oi[i][am[i] > 0].tolist()) for i in range(bucket)]
    keep = np.array([bool(valid[i]) for i in order])
    for i in range(bucket):
        if not keep[i]:
            continue
        for j in range(i + 1, bucket):
            if not keep[j]:
                continue
            a, b = sets[order[i]], sets[order[j]]
            iou = len(a & b) / max(len(a | b), 1)
            if iou > 0.55:
                keep[j] = False
    expect_sorted_by_score = [order[i] for i in range(bucket) if keep[i]][:150]
    expect_final = sorted(expect_sorted_by_score)
    np.testing.assert_array_equal(ki, expect_final)
