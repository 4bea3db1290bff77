"""cfg.share_att_train: image-shared attention for the teacher-forced scan.

The flag swaps the train decoder's per-row gathered attention streams
([S, N, R]/[S, N, H] scan-invariants plus their backward gradient
accumulators) for the eval fan-out's image-shared layout
(models/decoder.py::prepare_features_shared_train): att_embed projects the
image nodes once and attention() masks by node-set membership.  The math is
the packed layout's, float-reassociated (softmax is subset-stable, the
weighted sum hits the same rows); the ONE training-noise change is that
att_embed dropout samples per image node instead of per gathered row.
Pinned here:

* logprobs / gpn_loss match the packed layout with dropout off (both
  use_gpn and Full-GC row layouts)
* gradients match the packed layout at reassociation level (dropout off)
* an 8-device data-parallel step under the flag updates params identically
  to single-device (the positional [B, K] row grouping is mesh-safe)
* training still learns with dropout ON
* use_bn + share_att_train is an explicit config error
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from subgc_tpu.config import ModelConfig, TrainConfig
from subgc_tpu.models import decoder as D
from subgc_tpu.models import subgc
from subgc_tpu.models.params import init_params


def _tiny_cfg(**kw):
    kw.setdefault("drop_prob_lm", 0.0)
    return ModelConfig(vocab_size=20, rnn_size=32, input_encoding_size=24,
                       att_hid_size=16, gcn_dim=20, fc_feat_size=32,
                       att_feat_size=40, embed_dim=12, num_obj_classes=15,
                       num_rel_classes=8, obj_num=9, rel_num=11, **kw)


def _forward(cfg, seed=0, rng=7, train=True):
    from subgc_tpu.data.synthetic import synthetic_train_batch

    params, state = init_params(jax.random.PRNGKey(3), cfg,
                                n_obj_names=cfg.num_obj_classes,
                                n_pred_names=cfg.num_rel_classes)
    batch = synthetic_train_batch(cfg, 4, seed=seed)
    lps, gpn_loss, scores, _ = subgc.train_forward(
        params, state, batch.graph, batch.labels, batch.sub_obj_ind,
        batch.sub_att_mask, batch.img_ix, cfg, train=train,
        rng=jax.random.PRNGKey(rng))
    return lps, gpn_loss, scores


@pytest.mark.parametrize("use_gpn", [True, False])
def test_logprobs_match_packed(use_gpn):
    base = _tiny_cfg(use_gpn=use_gpn)
    flag = base.replace(share_att_train=True)
    lps0, gl0, sc0 = _forward(base)
    lps1, gl1, sc1 = _forward(flag)
    np.testing.assert_allclose(np.asarray(lps0), np.asarray(lps1),
                               rtol=2e-5, atol=2e-5)
    if use_gpn:
        # the sGPN path is untouched by the layout change
        np.testing.assert_array_equal(np.asarray(sc0), np.asarray(sc1))
        assert float(gl0) == float(gl1)


def _grads(cfg, seed=0):
    from subgc_tpu.data.synthetic import synthetic_train_batch
    from subgc_tpu.train.loss import language_model_loss

    params, state = init_params(jax.random.PRNGKey(3), cfg,
                                n_obj_names=cfg.num_obj_classes,
                                n_pred_names=cfg.num_rel_classes)
    batch = synthetic_train_batch(cfg, 4, seed=seed)

    def loss_fn(p):
        lps, gpn_loss, _, _ = subgc.train_forward(
            p, state, batch.graph, batch.labels, batch.sub_obj_ind,
            batch.sub_att_mask, batch.img_ix, cfg, train=True,
            rng=jax.random.PRNGKey(7))
        lang = language_model_loss(lps, batch.labels[:, 1:],
                                   batch.masks[:, 1:])
        return lang + (gpn_loss if gpn_loss is not None else 0.0)

    return jax.grad(loss_fn)(params)


def test_grads_match_packed_reassociation_level():
    g0 = _grads(_tiny_cfg())
    g1 = _grads(_tiny_cfg(share_att_train=True))
    flat0 = jax.tree_util.tree_leaves(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    num = np.sqrt(sum(float(((a - b).astype(jnp.float32) ** 2).sum())
                      for a, b in zip(flat0, flat1)))
    den = np.sqrt(sum(float((a.astype(jnp.float32) ** 2).sum())
                      for a in flat0))
    assert num / den < 1e-4, num / den


def test_sharded_matches_single_under_flag():
    from subgc_tpu.data.synthetic import synthetic_train_batch
    from subgc_tpu.parallel import mesh as M
    from subgc_tpu.train.optim import build_optimizer
    from subgc_tpu.train.step import init_train_state, make_train_step

    cfg = _tiny_cfg(share_att_train=True, drop_prob_lm=0.3)
    tcfg = TrainConfig(batch_size=8)
    params, mstate = init_params(jax.random.PRNGKey(0), cfg,
                                 n_obj_names=cfg.num_obj_classes,
                                 n_pred_names=cfg.num_rel_classes)
    optimizer = build_optimizer(tcfg)
    step = make_train_step(cfg, tcfg, optimizer, ss_active=False)
    batch = synthetic_train_batch(cfg, 8, seed=11)
    rng = jax.random.PRNGKey(2)
    z = jnp.zeros((), jnp.int32), jnp.zeros(())

    copy = lambda t: jax.tree_util.tree_map(lambda x: jnp.array(x), t)
    ts1 = init_train_state(copy(params), copy(mstate), optimizer)
    ts1, m1 = step(ts1, jax.tree_util.tree_map(jnp.asarray, batch), rng, *z)

    mesh = M.make_mesh()
    assert mesh.devices.size == 8
    sharded = M.shard_leading_axis(mesh, batch)
    ts2 = init_train_state(M.replicate(mesh, params),
                           M.replicate(mesh, mstate), optimizer)
    ts2, m2 = step(ts2, sharded, rng, *z)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(ts1.params),
                    jax.tree_util.tree_leaves(ts2.params)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=2e-4, atol=1e-6)


def test_train_step_learns_under_flag():
    from subgc_tpu.data.synthetic import synthetic_train_batch
    from subgc_tpu.train.optim import build_optimizer
    from subgc_tpu.train.step import init_train_state, make_train_step

    cfg = _tiny_cfg(share_att_train=True, drop_prob_lm=0.3)
    tcfg = TrainConfig(batch_size=4, learning_rate=3e-3)
    params, mstate = init_params(jax.random.PRNGKey(0), cfg,
                                 n_obj_names=cfg.num_obj_classes,
                                 n_pred_names=cfg.num_rel_classes)
    optimizer = build_optimizer(tcfg)
    ts = init_train_state(params, mstate, optimizer)
    step = make_train_step(cfg, tcfg, optimizer, ss_active=False)
    batch = synthetic_train_batch(cfg, 4, seed=5)
    z = jnp.zeros((), jnp.int32), jnp.zeros(())
    losses = []
    for i in range(25):
        ts, m = step(ts, batch, jax.random.PRNGKey(i), *z)
        losses.append(float(m["loss"]))
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses
    assert np.isfinite(losses).all()


def test_use_bn_is_config_error():
    cfg = _tiny_cfg(use_bn=1, share_att_train=True)
    params, state = init_params(jax.random.PRNGKey(0), cfg,
                                n_obj_names=cfg.num_obj_classes,
                                n_pred_names=cfg.num_rel_classes)
    mem = jnp.ones((4, cfg.obj_num), jnp.float32)
    x_obj = jnp.zeros((1, cfg.obj_num, cfg.gcn_dim), jnp.float32)
    fc = jnp.zeros((4, 2 * cfg.gcn_dim), jnp.float32)
    with pytest.raises(ValueError, match="share_att_train"):
        D.prepare_features_shared_train(params, fc, x_obj, mem, cfg,
                                        train=True)
