"""End-to-end training on synthetic data: loss decreases, checkpoint round-trips,
data-parallel step matches single-device."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from subgc_tpu.config import DataConfig, ModelConfig, TrainConfig
from subgc_tpu.data.dataset import TrainLoader
from subgc_tpu.data.synthetic import generate_dataset
from subgc_tpu.models.params import init_params
from subgc_tpu.parallel import mesh as M
from subgc_tpu.train import checkpoint as C
from subgc_tpu.train.optim import build_optimizer, learning_rate, ss_prob
from subgc_tpu.train.step import (TrainBatch, init_train_state, make_train_step,
                                  make_val_step)


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("synthdata")
    return generate_dataset(str(root), n_images=16, seed=3)


def _small_cfg(manifest):
    mcfg = ModelConfig(vocab_size=manifest["vocab_size"], rnn_size=48,
                       input_encoding_size=32, att_hid_size=24, gcn_dim=32,
                       fc_feat_size=48, att_feat_size=manifest["feat_dim"],
                       embed_dim=16,
                       num_obj_classes=manifest["n_obj_classes"],
                       num_rel_classes=manifest["n_rel_classes"])
    dcfg = DataConfig(input_json=manifest["input_json"],
                      input_label_h5=manifest["input_label_h5"],
                      sg_dir=manifest["sg_dir"], mask_dir=manifest["mask_dir"])
    tcfg = TrainConfig(batch_size=4, warmup_n=2)
    return mcfg, dcfg, tcfg


def test_lr_schedule():
    tcfg = TrainConfig(learning_rate=5e-4, warmup_n=300,
                       learning_rate_decay_start=0,
                       learning_rate_decay_every=3,
                       learning_rate_decay_rate=0.8)
    # warmup: lr = it * base / warmup (train.py:108-110)
    assert float(learning_rate(150, 0, tcfg)) == pytest.approx(2.5e-4)
    assert float(learning_rate(300, 0, tcfg)) == pytest.approx(5e-4)
    # decay at epoch 4: frac = (4-0)//3 = 1
    assert float(learning_rate(5000, 4, tcfg)) == pytest.approx(4e-4)
    assert float(learning_rate(5000, 0, tcfg)) == pytest.approx(5e-4)
    # ss schedule (train.py:128-131)
    assert ss_prob(0, tcfg) == 0.0
    assert ss_prob(6, tcfg) == pytest.approx(0.05)
    assert ss_prob(60, tcfg) == pytest.approx(0.25)


def test_train_loop_loss_decreases(synth):
    mcfg, dcfg, tcfg = _small_cfg(synth)
    loader = TrainLoader(mcfg, tcfg, dcfg)
    params, mstate = init_params(jax.random.PRNGKey(0), mcfg,
                                 n_obj_names=mcfg.num_obj_classes,
                                 n_pred_names=mcfg.num_rel_classes)
    optimizer = build_optimizer(tcfg)
    ts = init_train_state(params, mstate, optimizer)
    step = make_train_step(mcfg, tcfg, optimizer)

    losses = []
    rng = jax.random.PRNGKey(1)
    for i in range(8):
        batch, infos, wrapped = loader.get_batch("train")
        batch = jax.tree_util.tree_map(jnp.asarray, batch)
        rng, r = jax.random.split(rng)
        ts, metrics = step(ts, batch, r, jnp.zeros((), jnp.int32),
                           jnp.zeros(()))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert int(ts.step) == 8

    # validation step runs
    val = make_val_step(mcfg)
    vb, _, _ = loader.get_batch("val")
    vl = val(ts.params, ts.model_state, jax.tree_util.tree_map(jnp.asarray, vb))
    assert np.isfinite(float(vl))


def test_checkpoint_roundtrip(synth, tmp_path):
    mcfg, dcfg, tcfg = _small_cfg(synth)
    params, mstate = init_params(jax.random.PRNGKey(0), mcfg,
                                 n_obj_names=mcfg.num_obj_classes,
                                 n_pred_names=mcfg.num_rel_classes)
    optimizer = build_optimizer(tcfg)
    ts = init_train_state(params, mstate, optimizer)
    C.save_checkpoint(str(tmp_path), ts.params, ts.model_state, ts.opt_state,
                      {"iter": 3, "epoch": 0}, {"loss_history": {}})
    p2, s2, o2, infos, hist = C.load_checkpoint(str(tmp_path),
                                                opt_state_template=ts.opt_state)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert infos["iter"] == 3


def test_data_parallel_matches_single(synth):
    """Same batch, 8-device data-parallel vs single device: same loss/params."""
    mcfg, dcfg, tcfg = _small_cfg(synth)
    tcfg = tcfg.replace(batch_size=8)
    loader = TrainLoader(mcfg, tcfg, dcfg)
    params, mstate = init_params(jax.random.PRNGKey(0), mcfg,
                                 n_obj_names=mcfg.num_obj_classes,
                                 n_pred_names=mcfg.num_rel_classes)
    optimizer = build_optimizer(tcfg)
    step = make_train_step(mcfg, tcfg, optimizer)
    batch, _, _ = loader.get_batch("train")
    rng = jax.random.PRNGKey(2)
    epoch = jnp.zeros((), jnp.int32)

    # the step donates its TrainState — give each run its own copy
    copy = lambda t: jax.tree_util.tree_map(lambda x: jnp.array(x), t)
    ts1 = init_train_state(copy(params), copy(mstate), optimizer)
    ts1, m1 = step(ts1, jax.tree_util.tree_map(jnp.asarray, batch), rng,
                   epoch, jnp.zeros(()))

    mesh = M.make_mesh()
    assert mesh.devices.size == 8
    sharded = M.shard_leading_axis(mesh, batch)
    ts2 = init_train_state(M.replicate(mesh, params),
                           M.replicate(mesh, mstate), optimizer)
    ts2, m2 = step(ts2, sharded, rng, epoch, jnp.zeros(()))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(ts1.params),
                    jax.tree_util.tree_leaves(ts2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=1e-6)
