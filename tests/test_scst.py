"""SCST self-critical training step on synthetic data."""
import numpy as np
import jax
import jax.numpy as jnp

from subgc_tpu.config import DataConfig, TrainConfig
from subgc_tpu.data.dataset import TrainLoader
from subgc_tpu.data.synthetic import generate_dataset
from subgc_tpu.models.params import init_params
from subgc_tpu.train.optim import build_optimizer
from subgc_tpu.train.scst import (compute_rewards, make_sample_fn,
                                  make_scst_update_fn, scst_train_step)
from subgc_tpu.train.step import init_train_state

from .test_train import _small_cfg


def test_scst_step(tmp_path):
    manifest = generate_dataset(str(tmp_path / "d"), n_images=10, seed=13)
    mcfg, dcfg, tcfg = _small_cfg(manifest)
    tcfg = tcfg.replace(batch_size=2)
    loader = TrainLoader(mcfg, tcfg, dcfg)
    params, mstate = init_params(jax.random.PRNGKey(0), mcfg,
                                 n_obj_names=mcfg.num_obj_classes,
                                 n_pred_names=mcfg.num_rel_classes)
    optimizer = build_optimizer(tcfg)
    ts = init_train_state(params, mstate, optimizer)
    sample_fn = make_sample_fn(mcfg)
    update_fn = make_scst_update_fn(mcfg, tcfg, optimizer)

    batch, infos, _ = loader.get_batch("train")
    # per-sentence GT token arrays (5 per image)
    gts_tokens = []
    for info in infos:
        caps = loader.ds.captions_for(info.ix)
        for _ in range(tcfg.seq_per_img):
            gts_tokens.append(caps)

    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    ts, loss, mean_reward = scst_train_step(
        ts, batch, gts_tokens, loader.vocab, sample_fn, update_fn,
        jax.random.PRNGKey(3), jnp.zeros((), jnp.int32))
    assert np.isfinite(loss)
    assert np.isfinite(mean_reward)
    assert int(ts.step) == 1
