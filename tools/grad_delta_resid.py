"""Production-dim gradient-delta bound for cfg.bf16_residuals (VERDICT r4
item 4 "grad-parity delta bound if accepted").

Measures, at production dims (vocab 9487, rnn 1000) on a synthetic train
batch, the relative global-norm gradient delta between the default
backward (f32 autodiff residuals) and the bf16-residual backward
(models/decoder.py::_lstm_nonlin_b16r), in both compute modes.  The
forward loss/logprobs are asserted bitwise identical — the lever touches
only what the backward pass stores.

Usage: python tools/grad_delta_resid.py [batch]   (default 16)
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from subgc_tpu.config import ModelConfig
from subgc_tpu.data.synthetic import synthetic_train_batch
from subgc_tpu.models import subgc
from subgc_tpu.models.params import init_params
from subgc_tpu.train.loss import language_model_loss
from subgc_tpu.utils import cache

cache.enable_compilation_cache()


def grads_for(cfg, batch, params, state):
    def loss_fn(p):
        logprobs, gpn_loss, _, _ = subgc.train_forward(
            p, state, batch.graph, batch.labels, batch.sub_obj_ind,
            batch.sub_att_mask, batch.img_ix, cfg, train=True,
            rng=jax.random.PRNGKey(7))
        lang = language_model_loss(logprobs, batch.labels[:, 1:],
                                   batch.masks[:, 1:])
        return lang + (gpn_loss if gpn_loss is not None else 0.0), logprobs

    (loss, lps), g = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))(params)
    jax.block_until_ready(g)
    return float(loss), np.asarray(lps.astype(jnp.float32)), g


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    for dtype in ["float32", "bfloat16"]:
        base = ModelConfig(vocab_size=9487, compute_dtype=dtype)
        flag = base.replace(bf16_residuals=True)
        params, state = init_params(jax.random.PRNGKey(0), base,
                                    n_obj_names=base.num_obj_classes,
                                    n_pred_names=base.num_rel_classes)
        batch = synthetic_train_batch(base, B)
        loss0, lps0, g0 = grads_for(base, batch, params, state)
        loss1, lps1, g1 = grads_for(flag, batch, params, state)
        assert loss0 == loss1, (loss0, loss1)
        np.testing.assert_array_equal(lps0, lps1)
        flat0 = jax.tree_util.tree_leaves(g0)
        flat1 = jax.tree_util.tree_leaves(g1)
        num = np.sqrt(sum(float(((a - b).astype(jnp.float32) ** 2).sum())
                          for a, b in zip(flat0, flat1)))
        den = np.sqrt(sum(float((a.astype(jnp.float32) ** 2).sum())
                          for a in flat0))
        # worst per-tensor relative delta (ignore tiny-norm tensors)
        worst = 0.0
        worst_path = None
        for (path, a), b in zip(
                jax.tree_util.tree_leaves_with_path(g0), flat1):
            an = float(jnp.linalg.norm(a.astype(jnp.float32)))
            if an < 1e-6 * den:
                continue
            d = float(jnp.linalg.norm((a - b).astype(jnp.float32))) / an
            if d > worst:
                worst, worst_path = d, jax.tree_util.keystr(path)
        print(f"{dtype:9s} batch {B}: loss {loss0:.4f} forward-bitwise OK; "
              f"grad rel global-norm delta {num/den:.3e}; "
              f"worst tensor {worst:.3e} at {worst_path}", flush=True)


if __name__ == "__main__":
    main()
