"""Train-step bandwidth experiments on the real chip (round 3).

The batch sweep showed the train step saturates ~1.78k images/s with
LINEAR step-time scaling — a batch-proportional limiter, pointing at the
f32 [S,4R] gate/activation streams written forward and re-read by the
backward pass (docs/PERF.md).  Two candidate levers, measured here:

  A. bf16 LSTM gate streams in TRAINING (cfg.bf16_lstm_gates — already the
     inference deployment default; halves the gate-stream bytes)
  B. jax.checkpoint (remat) on the teacher-forcing scan body — recompute
     the decode step in the backward instead of storing its intermediates
     (trades MXU FLOPs, which the step has spare, for HBM traffic)
  A+B combined.

Round 5 adds lever C (VERDICT r4 item 4): cfg.bf16_residuals — forward
numerics untouched, but the scan's saved-for-backward LSTM residuals are
stored in bf16 and the elementwise derivatives recomputed from them
(models/decoder.py::_lstm_nonlin_b16r).  SUBGC_EXP_RESID=1 sweeps
{baseline, resid, gates, gates+resid} instead of the round-3 remat grid.

Usage: python tools/exp_train_bw.py [batch ...]   (default: 64 256)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from subgc_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from subgc_tpu.config import ModelConfig, TrainConfig
    from subgc_tpu.data.synthetic import synthetic_train_batch
    from subgc_tpu.models import decoder as D
    from subgc_tpu.models.params import init_params
    from subgc_tpu.train.optim import build_optimizer
    from subgc_tpu.train.step import init_train_state, make_train_step

    batches = [int(a) for a in sys.argv[1:]] or [64, 256]

    orig_forward_teacher = D.forward_teacher

    def remat_forward_teacher(params, feats, seq, cfg, train=False, rng=None,
                              ss_prob=None):
        """forward_teacher with the scan body rematerialized."""
        params = D.cast_decoder_weights(params, cfg)
        S, T2 = seq.shape
        n_steps = T2 - 1
        V1 = cfg.vocab_size + 1
        base_rng = rng if rng is not None else jax.random.PRNGKey(0)

        def step(carry, inp):
            state, prev_lp, step_rng = carry
            i, token_gt = inp
            step_rng, r_ss, r_pick, r_drop = jax.random.split(step_rng, 4)
            if train and ss_prob is not None:
                use_sample = jax.random.uniform(r_ss, (S,)) < ss_prob
                sampled = jax.random.categorical(r_pick, prev_lp, axis=-1)
                token = jnp.where((i >= 1) & use_sample, sampled, token_gt)
            else:
                token = token_gt
            lp, state, _ = D.decode_step(params, state, token, feats, cfg,
                                         train, r_drop if train else None)
            return (state, lp, step_rng), lp

        init = (D.init_state(S, cfg), jnp.zeros((S, V1), jnp.float32),
                base_rng)
        xs = (jnp.arange(n_steps), seq[:, :n_steps].T)
        _, lps = jax.lax.scan(jax.checkpoint(step), init, xs)
        return lps.transpose(1, 0, 2)

    def measure(B, gates, remat, resid=False, n_steps=15,
                dtype="bfloat16", ss_active=True, share=False):
        D.forward_teacher = remat_forward_teacher if remat \
            else orig_forward_teacher
        try:
            cfg = ModelConfig(vocab_size=9487, compute_dtype=dtype,
                              bf16_lstm_gates=gates, bf16_residuals=resid,
                              share_att_train=share)
            tcfg = TrainConfig(batch_size=B)
            params, mstate = init_params(jax.random.PRNGKey(0), cfg,
                                         n_obj_names=cfg.num_obj_classes,
                                         n_pred_names=cfg.num_rel_classes)
            optimizer = build_optimizer(tcfg)
            ts = init_train_state(params, mstate, optimizer)
            step = make_train_step(cfg, tcfg, optimizer, ss_active=ss_active)
            batch = synthetic_train_batch(cfg, B)
            key = jax.random.PRNGKey(2)
            z = jnp.zeros((), jnp.int32), jnp.zeros(())
            for _ in range(3):
                ts, m = step(ts, batch, key, *z)
                loss = float(np.asarray(m["loss"]))
            t0 = time.time()
            for _ in range(n_steps):
                ts, m = step(ts, batch, key, *z)
            jax.block_until_ready(m["loss"])
            dt = (time.time() - t0) / n_steps
            print(f"batch {B:4d} {dtype[:4]} ss={int(ss_active)} "
                  f"gates={int(gates)} remat={int(remat)} "
                  f"resid={int(resid)} share={int(share)}: "
                  f"{dt*1e3:7.2f} ms/step = {B/dt:7.1f} img/s "
                  f"(loss {loss:.3f})", flush=True)
        finally:
            D.forward_teacher = orig_forward_teacher

    if os.environ.get("SUBGC_EXP_SHAREATT"):
        # lever D grid (round 5): image-shared teacher-forced attention
        # (cfg.share_att_train) on the hoisted path — bf16 {base, share,
        # share+gates+resid (the full perf stack)} + f32 {base, share}
        for B in batches:
            measure(B, False, False, ss_active=False)
            measure(B, False, False, ss_active=False, share=True)
            measure(B, True, False, resid=True, ss_active=False)
            measure(B, True, False, resid=True, ss_active=False, share=True)
            measure(B, False, False, dtype="float32", ss_active=False)
            measure(B, False, False, dtype="float32", ss_active=False,
                    share=True)
    elif os.environ.get("SUBGC_EXP_RESID"):
        # lever C grid: the hoisted (ss_active=False) headline path, bf16
        # base {baseline, resid, gates, gates+resid} + the f32 parity
        # default {baseline, resid}
        for B in batches:
            for gates, resid in [(False, False), (False, True),
                                 (True, False), (True, True)]:
                measure(B, gates, False, resid, ss_active=False)
            for resid in [False, True]:
                measure(B, False, False, resid, dtype="float32",
                        ss_active=False)
    else:
        for B in batches:
            for gates, remat in [(False, False), (True, False),
                                 (False, True), (True, True)]:
                measure(B, gates, remat)


if __name__ == "__main__":
    main()
