"""Train-step roofline bisection on the real chip (VERDICT r2 item 6).

Phases at production dims (Sub_GC_Kar, batch 64 = 320 sentences):
  encoder fwd      — encode_graph + sGPN + prepare_features (loop-free, so
                     XLA cost_analysis FLOPs are accurate here)
  decoder fwd      — the 17-step teacher-forced scan (FLOPs analytic: XLA
                     counts while bodies once)
  full fwd         — loss value
  fwd+bwd          — value_and_grad
  full step        — fwd+bwd + global-norm clip + adam (the shipped step)
  optimizer        — adam update alone on a grads-shaped pytree

Per phase: time, analytic/cost FLOPs, achieved TFLOP/s, % of bf16 peak.
Env: BENCH_DTYPE=float32|bfloat16, PROFILE_BATCH=64.
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
    from subgc_tpu.models import subgc
    from subgc_tpu.models.params import init_params
    from subgc_tpu.train.loss import language_model_loss
    from subgc_tpu.train.optim import build_optimizer
    from subgc_tpu.train.step import init_train_state, make_train_step
    from subgc_tpu.utils.profiling import decode_flops_per_row

    B = int(os.environ.get("PROFILE_BATCH", "64"))
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    cfg = ModelConfig(vocab_size=9487, compute_dtype=dtype)
    tcfg = TrainConfig(batch_size=B)
    params, mstate = init_params(jax.random.PRNGKey(0), cfg,
                                 n_obj_names=cfg.num_obj_classes,
                                 n_pred_names=cfg.num_rel_classes)
    optimizer = build_optimizer(tcfg)
    ts = init_train_state(params, mstate, optimizer)
    step = make_train_step(cfg, tcfg, optimizer)

    S = B * 5
    batch = synthetic_train_batch(cfg, B)
    key = jax.random.PRNGKey(2)

    # analytic decode FLOPs (one definition: utils/profiling.py)
    n_steps = cfg.seq_length + 1
    dec_fwd_flops = S * n_steps * decode_flops_per_row(cfg)

    # --- phase programs -------------------------------------------------
    def enc_prep(params, mstate, batch, r):
        rngs = jax.random.split(r, 4)
        from subgc_tpu.models import encoder as Enc
        from subgc_tpu.models import gpn as G
        x_obj, x_pred, new_state = Enc.encode_graph(params, mstate,
                                                    batch.graph, cfg, True)
        gpn_loss, scores, att_feats, fc_feats, att_masks = \
            G.gpn_train_forward(params, x_obj, batch.sub_obj_ind,
                                batch.sub_att_mask, batch.img_ix, cfg, True,
                                rngs[0])
        feats, _ = D.prepare_features_bn(params, fc_feats, att_feats,
                                         att_masks, cfg, True, rngs[1],
                                         mstate.get("att_bn"))
        return feats, gpn_loss

    def dec_fwd(params, feats, labels, r):
        return D.forward_teacher(params, feats, labels, cfg, True, r, None)

    def full_fwd(params, mstate, batch, r):
        logprobs, gpn_loss, _, _ = subgc.train_forward(
            params, mstate, batch.graph, batch.labels, batch.sub_obj_ind,
            batch.sub_att_mask, batch.img_ix, cfg, train=True, rng=r)
        lang = language_model_loss(logprobs, batch.labels[:, 1:],
                                   batch.masks[:, 1:])
        return lang + gpn_loss

    fwd_bwd = jax.grad(full_fwd)

    def opt_only(grads, opt_state, params):
        updates, opt_state = optimizer.update(grads, opt_state, params)
        import optax
        return optax.apply_updates(params, updates), opt_state

    feats_ex, _ = jax.jit(enc_prep)(params, mstate, batch, key)
    grads_ex = jax.jit(fwd_bwd)(params, mstate, batch, key)

    def timeit(name, fn, args, flops=None, reps=10, cost_flops=False):
        jfn = jax.jit(fn)
        out = jfn(*args)
        jax.block_until_ready(out)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf)                   # fetched warm-up
        t0 = time.time()
        for _ in range(reps):
            out = jfn(*args)
        jax.block_until_ready(out)
        ms = (time.time() - t0) / reps * 1e3
        if flops is None and cost_flops:
            c = jfn.lower(*args).compile().cost_analysis()
            if isinstance(c, (list, tuple)):
                c = c[0]
            flops = float(c.get("flops", 0.0))
        tf = flops / ms * 1e3 / 1e12 if flops else None
        pct = 100 * tf * 1e12 / 197e12 if tf else None
        print(f"{name:>24}: {ms:8.2f} ms"
              + (f"  {flops/1e9:8.1f} GFLOP  {tf:6.1f} TF/s"
                 f"  {pct:5.1f}% of bf16 peak" if flops else ""), flush=True)
        return ms

    print(f"batch {B} ({S} sentences), dtype {dtype}, {n_steps}-step scan")
    t_enc = timeit("encoder+sGPN+prepare fwd", enc_prep,
                   (params, mstate, batch, key), cost_flops=True)
    t_dec = timeit("decoder teacher fwd", dec_fwd,
                   (params, feats_ex, batch.labels, key),
                   flops=dec_fwd_flops)
    t_fwd = timeit("full forward", full_fwd, (params, mstate, batch, key))
    t_fb = timeit("forward+backward", fwd_bwd, (params, mstate, batch, key),
                  flops=3 * dec_fwd_flops)   # decode ~3x fwd; encoder extra
    t_opt = timeit("adam update only", opt_only,
                   (grads_ex, ts.opt_state, params))
    # full step donates its TrainState — pre-make device copies and time
    # the shipped jitted step over them
    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
    ewarm = step(copy(ts), batch, key, jnp.zeros((), jnp.int32), jnp.zeros(()))
    jax.block_until_ready(ewarm)
    np.asarray(ewarm[1]["loss"])
    copies = [copy(ts) for _ in range(6)]
    jax.block_until_ready(copies)
    t0 = time.time()
    for c in copies:
        out = step(c, batch, key, jnp.zeros((), jnp.int32), jnp.zeros(()))
    jax.block_until_ready(out)
    t_full = (time.time() - t0) / len(copies) * 1e3
    print(f"{'full train step':>24}: {t_full:8.2f} ms")
    print(f"summary: enc {t_enc:.1f} + dec_fwd {t_dec:.1f} -> fwd {t_fwd:.1f};"
          f" fwd+bwd {t_fb:.1f}; opt {t_opt:.1f}; full {t_full:.1f} ms "
          f"({S / t_full * 1e3:.0f} sentences/s, {B / t_full * 1e3:.0f} "
          f"images/s)")


if __name__ == "__main__":
    main()
