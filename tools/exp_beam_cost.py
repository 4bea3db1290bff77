"""Compile-only cost comparison of the beam program (no TPU execution).

Prints XLA's cost_analysis (flops/bytes — while-loop bodies counted ONCE,
so these are per-step-ish signals) and memory_analysis for the current beam
formulation at the bench decode shape.  Use to compare formulations without
paying tunnel measurement variance.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from subgc_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from subgc_tpu.config import EvalConfig, ModelConfig
    from subgc_tpu.decode import beam
    from subgc_tpu.models import decoder as D
    from subgc_tpu.models.params import init_params

    S = int(sys.argv[1]) if len(sys.argv) > 1 else 960
    bm = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    dtype = os.environ.get("EXP_DTYPE", "bfloat16")
    gates = os.environ.get("EXP_BF16_GATES",
                           "1" if dtype == "bfloat16" else "0") == "1"
    cfg = ModelConfig(vocab_size=9487, compute_dtype=dtype,
                      bf16_lstm_gates=gates)
    ecfg = EvalConfig(beam_size=bm, beam_chunk=1024)
    params, _ = init_params(jax.random.PRNGKey(0), cfg,
                            n_obj_names=1599, n_pred_names=21)
    rng = np.random.RandomState(0)
    store_dt = cfg.cdtype
    feats = D.PreparedFeatures(
        fc=jnp.asarray(rng.randn(S, cfg.rnn_size), jnp.float32),
        att=jnp.asarray(rng.randn(S, cfg.obj_num, cfg.rnn_size), store_dt),
        p_att=jnp.asarray(rng.randn(S, cfg.obj_num, cfg.att_hid_size),
                          store_dt),
        mask=jnp.ones((S, cfg.obj_num), jnp.float32),
        fc_ih=jnp.asarray(rng.randn(S, 4 * cfg.rnn_size),
                          store_dt if gates else jnp.float32))

    fn = jax.jit(lambda p, f: beam.beam_search(p, f, cfg, ecfg))
    compiled = fn.lower(params, feats).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    mem = compiled.memory_analysis()
    print(f"S={S} beam={bm} dtype={dtype} gates={gates}")
    for k in sorted(cost):
        v = cost[k]
        if isinstance(v, float) and v > 1e6:
            print(f"  {k:>28}: {v/1e9:12.3f} G")
    print(f"  temp_size: {mem.temp_size_in_bytes/1e6:.1f} MB  "
          f"output: {mem.output_size_in_bytes/1e6:.1f} MB")


if __name__ == "__main__":
    main()
