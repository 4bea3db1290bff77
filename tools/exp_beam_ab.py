"""A/B the beam-decode optimizations on the real chip.

Times the full vmapped+chunked beam program (decode/beam.py::beam_search) at
the bench decode shape (default: 960 kept sub-graphs = batch 96 x keep 10,
beam 3) for each combination of the round-3 decode optimizations:

  fold  = fold_embed_ih   (per-vocab gate table replaces the xt matmul)
  share = share_att_beams (attention feature streams shared across beams)

Usage: python tools/exp_beam_ab.py [n_subgraphs] [beam]
Env:   EXP_DTYPE=float32|bfloat16 (default bfloat16), EXP_BF16_GATES=0|1
       (default 1 with bf16), EXP_VARIANTS=comma list like "00,11"
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

    from subgc_tpu.config import EvalConfig, ModelConfig
    from subgc_tpu.decode import beam
    from subgc_tpu.models import decoder as D
    from subgc_tpu.models.params import init_params

    S = int(sys.argv[1]) if len(sys.argv) > 1 else 960
    bm = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    dtype = os.environ.get("EXP_DTYPE", "bfloat16")
    gates = os.environ.get("EXP_BF16_GATES",
                           "1" if dtype == "bfloat16" else "0") == "1"
    # variant string: fold, share, merge (merge optional, default 0)
    variants = os.environ.get("EXP_VARIANTS", "000,100,010,011").split(",")

    base = ModelConfig(vocab_size=9487, compute_dtype=dtype,
                       bf16_lstm_gates=gates)
    ecfg = EvalConfig(beam_size=bm, beam_chunk=1024)
    params, _ = init_params(jax.random.PRNGKey(0), base,
                            n_obj_names=1599, n_pred_names=21)
    rng = np.random.RandomState(0)
    store_dt = base.cdtype
    feats = D.PreparedFeatures(
        fc=jnp.asarray(rng.randn(S, base.rnn_size), jnp.float32),
        att=jnp.asarray(rng.randn(S, base.obj_num, base.rnn_size), store_dt),
        p_att=jnp.asarray(rng.randn(S, base.obj_num, base.att_hid_size),
                          store_dt),
        mask=jnp.ones((S, base.obj_num), jnp.float32),
        fc_ih=jnp.asarray(rng.randn(S, 4 * base.rnn_size),
                          store_dt if gates else jnp.float32))

    print(f"S={S} beam={bm} dtype={dtype} gates={gates}", flush=True)
    ref_seq = None
    for v in variants:
        fold, share = v[0] == "1", v[1] == "1"
        merge = len(v) > 2 and v[2] == "1"
        cfg = base.replace(fold_embed_ih=fold, share_att_beams=share,
                           merge_lstm_matmuls=merge)
        fn = jax.jit(lambda p, f, c=cfg: beam.beam_search(p, f, c, ecfg))
        t_c0 = time.time()
        out = fn(params, feats)
        jax.block_until_ready(out)
        compile_s = time.time() - t_c0
        seq = np.asarray(out.seq)       # fetched warm-up (tunnel one-time work)
        if ref_seq is None:
            ref_seq = seq
        agree = float((seq == ref_seq).mean())
        t0 = time.time()
        reps = 10
        for _ in range(reps):
            out = fn(params, feats)
        jax.block_until_ready(out)
        ms = (time.time() - t0) / reps * 1e3
        print(f"fold={int(fold)} share={int(share)} merge={int(merge)}: "
              f"{ms:8.2f} ms "
              f"({S * 1e3 / ms:7.0f} caps/s decode-only; "
              f"token-agree vs first variant {agree:.4f}; "
              f"compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
