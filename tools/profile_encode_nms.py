"""Bisect the M-RNN-preset encode duty cycle on the real chip.

The mrnn bench (greedy, bucket 1024, NMS keep 1000) measures ~56k caps/s
against a ~70k caps/s decode-only ceiling (docs/PERF.md round 2); the
residual is the encode+sGPN+NMS cycle.  This tool times each phase at the
mrnn shape so the expensive one is measured, not guessed.  FINDINGS
(docs/PERF.md round 3): the sequential keep-1000 NMS loop costs 2.4 ms per
batch-4 dispatch (now replaced by the 0.16 ms parallel-fixpoint default),
the fused program is decode-bound at ~48% MXU, and the bench-vs-compute
gap is the host duty cycle.  CAVEAT: this tool's standalone phase timers
use block_until_ready, which does NOT reliably wait on the axon tunnel —
treat them as upper-bound pipeline numbers and trust only the fused
figure; for real per-op device times use the chained-dispatch fetched
recipe (CLAUDE.md, docs/PERF.md "Measurement pitfall").

Usage: python tools/profile_encode_nms.py [batch] [bucket] [keep] [thres]
Env: BENCH_DTYPE=float32|bfloat16 (default bfloat16 — the bench default).
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
    from subgc_tpu.decode import greedy as greedy_mod
    from subgc_tpu.eval.runner import make_batched_infer_fn
    from subgc_tpu.graph import SceneGraph, SubgraphSet
    from subgc_tpu.models import encoder as E
    from subgc_tpu.models import gpn as G
    from subgc_tpu.models import subgc
    from subgc_tpu.models.params import init_params

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    bucket = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    keep = int(sys.argv[3]) if len(sys.argv) > 3 else 1000
    thres = float(sys.argv[4]) if len(sys.argv) > 4 else 0.55
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")

    cfg = ModelConfig(vocab_size=9487, compute_dtype=dtype,
                      bf16_lstm_gates=dtype == "bfloat16")
    ecfg = EvalConfig(beam_size=1, gpn_nms_thres=thres, gpn_max_subg=keep)
    params, state = init_params(jax.random.PRNGKey(0), cfg,
                                n_obj_names=1599, n_pred_names=21)
    rng = np.random.RandomState(0)
    N, K = cfg.obj_num, cfg.rel_num

    graph = SceneGraph(
        obj_fmap=jnp.asarray(rng.rand(B, N, 2048), jnp.float32),
        obj_dist=jnp.asarray(rng.rand(B, N, 1599), jnp.float32),
        rel_ind=jnp.asarray(rng.randint(0, N - 1, (B, K, 2)), jnp.int32),
        pred_dist=jnp.asarray(rng.rand(B, K, 21), jnp.float32))
    oi = np.full((B, bucket, N), N - 1, np.int32)
    am = np.zeros((B, bucket, N), np.float32)
    for b in range(B):
        for s in range(bucket):
            n = rng.randint(3, 12)
            oi[b, s, :n] = rng.choice(N - 1, n, replace=False)
            am[b, s, :n] = 1
    subs = SubgraphSet(jnp.asarray(oi),
                       jnp.asarray(np.full((B, bucket, K), K - 1, np.int32)),
                       jnp.asarray(am), jnp.asarray(np.ones((B, bucket), bool)))
    key = jax.random.PRNGKey(0)

    def timeit(name, fn, *args, n=8):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / n
        print(f"{name:>36}: {dt * 1e3:9.2f} ms")
        return out, dt

    # every phase takes params/state as jit ARGUMENTS — closing over large
    # device arrays embeds them as HLO literals and can stall the axon
    # remote compiler indefinitely (CLAUDE.md)

    # phase 1: GCN encoder only
    enc_fn = jax.jit(lambda p, st, g: E.encode_graph(p, st, g, cfg,
                                                     train=False)[0])
    x_obj, _ = timeit("encode_graph (GCN)", enc_fn, params, state, graph)

    # phase 2: sGPN scoring (vmapped per image), no NMS
    def score_all(p, xo, su):
        return jax.vmap(lambda x, s: G.gpn_test_forward(
            p, x, s.obj_ind, s.att_mask, cfg).scores)(xo, su)
    sc_fn = jax.jit(score_all)
    scores, _ = timeit("sGPN scoring", sc_fn, params, x_obj, subs)

    # phase 3: NMS alone (vmapped per image)
    def nms_all(sc, su):
        return jax.vmap(lambda s, u: G.subgraph_nms(
            s, u.obj_ind, u.att_mask, u.valid, cfg, thres, keep))(sc, su)
    nms_fn = jax.jit(nms_all)
    (ki, kv), _ = timeit(f"subgraph_nms (keep {keep})", nms_fn, scores, subs)
    print(f"{'kept (img 0)':>36}: {int(np.asarray(kv[0]).sum())}")

    # phase 4: full encode (encoder + sGPN + NMS + gather + prepare)
    full_fn = jax.jit(lambda p, st, g, su: subgc.encode_images_batched(
        p, st, g, su, cfg, ecfg))
    enc, _ = timeit("full encode_images_batched", full_fn, params, state,
                    graph, subs)

    # phase 5: greedy decode of the flat kept set
    dec_fn = jax.jit(lambda p, f: greedy_mod.sample(p, f, cfg, ecfg).seq)
    _, ddt = timeit(f"greedy decode ({B * keep} rows)", dec_fn, params,
                    enc.feats)

    # phase 6: fused program (the bench's measured unit)
    infer = make_batched_infer_fn(cfg, ecfg)
    out, fdt = timeit("fused infer", infer, params, state, graph, subs, key)
    caps = B * keep
    print(f"{'captions/sec (compute, fused)':>36}: {caps / fdt:9.1f}")
    print(f"{'captions/sec (decode only)':>36}: {caps / ddt:9.1f}")


if __name__ == "__main__":
    main()
