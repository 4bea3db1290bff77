"""Break down batched-inference time on the real TPU chip.

Times encoder+sGPN+NMS vs beam decode vs the fused program vs the
host fetch, at Sub_GC_Kar dims.  Usage: python tools/profile_infer.py
[batch] [bucket] [beam].
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
    from subgc_tpu.decode import beam as beam_mod
    from subgc_tpu.eval.runner import make_batched_infer_fn
    from subgc_tpu.graph import SceneGraph, SubgraphSet
    from subgc_tpu.models import subgc
    from subgc_tpu.models.params import init_params

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    bucket = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    bsz = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    cfg = ModelConfig(vocab_size=9487)
    ecfg = EvalConfig(beam_size=bsz, gpn_nms_thres=0.75, gpn_max_subg=10)
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

    def timeit(name, fn, n=8):
        out = fn()
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(n):
            out = fn()
        jax.block_until_ready(out)
        dt = (time.time() - t0) / n
        print(f"{name:>28}: {dt * 1e3:9.2f} ms")
        return out, dt

    enc_fn = jax.jit(lambda: subgc.encode_images_batched(
        params, state, graph, subs, cfg, ecfg))
    enc, _ = timeit("encode+sGPN+NMS", enc_fn)

    bs_fn = jax.jit(lambda f: beam_mod.beam_search(params, f, cfg, ecfg))
    _, _ = timeit(f"beam-{bsz} decode ({B * 10} sg)", lambda: bs_fn(enc.feats))

    infer = make_batched_infer_fn(cfg, ecfg)
    out, dt = timeit("fused infer", lambda: infer(params, state, graph, subs,
                                                  key))
    t0 = time.time()
    jax.device_get(out)
    print(f"{'device_get':>28}: {(time.time() - t0) * 1e3:9.2f} ms")
    caps = B * 10
    print(f"{'captions/sec (compute)':>28}: {caps / dt:9.1f}")


if __name__ == "__main__":
    main()
