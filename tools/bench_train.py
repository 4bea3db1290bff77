"""Training-step throughput at production dims (Sub_GC_Kar).

Times the jitted data-parallel train step (forward+backward+adam) on the
real chip with synthetic device-resident batches (isolates device compute
from host input; tools/bench_input.py covers the host pipeline).
Usage: python tools/bench_train.py [batch_size]
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
    from subgc_tpu.models.params import init_params
    from subgc_tpu.train.optim import build_optimizer
    from subgc_tpu.train.step import TrainBatch, init_train_state, \
        make_train_step
    from subgc_tpu.graph import SceneGraph

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    # BENCH_GATES=1 adds the opt-in bf16 LSTM gate streams
    # (cli/train.py --bf16_lstm_gates) on top of the compute dtype
    cfg = ModelConfig(vocab_size=9487,
                      compute_dtype=os.environ.get("BENCH_DTYPE", "float32"),
                      bf16_lstm_gates=os.environ.get("BENCH_GATES") == "1")
    tcfg = TrainConfig(batch_size=B)
    params, mstate = init_params(jax.random.PRNGKey(0), cfg,
                                 n_obj_names=1599, n_pred_names=21)
    optimizer = build_optimizer(tcfg)
    ts = init_train_state(params, mstate, optimizer)
    # BENCH_SS=0 measures the ss-inactive program (hoisted input-gate
    # matmuls, the pre-scheduled-sampling-epoch shape of the hot loop)
    ss_active = os.environ.get("BENCH_SS", "1") != "0"
    step = make_train_step(cfg, tcfg, optimizer, ss_active=ss_active)

    rng = np.random.RandomState(0)
    N, K = cfg.obj_num, cfg.rel_num
    S, half = B * 5, 2
    graph = SceneGraph(
        obj_fmap=jnp.asarray(rng.rand(B, N, 2048), jnp.float32),
        obj_dist=jnp.asarray(rng.rand(B, N, 1599), jnp.float32),
        rel_ind=jnp.asarray(rng.randint(0, N - 1, (B, K, 2)), jnp.int32),
        pred_dist=jnp.asarray(rng.rand(B, K, 21), jnp.float32))
    soi = np.full((S, 2, half, N), N - 1, np.int32)
    sam = np.zeros((S, 2, half, N), np.float32)
    for s in range(S):
        for p in range(2):
            for h in range(half):
                n = rng.randint(3, 9)
                soi[s, p, h, :n] = rng.choice(N - 1, n, replace=False)
                sam[s, p, h, :n] = 1
    labels = np.zeros((S, 18), np.int64)
    labels[:, 1:13] = rng.randint(1, 9487, (S, 12))
    masks = np.zeros((S, 18), np.float32)
    masks[:, :14] = 1
    batch = TrainBatch(
        graph=graph, labels=jnp.asarray(labels, jnp.int32),
        masks=jnp.asarray(masks), sub_obj_ind=jnp.asarray(soi),
        sub_att_mask=jnp.asarray(sam),
        img_ix=jnp.asarray(np.repeat(np.arange(B, dtype=np.int32), 5)))

    key = jax.random.PRNGKey(1)
    ep = jnp.zeros((), jnp.int32)
    sp = jnp.zeros(())
    # warm (compile + first fetched execution)
    for _ in range(2):
        ts, m = step(ts, batch, key, ep, sp)
        float(m["loss"])

    n_steps = 20
    t0 = time.time()
    for _ in range(n_steps):
        ts, m = step(ts, batch, key, ep, sp)
    float(m["loss"])
    dt = (time.time() - t0) / n_steps
    print(f"train step (batch {B}, {S} sentences): {dt * 1e3:.1f} ms "
          f"-> {B / dt:.1f} images/s, {1.0 / dt:.2f} steps/s")


if __name__ == "__main__":
    main()
