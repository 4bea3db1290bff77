"""Benchmark: Sub-GC caption decode throughput on one TPU chip.

Measures the flagship inference path at production dims (Sub_GC_Kar shapes,
beam=3 to match BASELINE.json's metric): per image, one jitted program runs
encoder + sGPN scoring of a 128-sub-graph bucket + NMS + beam-3 decode of the
10 kept sub-graphs.  Metric = decoded captions / second / chip.

Prints ONE JSON line.  A bare run (no BENCH_PRESET) measures ALL THREE
headline workloads and emits the kar record's fields at top level plus a
"records" array holding every preset's record, so the driver-captured
BENCH_r*.json is artifact-backed for all three numbers (VERDICT r4 item 7):
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
     "records": [{kar}, {mrnn}, {train}]}
BENCH_PRESET=kar|mrnn|train restores the single-preset behavior (that one
record printed alone, still with a singleton "records" list).

vs_baseline: the reference publishes no throughput number (SURVEY.md §6).
Baseline here = the reference PyTorch model measured on this host's CPU
(tools/bench_torch_ref.py, pinned in BASELINE_MEASURED below) scaled by a
conservative 30x CPU->V100-GPU factor.  Re-pin by running
`python tools/bench_torch_ref.py`.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

# captions/sec of the reference PyTorch model on this host CPU (beam 3,
# 10 decoded sub-graphs/image, Sub_GC_Kar dims) x30 GPU-estimate factor.
# Measured by tools/bench_torch_ref.py; see that file for provenance.
BASELINE_MEASURED_CPU = None   # filled by tools/bench_torch_ref.py -> baseline.json
_BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "tools", "torch_baseline.json")
GPU_EST_FACTOR = 30.0


def _bench_train():
    """train preset: the fused train step (fwd+bwd+adam) at production
    dims — returns one record in the same schema so the driver can capture
    the training number alongside the inference presets (VERDICT r2 item 6).
    Env: BENCH_BATCH (default 256, the measured single-chip sweet spot),
    BENCH_DTYPE (default bfloat16)."""
    import jax
    import jax.numpy as jnp

    from subgc_tpu.config import ModelConfig, TrainConfig
    from subgc_tpu.data.synthetic import synthetic_train_batch
    from subgc_tpu.models.params import init_params
    from subgc_tpu.train.optim import build_optimizer
    from subgc_tpu.train.step import init_train_state, make_train_step
    from subgc_tpu.utils.cache import enable_compilation_cache
    from subgc_tpu.utils.profiling import decode_flops_per_row
    enable_compilation_cache()

    # headline config (docs/PERF.md round 5): batch 256, bf16 compute +
    # bf16 gate streams + bf16 backward residuals, ss-inactive (hoisted
    # input projections) = 2,051 img/s.  Each knob has an env override
    # for A/B runs.
    B = int(os.environ.get("BENCH_BATCH", "256"))
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    gates = os.environ.get("BENCH_GATES",
                           "1" if dtype == "bfloat16" else "0") == "1"
    resid = os.environ.get("BENCH_RESID", "1") == "1"
    ss_active = os.environ.get("BENCH_SS", "0") == "1"
    cfg = ModelConfig(vocab_size=9487, compute_dtype=dtype,
                      bf16_lstm_gates=gates, bf16_residuals=resid)
    tcfg = TrainConfig(batch_size=B)
    params, mstate = init_params(jax.random.PRNGKey(0), cfg,
                                 n_obj_names=cfg.num_obj_classes,
                                 n_pred_names=cfg.num_rel_classes)
    optimizer = build_optimizer(tcfg)
    ts = init_train_state(params, mstate, optimizer)
    step = make_train_step(cfg, tcfg, optimizer, ss_active=ss_active)

    S = B * 5
    batch = synthetic_train_batch(cfg, B)
    key = jax.random.PRNGKey(2)
    zero_e, zero_s = jnp.zeros((), jnp.int32), jnp.zeros(())

    # warm up with a fetched execution (tunnel one-time work)
    for _ in range(2):
        ts, m = step(ts, batch, key, zero_e, zero_s)
        np.asarray(m["loss"])
    n_steps = 20
    t0 = time.time()
    for _ in range(n_steps):
        ts, m = step(ts, batch, key, zero_e, zero_s)
    jax.block_until_ready(m["loss"])
    wall = time.time() - t0
    img_s = B * n_steps / wall

    # decode-scan FLOPs dominate; fwd ~1x + bwd ~2x (see docs/PERF.md)
    flops_step = 3 * S * (cfg.seq_length + 1) * decode_flops_per_row(cfg)
    tflops = flops_step * n_steps / wall / 1e12
    dt_tag = dtype + ("+bf16gates" if gates else "") + \
        ("+bf16resid" if resid else "") + \
        ("" if ss_active else ", ss-hoisted")
    return {
        "metric": f"train images/sec/chip (batch {B}, fwd+bwd+adam, "
                  f"{dt_tag})",
        "value": round(img_s, 2),
        "unit": "images/sec",
        "step_ms": round(wall / n_steps * 1e3, 2),
        "vs_baseline": None,
        "model_tflops_per_sec": round(tflops, 3),
        "mfu_pct_of_bf16_peak": round(100 * tflops * 1e12 / 197e12, 2),
    }


def _bench_infer(preset):
    import jax
    import jax.numpy as jnp

    from subgc_tpu.config import EvalConfig, ModelConfig
    from subgc_tpu.eval.runner import make_batched_infer_fn
    from subgc_tpu.graph import SceneGraph, SubgraphSet
    from subgc_tpu.models.params import init_params

    if preset == "mrnn":
        # Sub_GC_MRNN: beam 1, NMS .55, up to 1000 decodes/image (test.sh:13)
        defaults = dict(images="64", bucket="1024", beam="1", batch="4",
                        nms=0.55, keep=1000)
    else:
        # Sub_GC_Kar at beam 3 (BASELINE.json metric).  batch 96 is the
        # single-chip sweet spot: 64 -> 15.2k, 96 -> 16.2k, 112+ falls off
        # an HBM cliff (8.4k at 112, 10.4k at 128) — docs/PERF.md
        defaults = dict(images="768", bucket="128", beam="3", batch="96",
                        nms=0.75, keep=10)
    n_images = int(os.environ.get("BENCH_IMAGES", defaults["images"]))
    bucket = int(os.environ.get("BENCH_BUCKET", defaults["bucket"]))
    beam = int(os.environ.get("BENCH_BEAM", defaults["beam"]))
    batch = int(os.environ.get("BENCH_BATCH", defaults["batch"]))
    # default = the fastest deployment config: bf16 compute + bf16 LSTM gate
    # streams (>80% token agreement vs f32, tests/test_bf16.py; fp32 runs at
    # 16.3k vs 19.8k caps/s — docs/PERF.md).  BENCH_DTYPE=float32 restores f32.
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")

    cfg = ModelConfig(vocab_size=9487, compute_dtype=dtype,
                      bf16_lstm_gates=os.environ.get(
                          "BENCH_BF16_GATES", "1" if dtype == "bfloat16"
                          else "0") == "1")
    ecfg = EvalConfig(beam_size=beam, gpn_nms_thres=defaults["nms"],
                      gpn_max_subg=defaults["keep"],
                      max_subgraph_bucket=bucket,
                      beam_chunk=int(os.environ.get("BENCH_BEAM_CHUNK",
                                                    "1024")))
    params, state = init_params(jax.random.PRNGKey(0), cfg,
                                n_obj_names=cfg.num_obj_classes,
                                n_pred_names=cfg.num_rel_classes)

    rng = np.random.RandomState(0)
    N, K = cfg.obj_num, cfg.rel_num

    def make_image():
        graph = SceneGraph(
            obj_fmap=rng.rand(1, N, cfg.att_feat_size).astype("f"),
            obj_dist=rng.rand(1, N, cfg.num_obj_classes).astype("f"),
            rel_ind=rng.randint(0, N - 1, (1, K, 2)).astype(np.int32),
            pred_dist=rng.rand(1, K, cfg.num_rel_classes).astype("f"))
        obj_ind = np.full((bucket, N), N - 1, np.int32)
        att_mask = np.zeros((bucket, N), np.float32)
        att_mask[:, 0] = 1
        for s in range(bucket):
            n = rng.randint(3, 12)
            obj_ind[s, :n] = rng.choice(N - 1, n, replace=False)
            att_mask[s] = 0
            att_mask[s, :n] = 1
        subs = SubgraphSet(obj_ind=obj_ind,
                           pred_ind=np.full((bucket, K), K - 1, np.int32),
                           att_mask=att_mask,
                           valid=np.ones((bucket,), bool))
        return graph, subs

    infer = make_batched_infer_fn(cfg, ecfg)

    def stack(images):
        gs, ss = zip(*images)
        g = SceneGraph(*[np.concatenate([getattr(x, f) for x in gs])
                         for f in SceneGraph._fields])
        s = SubgraphSet(*[np.stack([getattr(x, f) for x in ss])
                          for f in SubgraphSet._fields])
        return g, s

    put = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
    n_batches = max(1, n_images // batch)
    dev_batches = [tuple(map(put, stack([make_image() for _ in range(batch)])))
                   for _ in range(min(n_batches, 4))]
    key = jax.random.PRNGKey(0)

    # warmup: compile AND first real executions + fetch (the axon tunnel
    # defers substantial one-time work past block_until_ready; a fetched
    # round trip is the only reliable warm state)
    for _ in range(2):
        out = infer(params, state, *dev_batches[0], key)
        np.asarray(out["keep_valid"])

    t0 = time.time()
    total_caps = 0
    pend = []
    for i in range(n_batches):
        g, s = dev_batches[i % len(dev_batches)]
        pend.append(infer(params, state, g, s, key))
    for out in pend:
        total_caps += int(np.asarray(out["keep_valid"]).sum())
    wall = time.time() - t0
    cps = total_caps / wall

    baseline = None
    if preset == "kar" and os.path.exists(_BASELINE_FILE):
        # the pinned torch baseline measures this same workload (beam 3,
        # bucket 128, keep 10); other presets have no comparable pin
        with open(_BASELINE_FILE) as f:
            baseline = json.load(f).get("captions_per_sec_cpu")
    vs_cpu = cps / baseline if baseline else None
    vs_gpu_est = cps / (baseline * GPU_EST_FACTOR) if baseline else None

    # MFU against the chip's published bf16 matmul peak, from an ANALYTIC
    # decode FLOP count.  XLA's cost_analysis counts while-loop bodies ONCE,
    # so it undercounts the T-step decode scan by ~16x (round 2 reported
    # 4.49% MFU from that artifact; the real figure is ~7x higher).  The
    # count below is decode-only (per-row per-step matmul FLOPs x rows x
    # steps), excluding the encoder — conservative.  fp32 runs are rated
    # against the same bf16 peak (fp32 matmuls cannot exceed it).
    tflops, mfu = None, None
    try:
        from subgc_tpu.utils.profiling import decode_flops_per_row
        rows_per_cap = beam if beam > 1 else 1
        steps = cfg.seq_length
        flops_per_cap = rows_per_cap * steps * decode_flops_per_row(cfg)
        tflops = flops_per_cap * cps / 1e12
        kind = jax.devices()[0].device_kind.lower()
        peaks = {"v5 lite": 197e12, "v5e": 197e12, "v5p": 459e12,
                 "v4": 275e12, "v6": 918e12, "trillium": 918e12}
        peak = next((v for k, v in peaks.items() if k in kind), None)
        if peak:
            mfu = 100.0 * tflops * 1e12 / peak
    except Exception:
        pass

    dt_tag = dtype + ("+bf16gates" if cfg.bf16_lstm_gates else "")
    return {
        "metric": f"captions/sec/chip ({preset} preset: beam={beam}, "
                  f"bucket={bucket}, NMS keep {defaults['keep']}, {dt_tag})",
        "value": round(cps, 2),
        "unit": "captions/sec",
        # measured: reference PyTorch on THIS host's CPU (torch_baseline.json)
        "vs_torch_cpu_measured": round(vs_cpu, 2) if vs_cpu else None,
        # estimate: measured CPU ratio / 30x CPU->V100 factor (documented
        # guess — the reference publishes no GPU throughput, SURVEY.md §6)
        "vs_gpu_estimated_30x": round(vs_gpu_est, 2) if vs_gpu_est else None,
        "vs_baseline": round(vs_gpu_est, 2) if vs_gpu_est is not None else None,
        "model_tflops_per_sec": round(tflops, 3) if tflops else None,
        "mfu_pct_of_bf16_peak": round(mfu, 2) if mfu else None,
    }


def _run_preset(preset):
    return _bench_train() if preset == "train" else _bench_infer(preset)


def main():
    from subgc_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    preset = os.environ.get("BENCH_PRESET")
    if preset:
        presets = [preset]
    else:
        # bare run: all three headline workloads, kar (the BASELINE.json
        # metric) leading so its fields sit at top level of the one line
        presets = ["kar", "mrnn", "train"]
        # the per-preset tuning knobs are single-preset A/B levers; in a
        # bare (headline) run they would apply to all three presets at
        # once — e.g. BENCH_BATCH=256 meant for train pushes kar past its
        # documented HBM cliff — so drop them with a notice
        dropped = [k for k in ("BENCH_BATCH", "BENCH_BUCKET", "BENCH_BEAM",
                               "BENCH_IMAGES", "BENCH_DTYPE", "BENCH_GATES",
                               "BENCH_RESID", "BENCH_SS")
                   if os.environ.pop(k, None) is not None]
        if dropped:
            print(f"[bench] bare run measures the documented headline "
                  f"configs; ignoring {', '.join(dropped)} (set "
                  f"BENCH_PRESET to tune one preset)", file=sys.stderr)
    records = []
    for p in presets:
        rec = dict(_run_preset(p))
        rec["preset"] = p
        records.append(rec)
        # progress breadcrumb on stderr so a slow bare run is observable
        # without polluting the single-JSON-line stdout contract
        print(f"[bench] {p}: {rec['value']} {rec['unit']}", file=sys.stderr)
    out = dict(records[0])
    out["records"] = records
    print(json.dumps(out))


if __name__ == "__main__":
    main()
