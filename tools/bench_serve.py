"""Serving throughput: concurrent HTTP clients vs the caption endpoint.

Measures end-to-end requests/sec (single-image requests) at a given client
concurrency, with and without cross-client coalescing, against a live
in-process server on the attached device:

    python tools/bench_serve.py --clients 16 --requests 64 --bucket 64

The no-coalescing baseline is batch_images=1 (every request is its own
padded dispatch, serialized behind the device); the coalesced run uses
batch_images=--batch with a --wait_ms fill window.  Run alone on the host —
the axon tunnel shares one CPU core.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_image(rng, i, cfg):
    n, k = 12, 16
    return {"id": i,
            "object_fmap": rng.rand(n, cfg.att_feat_size).tolist(),
            "object_dist": rng.rand(n, cfg.num_obj_classes).tolist(),
            "rel_ind": rng.randint(0, n, (k, 2)).tolist(),
            "pred_dist": rng.rand(k, cfg.num_rel_classes).tolist(),
            "subgraphs": [
                {"nodes": rng.choice(n, 3, replace=False).tolist(),
                 "rels": rng.choice(k, 2, replace=False).tolist()}
                for _ in range(8)]}


def run_load(port, images, clients, arrival_ms=0.0, seed=0):
    """Fire len(images) single-image requests from `clients` threads,
    return (elapsed_s, n_ok, latencies).  arrival_ms > 0 paces each
    client with exponential inter-request gaps of that mean (open-ish
    loop), modelling a given aggregate arrival rate."""
    def post(im):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/caption",
            json.dumps({"images": [im]}).encode(),
            {"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=600) as resp:
            return json.loads(resp.read())

    work = list(images)
    ok = [0]
    lats = []
    lock = threading.Lock()

    def worker(wi):
        r = np.random.RandomState(seed + wi)
        while True:
            with lock:
                if not work:
                    return
                im = work.pop()
            if arrival_ms > 0:
                time.sleep(r.exponential(arrival_ms / 1e3))
            t0 = time.perf_counter()
            out = post(im)
            lat = time.perf_counter() - t0
            assert out["results"][0]["captions"]
            with lock:
                ok[0] += 1
                lats.append(lat)

    threads = [threading.Thread(target=worker, args=(wi,))
               for wi in range(clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return time.perf_counter() - t0, ok[0], lats


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--clients", type=int, default=16)
    p.add_argument("--requests", type=int, default=64)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--wait_ms", type=float, default=5.0)
    p.add_argument("--bucket", type=int, default=64)
    p.add_argument("--beam_size", type=int, default=3)
    p.add_argument("--sweep", action="store_true",
                   help="arrival-rate sweep: fixed vs adaptive fill window "
                        "(VERDICT r2 item 9); prints req/s + mean latency "
                        "per (arrival_ms, policy) cell")
    args = p.parse_args()

    import jax
    from subgc_tpu.cli.serve import build_service, serve
    from subgc_tpu.config import EvalConfig, ModelConfig
    from subgc_tpu.models.params import init_params
    from subgc_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    cfg = ModelConfig()         # production dims
    params, state = init_params(jax.random.PRNGKey(0), cfg,
                                n_obj_names=cfg.num_obj_classes,
                                n_pred_names=cfg.num_rel_classes)
    ecfg = EvalConfig(beam_size=args.beam_size, gpn_nms_thres=0.75,
                      gpn_max_subg=10, max_subgraph_bucket=args.bucket)
    vocab = {str(i): f"w{i}" for i in range(1, cfg.vocab_size + 1)}
    rng = np.random.RandomState(0)
    images = [make_image(rng, i, cfg) for i in range(args.requests)]

    if args.sweep:
        run_sweep(args, params, state, cfg, ecfg, vocab, images)
        return

    results = {}
    for label, bi, wait in [("no_coalesce", 1, 0.0),
                            ("coalesce", args.batch, args.wait_ms)]:
        svc = build_service(params, state, cfg, ecfg, vocab,
                            batch_images=bi, microbatch_wait_ms=wait)
        httpd = serve(svc, port=0)
        port = httpd.server_address[1]
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        # warm up compile + tunnel (2 fetched executions)
        run_load(port, images[:2], 1)
        run_load(port, images[:2], 2)
        elapsed, n_ok, _ = run_load(port, images, args.clients)
        assert n_ok == args.requests
        results[label] = {"req_per_s": n_ok / elapsed,
                          "dispatches": svc.batcher.dispatch_count}
        print(f"{label}: {n_ok / elapsed:.1f} req/s "
              f"({svc.batcher.dispatch_count} dispatches)", file=sys.stderr)
        httpd.shutdown()

    speedup = results["coalesce"]["req_per_s"] / \
        results["no_coalesce"]["req_per_s"]
    print(json.dumps({"metric": "serving req/s (16 clients, beam "
                      f"{args.beam_size}, bucket {args.bucket})",
                      "coalesce": results["coalesce"],
                      "no_coalesce": results["no_coalesce"],
                      "speedup": round(speedup, 2)}))


def run_sweep(args, params, state, cfg, ecfg, vocab, images):
    from subgc_tpu.cli.serve import build_service, serve
    rows = []
    for adaptive in (False, True):
        svc = build_service(params, state, cfg, ecfg, vocab,
                            batch_images=args.batch,
                            microbatch_wait_ms=25.0,
                            adaptive_wait=adaptive)
        httpd = serve(svc, port=0)
        port = httpd.server_address[1]
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        run_load(port, images[:2], 1)
        run_load(port, images[:2], 2)
        for arrival_ms in (0.0, 50.0, 200.0, 800.0):
            d0 = svc.batcher.dispatch_count
            elapsed, n_ok, lats = run_load(port, images, args.clients,
                                           arrival_ms=arrival_ms,
                                           seed=int(arrival_ms))
            row = {"policy": "adaptive" if adaptive else "fixed25ms",
                   "client_arrival_ms": arrival_ms,
                   "req_per_s": round(n_ok / elapsed, 2),
                   "mean_latency_ms": round(1e3 * float(np.mean(lats)), 1),
                   "p90_latency_ms": round(
                       1e3 * float(np.percentile(lats, 90)), 1),
                   "dispatches": svc.batcher.dispatch_count - d0}
            rows.append(row)
            print(row, file=sys.stderr, flush=True)
        httpd.shutdown()
    print(json.dumps({"metric": "serving arrival-rate sweep "
                      f"({args.clients} clients, batch {args.batch})",
                      "rows": rows}))


if __name__ == "__main__":
    main()
