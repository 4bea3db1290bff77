"""Caption-serving HTTP endpoint — `python -m subgc_tpu.cli.serve`.

Loads one or more checkpoints once, keeps the jitted batched inference
programs warm, and serves caption requests over stdlib HTTP (no
web-framework dependency):

    POST /caption
        {"images": [{"id": 1, "object_fmap": [[...]], "object_dist": [[...]],
                     "rel_ind": [[s,o]...], "pred_dist": [[...]],
                     "subgraphs": [{"nodes": [...], "rels": [...]}, ...]}],
         "model": "kar",            # optional; default = first checkpoint
         "dtype": "float32"}        # optional; default = --compute_dtype
    ->  {"results": [{"id": 1, "captions": [...], "scores": [...]}]}

    GET /healthz -> {"ok": true}
    GET /models  -> {"default": ..., "models": {name: {...}}}
    GET /stats   -> per-model/dtype request+image counts, recent-latency
                    percentiles, per-replica dispatch/queue-load counters

Requests batch onto the static image/bucket shapes (padded); concurrent
clients' images coalesce into shared TPU dispatches (utils/microbatch.py),
so a full batch costs the same as one padded image.  The sub-graph list is
optional — without it the server samples a bank on the fly with
data/subgraph_sampler.py.

Per-request dtype: params live in float32 on device; ``compute_dtype`` is a
static jit config, so each dtype is a separate compiled program with its own
micro-batch queue (requests of different dtypes cannot share a dispatch).
``bfloat16`` (+ bf16 LSTM gate streams) is the fast deployment path,
``float32`` the bitwise reference-parity mode (docs/PERF.md); the non-default
program compiles lazily on its first request.  Multiple ``--checkpoint_path``
flags serve several models behind one endpoint, routed by the request's
``model`` field — e.g. a COCO Karpathy-split captioner next to an M-RNN one.
``--replicas N`` places N copies of each model on the first N attached
devices and round-robins requests across them: each replica keeps its own
micro-batch queue, so the chips fill and run in parallel (throughput scales
with chips for single-model serving, where data-parallel sharding of one
dispatch would only shrink its batch).
``--shard_fanout N`` is the complementary LATENCY mode: ONE model copy whose
per-dispatch sub-graph fan-out rows shard across an N-device mesh
(eval/runner.py row-axis sharding) — a single image's keep-1000 decode
splits over the chips instead of queueing behind one.
"""
from __future__ import annotations

import argparse
import json
import os
import threading
import time
from collections import deque
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from ..utils.microbatch import QueueFull


class LatencyWindow:
    """Sliding window of recent request latencies (seconds) + lifetime
    counters; summarized by the /stats endpoint."""

    def __init__(self, size: int = 256):
        self._samples = deque(maxlen=size)
        self._lock = threading.Lock()
        self.requests = 0
        self.images = 0

    def record(self, seconds: float, n_images: int = 1):
        with self._lock:
            self._samples.append(seconds)
            self.requests += 1
            self.images += n_images

    def reset(self):
        """Drop samples and counters (used after warmup, whose first
        dispatch pays the compile / one-time setup and would otherwise
        poison the recent-latency percentiles)."""
        with self._lock:
            self._samples.clear()
            self.requests = 0
            self.images = 0

    def snapshot(self) -> tuple:
        """(requests, images, [samples]) under the lock."""
        with self._lock:
            return self.requests, self.images, list(self._samples)

    @staticmethod
    def summarize(samples) -> dict:
        s = sorted(samples)
        n = len(s)
        if not n:
            return {}
        return {"mean": round(1e3 * sum(s) / n, 2),
                "p50": round(1e3 * s[n // 2], 2),
                "p90": round(1e3 * s[min(n - 1, int(n * 0.9))], 2)}

    def summary(self) -> dict:
        requests, images, samples = self.snapshot()
        out = {"requests": requests, "images": images}
        lat = self.summarize(samples)
        if lat:
            out["latency_ms"] = lat
        return out


def parse_checkpoint_spec(spec: str) -> tuple:
    """Split a ``--checkpoint_path`` value into ``(name, path)``.

    Accepts ``NAME=dir`` but never mis-splits a plain path that contains
    ``'='`` (e.g. sweep dirs like ``/ckpts/lr=5e-4/run``): the prefix must
    look like a name (no path separator) and the whole spec must not itself
    be an existing directory.  A missing name defaults to the path's
    basename."""
    name, eq, rest = spec.partition("=")
    if eq and os.sep not in name and not os.path.isdir(spec):
        path = rest
    else:
        name, path = "", spec
    return name or os.path.basename(os.path.normpath(path)), path


def build_service(params, state, mcfg, ecfg, vocab, batch_images: int = 8,
                  microbatch_wait_ms: float = 3.0,
                  adaptive_wait: bool = False, device=None, mesh=None,
                  max_queue: int = 0):
    """Returns handle(images_payload) -> results list.

    Concurrent requests coalesce into shared device dispatches via
    MicroBatcher (the jitted program has a static batch axis, so a full
    batch costs the same as a padded single image).  handle.batcher is
    exposed for observability (dispatch_count).

    device: optional jax.Device to pin this service's params and dispatches
    to — the building block for multi-replica serving (one handle per chip;
    execution follows the committed params placement).

    mesh: optional jax.sharding.Mesh — ONE model copy whose sub-graph
    fan-out rows shard across the mesh (eval/runner.py row-axis sharding):
    the LATENCY scale-out, complementary to ``device`` replicas
    (throughput).  Params replicate; each dispatch's decode splits over
    all mesh devices.  Mutually exclusive with ``device``."""
    import jax
    import jax.numpy as jnp

    from ..data.subgraph_sampler import sample_subgraph_bank
    from ..eval.runner import make_batched_infer_fn
    from ..graph import (SceneGraph, SubgraphSet, make_scene_graph,
                         pad_subgraph_set, subgraphs_from_masks)
    from ..utils.microbatch import MicroBatcher
    from ..utils.text import decode_sequence

    if device is not None and mesh is not None:
        raise ValueError("device and mesh are mutually exclusive")
    infer = make_batched_infer_fn(mcfg, ecfg, mesh=mesh)
    if device is not None:
        params = jax.device_put(params, device)
        state = jax.device_put(state, device)
    elif mesh is not None:
        from ..parallel.mesh import replicate, replicated
        params = replicate(mesh, params)
        state = replicate(mesh, state)
        mesh_rep = replicated(mesh)     # hoisted: reused by every dispatch
    bucket = ecfg.max_subgraph_bucket

    def to_example(img):
        graph = make_scene_graph(
            np.asarray(img["object_fmap"], np.float32),
            np.asarray(img["object_dist"], np.float32),
            np.asarray(img["rel_ind"], np.int64),
            np.asarray(img["pred_dist"], np.float32),
            mcfg.obj_num, mcfg.rel_num)
        if img.get("subgraphs"):
            obj_masks = np.zeros((len(img["subgraphs"]), mcfg.obj_num - 1))
            pred_masks = np.zeros((len(img["subgraphs"]), mcfg.rel_num - 1))
            for i, sg in enumerate(img["subgraphs"]):
                obj_masks[i, np.asarray(sg["nodes"], int)] = 1
                pred_masks[i, np.asarray(sg.get("rels", []), int)] = 1
            subs = subgraphs_from_masks(obj_masks, pred_masks,
                                        mcfg.obj_num, mcfg.rel_num)
        else:
            n = np.asarray(img["object_fmap"]).shape[0]
            bank = sample_subgraph_bank(
                n, np.asarray(img["rel_ind"], np.int64),
                [np.arange(min(2, n))] * 5,
                n_samples=min(bucket - 5, 64))
            masks = bank["subgraph_mask_list"][5:]
            obj_masks = np.stack([m[1][:mcfg.obj_num - 1] for m in masks])
            pred_masks = np.stack([m[2][:mcfg.rel_num - 1] for m in masks])
            subs = subgraphs_from_masks(obj_masks, pred_masks,
                                        mcfg.obj_num, mcfg.rel_num)
        return graph, pad_subgraph_set(subs, bucket)

    def run_batch(examples):
        """examples: 1..batch_images (graph, subs) pairs -> per-example
        {'seq','scores','keep_valid'} dicts.  Padding slots repeat the last
        example and are discarded — per-image outputs are independent of
        batch composition (inference is vmapped per image)."""
        n_real = len(examples)
        examples = list(examples)
        while len(examples) < batch_images:
            examples.append(examples[-1])
        graph = SceneGraph(*[np.concatenate([g[0][i] for g in examples])
                             for i in range(4)])
        subs = SubgraphSet(*[np.stack([np.asarray(g[1][i]) for g in examples])
                             for i in range(4)])
        if device is not None:
            to_dev = lambda x: jax.device_put(x, device)
        elif mesh is not None:
            # inputs replicate; the jitted program shard-constrains the
            # flat decode-row axis over the mesh
            to_dev = lambda x: jax.device_put(jnp.asarray(x), mesh_rep)
        else:
            to_dev = jnp.asarray
        out = jax.device_get(infer(
            params, state,
            jax.tree_util.tree_map(to_dev, graph),
            jax.tree_util.tree_map(to_dev, subs),
            jax.random.PRNGKey(0)))
        return [{k: out[k][bi] for k in ("seq", "scores", "keep_valid")}
                for bi in range(n_real)]

    batcher = MicroBatcher(run_batch, max_batch=batch_images,
                           max_wait_ms=microbatch_wait_ms,
                           adaptive=adaptive_wait, max_queue=max_queue)

    latency = LatencyWindow()

    def handle(images):
        # one atomic submit: the batcher splits the items into
        # <=batch_images dispatches itself, other clients' images share
        # them, and with max_queue set admission is all-or-nothing (no
        # half-served request burns a dispatch before being shed)
        t0 = time.monotonic()
        outs = batcher.submit_many([to_example(img) for img in images])
        results = []
        for img, out in zip(images, outs):
            n = int(out["keep_valid"].sum())
            order = np.argsort(-out["scores"][:n], kind="stable")
            sents = decode_sequence(vocab, out["seq"][:n][order])
            results.append({"id": img.get("id", len(results)),
                            "captions": sents,
                            "scores": out["scores"][:n][order].tolist()})
        latency.record(time.monotonic() - t0, len(images))
        return results

    handle.batcher = batcher
    handle.latency = latency
    return handle


_DTYPES = ("float32", "bfloat16")


class _ReplicaSet:
    """Least-loaded dispatcher over per-device service handles.

    Each replica keeps its own MicroBatcher, so concurrent requests
    coalesce per chip and the chips run genuinely in parallel; a request's
    images all go to one replica (no cross-device split of a single
    request).  Routing picks the replica with the lowest instantaneous
    queue pressure (MicroBatcher.load), breaking ties round-robin so idle
    replicas interleave.  Exposes .batcher (first replica's, for the
    single-replica observability contract) and .handles."""

    def __init__(self, handles):
        self.handles = list(handles)
        self._next = 0
        self._lock = threading.Lock()

    @property
    def batcher(self):
        return self.handles[0].batcher

    def __call__(self, images):
        loads = [h.batcher.load() for h in self.handles]
        lo = min(loads)
        candidates = [i for i, l in enumerate(loads) if l == lo]
        with self._lock:
            i = candidates[self._next % len(candidates)]
            self._next += 1
        return self.handles[i](images)


class ModelService:
    """One loaded checkpoint servable under per-request compute dtype.

    Holds the float32 params once; builds one `build_service` handle per
    requested dtype (each a separate jitted program + MicroBatcher — static
    jit config, so cross-dtype requests cannot share a dispatch).  Handles
    are constructed eagerly for the default dtype but XLA compiles on first
    dispatch — call :meth:`warmup` (the CLI does, before opening the port)
    to pay the compile and the tunnel's one-time execution setup up front;
    the non-default dtype always compiles lazily on its first request.

    devices: optional list of jax.Device — one service replica per device
    (params copied to each), requests routed round-robin.  None = default
    placement, single replica (the single-chip behavior, unchanged).

    mesh: optional jax.sharding.Mesh — one model copy, each dispatch's
    sub-graph fan-out rows sharded across the mesh (latency scale-out);
    mutually exclusive with devices.
    """

    def __init__(self, params, state, mcfg, ecfg, vocab,
                 default_dtype: str = "bfloat16", batch_images: int = 8,
                 microbatch_wait_ms: float = 3.0,
                 adaptive_wait: bool = False, devices=None, mesh=None,
                 max_queue: int = 0):
        if default_dtype not in _DTYPES:
            raise ValueError(f"default_dtype must be one of {_DTYPES}")
        if devices is not None and len(devices) == 0:
            raise ValueError("devices must be None or non-empty")
        if devices is not None and mesh is not None:
            raise ValueError("devices (replicas) and mesh (fan-out "
                             "sharding) are mutually exclusive")
        self.mesh = mesh
        self.params, self.state, self.vocab = params, state, vocab
        # base config with dtype fields neutralized; variants derive from it
        self.mcfg = mcfg.replace(compute_dtype="float32",
                                 bf16_lstm_gates=False)
        self.ecfg = ecfg
        self.default_dtype = default_dtype
        self.devices = devices
        self._kw = dict(batch_images=batch_images,
                        microbatch_wait_ms=microbatch_wait_ms,
                        adaptive_wait=adaptive_wait, max_queue=max_queue)
        self._handles = {}
        self._placed = {}       # device -> (params, state), shared by dtypes
        self._lock = threading.Lock()
        self._handle(default_dtype)

    def _params_on(self, device):
        """Params/state committed to `device` ONCE — the per-dtype handles
        share the same float32 copy (casting happens in-jit), so a second
        dtype costs no extra HBM or transfer."""
        if device not in self._placed:
            import jax
            self._placed[device] = (jax.device_put(self.params, device),
                                    jax.device_put(self.state, device))
        return self._placed[device]

    def _handle(self, dtype: str):
        with self._lock:
            if dtype not in self._handles:
                # float32 is the advertised BITWISE reference-parity mode:
                # it also keeps the per-row attention layout (image-shared
                # attention is exact-token but float-reassociated)
                mcfg = self.mcfg.replace(
                    compute_dtype=dtype,
                    bf16_lstm_gates=dtype == "bfloat16",
                    share_att_images=dtype == "bfloat16")
                if self.devices is None:
                    self._handles[dtype] = build_service(
                        self.params, self.state, mcfg, self.ecfg,
                        self.vocab, mesh=self.mesh, **self._kw)
                else:
                    self._handles[dtype] = _ReplicaSet([
                        build_service(*self._params_on(d), mcfg,
                                      self.ecfg, self.vocab, device=d,
                                      **self._kw)
                        for d in self.devices])
            return self._handles[dtype]

    def __call__(self, images, dtype: str | None = None):
        dtype = dtype or self.default_dtype
        if dtype not in _DTYPES:
            raise ValueError(f"dtype must be one of {_DTYPES}, got {dtype!r}")
        return self._handle(dtype)(images)

    def warmup(self):
        """Run one dummy image through the default-dtype program (per
        replica) so the first real request doesn't pay the XLA compile
        (nor, on the axon tunnel, the minutes-long first-execution setup)."""
        mcfg, n, k = self.mcfg, 4, 3
        rng = np.random.RandomState(0)
        for _ in range(len(self.devices) if self.devices else 1):
            self([{"object_fmap": rng.rand(n, mcfg.att_feat_size),
                   "object_dist": rng.rand(n, mcfg.num_obj_classes),
                   "rel_ind": rng.randint(0, n, (k, 2)),
                   "pred_dist": rng.rand(k, mcfg.num_rel_classes),
                   "subgraphs": [{"nodes": [0, 1], "rels": [0]}]}])
        # warmup dispatches pay the compile / one-time setup — drop them
        # from /stats so the recent-latency window reflects real traffic
        h = self._handles[self.default_dtype]
        for r in (h.handles if isinstance(h, _ReplicaSet) else [h]):
            r.latency.reset()

    def describe(self) -> dict:
        return {"default_dtype": self.default_dtype,
                "compiled_dtypes": sorted(self._handles),
                "beam_size": self.ecfg.beam_size,
                "bucket": self.ecfg.max_subgraph_bucket,
                "vocab_size": self.mcfg.vocab_size,
                "replicas": len(self.devices) if self.devices else 1,
                "fanout_devices":
                    int(self.mesh.devices.size) if self.mesh else 1}

    def stats(self) -> dict:
        """Per-dtype serving counters for GET /stats: request/image counts,
        recent-latency percentiles, per-replica dispatch/item counts."""
        out = {}
        with self._lock:
            handles = dict(self._handles)
        for dtype, h in handles.items():
            reps = h.handles if isinstance(h, _ReplicaSet) else [h]
            d = {"replicas": [{"dispatches": r.batcher.dispatch_count,
                               "images": r.batcher.item_count,
                               "load": r.batcher.load(),
                               "shed": r.batcher.shed_count} for r in reps]}
            snaps = [r.latency.snapshot() for r in reps]
            d["requests"] = sum(s[0] for s in snaps)
            d["images"] = sum(s[1] for s in snaps)
            # one schema regardless of replica count: percentiles over the
            # merged recent-sample windows
            lat = LatencyWindow.summarize(
                [x for s in snaps for x in s[2]])
            if lat:
                d["latency_ms"] = lat
            out[dtype] = d
        return out


class ModelRegistry:
    """Several ModelServices behind one endpoint, routed by request
    `model`; the first registered model is the default."""

    def __init__(self):
        self.models: dict = {}
        self.default = None

    def add(self, name: str, service: ModelService):
        if name in self.models:
            raise ValueError(f"duplicate model name {name!r}")
        self.models[name] = service
        if self.default is None:
            self.default = name

    def __call__(self, images, model: str | None = None,
                 dtype: str | None = None):
        name = model or self.default
        if name not in self.models:
            raise ValueError(f"unknown model {name!r}; available: "
                             f"{sorted(self.models)}")
        return self.models[name](images, dtype=dtype)

    def describe(self) -> dict:
        return {"default": self.default,
                "models": {n: s.describe() for n, s in self.models.items()}}

    def stats(self) -> dict:
        return {n: s.stats() for n, s in self.models.items()}


class _Handler(BaseHTTPRequestHandler):
    service = None

    def log_message(self, *a):      # quiet
        pass

    def _reply(self, code, payload):
        blob = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(blob)))
        self.end_headers()
        self.wfile.write(blob)

    def do_GET(self):
        if self.path == "/healthz":
            self._reply(200, {"ok": True})
        elif self.path == "/models" and hasattr(self.service, "describe"):
            self._reply(200, self.service.describe())
        elif self.path == "/stats" and hasattr(self.service, "stats"):
            self._reply(200, self.service.stats())
        else:
            self._reply(404, {"error": "not found"})

    def do_POST(self):
        if self.path not in ("/caption", "/caption_stream"):
            self._reply(404, {"error": "not found"})
            return
        try:
            length = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(length))
            images = req["images"]
            if not isinstance(images, list):
                raise ValueError("images must be a list")
            chunk = 8
            if self.path == "/caption_stream":
                # chunk only shapes streaming granularity; /caption
                # ignores it (single dispatch), so don't 400 on it there
                raw_chunk = req.get("chunk", 8)
                if not isinstance(raw_chunk, int) or isinstance(
                        raw_chunk, bool) or raw_chunk < 1:
                    raise ValueError("chunk must be a positive integer")
                chunk = raw_chunk
            service = self.service
            if isinstance(service, (ModelRegistry, ModelService)):
                kw = {"dtype": req.get("dtype")}
                if kw["dtype"] is not None and kw["dtype"] not in _DTYPES:
                    raise ValueError(f"dtype must be one of {_DTYPES}")
                if isinstance(service, ModelRegistry):
                    kw["model"] = req.get("model")
                    name = kw["model"] or service.default
                    if name not in service.models:
                        raise ValueError(f"unknown model {name!r}; "
                                         f"available: "
                                         f"{sorted(service.models)}")
                call = lambda imgs: service(imgs, **kw)
            else:               # plain build_service handle
                for field in ("dtype", "model"):
                    if req.get(field) is not None:
                        raise ValueError(
                            f"per-request {field!r} requires a "
                            f"ModelService/ModelRegistry backend; this "
                            f"endpoint serves a single fixed model")
                call = service
            if self.path == "/caption":
                self._reply(200, {"results": call(images)})
                return
            # /caption_stream: compute the FIRST chunk before committing to
            # a 200 — overload (QueueFull) and first-dispatch failures shed
            # as proper status codes instead of a 200 + error trailer
            first = call(images[:chunk]) if images else []
        except QueueFull as e:
            self.send_response(429)
            self.send_header("Content-Type", "application/json")
            self.send_header("Retry-After", "1")
            blob = json.dumps({"error": str(e), "shed": True}).encode()
            self.send_header("Content-Length", str(len(blob)))
            self.end_headers()
            self.wfile.write(blob)
            return
        except (ValueError, KeyError, TypeError,
                json.JSONDecodeError) as e:
            # load-bearing request validation: every 400 above routes
            # through here (exercised by test_serve bad-request cases);
            # malformed image payloads surface from the service as
            # KeyError/ValueError too
            self._reply(400, {"error": repr(e)})
            return
        except Exception as e:
            # anything else is a server-side dispatch failure (device/
            # tunnel errors), not a client fault — 4xx would tell
            # well-behaved clients not to retry a perfectly valid request
            self._reply(500, {"error": repr(e)})
            return
        # /caption_stream: NDJSON, one result line per image, flushed per
        # chunk as its dispatch drains — a 1000-image M-RNN request starts
        # delivering after the first chunk instead of after the whole run.
        # Everything knowable up front (payload shape, chunk, model, dtype,
        # admission of the first chunk) was resolved above so bad requests
        # still get real status codes; only mid-decode failures downgrade
        # to the error trailer.  No Content-Length: the HTTP/1.0 stream
        # ends when the connection closes, after the {"done":...} trailer.
        self.send_response(200)
        self.send_header("Content-Type", "application/x-ndjson")
        self.end_headers()
        n = 0
        try:
            for r in first:
                self.wfile.write((json.dumps(r) + "\n").encode())
                n += 1
            self.wfile.flush()
            for i in range(chunk, len(images), chunk):
                for r in call(images[i:i + chunk]):
                    self.wfile.write((json.dumps(r) + "\n").encode())
                    n += 1
                self.wfile.flush()
            tail = {"done": True, "count": n}
        except Exception as e:      # headers already sent: error trailer
            tail = {"done": False, "count": n, "error": repr(e),
                    "shed": isinstance(e, QueueFull)}
        try:
            self.wfile.write((json.dumps(tail) + "\n").encode())
        except OSError:             # client hung up mid-stream: normal
            pass


def serve(service, host: str = "127.0.0.1", port: int = 8742):
    # per-server handler subclass: several serve() calls in one process
    # (tests, multi-port deployments) must not hijack each other's service
    # through the shared _Handler class attribute
    # staticmethod: a plain-function service stored as a class attribute
    # would otherwise bind as a method and receive the handler as `self`
    handler = type("_BoundHandler", (_Handler,),
                   {"service": staticmethod(service)})
    httpd = ThreadingHTTPServer((host, port), handler)
    return httpd


def load_registry(args) -> ModelRegistry:
    """Build the ModelRegistry from parsed CLI args: one ModelService per
    --checkpoint_path spec, configs from each checkpoint's infos.json
    (checkpoint-authoritative, like cli/test.py), optional device replicas."""
    import jax
    import jax.numpy as jnp

    from ..config import ModelConfig, build_configs, config_from_json
    from ..train import checkpoint as C
    from ..utils.cache import enable_compilation_cache
    enable_compilation_cache()

    devices = None
    if args.replicas > 1:
        avail = jax.devices()
        if args.replicas > len(avail):
            raise SystemExit(f"--replicas {args.replicas} > "
                             f"{len(avail)} attached devices")
        devices = avail[:args.replicas]
    mesh = None
    if getattr(args, "shard_fanout", 1) > 1:
        if devices is not None:
            raise SystemExit("--shard_fanout and --replicas > 1 are "
                             "mutually exclusive (latency vs throughput "
                             "scale-out)")
        avail = jax.devices()
        if args.shard_fanout > len(avail):
            raise SystemExit(f"--shard_fanout {args.shard_fanout} > "
                             f"{len(avail)} attached devices")
        from ..parallel.mesh import make_mesh
        mesh = make_mesh(n_data=args.shard_fanout)

    registry = ModelRegistry()
    for spec in args.checkpoint_path:
        name, path = parse_checkpoint_spec(spec)
        infos = json.load(open(f"{path}/infos.json"))
        _, ecfg, _ = build_configs(infos.get("model_type", args.model_type),
                                   mode="test")
        mcfg = config_from_json(ModelConfig, infos["model_config"])
        ecfg = ecfg.replace(max_subgraph_bucket=args.bucket)
        if args.beam_size:
            ecfg = ecfg.replace(beam_size=args.beam_size)
        blob = C.load_pytree_npz(f"{path}/model.npz")
        params = jax.tree_util.tree_map(jnp.asarray, blob["params"])
        state = jax.tree_util.tree_map(jnp.asarray, blob["state"])
        registry.add(name, ModelService(
            params, state, mcfg, ecfg, infos["vocab"],
            default_dtype=args.compute_dtype,
            batch_images=args.batch_images,
            microbatch_wait_ms=args.microbatch_wait_ms,
            adaptive_wait=args.adaptive_wait, devices=devices, mesh=mesh,
            max_queue=getattr(args, "max_queue", 0)))
    return registry


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("model_type", nargs="?", default="Sub_GC_Kar",
                   help="eval-preset fallback for checkpoints whose "
                        "infos.json predates the model_type field")
    p.add_argument("--checkpoint_path", type=str, required=True,
                   action="append",
                   help="checkpoint dir, or NAME=dir; repeatable — each "
                        "becomes a servable model routed by the request's "
                        "'model' field (first one is the default)")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8742)
    p.add_argument("--bucket", type=int, default=128)
    p.add_argument("--batch_images", type=int, default=8)
    p.add_argument("--beam_size", type=int, default=None)
    p.add_argument("--microbatch_wait_ms", type=float, default=3.0,
                   help="how long a dispatch waits for more requests to "
                        "coalesce before running under-full")
    p.add_argument("--adaptive_wait", action="store_true",
                   help="tune the fill window from the observed arrival "
                        "rate (microbatch_wait_ms becomes the cap): waits "
                        "just long enough for the batch to plausibly fill, "
                        "~zero when traffic is sparse")
    p.add_argument("--replicas", type=int, default=1,
                   help="serve N copies of each model, one per attached "
                        "device (jax.devices()[:N]), requests routed "
                        "round-robin — per-chip micro-batching, chips run "
                        "in parallel")
    p.add_argument("--shard_fanout", type=int, default=1,
                   help="shard each dispatch's sub-graph fan-out rows over "
                        "an N-device mesh (ONE model copy, latency mode); "
                        "mutually exclusive with --replicas > 1")
    p.add_argument("--max_queue", type=int, default=256,
                   help="overload protection: per-model-queue cap on queued"
                        " + in-flight images; a request that would exceed "
                        "it is shed with HTTP 429 + Retry-After instead of "
                        "growing every client's latency without bound.  "
                        "Must exceed the largest single request (bigger "
                        "ones always 429 — stream them in chunks instead). "
                        " 0 = unbounded (pre-r5 behavior)")
    p.add_argument("--compute_dtype", type=str, default="bfloat16",
                   choices=["float32", "bfloat16"],
                   help="serving compute dtype; bfloat16 (+ bf16 LSTM gate "
                        "streams) is the fastest deployment config "
                        "(docs/PERF.md), float32 restores bitwise-parity "
                        "decode")
    args = p.parse_args(argv)
    registry = load_registry(args)

    for name, svc in registry.models.items():
        print(f"warming {name} ({svc.default_dtype})...", flush=True)
        svc.warmup()

    httpd = serve(registry, args.host, args.port)
    parity = ("default outputs are NOT bitwise-reproducible vs "
              "float32/reference checkpoints; per-request "
              '{"dtype": "float32"} (or --compute_dtype float32) is the '
              "parity mode"
              if args.compute_dtype == "bfloat16" else "reference parity mode")
    print(f"serving {sorted(registry.models)} on "
          f"http://{args.host}:{args.port} "
          f"(default {registry.default}, bucket {args.bucket}, "
          f"default dtype={args.compute_dtype} — {parity})")
    httpd.serve_forever()


if __name__ == "__main__":
    main()
