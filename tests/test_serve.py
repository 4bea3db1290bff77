"""Serving endpoint: health check + caption request over real HTTP."""
import json
import threading
import urllib.request

import numpy as np
import jax
import pytest

from subgc_tpu.cli.serve import (ModelRegistry, ModelService, build_service,
                                 parse_checkpoint_spec, serve)
from subgc_tpu.config import EvalConfig, ModelConfig
from subgc_tpu.models.params import init_params


@pytest.fixture(scope="module")
def server():
    cfg = ModelConfig(vocab_size=30, rnn_size=48, input_encoding_size=32,
                      att_hid_size=24, gcn_dim=32, fc_feat_size=48,
                      att_feat_size=64, embed_dim=16, num_obj_classes=12,
                      num_rel_classes=6)
    params, state = init_params(jax.random.PRNGKey(0), cfg,
                                n_obj_names=12, n_pred_names=6)
    ecfg = EvalConfig(beam_size=2, gpn_nms_thres=0.75, gpn_max_subg=4,
                      max_subgraph_bucket=16)
    vocab = {str(i): f"w{i}" for i in range(1, 31)}
    service = build_service(params, state, cfg, ecfg, vocab, batch_images=2,
                            microbatch_wait_ms=100.0)
    httpd = serve(service, port=0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}", cfg, service
    httpd.shutdown()


def _post(url, payload):
    req = urllib.request.Request(url, json.dumps(payload).encode(),
                                 {"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=300) as resp:
        return json.loads(resp.read())


def test_parse_checkpoint_spec(tmp_path):
    # NAME=dir form
    assert parse_checkpoint_spec("kar=/ckpts/run1") == ("kar", "/ckpts/run1")
    # bare path -> basename becomes the name
    assert parse_checkpoint_spec("/ckpts/run1") == ("run1", "/ckpts/run1")
    assert parse_checkpoint_spec("/ckpts/run1/") == ("run1", "/ckpts/run1/")
    # '=' inside the path must not be treated as a name separator
    assert parse_checkpoint_spec("/ckpts/lr=5e-4/run") == \
        ("run", "/ckpts/lr=5e-4/run")
    assert parse_checkpoint_spec("m=/ckpts/lr=5e-4/run") == \
        ("m", "/ckpts/lr=5e-4/run")
    # a spec that IS an existing directory is always a bare path, even if
    # its own name contains '=' with no separator in the prefix
    d = tmp_path / "lr=5e-4"
    d.mkdir()
    assert parse_checkpoint_spec(str(d)) == ("lr=5e-4", str(d))


def test_healthz(server):
    base, _, _ = server
    with urllib.request.urlopen(base + "/healthz", timeout=60) as resp:
        assert json.loads(resp.read()) == {"ok": True}


def test_caption_request(server):
    base, cfg, _ = server
    rng = np.random.RandomState(0)
    n, k = 8, 10

    def image(i, with_subgraphs):
        img = {"id": i,
               "object_fmap": rng.rand(n, cfg.att_feat_size).tolist(),
               "object_dist": rng.rand(n, cfg.num_obj_classes).tolist(),
               "rel_ind": rng.randint(0, n, (k, 2)).tolist(),
               "pred_dist": rng.rand(k, cfg.num_rel_classes).tolist()}
        if with_subgraphs:
            img["subgraphs"] = [
                {"nodes": rng.choice(n, 3, replace=False).tolist(),
                 "rels": rng.choice(k, 2, replace=False).tolist()}
                for _ in range(5)]
        return img

    out = _post(base + "/caption",
                {"images": [image(7, True), image(8, False)]})
    results = out["results"]
    assert [r["id"] for r in results] == [7, 8]
    for r in results:
        assert len(r["captions"]) >= 1
        assert len(r["captions"]) == len(r["scores"])
        assert all(isinstance(c, str) for c in r["captions"])
        # ranked by score descending
        assert all(a >= b - 1e-6 for a, b in zip(r["scores"],
                                                 r["scores"][1:]))


def test_bad_request(server):
    base, _, _ = server
    req = urllib.request.Request(base + "/caption", b"{}",
                                 {"Content-Type": "application/json"})
    try:
        urllib.request.urlopen(req, timeout=60)
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_concurrent_requests_coalesce(server):
    """Two single-image requests fired together share one device dispatch
    and return the same captions as when sent alone."""
    base, cfg, service = server
    rng = np.random.RandomState(3)
    n, k = 8, 10

    def image(i):
        return {"id": i,
                "object_fmap": rng.rand(n, cfg.att_feat_size).tolist(),
                "object_dist": rng.rand(n, cfg.num_obj_classes).tolist(),
                "rel_ind": rng.randint(0, n, (k, 2)).tolist(),
                "pred_dist": rng.rand(k, cfg.num_rel_classes).tolist(),
                "subgraphs": [
                    {"nodes": rng.choice(n, 3, replace=False).tolist(),
                     "rels": rng.choice(k, 2, replace=False).tolist()}
                    for _ in range(4)]}

    imgs = [image(100), image(101)]
    # sequential reference answers (each its own dispatch)
    solo = [_post(base + "/caption", {"images": [im]})["results"][0]
            for im in imgs]

    before = service.batcher.dispatch_count
    out = [None, None]
    barrier = threading.Barrier(2)

    def fire(i):
        barrier.wait()
        out[i] = _post(base + "/caption", {"images": [imgs[i]]})["results"][0]

    ts = [threading.Thread(target=fire, args=(i,)) for i in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    # identical results regardless of batch composition
    for i in range(2):
        assert out[i]["captions"] == solo[i]["captions"]
        np.testing.assert_allclose(out[i]["scores"], solo[i]["scores"],
                                   rtol=1e-6)
    # the two concurrent requests rode one dispatch (100ms fill window)
    assert service.batcher.dispatch_count - before == 1


@pytest.fixture(scope="module")
def registry_server():
    """Two models behind one endpoint via ModelRegistry/ModelService —
    the multi-model + per-request-dtype serving surface."""
    cfg = ModelConfig(vocab_size=30, rnn_size=48, input_encoding_size=32,
                      att_hid_size=24, gcn_dim=32, fc_feat_size=48,
                      att_feat_size=64, embed_dim=16, num_obj_classes=12,
                      num_rel_classes=6)
    ecfg = EvalConfig(beam_size=2, gpn_nms_thres=0.75, gpn_max_subg=4,
                      max_subgraph_bucket=16)
    registry = ModelRegistry()
    for name, seed, tag in (("kar", 0, "k"), ("mrnn", 1, "m")):
        params, state = init_params(jax.random.PRNGKey(seed), cfg,
                                    n_obj_names=12, n_pred_names=6)
        vocab = {str(i): f"{tag}{i}" for i in range(1, 31)}
        registry.add(name, ModelService(
            params, state, cfg, ecfg, vocab, default_dtype="float32",
            batch_images=2, microbatch_wait_ms=20.0))
    httpd = serve(registry, port=0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{port}", cfg, registry
    httpd.shutdown()


def _image(cfg, rng, i):
    n, k = 8, 10
    return {"id": i,
            "object_fmap": rng.rand(n, cfg.att_feat_size).tolist(),
            "object_dist": rng.rand(n, cfg.num_obj_classes).tolist(),
            "rel_ind": rng.randint(0, n, (k, 2)).tolist(),
            "pred_dist": rng.rand(k, cfg.num_rel_classes).tolist(),
            "subgraphs": [
                {"nodes": rng.choice(n, 3, replace=False).tolist(),
                 "rels": rng.choice(k, 2, replace=False).tolist()}
                for _ in range(4)]}


def test_models_endpoint(registry_server):
    base, _, _ = registry_server
    with urllib.request.urlopen(base + "/models", timeout=60) as resp:
        desc = json.loads(resp.read())
    assert desc["default"] == "kar"
    assert set(desc["models"]) == {"kar", "mrnn"}
    assert desc["models"]["kar"]["default_dtype"] == "float32"
    assert desc["models"]["kar"]["compiled_dtypes"] == ["float32"]


def test_model_routing(registry_server):
    """Requests route to the named model; the default is the first one.
    The two models share architecture but differ in weights + vocab, so
    their captions come from disjoint word sets."""
    base, cfg, _ = registry_server
    img = _image(cfg, np.random.RandomState(5), 1)
    r_def = _post(base + "/caption", {"images": [img]})["results"][0]
    r_kar = _post(base + "/caption",
                  {"images": [img], "model": "kar"})["results"][0]
    r_mrnn = _post(base + "/caption",
                   {"images": [img], "model": "mrnn"})["results"][0]
    assert r_def["captions"] == r_kar["captions"]
    assert all(w.startswith("k") for c in r_kar["captions"]
               for w in c.split())
    assert all(w.startswith("m") for c in r_mrnn["captions"]
               for w in c.split())


def test_warmup_compiles_default_program(registry_server):
    """ModelService.warmup pushes one dummy image through the default-dtype
    program (the CLI calls it before opening the port so the first real
    request doesn't pay the compile)."""
    _, _, registry = registry_server
    svc = registry.models["mrnn"]
    handle = svc._handle(svc.default_dtype)
    before = handle.batcher.dispatch_count
    svc.warmup()
    assert handle.batcher.dispatch_count == before + 1


def test_unknown_model_is_400(registry_server):
    base, cfg, _ = registry_server
    img = _image(cfg, np.random.RandomState(6), 2)
    req = urllib.request.Request(
        base + "/caption",
        json.dumps({"images": [img], "model": "nope"}).encode(),
        {"Content-Type": "application/json"})
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=60)
    assert e.value.code == 400


def test_per_request_dtype(registry_server):
    """dtype=bfloat16 lazily compiles a second program for the model and
    serves from it; dtype=float32 keeps serving the default program.
    Invalid dtypes are a 400."""
    base, cfg, registry = registry_server
    img = _image(cfg, np.random.RandomState(7), 3)
    svc = registry.models["kar"]

    r32 = _post(base + "/caption",
                {"images": [img], "dtype": "float32"})["results"][0]
    assert list(svc._handles) == ["float32"]
    rbf = _post(base + "/caption",
                {"images": [img], "model": "kar",
                 "dtype": "bfloat16"})["results"][0]
    assert sorted(svc._handles) == ["bfloat16", "float32"]
    assert svc.describe()["compiled_dtypes"] == ["bfloat16", "float32"]
    # same image through both programs: both decode real captions from the
    # same vocab (numerics may legitimately differ between the dtypes)
    assert rbf["captions"] and r32["captions"]
    assert all(w.startswith("k") for c in rbf["captions"]
               for w in c.split())

    req = urllib.request.Request(
        base + "/caption",
        json.dumps({"images": [img], "dtype": "float16"}).encode(),
        {"Content-Type": "application/json"})
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=60)
    assert e.value.code == 400


def test_replicated_service():
    """devices=[d0, d1]: per-replica params placement, round-robin routing,
    identical results to the single-replica service, warmup touches every
    replica."""
    cfg = ModelConfig(vocab_size=30, rnn_size=48, input_encoding_size=32,
                      att_hid_size=24, gcn_dim=32, fc_feat_size=48,
                      att_feat_size=64, embed_dim=16, num_obj_classes=12,
                      num_rel_classes=6)
    params, state = init_params(jax.random.PRNGKey(0), cfg,
                                n_obj_names=12, n_pred_names=6)
    ecfg = EvalConfig(beam_size=2, gpn_nms_thres=0.75, gpn_max_subg=4,
                      max_subgraph_bucket=16)
    vocab = {str(i): f"w{i}" for i in range(1, 31)}
    devs = jax.devices()[:2]
    assert len(devs) == 2, "conftest provides 8 virtual devices"
    kw = dict(default_dtype="float32", batch_images=2,
              microbatch_wait_ms=5.0)
    rep = ModelService(params, state, cfg, ecfg, vocab, devices=devs, **kw)
    single = ModelService(params, state, cfg, ecfg, vocab, **kw)
    assert rep.describe()["replicas"] == 2
    assert single.describe()["replicas"] == 1

    rng = np.random.RandomState(11)
    imgs = [_image(cfg, rng, i) for i in range(4)]
    # each request round-robins to the next replica; results must not
    # depend on which replica served them
    got = [rep([img])[0] for img in imgs]
    want = [single([img])[0] for img in imgs]
    for g, w in zip(got, want):
        assert g["captions"] == w["captions"]
        np.testing.assert_allclose(g["scores"], w["scores"], rtol=1e-6)

    handles = rep._handle("float32").handles
    assert len(handles) == 2
    counts = [h.batcher.dispatch_count for h in handles]
    assert all(c >= 1 for c in counts), counts   # both replicas served

    # multi-replica stats keep the single-dict latency schema (merged
    # windows), never a per-replica list
    st = rep.stats()["float32"]
    assert st["requests"] == 4 and len(st["replicas"]) == 2
    assert isinstance(st["latency_ms"], dict) and st["latency_ms"]["p50"] > 0

    # warmup covers every replica, then resets the latency window so
    # compile-time samples never show up as served traffic in /stats
    before = [h.batcher.dispatch_count for h in handles]
    rep.warmup()
    after = [h.batcher.dispatch_count for h in handles]
    assert all(a >= b + 1 for a, b in zip(after, before)), (before, after)
    st = rep.stats()["float32"]
    assert st["requests"] == 0 and "latency_ms" not in st

    # per-device params are placed once and SHARED across dtype handles
    assert len(rep._placed) == 2
    rep._handle("bfloat16")
    assert len(rep._placed) == 2


def test_stats_endpoint(registry_server):
    """GET /stats reports request/image counts and latency percentiles per
    model and dtype after traffic."""
    base, cfg, registry = registry_server
    img = _image(cfg, np.random.RandomState(12), 9)
    _post(base + "/caption", {"images": [img], "model": "kar"})
    with urllib.request.urlopen(base + "/stats", timeout=60) as resp:
        stats = json.loads(resp.read())
    assert set(stats) == set(registry.models)
    kar = stats["kar"]["float32"]
    assert kar["requests"] >= 1 and kar["images"] >= 1
    assert "latency_ms" in kar and kar["latency_ms"]["p50"] > 0
    assert kar["replicas"][0]["dispatches"] >= 1
    assert kar["replicas"][0]["load"] == 0      # idle after the request


def test_least_loaded_routing():
    """_ReplicaSet routes to the replica with the lowest queue pressure;
    idle replicas interleave round-robin."""
    from subgc_tpu.cli.serve import _ReplicaSet

    class FakeBatcher:
        def __init__(self, load):
            self._load = load
            self.dispatch_count = self.item_count = 0

        def load(self):
            return self._load

    def handle(tag, batcher):
        h = lambda images: tag
        h.batcher = batcher
        return h

    busy, idle = FakeBatcher(8), FakeBatcher(0)
    rs = _ReplicaSet([handle("busy", busy), handle("idle", idle)])
    assert [rs([None]) for _ in range(3)] == ["idle"] * 3
    # equal load -> alternate
    idle._load = 8
    assert sorted({rs([None]), rs([None])}) == ["busy", "idle"]


def test_load_registry_from_checkpoint(tmp_path):
    """serve.main's checkpoint-loading path: a tiny on-disk checkpoint in
    the train CLI's format loads into a registry, serves a request, and
    honors the --bucket/--beam_size overrides."""
    from subgc_tpu.cli.serve import load_registry
    from subgc_tpu.config import ModelConfig, config_to_json
    from subgc_tpu.train import checkpoint as C

    cfg = ModelConfig(vocab_size=30, rnn_size=48, input_encoding_size=32,
                      att_hid_size=24, gcn_dim=32, fc_feat_size=48,
                      att_feat_size=64, embed_dim=16, num_obj_classes=12,
                      num_rel_classes=6)
    params, state = init_params(jax.random.PRNGKey(0), cfg,
                                n_obj_names=12, n_pred_names=6)
    ckpt = str(tmp_path / "srv_ckpt")
    C.save_checkpoint(ckpt, params, state, None,
                      infos={"iter": 1, "model_type": "Sub_GC_Kar",
                             "model_config": config_to_json(cfg),
                             "vocab": {str(i): f"w{i}"
                                       for i in range(1, 31)}},
                      histories={})

    import argparse as _ap
    ns = _ap.Namespace(model_type="Sub_GC_Kar",
                       checkpoint_path=[f"tiny={ckpt}"],
                       bucket=16, batch_images=2, beam_size=2,
                       microbatch_wait_ms=5.0, adaptive_wait=False,
                       compute_dtype="float32", replicas=1)
    registry = load_registry(ns)
    assert registry.default == "tiny"
    svc = registry.models["tiny"]
    assert svc.ecfg.max_subgraph_bucket == 16
    assert svc.ecfg.beam_size == 2
    svc.warmup()
    out = svc([_image(cfg, np.random.RandomState(3), 42)])
    assert out[0]["id"] == 42 and out[0]["captions"]

    # replica over-subscription is a clean SystemExit
    ns.replicas = 10**6
    with pytest.raises(SystemExit):
        load_registry(ns)


def test_fanout_sharded_service():
    """mesh=8-device: one model copy, dispatch rows sharded over the mesh
    (latency mode) — captions identical to the default single-device
    service; devices+mesh together is rejected."""
    from subgc_tpu.parallel import mesh as M

    cfg = ModelConfig(vocab_size=30, rnn_size=48, input_encoding_size=32,
                      att_hid_size=24, gcn_dim=32, fc_feat_size=48,
                      att_feat_size=64, embed_dim=16, num_obj_classes=12,
                      num_rel_classes=6)
    params, state = init_params(jax.random.PRNGKey(0), cfg,
                                n_obj_names=12, n_pred_names=6)
    ecfg = EvalConfig(beam_size=2, gpn_nms_thres=0.75, gpn_max_subg=4,
                      max_subgraph_bucket=16)
    vocab = {str(i): f"w{i}" for i in range(1, 31)}
    mesh = M.make_mesh()
    assert mesh.devices.size == 8
    kw = dict(default_dtype="float32", batch_images=2,
              microbatch_wait_ms=5.0)
    sharded = ModelService(params, state, cfg, ecfg, vocab, mesh=mesh, **kw)
    single = ModelService(params, state, cfg, ecfg, vocab, **kw)
    assert sharded.describe()["fanout_devices"] == 8
    assert sharded.describe()["replicas"] == 1
    assert single.describe()["fanout_devices"] == 1

    rng = np.random.RandomState(13)
    imgs = [_image(cfg, rng, i) for i in range(3)]
    got = [sharded([img])[0] for img in imgs]
    want = [single([img])[0] for img in imgs]
    for g, w in zip(got, want):
        assert g["captions"] == w["captions"]
        np.testing.assert_allclose(g["scores"], w["scores"], rtol=1e-6)

    with pytest.raises(ValueError, match="mutually exclusive"):
        ModelService(params, state, cfg, ecfg, vocab,
                     devices=jax.devices()[:2], mesh=mesh, **kw)


def test_caption_stream(server):
    """POST /caption_stream returns NDJSON: one result line per image (same
    content as /caption) + a done trailer with the count; results are
    delivered per chunk."""
    url, cfg, _ = server
    rng = np.random.RandomState(17)
    imgs = [_image(cfg, rng, i) for i in range(5)]
    want = _post(f"{url}/caption", {"images": imgs})["results"]

    req = urllib.request.Request(
        f"{url}/caption_stream",
        json.dumps({"images": imgs, "chunk": 2}).encode(),
        {"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=300) as resp:
        assert resp.headers["Content-Type"] == "application/x-ndjson"
        lines = [json.loads(l) for l in resp.read().splitlines()]
    assert lines[-1] == {"done": True, "count": 5}
    got = lines[:-1]
    assert len(got) == 5
    for g, w in zip(got, want):
        assert g["captions"] == w["captions"]
        np.testing.assert_allclose(g["scores"], w["scores"], rtol=1e-6)


def test_caption_stream_bad_request(server):
    """Everything knowable before decode (payload shape, chunk, dtype)
    gets a clean 400 — never a 200 with an error trailer."""
    url, cfg, _ = server
    rng = np.random.RandomState(19)
    img = _image(cfg, rng, 0)
    for payload in ({"wrong": 1},                       # no images
                    {"images": 42},                     # not a list
                    {"images": [img], "chunk": "four"},  # bad chunk
                    {"images": [img], "dtype": "fp8"}):  # bad dtype
        req = urllib.request.Request(
            f"{url}/caption_stream", json.dumps(payload).encode(),
            {"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(req, timeout=60)
            assert False, f"expected HTTP 400 for {payload}"
        except urllib.error.HTTPError as e:
            assert e.code == 400, payload


def test_backend_failure_is_500(server):
    """A server-side dispatch failure (device/tunnel error) must surface
    as 5xx, not 400 — 4xx tells well-behaved clients not to retry a
    perfectly valid request.  Validation errors stay 400."""
    import threading

    from subgc_tpu.cli.serve import serve

    def broken_service(images):
        raise RuntimeError("device tunnel exploded")

    httpd = serve(broken_service, port=0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        url, cfg, _ = server
        rng = np.random.RandomState(31)
        img = _image(cfg, rng, 0)
        for path in ("/caption", "/caption_stream"):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{path}",
                json.dumps({"images": [img]}).encode(),
                {"Content-Type": "application/json"})
            try:
                urllib.request.urlopen(req, timeout=60)
                assert False, f"expected HTTP 500 for {path}"
            except urllib.error.HTTPError as e:
                assert e.code == 500, (path, e.code)
    finally:
        httpd.shutdown()


def test_caption_chunk_ignored(server):
    """chunk only shapes /caption_stream granularity; /caption accepts and
    ignores it — even a malformed value must not 400 a valid request."""
    url, cfg, _ = server
    rng = np.random.RandomState(29)
    img = _image(cfg, rng, 0)
    for chunk in ("four", 2.5, 3):
        out = _post(f"{url}/caption", {"images": [img], "chunk": chunk})
        assert len(out["results"]) == 1


def test_plain_handle_rejects_per_request_fields(server):
    """A plain build_service handle serves one fixed model/dtype; requests
    carrying dtype/model get an explicit 400 (not a silent ignore) on both
    endpoints — per-request routing requires ModelService/ModelRegistry."""
    url, cfg, _ = server
    rng = np.random.RandomState(31)
    img = _image(cfg, rng, 0)
    for endpoint in ("/caption", "/caption_stream"):
        for payload in ({"images": [img], "dtype": "bfloat16"},
                        {"images": [img], "model": "kar"}):
            req = urllib.request.Request(
                f"{url}{endpoint}", json.dumps(payload).encode(),
                {"Content-Type": "application/json"})
            try:
                urllib.request.urlopen(req, timeout=60)
                assert False, f"expected 400 for {payload} on {endpoint}"
            except urllib.error.HTTPError as e:
                assert e.code == 400, (endpoint, payload)


def test_caption_stream_unknown_model_is_400(registry_server):
    """Unknown model on the streaming endpoint 400s BEFORE headers (same
    status semantics as /caption), not 200 + error trailer."""
    url, cfg, _ = registry_server
    rng = np.random.RandomState(23)
    payload = {"images": [_image(cfg, rng, 0)], "model": "nope"}
    req = urllib.request.Request(
        f"{url}/caption_stream", json.dumps(payload).encode(),
        {"Content-Type": "application/json"})
    try:
        urllib.request.urlopen(req, timeout=60)
        assert False, "expected HTTP 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_overload_sheds_with_429():
    """Serving overload protection: with a bounded queue, a burst beyond
    device throughput gets every request either served (200) or shed
    (429 + Retry-After) — never an unbounded queue.  Covers /caption and
    the pre-header path of /caption_stream."""
    import time as _time

    cfg = ModelConfig(vocab_size=30, rnn_size=48, input_encoding_size=32,
                      att_hid_size=24, gcn_dim=32, fc_feat_size=48,
                      att_feat_size=64, embed_dim=16, num_obj_classes=12,
                      num_rel_classes=6)
    params, state = init_params(jax.random.PRNGKey(0), cfg,
                                n_obj_names=12, n_pred_names=6)
    ecfg = EvalConfig(beam_size=1, gpn_nms_thres=0.75, gpn_max_subg=2,
                      max_subgraph_bucket=16)
    vocab = {str(i): f"w{i}" for i in range(1, 31)}
    service = build_service(params, state, cfg, ecfg, vocab,
                            batch_images=1, microbatch_wait_ms=1.0,
                            max_queue=2)
    # make each dispatch slow enough that a 12-request burst must overflow
    # the 2-item queue regardless of scheduler timing
    orig = service.batcher._run
    service.batcher._run = lambda xs: (_time.sleep(0.25), orig(xs))[1]
    httpd = serve(service, port=0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{port}"
        rng = np.random.RandomState(37)
        img = _image(cfg, rng, 0)
        # warm the jit outside the burst (first dispatch pays compile)
        _post(f"{url}/caption", {"images": [img]})

        codes, retry_after = [], []

        def fire(endpoint):
            req = urllib.request.Request(
                f"{url}{endpoint}", json.dumps({"images": [img]}).encode(),
                {"Content-Type": "application/json"})
            try:
                with urllib.request.urlopen(req, timeout=120) as resp:
                    codes.append(resp.getcode())
            except urllib.error.HTTPError as e:
                codes.append(e.code)
                if e.code == 429:
                    retry_after.append(e.headers.get("Retry-After"))
                    body = json.loads(e.read())
                    assert body.get("shed") is True

        ts = [threading.Thread(target=fire, args=(ep,))
              for ep in ["/caption"] * 8 + ["/caption_stream"] * 4]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert len(codes) == 12
        assert set(codes) <= {200, 429}, codes
        assert 200 in codes, "burst shed everything"
        assert 429 in codes, "nothing shed at 12 concurrent vs queue cap 2"
        assert all(r is not None for r in retry_after)
        # shed requests are visible in the batcher counters
        assert service.batcher.shed_count == codes.count(429)
        # the service still answers after the burst
        out = _post(f"{url}/caption", {"images": [img]})
        assert len(out["results"]) == 1
    finally:
        httpd.shutdown()
