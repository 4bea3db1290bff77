"""Serving endpoint: health check + caption request over real HTTP."""
import json
import threading
import urllib.request

import numpy as np
import jax
import pytest

from subgc_tpu.cli.serve import build_service, serve
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
