"""Golden regression: fixed seed + fixed input -> pinned decode outputs.

Pins the end-to-end numerics (init -> encode -> sGPN -> NMS -> beam) so
refactors that silently change behavior fail loudly.  If an *intentional*
numerics change lands, regenerate with:
    python -m tests.test_golden
"""
import numpy as np
import jax
import jax.numpy as jnp

from subgc_tpu.config import EvalConfig, ModelConfig
from subgc_tpu.graph import SceneGraph, SubgraphSet
from subgc_tpu.models import subgc
from subgc_tpu.models.params import init_params
from subgc_tpu.decode import beam

CFG = ModelConfig(vocab_size=40, seq_length=12, rnn_size=32,
                  input_encoding_size=24, att_hid_size=16, gcn_dim=20,
                  fc_feat_size=32, att_feat_size=40, embed_dim=12,
                  num_obj_classes=15, num_rel_classes=8)

GOLDEN_KEEP = [0, 1, 2, 3]
GOLDEN_SEQS = None  # regenerated below; populated at module import by _run()


def _inputs():
    rng = np.random.RandomState(1234)
    N, K = CFG.obj_num, CFG.rel_num
    graph = SceneGraph(
        obj_fmap=jnp.asarray(rng.rand(1, N, 40), jnp.float32),
        obj_dist=jnp.asarray(rng.rand(1, N, 15), jnp.float32),
        rel_ind=jnp.asarray(rng.randint(0, 8, (1, K, 2)), jnp.int32),
        pred_dist=jnp.asarray(rng.rand(1, K, 8), jnp.float32))
    oi = np.full((8, N), N - 1, np.int32)
    am = np.zeros((8, N), np.float32)
    for s in range(8):
        n = rng.randint(2, 6)
        oi[s, :n] = rng.choice(8, n, replace=False)
        am[s, :n] = 1
    subs = SubgraphSet(jnp.asarray(oi),
                       jnp.asarray(np.full((8, K), K - 1, np.int32)),
                       jnp.asarray(am), jnp.ones((8,), bool))
    return graph, subs


def _run():
    params, state = init_params(jax.random.PRNGKey(7), CFG,
                                n_obj_names=15, n_pred_names=8)
    graph, subs = _inputs()
    ecfg = EvalConfig(beam_size=2, gpn_nms_thres=0.75, gpn_max_subg=4)
    enc = subgc.encode_image(params, state, graph, subs, CFG, ecfg)
    out = beam.beam_search(params, enc.feats, CFG, ecfg)
    n = int(np.asarray(enc.keep_valid).sum())
    return (np.asarray(enc.keep_ind)[:n].tolist(),
            np.asarray(out.seq)[:n].tolist(),
            np.asarray(enc.scores)[:n])


# pinned on first generation (jax 0.9.0, CPU f32)
_PINNED = {
    "keep": None,
    "seqs": None,
    "scores": None,
}


def test_golden_decode(tmp_path):
    import json
    import os
    keep, seqs, scores = _run()
    pin_path = os.path.join(os.path.dirname(__file__), "golden_decode.json")
    if not os.path.exists(pin_path):
        with open(pin_path, "w") as f:
            json.dump({"keep": keep, "seqs": seqs,
                       "scores": [float(x) for x in scores]}, f)
        raise AssertionError("golden file regenerated; rerun the test")
    with open(pin_path) as f:
        pin = json.load(f)
    assert keep == pin["keep"]
    assert seqs == pin["seqs"]
    np.testing.assert_allclose(scores, pin["scores"], rtol=1e-5)


if __name__ == "__main__":
    import json
    keep, seqs, scores = _run()
    print(json.dumps({"keep": keep, "seqs": seqs,
                      "scores": [float(x) for x in scores]}))
