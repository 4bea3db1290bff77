"""bfloat16 compute path: runs end-to-end, stays close to f32."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from subgc_tpu.config import EvalConfig
from subgc_tpu.graph import SceneGraph, SubgraphSet, pad_subgraph_set, \
    subgraphs_from_masks, make_scene_graph
from subgc_tpu.models import subgc
from subgc_tpu.models.params import init_params
from subgc_tpu.decode import beam, greedy


def test_bf16_encode_decode_close_to_f32(tiny_cfg, rng_np):
    cfg32 = tiny_cfg
    cfg16 = tiny_cfg.replace(compute_dtype="bfloat16")
    params, state = init_params(jax.random.PRNGKey(0), cfg32,
                                n_obj_names=30, n_pred_names=10)
    g = make_scene_graph(rng_np.rand(10, 80).astype("f"),
                         rng_np.rand(10, 30).astype("f"),
                         rng_np.randint(0, 10, (12, 2)),
                         rng_np.rand(12, 10).astype("f"))
    g = SceneGraph(*map(jnp.asarray, g))
    subs = pad_subgraph_set(subgraphs_from_masks(
        (rng_np.rand(6, 36) > 0.6).astype("f"),
        (rng_np.rand(6, 64) > 0.6).astype("f")), 8)
    subs = SubgraphSet(*map(jnp.asarray, subs))
    ecfg = EvalConfig(beam_size=2, gpn_max_subg=4)

    enc32 = subgc.encode_image(params, state, g, subs, cfg32, ecfg)
    enc16 = subgc.encode_image(params, state, g, subs, cfg16, ecfg)
    # scores close; keep decisions identical on this input
    np.testing.assert_allclose(np.asarray(enc16.scores),
                               np.asarray(enc32.scores), atol=2e-2)
    np.testing.assert_array_equal(np.asarray(enc16.keep_ind),
                                  np.asarray(enc32.keep_ind))

    out32 = beam.beam_search(params, enc32.feats, cfg32, ecfg)
    out16 = beam.beam_search(params, enc16.feats, cfg16, ecfg)
    # token agreement is high but not guaranteed bitwise — require > 80%
    agree = (np.asarray(out32.seq) == np.asarray(out16.seq)).mean()
    assert agree > 0.8, f"bf16 token agreement only {agree:.2f}"

    # bf16 gate streams (cfg.bf16_lstm_gates): c stays f32, gates in bf16
    cfg16g = cfg16.replace(bf16_lstm_gates=True)
    enc16g = subgc.encode_image(params, state, g, subs, cfg16g, ecfg)
    out16g = beam.beam_search(params, enc16g.feats, cfg16g, ecfg)
    agree_g = (np.asarray(out32.seq) == np.asarray(out16g.seq)).mean()
    assert agree_g > 0.8, f"bf16-gates token agreement only {agree_g:.2f}"
    gr = greedy.sample(params, enc16g.feats, cfg16g, ecfg)
    assert np.asarray(gr.seq).shape[1] == cfg16g.seq_length
