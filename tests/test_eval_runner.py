"""Eval orchestration on synthetic data -> captions_*.npy artifact format."""
import numpy as np
import jax
import pytest

from subgc_tpu.config import DataConfig, EvalConfig, ModelConfig
from subgc_tpu.data.dataset import EvalLoader
from subgc_tpu.data.synthetic import generate_dataset
from subgc_tpu.eval.runner import run_test_split, save_predictions
from subgc_tpu.models.params import init_params


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("syntheval")
    return generate_dataset(str(root), n_images=10, seed=5)


@pytest.mark.parametrize("beam_size", [1, 2])
def test_run_test_split(synth, tmp_path, beam_size):
    mcfg = ModelConfig(vocab_size=synth["vocab_size"], rnn_size=48,
                       input_encoding_size=32, att_hid_size=24, gcn_dim=32,
                       fc_feat_size=48, att_feat_size=synth["feat_dim"],
                       embed_dim=16, num_obj_classes=synth["n_obj_classes"],
                       num_rel_classes=synth["n_rel_classes"])
    dcfg = DataConfig(input_json=synth["input_json"],
                      input_label_h5=synth["input_label_h5"],
                      sg_dir=synth["sg_dir"], mask_dir=synth["mask_dir"])
    ecfg = EvalConfig(beam_size=beam_size, gpn_nms_thres=0.75, gpn_max_subg=5)
    loader = EvalLoader(mcfg, dcfg, bucket=32)
    params, state = init_params(jax.random.PRNGKey(0), mcfg,
                                n_obj_names=mcfg.num_obj_classes,
                                n_pred_names=mcfg.num_rel_classes)

    preds, wall, n_caps = run_test_split(params, state, loader, mcfg, ecfg,
                                         loader.vocab, verbose=False)
    assert len(preds) == len(loader)
    for p in preds:
        assert set(p) == {"image_id", "caption", "subgraph_score",
                          "sorted_subgraph_ind"}
        assert 1 <= len(p["caption"]) <= 5
        # scores sorted descending (eval_utils.py:105-110)
        s = p["subgraph_score"]
        assert (np.diff(s) <= 1e-6).all()
        for c in p["caption"]:
            assert isinstance(c, str)

    path = save_predictions(preds, str(tmp_path), "1000")
    loaded = np.load(path, allow_pickle=True).tolist()
    assert loaded[0]["image_id"] == preds[0]["image_id"]
    assert loaded[0]["caption"] == preds[0]["caption"]

    # keep_tokens: the raw sGPN-ordered token ids re-render to exactly the
    # caption strings of the same decode (tools/metric_bounds.py relies on
    # this to score one decode through two vocab surfaces)
    from subgc_tpu.utils.text import decode_sequence
    preds_t, _, _ = run_test_split(params, state, loader, mcfg, ecfg,
                                   loader.vocab, verbose=False,
                                   keep_tokens=True)
    assert [p["caption"] for p in preds_t] == [p["caption"] for p in preds]
    for p in preds_t:
        assert decode_sequence(
            loader.vocab, p["tokens"],
            remove_bad_endings=ecfg.remove_bad_endings) == p["caption"]
