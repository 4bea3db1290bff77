"""Grounding pipeline end-to-end: decode w/ attention capture -> material
collection -> grounding_file.json -> FlickrGrdEval."""
import json

import numpy as np
import jax
import pytest

from subgc_tpu.config import DataConfig, EvalConfig, ModelConfig
from subgc_tpu.data.dataset import EvalLoader
from subgc_tpu.data.synthetic import generate_dataset
from subgc_tpu.eval.grounding import FlickrGrdEval, GroundingCollector
from subgc_tpu.eval.runner import run_test_split
from subgc_tpu.models.params import init_params


def test_grounding_collection_and_eval(tmp_path):
    manifest = generate_dataset(str(tmp_path / "d"), n_images=8, seed=21)
    mcfg = ModelConfig(vocab_size=manifest["vocab_size"], rnn_size=48,
                       input_encoding_size=32, att_hid_size=24, gcn_dim=32,
                       fc_feat_size=48, att_feat_size=manifest["feat_dim"],
                       embed_dim=16, num_obj_classes=manifest["n_obj_classes"],
                       num_rel_classes=manifest["n_rel_classes"])
    dcfg = DataConfig(input_json=manifest["input_json"],
                      input_label_h5=manifest["input_label_h5"],
                      sg_dir=manifest["sg_dir"], mask_dir=manifest["mask_dir"])
    loader = EvalLoader(mcfg, dcfg, bucket=32)
    params, state = init_params(jax.random.PRNGKey(2), mcfg,
                                n_obj_names=mcfg.num_obj_classes,
                                n_pred_names=mcfg.num_rel_classes)

    # word -> lemma -> detection-class tables over the synthetic vocab
    vocab_words = list(loader.vocab.values())
    wd_to_lemma = {w: w for w in vocab_words}
    # map the first 10 words to detection classes
    lemma_det_id = {w: i for i, w in enumerate(vocab_words[:10])}
    det_id_to_wd = {i: w for w, i in lemma_det_id.items()}
    img_wh = {}
    for pos in range(len(loader)):
        ix = loader.split_ix["test"][pos]
        img_wh[loader.ds.images[ix]["id"]] = (592, 592)

    collector = GroundingCollector(wd_to_lemma, lemma_det_id, det_id_to_wd,
                                   img_wh)
    ecfg = EvalConfig(beam_size=1, gpn_nms_thres=0.75, gpn_max_subg=5,
                      return_att=True)
    preds, _, _ = run_test_split(params, state, loader, mcfg, ecfg,
                                 loader.vocab, verbose=False,
                                 collect_grounding=collector, batch_images=4)
    assert len(collector.output) == len(preds)
    for img_id, entries in collector.output.items():
        assert len(entries) == 1
        e = entries[0]
        assert len(e["clss"]) == len(e["bbox"]) == len(e["idx_in_sent"])
        for b in e["bbox"]:
            assert len(b) == 4

    path = str(tmp_path / "grounding_file.json")
    collector.save(path)
    blob = json.load(open(path))
    assert blob["eval_mode"] == "gen"

    # fabricate reference annotations matching some collected classes and
    # run the evaluator end-to-end
    ref = []
    for img_id, entries in collector.output.items():
        e = entries[0]
        if not e["clss"]:
            continue
        ref.append({"image_id": int(img_id), "captions": [{
            "process_bnd_box": [[e["bbox"][0]]],
            "process_idx": [e["idx_in_sent"][0]],
            "process_clss": [e["clss"][0]],
            "tokens": ["a"] * (e["idx_in_sent"][0] + 1),
        }]})
    if ref:
        ev = FlickrGrdEval(ref, blob["results"])
        out = ev.grd_eval("all")
        # the first collected box IS the GT box -> that class grounds at 1.0
        assert out["recall_all"] > 0


def test_grd_eval_empty_reference():
    """An empty reference (e.g., a degenerate model emitted only empty
    captions, so the prepass produced no grounded classes) must score
    all-zero instead of dividing by zero."""
    ev = FlickrGrdEval([], {})
    for mode in ("all", "loc"):
        out = ev.grd_eval(mode)
        assert out == {f"precision_{mode}": 0.0, f"recall_{mode}": 0.0,
                       f"F1_{mode}": 0.0}
