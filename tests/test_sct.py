"""SCT (controllability) loader: region matching + sub-graph construction."""
import numpy as np
import jax
import pytest

from subgc_tpu.config import DataConfig, EvalConfig, ModelConfig
from subgc_tpu.data.sct import (SCTLoader, box_iou_single, greedy_subgraph,
                                match_region_sets)
from subgc_tpu.data.synthetic import generate_dataset
from subgc_tpu.eval.runner import run_test_split
from subgc_tpu.models.params import init_params


def test_box_iou_single():
    assert box_iou_single([0, 0, 10, 10], [0, 0, 10, 10]) == pytest.approx(1.0)
    assert box_iou_single([0, 0, 10, 10], [20, 20, 30, 30]) == 0.0


def test_match_region_sets_adaptive_fallback():
    sg_boxes = np.array([[0, 0, 10, 10], [100, 100, 120, 120]], float)
    # set 1: exact match; set 2: weak overlap -> adaptive; set 3: none -> all
    rs = np.zeros((3, 2, 5))
    rs[0, 0] = [0, 0, 10, 10, 1]
    rs[1, 0] = [8, 8, 30, 30, 1]
    rs[2, 0] = [500, 500, 510, 510, 1]
    out = match_region_sets(rs, sg_boxes)
    assert out[0].tolist() == [0]
    assert out[1].tolist() == [0]          # best (only) match kept adaptively
    assert out[2].tolist() == [0, 1]       # no overlap at all -> all nodes


def test_greedy_subgraph_expansion():
    object_cls = np.array([5, 5, 7, 9, 11])
    rel_ind = np.array([[0, 3], [2, 4]])
    obj_mask, rel_mask = greedy_subgraph(np.array([0]), object_cls, rel_ind)
    # seed 0 -> same-class node 1 -> neighbor 3 via rel 0
    assert obj_mask.tolist() == [1, 1, 0, 1, 0]
    assert rel_mask.tolist() == [1, 0]


def test_sct_end_to_end(tmp_path):
    manifest = generate_dataset(str(tmp_path / "d"), n_images=8, seed=11)
    mcfg = ModelConfig(vocab_size=manifest["vocab_size"], rnn_size=48,
                       input_encoding_size=32, att_hid_size=24, gcn_dim=32,
                       fc_feat_size=48, att_feat_size=manifest["feat_dim"],
                       embed_dim=16, num_obj_classes=manifest["n_obj_classes"],
                       num_rel_classes=manifest["n_rel_classes"])
    dcfg = DataConfig(input_json=manifest["input_json"],
                      input_label_h5=manifest["input_label_h5"],
                      sg_dir=manifest["sg_dir"], mask_dir=manifest["mask_dir"])

    # fabricate SCT region sets: 2 groups per image from the sg boxes
    import subgc_tpu.io.sg_npz as sgio
    base = SCTLoader.__mro__[1]  # EvalLoader for split info
    tmp_loader = base(mcfg, dcfg, bucket=8)
    sct_dict, img_wh = {}, {}
    rng = np.random.RandomState(0)
    for ix in tmp_loader.split_ix["test"]:
        img_id = tmp_loader.ds.images[ix]["id"]
        sg = tmp_loader.sg.get(img_id)
        boxes = np.asarray(sg["boxes"])
        img_wh[img_id] = (592, 592)
        rs = np.zeros((2, 3, 5))
        for g in range(2):
            n = rng.randint(1, 3)
            pick = rng.choice(boxes.shape[0], n, replace=False)
            rs[g, :n, :4] = boxes[pick]
            rs[g, :n, 4] = 1
        sct_dict[str(img_id)] = rs

    loader = SCTLoader(mcfg, dcfg, sct_dict, img_wh, use_greedy_subg=True,
                       bucket=8)
    ex = loader.example(0)
    assert ex.n_subgraphs == 2
    assert bool(ex.subs.valid[:2].all()) and not bool(ex.subs.valid[2:].any())

    params, state = init_params(jax.random.PRNGKey(0), mcfg,
                                n_obj_names=mcfg.num_obj_classes,
                                n_pred_names=mcfg.num_rel_classes)
    ecfg = EvalConfig(beam_size=2, sct=True, use_greedy_subg=True)
    preds, _, _ = run_test_split(params, state, loader, mcfg, ecfg,
                                 loader.vocab, verbose=False, batch_images=2)
    # SCT: captions stay in region-set order, one per group
    assert all(len(p["caption"]) == 2 for p in preds)
    np.testing.assert_array_equal(preds[0]["sorted_subgraph_ind"], [0, 1])
