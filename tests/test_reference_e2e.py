"""Full-pipeline parity: reference dataloader_test + model vs subgc_tpu.

Drives the reference's OWN eval data path (dataloaders/dataloader_test.py —
sub-graph enumeration, padding, 5-slot packing) and its model on the
synthetic dataset, then runs this framework's EvalLoader + batched runner
with the converted weights, and compares the per-image ranked captions and
sGPN scores.  This closes the loop the unit parity tests can't: the data
layer and orchestration must agree, not just the model math.
"""
import json
import os
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from subgc_tpu.config import DataConfig, EvalConfig, ModelConfig
from subgc_tpu.data.dataset import EvalLoader
from subgc_tpu.data.synthetic import generate_dataset
from subgc_tpu.eval.runner import run_test_split

from .torch_ref import load_reference_models, make_ref_opt, ref_model_to_params

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("refnames_e2e")
    return load_reference_models(tmp, n_obj_names=30, n_pred_names=10)


def test_reference_pipeline_parity(ref, tmp_path, monkeypatch):
    import torch
    # the reference's get_batch hardcodes the real data dims
    # (2048/1599/21, dataloader_test.py:191-195) and assumes exactly 36
    # detections per image — generate at real dims with a small decoder
    names_dir = tmp_path / "names1599"
    names_dir.mkdir()
    ref_att, obj_path, pred_path = load_reference_models(
        names_dir, n_obj_names=1599, n_pred_names=21)
    cfg = ModelConfig(vocab_size=60, rnn_size=64,
                      input_encoding_size=48, att_hid_size=32, gcn_dim=1024,
                      fc_feat_size=64, att_feat_size=2048, embed_dim=20,
                      num_obj_classes=1599, num_rel_classes=21)
    man = generate_dataset(str(tmp_path / "origin"), n_images=8, seed=51,
                           n_subgraphs=8, feat_dim=2048,
                           n_obj_classes=1599, n_rel_classes=21, min_obj=36)

    # the reference dataloader hardcodes data/COCO_* paths relative to CWD
    # (dataloader_test.py:70-76); build that layout with symlinks
    workdir = tmp_path / "refcwd"
    (workdir / "data").mkdir(parents=True)
    os.symlink(man["sg_dir"], workdir / "data" / "COCO_sg_output_64")
    os.symlink(man["mask_dir"],
               workdir / "data" / "COCO_graph_mask_1000_rm_duplicate")

    beam_size = 2
    opt = make_ref_opt(cfg, obj_path, pred_path, test_LSTM=1,
                       gpn_nms_thres=0.75, gpn_max_subg=4,
                       use_topk_sampling=0, topk_temp=0.6, the_k=3, sct=0)
    # dataloader_test opt surface (dataloader_test.py:56-100)
    opt.batch_size = 1
    opt.seq_per_img = 5
    opt.input_json = man["input_json"]
    opt.input_label_h5 = man["input_label_h5"].replace(
        os.path.basename(man["input_label_h5"]), "cocotalk_label.h5")
    # needs 'coco' in the h5 name for dataset routing (dataloader_test.py:72)
    os.symlink(man["input_label_h5"], workdir / "cocotalk_label.h5")
    opt.input_label_h5 = str(workdir / "cocotalk_label.h5")
    opt.use_MRNN_split = False
    opt.gpn_label_thres = 0.75
    opt.use_gt_subg = 0
    opt.obj_num = 37
    opt.rel_num = 65
    opt.num_workers = 0
    opt.train_only = 0

    torch.manual_seed(61)
    model = ref_att.TopDownModel(opt)
    model.eval()
    params, state = ref_model_to_params(model, cfg)

    monkeypatch.chdir(workdir)
    sys.path.insert(0, REF)
    # the reference calls the python-2-era iterator .next()
    # (dataloader_test.py:405-411); alias it on modern torch
    from torch.utils.data.dataloader import _SingleProcessDataLoaderIter
    _SingleProcessDataLoaderIter.next = _SingleProcessDataLoaderIter.__next__
    import importlib
    import dataloaders.dataloader_test as dlt
    importlib.reload(dlt)

    loader_ref = dlt.DataLoader(opt)
    loader_ref.reset_iterator("test")
    import misc.utils as ref_utils

    ref_results = {}
    eval_kwargs = {"beam_size": beam_size, "sample_max": 1}
    while True:
        data = loader_ref.get_batch("test")
        tmp = [data["fc_feats"], data["att_feats"], data["att_masks"],
               data["obj_dist"], data["rel_ind"], data["pred_dist"],
               data["gpn_obj_ind"], data["gpn_pred_ind"], data["gpn_pool_mtx"]]
        fc, att, am, od, ri, pd, goi, gpi, gpm = tmp
        with torch.no_grad():
            seqq, _, score, keep_ind = model(
                fc, att, am, None, od, None, ri, None, pd, goi, gpi, None,
                gpm, opt=eval_kwargs, mode="sample")
        sorted_score, sort_ind = torch.sort(score, descending=True)
        seq = seqq[sort_ind].data
        sents = ref_utils.decode_sequence(loader_ref.get_vocab(), seq)
        ref_results[data["infos"][0]["id"]] = (
            sents, sorted_score.numpy(),
            keep_ind[sort_ind].numpy().astype(np.int64))
        if data["bounds"]["wrapped"]:
            break

    # ---- subgc_tpu pipeline with the same weights
    dcfg = DataConfig(input_json=man["input_json"],
                      input_label_h5=man["input_label_h5"],
                      sg_dir=man["sg_dir"], mask_dir=man["mask_dir"])
    loader = EvalLoader(cfg, dcfg, bucket=16)
    ecfg = EvalConfig(beam_size=beam_size, gpn_nms_thres=0.75, gpn_max_subg=4)
    preds, _, _ = run_test_split(params, state, loader, cfg, ecfg,
                                 loader.vocab, verbose=False, batch_images=4)

    assert len(preds) == len(ref_results)
    for p in preds:
        sents_ref, scores_ref, keep_ref = ref_results[p["image_id"]]
        assert p["caption"] == sents_ref, p["image_id"]
        np.testing.assert_allclose(p["subgraph_score"], scores_ref,
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_array_equal(p["sorted_subgraph_ind"], keep_ref)
