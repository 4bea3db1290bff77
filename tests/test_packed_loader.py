"""Packed-shard backend produces the same eval results as the npz backend."""
import json

import numpy as np
import jax
import pytest

from subgc_tpu.config import DataConfig, EvalConfig, ModelConfig
from subgc_tpu.data.dataset import EvalLoader
from subgc_tpu.data.packed import PackedSpec, pack_image, write_shard
from subgc_tpu.data.synthetic import generate_dataset
from subgc_tpu.eval.runner import run_test_split
from subgc_tpu.io.sg_npz import SGDir
from subgc_tpu.models.params import init_params


def test_packed_backend_matches_npz(tmp_path):
    man = generate_dataset(str(tmp_path / "d"), n_images=8, seed=29)
    spec = PackedSpec(feat_dim=man["feat_dim"],
                      n_obj_cls=man["n_obj_classes"],
                      n_rel_cls=man["n_rel_classes"], max_subg=16)
    sg = SGDir(man["sg_dir"])
    masks = SGDir(man["mask_dir"])
    images = json.load(open(man["input_json"]))["images"]
    recs = [pack_image(spec, img["id"], sg.get(img["id"]),
                       masks.get(img["id"])) for img in images]
    shard_path = str(tmp_path / "shard.bin")
    write_shard(shard_path, spec, recs)

    mcfg = ModelConfig(vocab_size=man["vocab_size"], rnn_size=48,
                       input_encoding_size=32, att_hid_size=24, gcn_dim=32,
                       fc_feat_size=48, att_feat_size=man["feat_dim"],
                       embed_dim=16, num_obj_classes=man["n_obj_classes"],
                       num_rel_classes=man["n_rel_classes"])
    base = dict(input_json=man["input_json"],
                input_label_h5=man["input_label_h5"])
    dcfg_npz = DataConfig(sg_dir=man["sg_dir"], mask_dir=man["mask_dir"],
                          **base)
    dcfg_packed = DataConfig(packed_path=shard_path, **base)
    params, state = init_params(jax.random.PRNGKey(0), mcfg,
                                n_obj_names=mcfg.num_obj_classes,
                                n_pred_names=mcfg.num_rel_classes)
    ecfg = EvalConfig(beam_size=2, gpn_nms_thres=0.75, gpn_max_subg=5)

    preds = {}
    for name, dcfg in [("npz", dcfg_npz), ("packed", dcfg_packed)]:
        loader = EvalLoader(mcfg, dcfg, bucket=32)
        p, _, _ = run_test_split(params, state, loader, mcfg, ecfg,
                                 loader.vocab, verbose=False, batch_images=4)
        preds[name] = p

    assert len(preds["npz"]) == len(preds["packed"])
    for a, b in zip(preds["npz"], preds["packed"]):
        assert a["image_id"] == b["image_id"]
        assert a["caption"] == b["caption"]
        np.testing.assert_allclose(a["subgraph_score"], b["subgraph_score"],
                                   rtol=1e-6)


def test_packed_train_batches_match_npz(tmp_path):
    """Fast left-packed gather path == npz _left_pack path, byte-identical
    (same seed drives the same sample_pos_neg RNG sequence)."""
    from subgc_tpu.config import TrainConfig
    from subgc_tpu.data.dataset import TrainLoader

    man = generate_dataset(str(tmp_path / "d"), n_images=8, seed=31)
    spec = PackedSpec(feat_dim=man["feat_dim"],
                      n_obj_cls=man["n_obj_classes"],
                      n_rel_cls=man["n_rel_classes"], max_subg=16)
    sg = SGDir(man["sg_dir"])
    masks = SGDir(man["mask_dir"])
    images = json.load(open(man["input_json"]))["images"]
    recs = [pack_image(spec, img["id"], sg.get(img["id"]),
                       masks.get(img["id"])) for img in images]
    shard_path = str(tmp_path / "shard.bin")
    write_shard(shard_path, spec, recs)

    mcfg = ModelConfig(vocab_size=man["vocab_size"], rnn_size=48,
                       input_encoding_size=32, att_hid_size=24, gcn_dim=32,
                       fc_feat_size=48, att_feat_size=man["feat_dim"],
                       embed_dim=16, num_obj_classes=man["n_obj_classes"],
                       num_rel_classes=man["n_rel_classes"])
    tcfg = TrainConfig(batch_size=4)
    base = dict(input_json=man["input_json"],
                input_label_h5=man["input_label_h5"])
    loaders = {
        "npz": TrainLoader(mcfg, tcfg, DataConfig(
            sg_dir=man["sg_dir"], mask_dir=man["mask_dir"], **base), seed=7),
        "packed": TrainLoader(mcfg, tcfg, DataConfig(
            packed_path=shard_path, **base), seed=7),
    }
    assert hasattr(loaders["packed"].masks, "get_fast")
    for _ in range(4):       # several batches incl. a wrap/reshuffle
        ba, ia, _ = loaders["npz"].get_batch("train")
        bb, ib, _ = loaders["packed"].get_batch("train")
        assert [x.id for x in ia] == [x.id for x in ib]
        for f in ba._fields:
            va, vb = getattr(ba, f), getattr(bb, f)
            if hasattr(va, "shape"):
                np.testing.assert_array_equal(np.asarray(va), np.asarray(vb),
                                              err_msg=f)
            else:
                for la, lb in zip(va, vb):
                    np.testing.assert_array_equal(np.asarray(la),
                                                  np.asarray(lb), err_msg=f)
