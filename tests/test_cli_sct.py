"""SCT preset through the test CLI: ctl_captions artifact end-to-end."""
import json
import os

import numpy as np
import pytest

from subgc_tpu.data.synthetic import generate_dataset


def test_sct_cli(tmp_path):
    from subgc_tpu.cli import test as test_cli
    from subgc_tpu.cli import train as train_cli

    man = generate_dataset(str(tmp_path / "d"), n_images=10, seed=37)
    ckpt = str(tmp_path / "run")
    common = ["--input_json", man["input_json"],
              "--input_label_h5", man["input_label_h5"],
              "--sg_dir", man["sg_dir"], "--mask_dir", man["mask_dir"]]
    train_cli.main(["Sub_GC_Kar", "--checkpoint_path", ckpt,
                    "--batch_size", "4", "--max_iters", "2",
                    "--save_checkpoint_every", "2", "--val_images_use", "4",
                    "--obj_name_path", man["obj_name_path"],
                    "--rel_name_path", man["rel_name_path"]] + common)

    # fabricate SCT region sets from each test image's own boxes
    from subgc_tpu.config import DataConfig, ModelConfig
    from subgc_tpu.data.dataset import EvalLoader
    from subgc_tpu.io.sg_npz import SGDir
    mcfg = ModelConfig(vocab_size=man["vocab_size"],
                       num_obj_classes=man["n_obj_classes"],
                       num_rel_classes=man["n_rel_classes"],
                       att_feat_size=man["feat_dim"])
    dcfg = DataConfig(input_json=man["input_json"],
                      input_label_h5=man["input_label_h5"],
                      sg_dir=man["sg_dir"], mask_dir=man["mask_dir"])
    tmp_loader = EvalLoader(mcfg, dcfg, bucket=8)
    rng = np.random.RandomState(0)
    sct_dict, img_wh = {}, {}
    for ix in tmp_loader.split_ix["test"]:
        img_id = tmp_loader.ds.images[ix]["id"]
        boxes = np.asarray(tmp_loader.sg.get(img_id)["boxes"])
        img_wh[img_id] = (592, 592)
        rs = np.zeros((2, 2, 5))
        for g in range(2):
            pick = rng.choice(boxes.shape[0], 1)
            rs[g, 0, :4] = boxes[pick[0]]
            rs[g, 0, 4] = 1
        sct_dict[str(img_id)] = rs
    sct_path = str(tmp_path / "sct.npy")
    wh_path = str(tmp_path / "wh.npy")
    np.save(sct_path, sct_dict)
    np.save(wh_path, img_wh)

    test_cli.main(["Sub_GC_Flickr_CTL", "--checkpoint_path", ckpt,
                   "--bucket", "8", "--batch_images", "2",
                   "--sct_dict", sct_path, "--img_wh", wh_path] + common)
    ctl_path = os.path.join(ckpt, "ctl_captions_2.npy")
    assert os.path.exists(ctl_path)
    preds = np.load(ctl_path, allow_pickle=True).tolist()
    # one caption per region set, input order preserved
    assert all(len(p["caption"]) == 2 for p in preds)
