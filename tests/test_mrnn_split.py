"""M-RNN split-dict routing (dataloader.py:104-115)."""
import numpy as np

from subgc_tpu.config import DataConfig, ModelConfig
from subgc_tpu.data.dataset import EvalLoader
from subgc_tpu.data.synthetic import generate_dataset


def test_mrnn_split_routing(tmp_path):
    man = generate_dataset(str(tmp_path / "d"), n_images=10, seed=33)
    import json
    images = json.load(open(man["input_json"]))["images"]
    # MRNN dict overrides the json splits; route ids cyclically; one image
    # gets an unknown tag -> restval -> train (train_only=0)
    tags = ["train", "val", "test"]
    split_dict = {img["id"]: tags[i % 3] for i, img in enumerate(images)}
    split_dict[images[0]["id"]] = "restval"
    dict_path = str(tmp_path / "MRNN_split_dict.npy")
    np.save(dict_path, split_dict)

    mcfg = ModelConfig(vocab_size=man["vocab_size"],
                       num_obj_classes=man["n_obj_classes"],
                       num_rel_classes=man["n_rel_classes"],
                       att_feat_size=man["feat_dim"])
    dcfg = DataConfig(input_json=man["input_json"],
                      input_label_h5=man["input_label_h5"],
                      sg_dir=man["sg_dir"], mask_dir=man["mask_dir"],
                      use_MRNN_split=True, mrnn_split_dict=dict_path)
    loader = EvalLoader(mcfg, dcfg, bucket=32)
    got = {s: set(loader.ds.images[ix]["id"] for ix in v)
           for s, v in loader.split_ix.items()}
    for i, img in enumerate(images):
        tag = split_dict[img["id"]]
        if tag == "restval":
            assert img["id"] in got["train"]
        else:
            assert img["id"] in got[tag]
