"""COCO->Flickr cross-dataset transfer, rehearsed end-to-end (VERDICT r4
item 5).

The reference finetunes its Flickr models from a COCO checkpoint: restore
with `optimistic_restore` and remap the token-embedding / logit rows through
`data/word_mapping.npy` (new vocab index -> old index or -1), then continue
training (`/root/reference/models/__init__.py:14-41`,
`misc/utils.py:202-221`).  These tests drive that full path through the
train CLI on two synthetic datasets with DIFFERENT vocabularies:

* exact-remap assertion: a zero-learning-rate finetune step leaves params
  untouched, so the saved checkpoint IS the restore output — mapped rows
  must equal the source rows bitwise, unmapped rows must stay fresh init
* learning assertion: a real finetune continues from the transferred
  weights and the loss keeps dropping
* converted-torch mirror: the same finetune started from a checkpoint DIR
  produced by tools/convert_torch_ckpt.py --pth/--infos/--out from an
  actual reference TopDownModel state_dict + infos pickle
"""
import json
import os
import pickle

import numpy as np
import pytest

from subgc_tpu.data.synthetic import generate_dataset
from subgc_tpu.train.checkpoint import load_pytree_npz


def _data_flags(man):
    return ["--input_json", man["input_json"],
            "--input_label_h5", man["input_label_h5"],
            "--sg_dir", man["sg_dir"], "--mask_dir", man["mask_dir"],
            "--obj_name_path", man["obj_name_path"],
            "--rel_name_path", man["rel_name_path"]]


@pytest.fixture(scope="module")
def corpora(tmp_path_factory):
    root = tmp_path_factory.mktemp("transfer")
    # the synthetic word list is shared and ordered, so a 48-word vocab is
    # an index-aligned subset of the 60-word one — the natural word_mapping
    # is identity on shared ids (like real COCO->Flickr overlap)
    coco = generate_dataset(str(root / "coco"), n_images=10, vocab_size=60,
                            seed=11)
    flickr = generate_dataset(str(root / "flickr"), n_images=10,
                              vocab_size=48, seed=13)
    return root, coco, flickr


@pytest.fixture(scope="module")
def coco_ckpt(corpora):
    from subgc_tpu.cli import train as train_cli
    root, coco, _ = corpora
    ckpt = str(root / "coco_run")
    train_cli.main(["Sub_GC_Kar", "--checkpoint_path", ckpt,
                    "--batch_size", "4", "--max_iters", "3",
                    "--save_checkpoint_every", "3", "--val_images_use", "2"]
                   + _data_flags(coco))
    return ckpt


@pytest.fixture(scope="module")
def word_mapping(corpora):
    root, _, _ = corpora
    # flickr vocab rows 0..40 map to the same coco ids; rows 41..48 are
    # pretend Flickr-only words (no source row -> fresh init)
    wm = np.arange(49)
    wm[41:] = -1
    path = str(root / "word_mapping.npy")
    np.save(path, wm)
    return path, wm


def _assert_remap(flickr_ckpt, src_params, wm):
    """Mapped embed/logit rows bitwise-equal the source; unmapped rows are
    fresh init (differ from any source row of the same index)."""
    got = load_pytree_npz(os.path.join(flickr_ckpt, "model.npz"))["params"]
    emb_new = np.asarray(got["decoder"]["embed"])
    emb_old = np.asarray(src_params["decoder"]["embed"])
    logit_w_new = np.asarray(got["decoder"]["logit"]["w"])
    logit_w_old = np.asarray(src_params["decoder"]["logit"]["w"])
    logit_b_new = np.asarray(got["decoder"]["logit"]["b"])
    logit_b_old = np.asarray(src_params["decoder"]["logit"]["b"])
    assert emb_new.shape[0] == 49 and emb_old.shape[0] == 61
    ok = wm >= 0
    idx = np.where(ok)[0]
    np.testing.assert_array_equal(emb_new[idx], emb_old[wm[idx]])
    np.testing.assert_array_equal(logit_w_new[:, idx], logit_w_old[:, wm[idx]])
    np.testing.assert_array_equal(logit_b_new[idx], logit_b_old[wm[idx]])
    for i in np.where(~ok)[0]:
        assert not np.allclose(emb_new[i], emb_old[i]), \
            f"unmapped row {i} was copied, not fresh"
    # non-vocab weights restore whole (optimistic path)
    np.testing.assert_array_equal(
        np.asarray(got["decoder"]["att_lstm"]["w_ih"]),
        np.asarray(src_params["decoder"]["att_lstm"]["w_ih"]))


def test_transfer_cli_exact_remap(corpora, coco_ckpt, word_mapping, ):
    """Zero-lr finetune step through the CLI: the checkpoint equals the
    word_mapping-remapped restore of the COCO weights."""
    from subgc_tpu.cli import train as train_cli
    root, _, flickr = corpora
    wm_path, wm = word_mapping
    ckpt = str(root / "flickr_lr0")
    train_cli.main(["Sub_GC_Kar", "--checkpoint_path", ckpt,
                    "--start_from", coco_ckpt, "--word_mapping", wm_path,
                    "--batch_size", "4", "--max_iters", "4",
                    "--learning_rate", "0.0",
                    "--save_checkpoint_every", "4", "--val_images_use", "2"]
                   + _data_flags(flickr))
    src = load_pytree_npz(os.path.join(coco_ckpt, "model.npz"))["params"]
    _assert_remap(ckpt, src, wm)
    infos = json.load(open(os.path.join(ckpt, "infos.json")))
    assert json.loads(infos["model_config"])["vocab_size"] == 48


def test_transfer_cli_finetune_learns(corpora, coco_ckpt, word_mapping):
    """Real finetune from the transferred weights: training continues on
    the new dataset and the loss keeps dropping."""
    from subgc_tpu.cli import train as train_cli
    root, _, flickr = corpora
    wm_path, _ = word_mapping
    ckpt = str(root / "flickr_ft")
    train_cli.main(["Sub_GC_Kar", "--checkpoint_path", ckpt,
                    "--start_from", coco_ckpt, "--word_mapping", wm_path,
                    "--batch_size", "4", "--max_iters", "23",
                    "--losses_log_every", "1",
                    "--save_checkpoint_every", "20", "--val_images_use", "2"]
                   + _data_flags(flickr))
    hist = json.load(open(os.path.join(ckpt, "histories.json")))
    losses = [hist["loss_history"][k]
              for k in sorted(hist["loss_history"], key=int)]
    assert len(losses) == 20          # iters 4..23 on the new dataset
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses
    infos = json.load(open(os.path.join(ckpt, "infos.json")))
    assert infos["iter"] == 23        # continued from the COCO iter count


def test_transfer_from_converted_torch_ckpt(corpora, word_mapping, tmp_path):
    """The shipped-checkpoint route: an actual reference TopDownModel
    state_dict + infos pickle -> tools/convert_torch_ckpt.py --pth/--infos/
    --out DIR -> train --start_from DIR --word_mapping (the exact
    docs/REALDATA.md step-1 + finetune sequence)."""
    torch = pytest.importorskip("torch")
    from argparse import Namespace

    from tools.convert_torch_ckpt import main as convert_main
    from subgc_tpu.cli import train as train_cli
    from .torch_ref import load_reference_models, make_ref_opt

    root, coco, flickr = corpora
    from subgc_tpu.config import ModelConfig
    cfg = ModelConfig(vocab_size=60)   # production dims, COCO-drill vocab
    ref_att, obj_path, pred_path = load_reference_models(
        tmp_path, n_obj_names=30, n_pred_names=10)
    opt = make_ref_opt(cfg, obj_path, pred_path, test_LSTM=0,
                       gpn_nms_thres=0.75, gpn_max_subg=4,
                       use_topk_sampling=0, topk_temp=0.6, the_k=3, sct=0)
    torch.manual_seed(7)
    model = ref_att.TopDownModel(opt)
    pth = str(tmp_path / "model-500.pth")
    torch.save(model.state_dict(), pth)
    vocab = json.load(open(coco["input_json"]))["ix_to_word"]
    infos_pkl = str(tmp_path / "infos_topdown-500.pkl")
    with open(infos_pkl, "wb") as f:
        pickle.dump({"opt": Namespace(**vars(opt)), "vocab": vocab,
                     "iter": 500, "epoch": 2}, f)

    conv_dir = str(tmp_path / "converted")
    convert_main(["--pth", pth, "--infos", infos_pkl, "--out", conv_dir,
                  "--model_type", "Sub_GC_Kar"])
    infos = json.load(open(os.path.join(conv_dir, "infos.json")))
    assert infos["iter"] == 500
    assert json.loads(infos["model_config"])["vocab_size"] == 60

    wm_path, wm = word_mapping
    ckpt = str(tmp_path / "flickr_from_torch")
    train_cli.main(["Sub_GC_Kar", "--checkpoint_path", ckpt,
                    "--start_from", conv_dir, "--word_mapping", wm_path,
                    "--batch_size", "4", "--max_iters", "501",
                    "--learning_rate", "0.0",
                    "--save_checkpoint_every", "501",
                    "--val_images_use", "2"] + _data_flags(flickr))
    src = load_pytree_npz(os.path.join(conv_dir, "model.npz"))["params"]
    _assert_remap(ckpt, src, wm)
