"""Paper-table orchestrator end-to-end on synthetic data.

One Sub_GC_Kar-trained checkpoint drives all four model-family pipelines
through cli/reproduce: language eval + consensus rerank (Kar), diversity
(MRNN), controllability (CTL), and the automated rerank-aware grounding
two-pass (GRD — the reference's manual move-the-file round trip,
misc/eval_utils.py:52-54).
"""
import json
import os

import numpy as np
import pytest

from subgc_tpu.data.synthetic import generate_dataset


@pytest.fixture(scope="module")
def pipeline_fixture(tmp_path_factory):
    from subgc_tpu.cli import train as train_cli
    from subgc_tpu.config import DataConfig, ModelConfig
    from subgc_tpu.data.dataset import EvalLoader

    tmp = tmp_path_factory.mktemp("repro")
    man = generate_dataset(str(tmp / "d"), n_images=10, seed=11)
    ckpt = str(tmp / "run")
    train_cli.main(["Sub_GC_Kar", "--checkpoint_path", ckpt,
                    "--batch_size", "4", "--max_iters", "2",
                    "--save_checkpoint_every", "2", "--val_images_use", "4",
                    "--obj_name_path", man["obj_name_path"],
                    "--rel_name_path", man["rel_name_path"],
                    "--input_json", man["input_json"],
                    "--input_label_h5", man["input_label_h5"],
                    "--sg_dir", man["sg_dir"],
                    "--mask_dir", man["mask_dir"]])

    mcfg = ModelConfig(vocab_size=man["vocab_size"],
                       num_obj_classes=man["n_obj_classes"],
                       num_rel_classes=man["n_rel_classes"],
                       att_feat_size=man["feat_dim"])
    dcfg = DataConfig(input_json=man["input_json"],
                      input_label_h5=man["input_label_h5"],
                      sg_dir=man["sg_dir"], mask_dir=man["mask_dir"])
    loader = EvalLoader(mcfg, dcfg, bucket=8)
    test_ids = [loader.ds.images[ix]["id"]
                for ix in loader.split_ix["test"]]
    vocab_words = list(loader.vocab.values())
    return dict(tmp=tmp, man=man, ckpt=ckpt, loader=loader,
                test_ids=test_ids, vocab_words=vocab_words)


def test_reproduce_all_families(pipeline_fixture, monkeypatch):
    fx = pipeline_fixture
    tmp, man, ckpt = fx["tmp"], fx["man"], fx["ckpt"]
    loader, test_ids = fx["loader"], fx["test_ids"]
    rng = np.random.RandomState(3)

    # ---- rerank fixtures: train annos + aligned global feats
    n_train, dim = 8, 48
    train_annos = [{"id": 5000 + i,
                    "sentences": [" ".join(fx["vocab_words"][rng.randint(
                        len(fx["vocab_words"]))] for _ in range(5))
                        for _ in range(3)]}
                   for i in range(n_train)]
    annos_path = str(tmp / "train_annos.json")
    json.dump(train_annos, open(annos_path, "w"))
    feats_path = str(tmp / "feats.npz")
    np.savez(feats_path, train=rng.rand(n_train, dim).astype("f"),
             test=rng.rand(len(test_ids), dim).astype("f"))

    # ---- controllability fixtures (region sets from each image's boxes)
    sct_dict, img_wh = {}, {}
    for img_id in test_ids:
        boxes = np.asarray(loader.sg.get(img_id)["boxes"])
        img_wh[img_id] = (592, 592)
        rs = np.zeros((2, 2, 5))
        for g in range(2):
            rs[g, 0, :4] = boxes[rng.choice(boxes.shape[0], 1)[0]]
            rs[g, 0, 4] = 1
        sct_dict[str(img_id)] = rs
    sct_path, wh_path = str(tmp / "sct.npy"), str(tmp / "wh.npy")
    np.save(sct_path, sct_dict)
    np.save(wh_path, img_wh)
    order_path = str(tmp / "order.npy")
    np.save(order_path, np.asarray(test_ids, dtype=object))
    gt_groups = [[" ".join(fx["vocab_words"][rng.randint(
        len(fx["vocab_words"]))] for _ in range(4))]
        for _ in range(2 * len(test_ids))]
    gt_path = str(tmp / "gt_groups.npy")
    np.save(gt_path, np.asarray(gt_groups, dtype=object))
    glove_path = str(tmp / "nglove.npz")
    np.savez(glove_path, words=np.asarray(fx["vocab_words"], dtype=object),
             vecs=rng.rand(len(fx["vocab_words"]), 16))

    # ---- grounding fixtures: gvd tables under CWD/data (the test CLI's
    # hardcoded relative path), then a pre-pass to fabricate a reference
    # whose classes match what the collector emits
    monkeypatch.chdir(tmp)
    os.makedirs("data", exist_ok=True)
    wd_to_lemma = {w: w for w in fx["vocab_words"]}
    lemma_det_id = {w: i for i, w in enumerate(fx["vocab_words"])}
    det_id_to_wd = {i: w for w, i in lemma_det_id.items()}
    np.save("data/gvd_all_dict.npy",
            {"wd_to_lemma": wd_to_lemma, "lemma_det_id_dict": lemma_det_id,
             "det_id_to_det_wd": det_id_to_wd})
    np.save("data/flickr30k_img_wh.npy", img_wh)
    # MRNN split routing for the Sub_GC_MRNN preset (DataConfig default path)
    np.save("data/MRNN_split_dict.npy",
            {img["id"]: img["split"] for img in loader.ds.images})

    from subgc_tpu.cli import test as test_cli
    common = ["--input_json", man["input_json"],
              "--input_label_h5", man["input_label_h5"],
              "--sg_dir", man["sg_dir"], "--mask_dir", man["mask_dir"]]
    grd_flags = ["--bucket", "8", "--batch_images", "2",
                 "--gpn_max_subg", "3"]
    test_cli.main(["Sub_GC_Flickr_GRD", "--checkpoint_path", ckpt,
                   "--iter_tag", "pre"] + grd_flags + common)
    blob = json.load(open(os.path.join(ckpt, "grounding_file.json")))
    ref = []
    for img_id, entries in blob["results"].items():
        e = entries[0]
        if not e["clss"]:
            continue
        ref.append({"image_id": int(img_id), "captions": [{
            "process_bnd_box": [[e["bbox"][0]]],
            "process_idx": [e["idx_in_sent"][0]],
            "process_clss": [e["clss"][0]],
            "tokens": ["a"] * (e["idx_in_sent"][0] + 1)}]})
    assert ref, "pre-pass produced no groundable classes"
    ref_path = str(tmp / "grd_ref.json")
    json.dump(ref, open(ref_path, "w"))

    # ---- the manifest
    manifest = {
        "data": {"input_json": man["input_json"],
                 "input_label_h5": man["input_label_h5"],
                 "sg_dir": man["sg_dir"], "mask_dir": man["mask_dir"]},
        "output": str(tmp / "out"),
        "models": {
            "Sub_GC_Kar": {"checkpoint_path": ckpt, "oracle_num": 2,
                           "test_flags": ["--bucket", "8", "--beam_size",
                                          "2", "--gpn_max_subg", "3",
                                          "--batch_images", "2"]},
            "Sub_GC_MRNN": {"checkpoint_path": ckpt,
                            "test_flags": ["--bucket", "8", "--gpn_max_subg",
                                           "4", "--batch_images", "2"]},
            "Sub_GC_Flickr_CTL": {"checkpoint_path": ckpt,
                                  "test_flags": ["--bucket", "8",
                                                 "--batch_images", "2"]},
            "Sub_GC_Flickr_GRD": {"checkpoint_path": ckpt,
                                  "test_flags": grd_flags},
        },
        "rerank": {"train_annos": annos_path, "feats": feats_path,
                   "top_k": 2},
        "diversity": {},
        "grounding": {"reference": ref_path},
        "controllability": {"sct_dict": sct_path, "img_wh": wh_path,
                            "order_list": order_path, "gt_captions": gt_path,
                            "noun_glove": glove_path},
    }
    man_path = str(tmp / "manifest.json")
    json.dump(manifest, open(man_path, "w"))

    from subgc_tpu.cli import reproduce
    summary = reproduce.main(["--manifest", man_path])

    kar = summary["Sub_GC_Kar"]
    assert "top1" in kar["language_eval"] and "oracle" in kar["language_eval"]
    assert kar["rerank"] == "reranked" or isinstance(kar["rerank"], dict)
    assert not str(kar.get("rerank", "")).startswith("FAILED")

    mrnn = summary["Sub_GC_MRNN"]
    assert "mBLEU4" in mrnn["diversity"] and "distinct" in mrnn["diversity"]

    ctl = summary["Sub_GC_Flickr_CTL"]
    assert "Bleu_1" in ctl["controllability"]
    assert "NounIoU" in ctl["controllability"]

    grd = summary["Sub_GC_Flickr_GRD"]
    assert "precision_all" in grd["grounding_sgpn"]
    assert "precision_all" in grd["grounding_rerank"]
    assert os.path.exists(str(tmp / "out" / "reproduce_summary.md"))
