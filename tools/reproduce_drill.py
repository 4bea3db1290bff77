"""Full-scale reproduce drill on synthetic data (VERDICT r2 item 8).

The real Sub-GC data is a blocked 100GB external download
(`/root/reference/DATA.md`, `pretrained/README.md:1-9`), so the paper
tables cannot be reproduced against real images yet.  This drill is the
dress rehearsal: it fabricates a COCO-SHAPED synthetic dataset at
production scale (default 1000 images, vocab 9487, 1599 object / 21
relation classes, 36 detections, 2048-d features), trains a short
checkpoint per model family on the TPU, then runs the FULL
`cli/reproduce.py` pipeline — test + language eval + oracle + consensus
rerank (Kar), diversity (M-RNN 1000-caption fan-out), controllability
(CTL), and the rerank-aware grounding two-pass (GRD) — end to end, and
records wall-clock per stage plus artifact checksums in
``<out>/drill_report.json``.

Run (TPU):  python tools/reproduce_drill.py --out /tmp/drill
Quick CI-sized check: --images 40 --train_iters 4 --mrnn_keep 50

Reference workflow being drilled: `/root/reference/README.md:46-115`
(the manual multi-stage eval this repo's cli/reproduce automates).
"""
from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from subgc_tpu.data.synthetic import generate_dataset


def _sha(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for blk in iter(lambda: f.read(1 << 20), b""):
            h.update(blk)
    return h.hexdigest()[:16]


class _Timer:
    def __init__(self):
        self.t = {}

    def __call__(self, name):
        timer = self

        class _Ctx:
            def __enter__(self):
                self.t0 = time.time()

            def __exit__(self, *exc):
                timer.t[name] = round(time.time() - self.t0, 2)
                print(f"[drill] {name}: {timer.t[name]:.1f}s", flush=True)

        return _Ctx()


def write_relative_tables(out, images, vocab_words):
    """The data/*.npy lookup tables the CLIs read relative to CWD
    (MRNN split routing, gvd grounding dicts, image sizes)."""
    os.makedirs(os.path.join(out, "data"), exist_ok=True)
    np.save(os.path.join(out, "data", "MRNN_split_dict.npy"),
            {img["id"]: img["split"] for img in images})
    np.save(os.path.join(out, "data", "gvd_all_dict.npy"),
            {"wd_to_lemma": {w: w for w in vocab_words},
             "lemma_det_id_dict": {w: i for i, w in enumerate(vocab_words)},
             "det_id_to_det_wd": {i: w for i, w in enumerate(vocab_words)}})
    np.save(os.path.join(out, "data", "flickr30k_img_wh.npy"),
            {img["id"]: (592, 592) for img in images})


def build_fixtures(out, man, loader, test_ids, vocab_words, rng):
    """Rerank/controllability/grounding side inputs at drill scale —
    the same fabrication recipe as tests/test_reproduce.py, sized up."""
    fx = {}
    # rerank: train annos + aligned global feats
    n_train, dim = 200, 128
    train_annos = [{"id": 50000 + i,
                    "sentences": [" ".join(vocab_words[rng.randint(
                        len(vocab_words))] for _ in range(8))
                        for _ in range(5)]}
                   for i in range(n_train)]
    fx["annos"] = os.path.join(out, "train_annos.json")
    json.dump(train_annos, open(fx["annos"], "w"))
    fx["feats"] = os.path.join(out, "feats.npz")
    np.savez(fx["feats"], train=rng.rand(n_train, dim).astype("f"),
             test=rng.rand(len(test_ids), dim).astype("f"))

    # controllability: 2 region sets per test image from its own boxes
    sct_dict, img_wh = {}, {}
    for img_id in test_ids:
        boxes = np.asarray(loader.sg.get(img_id)["boxes"])
        img_wh[img_id] = (592, 592)
        rs = np.zeros((2, 2, 5))
        for g in range(2):
            rs[g, 0, :4] = boxes[rng.choice(boxes.shape[0], 1)[0]]
            rs[g, 0, 4] = 1
        sct_dict[str(img_id)] = rs
    fx["sct"] = os.path.join(out, "sct.npy")
    np.save(fx["sct"], sct_dict)
    fx["wh"] = os.path.join(out, "wh.npy")
    np.save(fx["wh"], img_wh)
    fx["order"] = os.path.join(out, "order.npy")
    np.save(fx["order"], np.asarray(test_ids, dtype=object))
    gt_groups = [[" ".join(vocab_words[rng.randint(len(vocab_words))]
                           for _ in range(6))]
                 for _ in range(2 * len(test_ids))]
    fx["gt"] = os.path.join(out, "gt_groups.npy")
    np.save(fx["gt"], np.asarray(gt_groups, dtype=object))
    fx["glove"] = os.path.join(out, "nglove.npz")
    np.savez(fx["glove"], words=np.asarray(vocab_words, dtype=object),
             vecs=rng.rand(len(vocab_words), 32))
    return fx


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/drill")
    p.add_argument("--images", type=int, default=1000)
    p.add_argument("--train_iters", type=int, default=400,
                   help="enough for the learnable synthetic captions to "
                        "become non-degenerate (empty captions at <100 "
                        "iters zero out every downstream metric)")
    p.add_argument("--train_batch", type=int, default=16)
    p.add_argument("--compute_dtype", default="bfloat16")
    p.add_argument("--batch_images", type=int, default=16)
    p.add_argument("--bucket", type=int, default=64)
    p.add_argument("--n_subgraphs", type=int, default=16)
    p.add_argument("--mrnn_keep", type=int, default=200,
                   help="gpn_max_subg for the M-RNN fan-out stage "
                        "(paper config is 1000; 16 synthetic sub-graphs "
                        "bound what NMS can keep anyway)")
    args = p.parse_args(argv)

    out = os.path.abspath(args.out)
    os.makedirs(out, exist_ok=True)
    timer = _Timer()
    rng = np.random.RandomState(3)

    with timer("generate_dataset"):
        man = generate_dataset(
            os.path.join(out, "d"), n_images=args.images, vocab_size=9487,
            n_obj_classes=1599, n_rel_classes=21, max_obj=36, min_obj=36,
            max_rel=64, n_subgraphs=args.n_subgraphs, feat_dim=2048,
            seed=7, learnable=True)

    from subgc_tpu.cli import train as train_cli
    from subgc_tpu.config import DataConfig, ModelConfig
    from subgc_tpu.data.dataset import EvalLoader

    # data_flags: the dataset paths every CLI needs; name_flags: the GloVe
    # name tables the grounding prepass must omit (it fabricates classes)
    data_flags = ["--input_json", man["input_json"],
                  "--input_label_h5", man["input_label_h5"],
                  "--sg_dir", man["sg_dir"], "--mask_dir", man["mask_dir"]]
    name_flags = ["--obj_name_path", man["obj_name_path"],
                  "--rel_name_path", man["rel_name_path"]]
    common_data = data_flags + name_flags

    # the CLIs read data/*.npy lookup tables relative to CWD (the
    # reference's convention) — stage them and run from the drill dir
    blob = json.load(open(man["input_json"]))
    vocab_words = [blob["ix_to_word"][k]
                   for k in sorted(blob["ix_to_word"], key=int)]
    write_relative_tables(out, blob["images"], vocab_words)
    cwd = os.getcwd()
    os.chdir(out)
    try:
        # one short production-dim checkpoint per trained family; the
        # Flickr families evaluate the Kar checkpoint (same architecture —
        # the drill exercises the pipelines, not Flickr-specific weights)
        ckpts = {}
        for fam in ("Sub_GC_Kar", "Sub_GC_MRNN"):
            ckpt = os.path.join(out, f"run_{fam}")
            with timer(f"train_{fam}"):
                train_cli.main([fam, "--checkpoint_path", ckpt,
                                "--batch_size", str(args.train_batch),
                                "--max_iters", str(args.train_iters),
                                "--save_checkpoint_every",
                                str(args.train_iters),
                                "--val_images_use", "8",
                                "--compute_dtype", args.compute_dtype]
                               + common_data)
            ckpts[fam] = ckpt

        with timer("eval_loader"):
            mcfg = ModelConfig()  # production defaults match the dataset
            dcfg = DataConfig(input_json=man["input_json"],
                              input_label_h5=man["input_label_h5"],
                              sg_dir=man["sg_dir"], mask_dir=man["mask_dir"])
            loader = EvalLoader(mcfg, dcfg, bucket=args.bucket)
            test_ids = [loader.ds.images[ix]["id"]
                        for ix in loader.split_ix["test"]]

        with timer("fixtures"):
            fx = build_fixtures(out, man, loader, test_ids, vocab_words,
                                rng)

        # grounding reference needs a pre-pass (fabricate a reference whose
        # classes match what the collector emits on this data)
        from subgc_tpu.cli import test as test_cli
        grd_flags = ["--bucket", str(args.bucket),
                     "--batch_images", str(args.batch_images),
                     "--gpn_max_subg", "10"]
        with timer("grounding_prepass"):
            test_cli.main(["Sub_GC_Flickr_GRD", "--checkpoint_path",
                           ckpts["Sub_GC_Kar"], "--iter_tag", "pre"]
                          + grd_flags + data_flags)
        blob = json.load(open(os.path.join(ckpts["Sub_GC_Kar"],
                                           "grounding_file.json")))
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
        ref_path = os.path.join(out, "grd_ref.json")
        json.dump(ref, open(ref_path, "w"))

        manifest = {
            "data": {"input_json": man["input_json"],
                     "input_label_h5": man["input_label_h5"],
                     "sg_dir": man["sg_dir"], "mask_dir": man["mask_dir"]},
            "output": os.path.join(out, "out"),
            "models": {
                "Sub_GC_Kar": {
                    "checkpoint_path": ckpts["Sub_GC_Kar"], "oracle_num": 5,
                    "test_flags": ["--bucket", str(args.bucket),
                                   "--batch_images", str(args.batch_images)]},
                "Sub_GC_MRNN": {
                    "checkpoint_path": ckpts["Sub_GC_MRNN"],
                    "test_flags": ["--bucket", str(args.bucket),
                                   "--batch_images", "4",
                                   "--gpn_max_subg", str(args.mrnn_keep)]},
                "Sub_GC_Flickr_CTL": {
                    "checkpoint_path": ckpts["Sub_GC_Kar"],
                    "test_flags": ["--bucket", str(args.bucket),
                                   "--batch_images",
                                   str(args.batch_images)]},
                "Sub_GC_Flickr_GRD": {
                    "checkpoint_path": ckpts["Sub_GC_Kar"],
                    "test_flags": grd_flags},
            },
            "rerank": {"train_annos": fx["annos"], "feats": fx["feats"],
                       "top_k": 4},
            "diversity": {},
            "grounding": {"reference": ref_path},
            "controllability": {"sct_dict": fx["sct"], "img_wh": fx["wh"],
                                "order_list": fx["order"],
                                "gt_captions": fx["gt"],
                                "noun_glove": fx["glove"]},
        }
        man_path = os.path.join(out, "manifest.json")
        json.dump(manifest, open(man_path, "w"))

        from subgc_tpu.cli import reproduce
        with timer("reproduce_all_families"):
            summary = reproduce.main(["--manifest", man_path])
    finally:
        os.chdir(cwd)

    artifacts = {}
    for root, _, files in os.walk(os.path.join(out, "out")):
        for f in sorted(files):
            pth = os.path.join(root, f)
            artifacts[os.path.relpath(pth, out)] = _sha(pth)
    for fam, ck in ckpts.items():
        for f in ("model.npz", "infos.json", "captions_repro.npy",
                  "ctl_captions_repro.npy", "grounding_file.json",
                  "consensus_rerank_ind.npy",
                  "all_scores_repro_5-subgraph.npy"):
            pth = os.path.join(ck, f)
            if os.path.exists(pth):
                artifacts[os.path.relpath(pth, out)] = _sha(pth)

    report = {"config": vars(args), "timings_s": timer.t,
              "n_test_images": len(test_ids),
              "summary": summary, "artifact_sha256_16": artifacts}
    rep_path = os.path.join(out, "drill_report.json")
    json.dump(report, open(rep_path, "w"), indent=1, default=str)
    print(json.dumps({"metric": "reproduce drill wall-clock",
                      "timings_s": timer.t,
                      "total_s": round(sum(timer.t.values()), 1),
                      "report": rep_path}))
    return report


if __name__ == "__main__":
    main()
