"""Production-dim bf16 deployment-accuracy bound (VERDICT r3 item 4).

The round-3 bf16 accuracy bound (docs/PERF.md "End-to-end accuracy bound")
was measured at TEST dims on a 60-image synthetic corpus.  This tool
re-runs the same protocol at FULL Sub_GC_Kar production dims on the
1000-image reproduce-drill corpus (`tools/reproduce_drill.py` recipe):

1. generate the learnable synthetic dataset at production scale
   (1000 images, vocab 9487, 1599/21 classes, 36 detections, 2048-d
   features — the dims of the real COCO pipeline),
2. train Sub_GC_Kar for --train_iters in float32 (the "truth" weights),
3. evaluate the SAME trained weights on the 200-image test split under
   three compute configs — float32 (parity mode), bfloat16, and
   bfloat16 + bf16 LSTM gate streams (the bench/serving default) — at
   the Kar eval preset (beam 2, NMS 0.75, keep 10; test.sh:33-43),
4. report per-metric top-1 and oracle-5 table deltas
   (BLEU-1..4 / ROUGE / CIDEr / METEOR / SPICE), the top-1 caption flip
   rate, and the CIDEr oracle-pick flip rate, all vs float32.

Writes docs/bf16_bound_prod.json; envelopes are pinned in
tests/test_bf16.py::test_bf16_end_to_end_metric_bound (compact CI form).

Run (TPU, ~8 min):  python tools/bf16_bound_prod.py --out /tmp/bf16_prod
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _manifest(root):
    """Path manifest for an already-generated dataset under root (matches
    generate_dataset's layout)."""
    return {"root": root,
            "input_json": os.path.join(root, "talk.json"),
            "input_label_h5": os.path.join(root, "talk_label.h5"),
            "sg_dir": os.path.join(root, "sg_output_64"),
            "mask_dir": os.path.join(root, "graph_mask"),
            "obj_name_path": os.path.join(root, "object_names.npy"),
            "rel_name_path": os.path.join(root, "predicate_names.npy")}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/bf16_prod")
    p.add_argument("--images", type=int, default=1000)
    p.add_argument("--train_iters", type=int, default=400)
    p.add_argument("--train_batch", type=int, default=16)
    p.add_argument("--bucket", type=int, default=64)
    p.add_argument("--batch_images", type=int, default=16)
    p.add_argument("--oracle_num", type=int, default=5)
    p.add_argument("--json_out",
                   default=os.path.join(os.path.dirname(
                       os.path.dirname(os.path.abspath(__file__))),
                       "docs", "bf16_bound_prod.json"))
    p.add_argument("--reuse", action="store_true",
                   help="reuse an existing dataset + trained checkpoint "
                        "under --out (re-runs only the three evals)")
    args = p.parse_args(argv)

    out = os.path.abspath(args.out)
    os.makedirs(out, exist_ok=True)
    t_all = time.time()

    from subgc_tpu.data.synthetic import generate_dataset
    t0 = time.time()
    man = generate_dataset(
        os.path.join(out, "d"), n_images=args.images, vocab_size=9487,
        n_obj_classes=1599, n_rel_classes=21, max_obj=36, min_obj=36,
        max_rel=64, n_subgraphs=16, feat_dim=2048, seed=7, learnable=True) \
        if not (args.reuse and os.path.exists(os.path.join(out, "d"))) \
        else _manifest(os.path.join(out, "d"))
    print(f"[bf16_prod] dataset: {time.time() - t0:.1f}s", flush=True)

    import jax
    import jax.numpy as jnp

    from subgc_tpu.cli import train as train_cli
    from subgc_tpu.config import DataConfig, ModelConfig, build_configs
    from subgc_tpu.data.dataset import EvalLoader
    from subgc_tpu.eval.runner import run_test_split
    from subgc_tpu.eval.sentence import align_predictions, language_eval
    from subgc_tpu.train import checkpoint as C

    data_flags = ["--input_json", man["input_json"],
                  "--input_label_h5", man["input_label_h5"],
                  "--sg_dir", man["sg_dir"], "--mask_dir", man["mask_dir"],
                  "--obj_name_path", man["obj_name_path"],
                  "--rel_name_path", man["rel_name_path"]]
    ckpt = os.path.join(out, "run_kar_f32")
    t0 = time.time()
    if not (args.reuse and os.path.exists(os.path.join(ckpt, "model.npz"))):
        train_cli.main(["Sub_GC_Kar", "--checkpoint_path", ckpt,
                        "--batch_size", str(args.train_batch),
                        "--max_iters", str(args.train_iters),
                        "--save_checkpoint_every", str(args.train_iters),
                        "--val_images_use", "8",
                        "--compute_dtype", "float32"] + data_flags)
    print(f"[bf16_prod] train f32: {time.time() - t0:.1f}s", flush=True)

    blob = C.load_pytree_npz(os.path.join(ckpt, "model.npz"))
    params = jax.tree_util.tree_map(jnp.asarray, blob["params"])
    state = jax.tree_util.tree_map(jnp.asarray, blob["state"])

    mcfg0, ecfg, _ = build_configs("Sub_GC_Kar", mode="test")
    dcfg = DataConfig(input_json=man["input_json"],
                      input_label_h5=man["input_label_h5"],
                      sg_dir=man["sg_dir"], mask_dir=man["mask_dir"])

    configs = {
        "float32": mcfg0.replace(compute_dtype="float32"),
        "bfloat16": mcfg0.replace(compute_dtype="bfloat16"),
        "bf16_gates": mcfg0.replace(compute_dtype="bfloat16",
                                    bf16_lstm_gates=True),
    }

    results = {}
    for name, mc in configs.items():
        t0 = time.time()
        loader = EvalLoader(mc, dcfg, bucket=args.bucket)
        mc = mc.replace(vocab_size=loader.vocab_size,
                        seq_length=loader.seq_length)
        preds, wall, n_caps = run_test_split(
            params, state, loader, mc, ecfg, loader.vocab, verbose=False,
            batch_images=args.batch_images)
        gts = {}
        for pos in range(len(loader.split_ix["test"])):
            ix = loader.split_ix["test"][pos]
            from subgc_tpu.utils.text import decode_sequence
            gts[loader.ds.images[ix]["id"]] = decode_sequence(
                loader.vocab, loader.ds.captions_for(ix),
                remove_bad_endings=False)
        aligned = align_predictions(preds, args.oracle_num)
        scores = language_eval(gts, aligned, verbose=False)
        results[name] = {
            "preds": {p["image_id"]: list(p["caption"]) for p in preds},
            "sgpn": {p["image_id"]: np.asarray(p["subgraph_score"],
                                               np.float64) for p in preds},
            "top1": {k: float(v) for k, v in scores["top1"].items()},
            "oracle": {k: float(v) for k, v in scores["oracle"].items()},
            "cider_pick": {int(i): int(r) for i, r in zip(
                scores["image_id_list"],
                np.argmax(scores["CIDEr"], axis=0))},
            "decode_s": round(wall, 2),
            "n_captions": int(n_caps),
        }
        print(f"[bf16_prod] eval {name}: {time.time() - t0:.1f}s "
              f"top1 CIDEr {results[name]['top1']['CIDEr']:.4f} "
              f"B4 {results[name]['top1']['Bleu_4']:.4f}", flush=True)

    base = results["float32"]
    report = {"config": {k: v for k, v in vars(args).items()
                         if k != "json_out"},
              "n_test_images": len(base["preds"]),
              "float32": {"top1": base["top1"], "oracle": base["oracle"]}}
    for name in ("bfloat16", "bf16_gates"):
        r = results[name]
        ids = list(base["preds"])
        top1_flips = sum(1 for i in ids
                         if r["preds"][i][0] != base["preds"][i][0])
        anyrank_flips = sum(1 for i in ids
                            if r["preds"][i] != base["preds"][i])
        pick_flips = sum(1 for i in base["cider_pick"]
                         if r["cider_pick"][i] != base["cider_pick"][i])
        # decompose top-1 flips: captions are ordered by sGPN score
        # (eval_utils.py:105-114 semantics), so a "flip" is either a RANK
        # flip (bf16's top caption already exists at another rank in the
        # f32 list — near-tied sGPN scores reordered) or a DECODE flip
        # (genuinely different tokens).  For rank flips, record the f32
        # rank-1 vs rank-2 sGPN margin that got crossed.
        rank_flips, decode_flips, margins = 0, 0, []
        for i in ids:
            if r["preds"][i][0] == base["preds"][i][0]:
                continue
            if r["preds"][i][0] in base["preds"][i]:
                rank_flips += 1
                s = np.sort(base["sgpn"][i])[::-1]
                if len(s) > 1:
                    margins.append(float(s[0] - s[1]))
            else:
                decode_flips += 1
        report[name] = {
            "top1": r["top1"], "oracle": r["oracle"],
            "top1_delta": {k: round(r["top1"][k] - base["top1"][k], 6)
                           for k in base["top1"]},
            "oracle_delta": {k: round(r["oracle"][k] - base["oracle"][k], 6)
                             for k in base["oracle"]},
            "top1_caption_flips": [top1_flips, len(ids)],
            "top1_rank_flips": rank_flips,
            "top1_decode_flips": decode_flips,
            "rank_flip_sgpn_margin": {
                "median": float(np.median(margins)) if margins else None,
                "max": float(np.max(margins)) if margins else None,
            },
            "anyrank_caption_flips": [anyrank_flips, len(ids)],
            "cider_oracle_pick_flips": [pick_flips, len(ids)],
        }
    report["wall_s"] = round(time.time() - t_all, 1)
    with open(args.json_out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({
        "metric": "bf16 production-dim accuracy bound",
        "dCIDEr_top1": {n: report[n]["top1_delta"]["CIDEr"]
                        for n in ("bfloat16", "bf16_gates")},
        "dBleu4_top1": {n: report[n]["top1_delta"]["Bleu_4"]
                        for n in ("bfloat16", "bf16_gates")},
        "top1_flips": {n: report[n]["top1_caption_flips"]
                       for n in ("bfloat16", "bf16_gates")},
        "report": args.json_out}))
    return report


if __name__ == "__main__":
    main()
