"""End-to-end accept drill for a parity-affecting train flag (PERF.md round 5).

--flag resid (default) drills cfg.bf16_residuals; --flag share drills
cfg.share_att_train (image-shared teacher-forced attention — float
reassociation + per-image att-dropout masks).  base/seed-control runs are
cached under --out and shared between flags.

The gradient bound (tools/grad_delta_resid.py: rel global-norm 3.4e-4 in
f32 compute) says each step's update differs from autodiff by bf16
residual rounding only; this drill answers the deployment question — does
TRAINING with the flag land at the same place?  Three IDENTICALLY
configured prod-dim drill trainings (1000-image corpus at real COCO dims,
f32 compute, batch 16):

  base    seed 2019, flag OFF          (reference point)
  resid   seed 2019, flag ON           (only the backward rounding differs)
  seed    seed 2020, flag OFF          (run-to-run noise control)

Training trajectories diverge chaotically under ANY perturbation, so the
comparison is end state, not weights: final train loss (last-8 logged
mean) and f32 Kar eval metrics (beam 2, keep 10, 200 test images), with
the flag's deltas judged AGAINST the seed control's — accept if
|resid - base| is within the run-to-run noise band |seed - base|.

Writes docs/{flag}_drill.json.  Run (TPU, ~25 min; ~8 min when the base and
seed runs are already cached under --out):
  python tools/resid_drill.py [--flag share]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--base", default="/tmp/bf16_prod",
                   help="bf16_bound_prod layout (d/ dataset is reused)")
    p.add_argument("--out", default="/tmp/resid_drill")
    p.add_argument("--train_iters", type=int, default=1300)
    p.add_argument("--flag", choices=["resid", "share"], default="resid")
    p.add_argument("--json_out", default=None)
    args = p.parse_args(argv)
    flag = args.flag
    flag_cli = {"resid": ["--bf16_residuals", "1"],
                "share": ["--share_att_train", "1"]}[flag]
    if args.json_out is None:
        args.json_out = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "docs", f"{flag}_drill.json")

    root = os.path.join(os.path.abspath(args.base), "d")
    if not os.path.exists(root):
        sys.exit(f"no drill dataset at {root}; run tools/bf16_bound_prod.py "
                 f"--out {args.base} first")

    import jax
    import jax.numpy as jnp

    from subgc_tpu.cli import train as train_cli
    from subgc_tpu.config import DataConfig, build_configs
    from subgc_tpu.data.dataset import EvalLoader
    from subgc_tpu.eval.runner import run_test_split
    from subgc_tpu.eval.sentence import align_predictions, language_eval
    from subgc_tpu.train import checkpoint as C
    from subgc_tpu.utils.cache import enable_compilation_cache
    from subgc_tpu.utils.text import decode_sequence
    enable_compilation_cache()

    man = {"input_json": os.path.join(root, "talk.json"),
           "input_label_h5": os.path.join(root, "talk_label.h5"),
           "sg_dir": os.path.join(root, "sg_output_64"),
           "mask_dir": os.path.join(root, "graph_mask"),
           "obj_name_path": os.path.join(root, "object_names.npy"),
           "rel_name_path": os.path.join(root, "predicate_names.npy")}
    data_flags = ["--input_json", man["input_json"],
                  "--input_label_h5", man["input_label_h5"],
                  "--sg_dir", man["sg_dir"], "--mask_dir", man["mask_dir"],
                  "--obj_name_path", man["obj_name_path"],
                  "--rel_name_path", man["rel_name_path"]]

    runs = {
        "base": ["--seed", "2019"],
        flag: ["--seed", "2019"] + flag_cli,
        "seed": ["--seed", "2020"],
    }
    ckpts = {}
    for name, extra in runs.items():
        ck = os.path.join(os.path.abspath(args.out),
                          f"run_{name}_{args.train_iters}")
        ckpts[name] = ck
        if not os.path.exists(os.path.join(ck, "model.npz")):
            print(f"[resid_drill] training {name} ({args.train_iters} "
                  f"iters)...", flush=True)
            train_cli.main(["Sub_GC_Kar", "--checkpoint_path", ck,
                            "--batch_size", "16",
                            "--max_iters", str(args.train_iters),
                            "--save_checkpoint_every",
                            str(args.train_iters),
                            "--val_images_use", "8",
                            "--compute_dtype", "float32"]
                           + extra + data_flags)

    def final_loss(ck):
        losses = []
        with open(os.path.join(ck, "metrics.jsonl")) as f:
            for line in f:
                rec = json.loads(line)
                if "train_loss" in rec:
                    losses.append(rec["train_loss"])
        return float(np.mean(losses[-8:])) if losses else None

    def eval_ckpt(ck):
        blob = C.load_pytree_npz(os.path.join(ck, "model.npz"))
        params = jax.tree_util.tree_map(jnp.asarray, blob["params"])
        state = jax.tree_util.tree_map(jnp.asarray, blob["state"])
        mcfg, ecfg, _ = build_configs("Sub_GC_Kar", mode="test")
        mcfg = mcfg.replace(compute_dtype="float32")
        dcfg = DataConfig(input_json=man["input_json"],
                          input_label_h5=man["input_label_h5"],
                          sg_dir=man["sg_dir"], mask_dir=man["mask_dir"])
        loader = EvalLoader(mcfg, dcfg, bucket=64)
        mcfg = mcfg.replace(vocab_size=loader.vocab_size,
                            seq_length=loader.seq_length)
        preds, _, _ = run_test_split(params, state, loader, mcfg, ecfg,
                                     loader.vocab, verbose=False,
                                     batch_images=16)
        gts = {}
        for pos in range(len(loader.split_ix["test"])):
            ix = loader.split_ix["test"][pos]
            gts[loader.ds.images[ix]["id"]] = decode_sequence(
                loader.vocab, loader.ds.captions_for(ix),
                remove_bad_endings=False)
        scores = language_eval(gts, align_predictions(preds, 5),
                               verbose=False)
        return ({k: float(v) for k, v in scores["top1"].items()},
                {k: float(v) for k, v in scores["oracle"].items()})

    loss = {n: final_loss(ck) for n, ck in ckpts.items()}
    top = {}
    orc = {}
    for n, ck in ckpts.items():
        print(f"[resid_drill] eval {n}...", flush=True)
        top[n], orc[n] = eval_ckpt(ck)

    def table(metrics):
        t = {}
        for k in metrics["base"]:
            flag_d = metrics[flag][k] - metrics["base"][k]
            seed_d = metrics["seed"][k] - metrics["base"][k]
            t[k] = {"base": round(metrics["base"][k], 5),
                    flag: round(metrics[flag][k], 5),
                    "seed_ctrl": round(metrics["seed"][k], 5),
                    "flag_delta": round(flag_d, 5),
                    "seed_noise_delta": round(seed_d, 5)}
        return t

    out = {
        "protocol": f"three identical {args.train_iters}-iter f32 prod-dim "
                    f"drill trainings (base s2019 / {flag} s2019+flag / "
                    "seed-noise control s2020); f32 Kar eval on the "
                    "200-image test split; accept if the flag's deltas sit "
                    "within the seed control's noise band",
        "flag": " ".join(flag_cli),
        "final_train_loss": {
            **{n: round(v, 4) for n, v in loss.items()},
            "flag_delta": round(loss[flag] - loss["base"], 4),
            "seed_noise_delta": round(loss["seed"] - loss["base"], 4)},
        "top1": table(top),
        "oracle5": table(orc),
        "flag_within_seed_noise": {
            "top1": sum(abs(top[flag][k] - top["base"][k])
                        <= abs(top["seed"][k] - top["base"][k]) + 1e-9
                        for k in top["base"]),
            "oracle5": sum(abs(orc[flag][k] - orc["base"][k])
                           <= abs(orc["seed"][k] - orc["base"][k]) + 1e-9
                           for k in orc["base"]),
            "n_metrics": len(top["base"]),
        },
    }
    print(json.dumps(out, indent=2))
    with open(args.json_out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"[resid_drill] wrote {args.json_out}")


if __name__ == "__main__":
    main()
