"""Inference/eval CLI — `python -m subgc_tpu.cli.test <MODEL_TYPE> [flags]`.

Replaces `test.sh` + `test.py` + `misc/eval_utils.py`: decode the test split
with the preset's beam/NMS/sampling settings, write captions_*.npy (and
grounding_file.json with --return_att), then optionally run language eval
(--language_eval 1) or re-score an existing captions file
(--only_sent_eval 1, with --oracle_num k for the top-k oracle).
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("model_type", nargs="?", default="Sub_GC_Kar")
    p.add_argument("--checkpoint_path", type=str, required=True,
                   help="directory with model.npz + infos.json")
    p.add_argument("--iter_tag", type=str, default=None,
                   help="tag for captions_<tag>.npy (default: ckpt iter)")
    p.add_argument("--num_images", type=int, default=-1)
    p.add_argument("--batch_images", type=int, default=16)
    p.add_argument("--n_devices", type=int, default=None,
                   help="shard eval over a data-parallel device mesh: the "
                        "image batch (and its sub-graph fan-out) splits "
                        "across N devices, params replicate "
                        "(tests/test_eval_sharded.py path).  Requires "
                        "batch_images %% N == 0.  Default: single device")
    p.add_argument("--shard_subgraphs", action="store_true",
                   help="with --n_devices: shard the flat sub-graph ROW "
                        "axis instead of the image axis — balances a "
                        "single image's keep-1000 fan-out across devices, "
                        "no batch_images divisibility requirement")
    p.add_argument("--bucket", type=int, default=None,
                   help="static sub-graph bucket (default: preset)")
    p.add_argument("--beam_size", type=int, default=None)
    p.add_argument("--gpn_nms_thres", type=float, default=None)
    p.add_argument("--gpn_max_subg", type=int, default=None)
    p.add_argument("--language_eval", type=int, default=0)
    p.add_argument("--only_sent_eval", type=int, default=0)
    p.add_argument("--oracle_num", type=int, default=1)
    p.add_argument("--return_att", type=int, default=None)
    p.add_argument("--use_topk_sampling", type=int, default=None)
    p.add_argument("--topk_temp", type=float, default=None)
    p.add_argument("--the_k", type=int, default=None)
    p.add_argument("--group_size", type=int, default=None)
    p.add_argument("--diversity_lambda", type=float, default=None)
    p.add_argument("--decoding_constraint", type=int, default=None)
    p.add_argument("--length_penalty", type=str, default=None)
    p.add_argument("--remove_bad_endings", type=int, default=None)
    p.add_argument("--input_json", type=str, default=None)
    p.add_argument("--input_label_h5", type=str, default=None)
    p.add_argument("--sg_dir", type=str, default=None)
    p.add_argument("--mask_dir", type=str, default=None)
    p.add_argument("--packed_path", type=str, default=None,
                   help="mmap'ed packed shard(s) (glob / comma-list) "
                        "replacing --sg_dir/--mask_dir (tools/pack_dataset)")
    p.add_argument("--annotations_json", type=str, default=None,
                   help="GT annotation json for language eval "
                        "({image_id: [captions]}); defaults to the "
                        "dataset's own label h5")
    p.add_argument("--sct_dict", type=str,
                   default="data/sct_dict_test_grouped_gt_box.npy",
                   help="grouped GT region sets for SCT presets")
    p.add_argument("--img_wh", type=str, default="data/flickr30k_img_wh.npy",
                   help="{img_id: (w,h)} table for SCT/grounding presets")
    p.add_argument("--split", type=str, default="test")
    p.add_argument("--seed", type=int, default=2019)
    # debug surface (reference test.py:48-50,96-98)
    p.add_argument("--verbose_beam", type=int, default=None,
                   help="print every beam of one random kept sub-graph "
                        "per image (reference default 1; here 0)")
    p.add_argument("--verbose_loss", type=int, default=0,
                   help="also report the teacher-forced LM loss over the "
                        "split's labels (eval_utils.py:73-86)")
    p.add_argument("--dump_json", type=int, default=0,
                   help="write vis/vis.json with the best caption per "
                        "image")
    p.add_argument("--dump_path", type=int, default=0,
                   help="include each image's file_path in vis/vis.json")
    return p.parse_args(argv)


def _gts_from_loader(loader, split):
    """Decode the label h5 GT captions to strings per image id."""
    from ..utils.text import decode_sequence
    gts = {}
    for pos in range(len(loader.split_ix[split])):
        ix = loader.split_ix[split][pos]
        img_id = loader.ds.images[ix]["id"]
        caps = loader.ds.captions_for(ix)
        gts[img_id] = decode_sequence(loader.vocab, caps,
                                      remove_bad_endings=False)
    return gts


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..config import (EvalConfig, ModelConfig, DataConfig, build_configs,
                          config_from_json)
    from ..data.dataset import EvalLoader
    from ..eval.runner import run_test_split, save_predictions
    from ..eval.sentence import align_predictions, language_eval
    from ..train import checkpoint as C

    # resolve configs: preset < checkpoint infos < CLI flags
    # (the reference asserts eval/train opt consistency, test.py:188-196;
    # here the checkpoint's saved configs are the source of truth)
    mcfg, ecfg, dcfg = build_configs(args.model_type, mode="test")
    infos_path = os.path.join(args.checkpoint_path, "infos.json")
    infos = {}
    if os.path.exists(infos_path):
        infos = json.load(open(infos_path))
        mcfg = config_from_json(ModelConfig, infos["model_config"])
        if infos.get("model_type") and infos["model_type"] != args.model_type:
            print(f"note: checkpoint was trained as {infos['model_type']}, "
                  f"evaluating as {args.model_type}")
    for k in ["beam_size", "gpn_nms_thres", "gpn_max_subg", "return_att",
              "use_topk_sampling", "oracle_num", "only_sent_eval",
              "topk_temp", "the_k", "group_size", "diversity_lambda",
              "decoding_constraint", "length_penalty",
              "remove_bad_endings", "verbose_beam"]:
        v = getattr(args, k)
        if v is not None:
            ecfg = ecfg.replace(**{k: bool(v) if k in ("return_att",
                                                       "use_topk_sampling",
                                                       "remove_bad_endings")
                                   else v})
    if ecfg.group_size > 1 and ecfg.beam_size % ecfg.group_size != 0:
        raise SystemExit(
            f"--beam_size {ecfg.beam_size} must be divisible by "
            f"--group_size {ecfg.group_size} (each diverse group runs "
            f"beam_size/group_size beams)")
    for k in ["input_json", "input_label_h5", "sg_dir", "mask_dir",
              "packed_path"]:
        if getattr(args, k) is not None:
            dcfg = dcfg.replace(**{k: getattr(args, k)})

    bucket = args.bucket or ecfg.max_subgraph_bucket
    if ecfg.sct:
        from ..data.sct import SCTLoader
        sct_dict = np.load(args.sct_dict, allow_pickle=True,
                           encoding="latin1").tolist()
        img_wh = np.load(args.img_wh, allow_pickle=True,
                         encoding="latin1").tolist()
        loader = SCTLoader(mcfg, dcfg, sct_dict, img_wh,
                           use_greedy_subg=ecfg.use_greedy_subg,
                           use_gt_subg=ecfg.use_gt_subg, bucket=bucket,
                           seed=args.seed)
    else:
        loader = EvalLoader(mcfg, dcfg, bucket=bucket, seed=args.seed)
    mcfg = mcfg.replace(vocab_size=loader.vocab_size,
                        seq_length=loader.seq_length)
    iter_tag = args.iter_tag or str(infos.get("iter", "0"))

    if not ecfg.only_sent_eval:
        blob = C.load_pytree_npz(os.path.join(args.checkpoint_path,
                                              "model.npz"))
        params = jax.tree_util.tree_map(jnp.asarray, blob["params"])
        state = jax.tree_util.tree_map(jnp.asarray, blob["state"])

        collector = None
        if ecfg.return_att:
            from ..eval.grounding import GroundingCollector
            gvd = np.load("data/gvd_all_dict.npy", allow_pickle=True,
                          encoding="latin1").tolist() \
                if os.path.exists("data/gvd_all_dict.npy") else None
            img_wh = np.load("data/flickr30k_img_wh.npy", allow_pickle=True,
                             encoding="latin1").tolist() \
                if os.path.exists("data/flickr30k_img_wh.npy") else {}
            if gvd is not None:
                rr_path = os.path.join(args.checkpoint_path,
                                       "consensus_rerank_ind.npy")
                rr = np.load(rr_path, allow_pickle=True).tolist() \
                    if os.path.exists(rr_path) else None
                collector = GroundingCollector(
                    gvd["wd_to_lemma"], gvd["lemma_det_id_dict"],
                    gvd["det_id_to_det_wd"], img_wh, rerank_ind=rr)

        mesh = None
        if args.shard_subgraphs and not (args.n_devices
                                         and args.n_devices > 1):
            raise SystemExit("--shard_subgraphs requires --n_devices > 1 "
                             "(it picks WHICH axis shards over the mesh)")
        if args.n_devices and args.n_devices > 1:
            from ..parallel.mesh import make_mesh
            avail = len(jax.devices())
            if args.n_devices > avail:
                raise SystemExit(f"--n_devices {args.n_devices} > {avail} "
                                 f"attached devices")
            if not args.shard_subgraphs and args.batch_images % args.n_devices:
                raise SystemExit(f"--batch_images {args.batch_images} must "
                                 f"be divisible by --n_devices "
                                 f"{args.n_devices} (or use "
                                 f"--shard_subgraphs)")
            mesh = make_mesh(n_data=args.n_devices)

        preds, wall, n_caps = run_test_split(
            params, state, loader, mcfg, ecfg, loader.vocab,
            split=args.split, num_images=args.num_images,
            batch_images=args.batch_images, collect_grounding=collector,
            mesh=mesh,
            shard_axis="subgraph" if args.shard_subgraphs else "image")
        path = save_predictions(preds, args.checkpoint_path, iter_tag,
                                sct=ecfg.sct)
        print(f"decoded {n_caps} captions for {len(preds)} images in "
              f"{wall:.1f}s -> {path}")
        if collector is not None:
            gpath = os.path.join(args.checkpoint_path, "grounding_file.json")
            collector.save(gpath)
            print(f"grounding material -> {gpath}")

        if args.verbose_loss:
            # teacher-forced LM loss over the split's labels — the
            # reference's in-eval loss report (eval_utils.py:73-86)
            from ..config import TrainConfig
            from ..data.dataset import TrainLoader
            from ..train.step import make_val_step
            tloader = TrainLoader(mcfg, TrainConfig(
                batch_size=min(8, max(1, args.batch_images))), dcfg,
                seed=args.seed)
            val_step = make_val_step(mcfg)
            n_img = len(tloader.split_ix[args.split]) \
                if args.num_images < 0 else args.num_images
            tot, nb = 0.0, 0
            tloader.reset_iterator(args.split)
            for _ in range(max(1, n_img // tloader.batch_size)):
                vb, _, vw = tloader.get_batch(args.split)
                tot += float(val_step(params, state,
                                      jax.tree_util.tree_map(jnp.asarray,
                                                             vb)))
                nb += 1
                if vw:
                    break
            print(f"{args.split} LM loss: {tot / nb:.4f} ({nb} batches)")

        if args.dump_json:
            # vis/vis.json: best caption per image (+ file_path with
            # --dump_path) — reference test.py:48-50's vis artifact
            id_to_path = {img["id"]: img.get("file_path", "")
                          for img in loader.ds.images}
            vis = []
            for pr in preds:
                entry = {"image_id": pr["image_id"],
                         "caption": pr["caption"][0] if pr["caption"]
                         else ""}
                if args.dump_path:
                    entry["file_path"] = id_to_path.get(pr["image_id"], "")
                vis.append(entry)
            os.makedirs("vis", exist_ok=True)
            with open(os.path.join("vis", "vis.json"), "w") as f:
                json.dump(vis, f)
            print(f"predictions -> vis/vis.json ({len(vis)} images)")
    else:
        path = os.path.join(args.checkpoint_path,
                            f"captions_{iter_tag}.npy")
        preds = np.load(path, allow_pickle=True).tolist()
        print(f"loaded {len(preds)} predictions from {path}")

    scores = None
    if args.language_eval or ecfg.only_sent_eval:
        if args.annotations_json:
            gts = {int(k): v for k, v in
                   json.load(open(args.annotations_json)).items()}
        else:
            gts = _gts_from_loader(loader, args.split)
        aligned = align_predictions(preds, ecfg.oracle_num)
        scores = language_eval(
            gts, aligned,
            cache_dir=os.path.join(args.checkpoint_path, "eval_results"),
            model_id=args.model_type, split=args.split)
        out = os.path.join(args.checkpoint_path,
                           f"all_scores_{iter_tag}_{ecfg.oracle_num}-subgraph.npy")
        np.save(out, np.asarray(scores, dtype=object), allow_pickle=True)
        print(f"scores -> {out}")
    return {"captions_path": path, "scores": scores, "iter_tag": iter_tag}


if __name__ == "__main__":
    main()
