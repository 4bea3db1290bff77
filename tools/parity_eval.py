"""Bit-compatibility check against a real reference checkpoint + dataset.

When the public Sub-GC data and pretrained checkpoints are present, this
tool (1) converts `model-<iter>.pth`, (2) runs the subgc_tpu test pipeline,
(3) optionally runs the reference's own test.py output file, and (4) diffs
the two `captions_*.npy` artifacts caption-by-caption.

Usage:
  python tools/parity_eval.py --ckpt pretrained/sub_gc_karpathy/model-60000.pth \
      --ref_captions pretrained/sub_gc_karpathy/captions_60000.npy \
      --input_json data/cocotalk.json --input_label_h5 data/cocotalk_label.h5 \
      --sg_dir data/COCO_sg_output_64 \
      --mask_dir data/COCO_graph_mask_1000_rm_duplicate \
      --beam_size 2 --gpn_nms_thres 0.75 --gpn_max_subg 10
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--ref_captions", default=None,
                    help="captions_*.npy produced by the reference")
    ap.add_argument("--input_json", required=True)
    ap.add_argument("--input_label_h5", required=True)
    ap.add_argument("--sg_dir", required=True)
    ap.add_argument("--mask_dir", required=True)
    ap.add_argument("--beam_size", type=int, default=2)
    ap.add_argument("--gpn_nms_thres", type=float, default=0.75)
    ap.add_argument("--gpn_max_subg", type=int, default=10)
    ap.add_argument("--bucket", type=int, default=1024)
    ap.add_argument("--num_images", type=int, default=-1)
    ap.add_argument("--full_gc", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import torch

    from subgc_tpu.config import DataConfig, EvalConfig, ModelConfig
    from subgc_tpu.data.dataset import EvalLoader
    from subgc_tpu.eval.runner import run_test_split
    from tools.convert_torch_ckpt import torch_state_dict_to_params

    dcfg = DataConfig(input_json=args.input_json,
                      input_label_h5=args.input_label_h5,
                      sg_dir=args.sg_dir, mask_dir=args.mask_dir)
    if args.full_gc:
        mcfg = ModelConfig(noun_fuse=False, pred_emb_type=2, gcn_layers=4,
                           gcn_residual=1, gcn_bn=True, use_gpn=False)
    else:
        mcfg = ModelConfig()
    loader = EvalLoader(mcfg, dcfg, bucket=args.bucket)
    mcfg = mcfg.replace(vocab_size=loader.vocab_size,
                        seq_length=loader.seq_length)
    ecfg = EvalConfig(beam_size=args.beam_size,
                      gpn_nms_thres=args.gpn_nms_thres,
                      gpn_max_subg=args.gpn_max_subg)

    sd = {k: v.numpy() for k, v in torch.load(args.ckpt,
                                              map_location="cpu").items()}
    params, state = torch_state_dict_to_params(sd, mcfg)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    state = jax.tree_util.tree_map(jnp.asarray, state)

    preds, wall, n_caps = run_test_split(params, state, loader, mcfg, ecfg,
                                         loader.vocab,
                                         num_images=args.num_images)
    print(f"decoded {n_caps} captions for {len(preds)} images in {wall:.1f}s")

    if args.ref_captions:
        ref = np.load(args.ref_captions, allow_pickle=True,
                      encoding="latin1").tolist()
        ref_by_id = {int(r["image_id"]): r for r in ref}
        total = match = 0
        for p in preds:
            r = ref_by_id.get(int(p["image_id"]))
            if r is None:
                continue
            for a, b in zip(p["caption"], r["caption"]):
                total += 1
                match += int(a == b)
        print(f"caption match: {match}/{total} "
              f"({100.0 * match / max(total, 1):.2f}%)")


if __name__ == "__main__":
    main()
