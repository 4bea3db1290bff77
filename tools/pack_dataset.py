"""Pack an npz-directory dataset into a fixed-record binary shard.

Usage:
    python tools/pack_dataset.py --input_json data/cocotalk.json \
        --sg_dir data/COCO_sg_output_64 \
        --mask_dir data/COCO_graph_mask_1000_rm_duplicate \
        --out data/coco_packed.bin [--max_subg 1000]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input_json", required=True)
    ap.add_argument("--sg_dir", required=True)
    ap.add_argument("--mask_dir", default=None)
    ap.add_argument("--out", required=True)
    ap.add_argument("--max_subg", type=int, default=1000)
    ap.add_argument("--feat_dim", type=int, default=2048)
    ap.add_argument("--n_obj_cls", type=int, default=1599)
    ap.add_argument("--n_rel_cls", type=int, default=21)
    args = ap.parse_args()

    from subgc_tpu.data.packed import PackedSpec, pack_image, write_shard
    from subgc_tpu.io.sg_npz import SGDir

    spec = PackedSpec(feat_dim=args.feat_dim, n_obj_cls=args.n_obj_cls,
                      n_rel_cls=args.n_rel_cls, max_subg=args.max_subg)
    with open(args.input_json) as f:
        images = json.load(f)["images"]
    sg = SGDir(args.sg_dir)
    masks = SGDir(args.mask_dir) if args.mask_dir else None

    records = []
    for i, img in enumerate(images):
        sg_d = sg.get(img["id"])
        mask_d = masks.get(img["id"]) if masks else None
        records.append(pack_image(spec, img["id"], sg_d, mask_d))
        if (i + 1) % 500 == 0:
            print(f"packed {i + 1}/{len(images)}")
    write_shard(args.out, spec, records)
    sz = os.path.getsize(args.out) / 1e9
    print(f"wrote {args.out}: {len(records)} images, {sz:.2f} GB "
          f"({spec.record_size / 1e6:.2f} MB/record)")


if __name__ == "__main__":
    main()
