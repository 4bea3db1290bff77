"""Adapter exposing a packed shard through the npz-dict loader interface.

Lets TrainLoader/EvalLoader run off one mmap'ed shard (native C++ reads)
instead of per-image npz files, without changing loader logic: `.get(img_id)`
returns dicts shaped like the npz payloads.
"""
from __future__ import annotations

from typing import Dict

import numpy as np

from .packed import PackedShard


class PackedSource:
    """One shard path, or a glob / comma-list of shards for large datasets
    packed in parallel (each shard is independently mmap'ed; the lookup
    index spans all of them)."""

    def __init__(self, path: str, use_native: bool = True):
        import glob as _glob
        if "," in path:
            paths = path.split(",")
        elif any(c in path for c in "*?["):
            paths = sorted(_glob.glob(path))
        else:
            paths = [path]
        if not paths:
            raise FileNotFoundError(f"no shards match {path!r}")
        self.shards = [PackedShard(p, use_native=use_native) for p in paths]
        self.shard = self.shards[0]
        self.index = {}
        for si, sh in enumerate(self.shards):
            for i, v in enumerate(sh.image_ids()):
                self.index[int(v)] = (si, i)

    def _rec(self, img_id):
        si, i = self.index[int(img_id)]
        return self.shards[si].record(i)


class PackedSGSource(PackedSource):
    """sg_output npz interface: object_fmap/object_dist/rel_ind/pred_dist/boxes."""

    def get(self, img_id) -> Dict[str, np.ndarray]:
        r = self._rec(img_id)
        n, k = int(r["counts"][0]), int(r["counts"][1])
        return {"object_fmap": r["obj_fmap"][:n],
                "object_dist": r["obj_dist"][:n],
                "rel_ind": r["rel_ind"][:k],
                "pred_dist": r["pred_dist"][:k],
                "boxes": r["boxes"]}


class PackedMaskSource(PackedSource):
    """graph_mask npz interface: node_iou_mtx + subgraph_mask_list entries."""

    def get(self, img_id) -> Dict:
        r = self._rec(img_id)
        n_subg = int(r["counts"][2])
        total = 5 + n_subg
        obj_num = self.shard.spec.obj_num
        rel_num = self.shard.spec.rel_num
        entries = []
        for i in range(total):
            obj_mask = np.zeros(obj_num - 1, np.int64)
            nodes = r["sub_obj_ind"][i][r["sub_att_mask"][i] > 0]
            obj_mask[nodes[nodes < obj_num - 1]] = 1
            pred_mask = np.zeros(rel_num - 1, np.int64)
            # padded slots hold rel_num-1; valid ones were left-packed
            valid_rels = []
            for v in r["sub_pred_ind"][i]:
                if v == rel_num - 1:
                    break
                valid_rels.append(int(v))
            pred_mask[valid_rels] = 1
            entries.append([None, obj_mask, pred_mask,
                            np.zeros((0, 2), np.int64), nodes[:1]])
        return {"node_iou_mtx": r["node_iou"][:, :total],
                "subgraph_mask_list": entries}

    def get_fast(self, img_id) -> Dict:
        """Zero-roundtrip view: the shard already stores sub-graphs in the
        model's left-packed layout, so the loaders can gather rows directly
        instead of rebuilding dense masks and re-packing them (the slow
        `get()` path exists only for npz-interface compatibility)."""
        r = self._rec(img_id)
        total = 5 + int(r["counts"][2])
        return {"node_iou_mtx": r["node_iou"][:, :total],
                "sub_obj_ind": r["sub_obj_ind"][:total],
                "sub_att_mask": r["sub_att_mask"][:total],
                "sub_pred_ind": r["sub_pred_ind"][:total],
                "total": total}
