"""Show-Control-Tell (controllability) eval loader.

Torch-free reimplementation of `dataloaders/dataloader_test_sct.py`: per
image, match each user/GT region set to detector boxes by box IoU, then build
one sub-graph per region set either greedily (seed nodes + same-class nodes +
1-hop neighbor expansion; `dataloader_test_sct.py:313-355`) or by look-up of
the precomputed GT sub-graph whose seed-node set matches exactly
(`dataloader_test_sct.py:356-380`).
"""
from __future__ import annotations

from typing import Dict, List

import numpy as np

from ..config import DataConfig, ModelConfig
from ..graph import SubgraphSet
from .dataset import EvalLoader, ImageInfo, TestExample


def box_iou_single(a, b) -> float:
    """+1-extent IoU (dataloader_test_sct.py:207-226)."""
    xa, ya = max(a[0], b[0]), max(a[1], b[1])
    xb, yb = min(a[2], b[2]), min(a[3], b[3])
    inter = max(0.0, xb - xa + 1) * max(0.0, yb - ya + 1)
    area_a = (a[2] - a[0] + 1) * (a[3] - a[1] + 1)
    area_b = (b[2] - b[0] + 1) * (b[3] - b[1] + 1)
    return inter / float(area_a + area_b - inter)


def match_region_sets(region_sets, sg_boxes, iou_thres: float = 0.5
                      ) -> List[np.ndarray]:
    """Per region set, the matched detector node indices
    (dataloader_test_sct.py:266-295 incl. the adaptive-threshold fallback)."""
    out = []
    for rset in region_sets:
        valid = np.asarray(rset)[:, 4].nonzero()[0].shape[0]
        boxes = np.asarray(rset)[:valid, :4]
        matched = []
        for region in boxes:
            best_iou, best_k = 0.0, -1
            for k in range(sg_boxes.shape[0]):
                iou = box_iou_single(region, sg_boxes[k])
                if iou > best_iou:
                    best_iou, best_k = iou, k
            if best_k != -1:
                matched.append((best_k, best_iou))
        keep = [m for m, iou in matched if iou >= iou_thres]
        if not keep:
            if matched:
                adaptive = max(iou for _, iou in matched)
            else:
                adaptive = 0.0
            if adaptive == 0.0:
                keep = list(range(sg_boxes.shape[0]))
            else:
                keep = [m for m, iou in matched if iou >= adaptive]
        out.append(np.asarray(keep, np.int64))
    return out


def greedy_subgraph(seed_nodes: np.ndarray, object_cls: np.ndarray,
                    rel_ind: np.ndarray):
    """Seed nodes -> same-class nodes -> neighbor closure
    (dataloader_test_sct.py:313-344).  Returns (obj_mask, rel_mask)."""
    keep_obj = np.zeros(object_cls.shape[0], np.int64)
    keep_obj[np.asarray(seed_nodes, np.int64)] = 1
    kept_cls = np.unique(object_cls[keep_obj == 1])
    keep_obj[np.isin(object_cls, kept_cls)] = 1
    keep_ind = keep_obj.nonzero()[0]

    keep_rel = np.isin(rel_ind[:, 0], keep_ind) | np.isin(rel_ind[:, 1], keep_ind)
    keep_obj[np.unique(rel_ind[keep_rel])] = 1
    return keep_obj, keep_rel.astype(np.int64)


class SCTLoader(EvalLoader):
    """Controllability loader: one sub-graph per GT region set.

    sct_dict: {str(img_id): [G, R, 5] region sets (x1,y1,x2,y2,valid)},
    img_wh: {img_id: (w, h)} — the reference's
    sct_dict_test_grouped_gt_box.npy / flickr30k_img_wh.npy contents.
    """

    def __init__(self, mcfg: ModelConfig, dcfg: DataConfig, sct_dict: Dict,
                 img_wh: Dict, use_greedy_subg: bool = True,
                 use_gt_subg: bool = False, bucket: int = 32,
                 seed: int = 2019):
        super().__init__(mcfg, dcfg, bucket=bucket, seed=seed)
        self.sct_dict = sct_dict
        self.img_wh = img_wh
        self.use_greedy_subg = use_greedy_subg
        self.use_gt_subg = use_gt_subg

    def example(self, pos: int, split: str = "test") -> TestExample:
        ix = self.split_ix[split][pos]
        img = self.ds.images[ix]
        img_id = img["id"]
        m = self.mcfg

        graph, sg_raw = self._scene_graph(img_id)
        w, h = self.img_wh[img_id]
        sg_boxes = np.asarray(sg_raw["boxes"])[:m.obj_num] * max(w, h) / 592.0
        rel_ind = np.asarray(sg_raw["rel_ind"], np.int64)
        object_cls = np.argmax(np.asarray(sg_raw["object_dist"])[:m.obj_num],
                               axis=1)

        region_sets = np.asarray(self.sct_dict[str(img_id)])
        match_ind = match_region_sets(region_sets, sg_boxes)

        obj_ind = np.full((self.bucket, m.obj_num), m.obj_num - 1, np.int32)
        att_mask = np.zeros((self.bucket, m.obj_num), np.float32)
        att_mask[:, 0] = 1.0
        pred_ind = np.full((self.bucket, m.rel_num), m.rel_num - 1, np.int32)
        valid = np.zeros((self.bucket,), bool)

        gt_masks = None
        if self.use_gt_subg:
            md = self.masks.get(img_id)
            gt_masks = md["subgraph_mask_list"]
            gt_seeds = [np.unique(np.asarray(mask[4])) for mask in gt_masks[:5]]

        for i, seeds in enumerate(match_ind):
            if self.use_greedy_subg:
                obj_mask, rel_mask = greedy_subgraph(seeds, object_cls, rel_ind)
                onz = obj_mask.nonzero()[0]
                pnz = rel_mask.nonzero()[0]
            else:
                # match by exact seed-node set (dataloader_test_sct.py:356-372)
                uq = np.unique(seeds)
                matched = None
                for sn_i, pre in enumerate(gt_seeds):
                    if uq.shape[0] == pre.shape[0] and (pre == uq).all():
                        matched = sn_i
                        break
                if matched is None:
                    raise ValueError(f"no GT sub-graph matches region set {i} "
                                     f"of image {img_id}")
                onz = np.asarray(gt_masks[matched][1]).nonzero()[0]
                pnz = np.asarray(gt_masks[matched][2]).nonzero()[0]
            att_mask[i] = 0.0
            obj_ind[i, :onz.shape[0]] = onz
            att_mask[i, :onz.shape[0]] = 1.0
            pred_ind[i, :pnz.shape[0]] = pnz
            valid[i] = True

        subs = SubgraphSet(obj_ind=obj_ind, pred_ind=pred_ind,
                           att_mask=att_mask, valid=valid)
        return TestExample(graph=graph, subs=subs, n_subgraphs=len(match_ind),
                           info=ImageInfo(ix=ix, id=img_id,
                                          file_path=img["file_path"]),
                           gts=self.ds.captions_for(ix), sg_raw=sg_raw)
