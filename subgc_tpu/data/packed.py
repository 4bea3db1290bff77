"""Packed binary dataset: fixed-record shards for the production input path.

The reference reads one pickled npz per image per access (zip + pickle
decode per item, `dataloaders/dataloader.py:14-37`).  For production input
pipelines this module defines a flat mmap-able shard format with
fixed-size records — zero-copy reads, no per-item decompression — plus a
native C++ reader (native/packed_reader.cpp via ctypes) and a pure-numpy
fallback.

Shard layout (little-endian), all images padded to the config's static
shapes at pack time:

  header (64 bytes):
    magic     uint64  0x53554247'43504B31  ("SUBGCPK1")
    n_images  uint32
    obj_num   uint32   rel_num  uint32   feat_dim uint32
    n_obj_cls uint32   n_rel_cls uint32  max_subg uint32  reserved uint32
    record_sz uint64   (bytes per image record)
    reserved  16 bytes

  per-image record:
    img_id      int64
    n_obj, n_rel, n_subg  int32 x3  (+ int32 pad)
    obj_fmap    float32 [obj_num, feat_dim]
    obj_dist    float32 [obj_num, n_obj_cls]
    rel_ind     int32   [rel_num, 2]
    pred_dist   float32 [rel_num, n_rel_cls]
    boxes       float32 [obj_num, 4]
    node_iou    float32 [5, 5 + max_subg]
    sub_obj_ind  int32  [5 + max_subg, obj_num]   (left-packed, pad = obj_num-1)
    sub_att_mask uint8  [5 + max_subg, obj_num]
    sub_pred_ind int32  [5 + max_subg, rel_num]
"""
from __future__ import annotations

import struct
from typing import Dict, List, NamedTuple, Optional

import numpy as np

MAGIC = 0x5355424743504B31


class PackedSpec(NamedTuple):
    obj_num: int = 37
    rel_num: int = 65
    feat_dim: int = 2048
    n_obj_cls: int = 1599
    n_rel_cls: int = 21
    max_subg: int = 1000

    @property
    def total_subg(self) -> int:
        return 5 + self.max_subg

    def record_fields(self):
        s = self
        return [
            ("img_id", np.int64, ()),
            ("counts", np.int32, (4,)),
            ("obj_fmap", np.float32, (s.obj_num, s.feat_dim)),
            ("obj_dist", np.float32, (s.obj_num, s.n_obj_cls)),
            ("rel_ind", np.int32, (s.rel_num, 2)),
            ("pred_dist", np.float32, (s.rel_num, s.n_rel_cls)),
            ("boxes", np.float32, (s.obj_num, 4)),
            ("node_iou", np.float32, (5, s.total_subg)),
            ("sub_obj_ind", np.int32, (s.total_subg, s.obj_num)),
            ("sub_att_mask", np.uint8, (s.total_subg, s.obj_num)),
            ("sub_pred_ind", np.int32, (s.total_subg, s.rel_num)),
        ]

    @property
    def record_size(self) -> int:
        return sum(np.dtype(dt).itemsize * int(np.prod(shape) or 1)
                   for _, dt, shape in self.record_fields())


def pack_image(spec: PackedSpec, img_id: int, sg: Dict,
               mask_bank: Optional[Dict]) -> bytes:
    """One image's npz dicts -> a fixed-size record (padding semantics of
    dataloader.py:335-357 / the left-packing of :269-303)."""
    s = spec
    rec = bytearray()

    fmap = np.zeros((s.obj_num, s.feat_dim), np.float32)
    dist = np.zeros((s.obj_num, s.n_obj_cls), np.float32)
    dist[:, 0] = 1.0
    n = min(np.asarray(sg["object_fmap"]).shape[0], s.obj_num - 1)
    fmap[:n] = sg["object_fmap"][:n]
    dist[:n] = sg["object_dist"][:n]

    rind = np.full((s.rel_num, 2), s.obj_num - 1, np.int32)
    pdist = np.zeros((s.rel_num, s.n_rel_cls), np.float32)
    pdist[:, 0] = 1.0
    k = min(np.asarray(sg["rel_ind"]).shape[0], s.rel_num - 1)
    rind[:k] = sg["rel_ind"][:k]
    pdist[:k] = sg["pred_dist"][:k]

    boxes = np.zeros((s.obj_num, 4), np.float32)
    nb = min(np.asarray(sg["boxes"]).shape[0], s.obj_num)
    boxes[:nb] = sg["boxes"][:nb]

    node_iou = np.zeros((5, s.total_subg), np.float32)
    soi = np.full((s.total_subg, s.obj_num), s.obj_num - 1, np.int32)
    sam = np.zeros((s.total_subg, s.obj_num), np.uint8)
    spi = np.full((s.total_subg, s.rel_num), s.rel_num - 1, np.int32)
    n_subg = 0
    if mask_bank is not None:
        iou = np.asarray(mask_bank["node_iou_mtx"], np.float32)
        cols = min(iou.shape[1], s.total_subg)
        node_iou[:, :cols] = iou[:, :cols]
        entries = mask_bank["subgraph_mask_list"][:s.total_subg]
        n_subg = max(0, len(entries) - 5)
        for i, entry in enumerate(entries):
            onz = np.asarray(entry[1]).nonzero()[0]
            soi[i, :onz.shape[0]] = onz
            sam[i, :onz.shape[0]] = 1
            pnz = np.asarray(entry[2]).nonzero()[0]
            spi[i, :pnz.shape[0]] = pnz

    rec += struct.pack("<q", int(img_id))
    rec += np.asarray([n, k, n_subg, 0], np.int32).tobytes()
    for arr in [fmap, dist, rind, pdist, boxes, node_iou, soi, sam, spi]:
        rec += np.ascontiguousarray(arr).tobytes()
    assert len(rec) == spec.record_size, (len(rec), spec.record_size)
    return bytes(rec)


def write_shard(path: str, spec: PackedSpec, records: List[bytes]) -> None:
    with open(path, "wb") as f:
        f.write(struct.pack("<QIIIIIIIIQ", MAGIC, len(records), spec.obj_num,
                            spec.rel_num, spec.feat_dim, spec.n_obj_cls,
                            spec.n_rel_cls, spec.max_subg, 0,
                            spec.record_size))
        f.write(b"\0" * (64 - 48))
        for r in records:
            f.write(r)


class PackedShard:
    """mmap-backed reader; prefers the native C++ reader, falls back to
    numpy views over the same mapping."""

    def __init__(self, path: str, use_native: bool = True):
        self.path = path
        with open(path, "rb") as f:
            hdr = f.read(64)
        (magic, n_images, obj_num, rel_num, feat_dim, n_obj_cls, n_rel_cls,
         max_subg, _res, record_size) = struct.unpack("<QIIIIIIIIQ", hdr[:48])
        assert magic == MAGIC, f"bad shard magic in {path}"
        self.spec = PackedSpec(obj_num, rel_num, feat_dim, n_obj_cls,
                               n_rel_cls, max_subg)
        assert record_size == self.spec.record_size
        self.n_images = n_images
        self._mm = np.memmap(path, np.uint8, "r", offset=64,
                             shape=(n_images, record_size))
        self._native = None
        if use_native:
            from ..ops.native_packed import NativePackedReader
            try:
                self._native = NativePackedReader(path)
            except Exception:
                self._native = None

        # field offsets
        self._offsets = {}
        off = 0
        for name, dt, shape in self.spec.record_fields():
            size = np.dtype(dt).itemsize * int(np.prod(shape) or 1)
            self._offsets[name] = (off, dt, shape)
            off += size

    def _field(self, i: int, name: str) -> np.ndarray:
        off, dt, shape = self._offsets[name]
        size = np.dtype(dt).itemsize * int(np.prod(shape) or 1)
        raw = self._mm[i, off:off + size]
        return np.frombuffer(raw, dtype=dt).reshape(shape)

    def image_ids(self) -> np.ndarray:
        if self._native is not None:
            return self._native.image_ids()
        return np.asarray([int(self._field(i, "img_id")[()])
                           for i in range(self.n_images)])

    def record(self, i: int) -> Dict[str, np.ndarray]:
        if self._native is not None:
            return self._native.record(i)
        out = {name: self._field(i, name)
               for name, _, _ in self.spec.record_fields()}
        out["img_id"] = int(out["img_id"][()])
        return out
