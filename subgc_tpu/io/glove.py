"""GloVe class-name embeddings (misc/utils.py:348-478).

Builds the [num_names, dim] table used to fuse word embeddings into graph
nodes: per class name, the GloVe vector, with the reference's typo fixes,
multi-word averaging fallback, and N(0,1) init for unknown tokens.  Reads
the plain-text glove.6B.300d.txt format (the reference caches a torch .pt;
here a .npz cache sits alongside).
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

TYPO_FIX = {"brocolli": "broccoli", "sandwhich": "sandwich",
            "kneepad": "knee pad", "skiis": "skis", "tshirt": "shirt"}


def load_glove_txt(path: str, dim: int = 300,
                   vocab: Optional[set] = None) -> Dict[str, np.ndarray]:
    """Parse a GloVe .txt; optionally restrict to a vocab set.  Caches the
    full table as <path>.npz on first load when no vocab filter is given."""
    cache = path + ".npz"
    if vocab is None and os.path.exists(cache):
        with np.load(cache, allow_pickle=False) as z:
            words = [w for w in z["words"]]
            return dict(zip(words, z["vecs"]))
    table: Dict[str, np.ndarray] = {}
    with open(path, "rb") as f:
        for line in f:
            parts = line.rstrip().split(b" ")
            try:
                word = parts[0].decode("utf-8")
            except UnicodeDecodeError:
                continue
            if vocab is not None and word not in vocab:
                continue
            table[word] = np.asarray([float(x) for x in parts[1:]], np.float32)
    if vocab is None:
        np.savez(cache, words=np.asarray(list(table), dtype=object),
                 vecs=np.stack(list(table.values())))
    return table


def load_glove_pt(path: str, vocab: Optional[set] = None
                  ) -> Dict[str, np.ndarray]:
    """Read the reference's cached torch pickle (glove.6B.300d.pt:
    a (word->index dict, tensor, size) tuple; misc/utils.py:418-422)."""
    import torch

    wv_dict, wv_arr, _ = torch.load(path, map_location="cpu",
                                    weights_only=False)
    arr = wv_arr.numpy()
    if vocab is not None:
        return {w: arr[i] for w, i in wv_dict.items() if w in vocab}
    return {w: arr[i] for w, i in wv_dict.items()}


def class_embeddings(names: List[str], glove_path: str, dim: int = 300,
                     seed: int = 0) -> np.ndarray:
    """[len(names), dim] embedding table (obj_edge_vectors semantics)."""
    wanted = set()
    fixed_names = []
    for name in names:
        name = str(name)
        name = TYPO_FIX.get(name, name)
        fixed_names.append(name)
        for tok in name.split(" "):
            wanted.add(tok)
    if glove_path.endswith(".pt"):
        table = load_glove_pt(glove_path, vocab=wanted)
    else:
        table = load_glove_txt(glove_path, dim, vocab=wanted)

    rng = np.random.RandomState(seed)
    out = rng.normal(0, 1, (len(names), dim)).astype(np.float32)
    for i, name in enumerate(fixed_names):
        if name in table:
            out[i] = table[name]
            continue
        parts = [table[t] for t in name.split(" ") if t in table]
        if parts:
            out[i] = np.mean(parts, axis=0)
        else:
            print(f"GloVe: no vector for {name!r}")
    return out
