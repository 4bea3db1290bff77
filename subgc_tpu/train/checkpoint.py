"""Checkpoint / resume.

The reference saves `model.pth` + `optimizer.pth` + `infos_*.pkl` +
`histories_*.pkl` (`train.py:36-52,194-227`).  Here one checkpoint directory
holds:

* ``model.npz``      — params + model state (BN stats), flat path->array
* ``optimizer.npz``  — optax optimizer state
* ``infos.json``     — iteration/epoch counters, configs, vocab, split order
* ``histories.json`` — loss/lr/ss-prob/val histories

npz with deterministic key paths keeps checkpoints portable (no pickles) and
loadable without JAX.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict

import numpy as np

_SEP = "///"


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        if not tree:
            out[f"{prefix}{_SEP}__empty__" if prefix else "__empty__"] = \
                np.asarray(0)
            return out
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{_SEP}{k}" if prefix else str(k)))
    elif isinstance(tree, (list, tuple)):
        out[f"{prefix}{_SEP}__len__" if prefix else "__len__"] = np.asarray(
            [len(tree), int(isinstance(tree, tuple))])
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{_SEP}{i}" if prefix else str(i)))
    elif tree is None:
        out[f"{prefix}{_SEP}__none__" if prefix else "__none__"] = np.asarray(0)
    else:
        out[prefix] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]):
    # rebuild nested structure from path keys
    if list(flat.keys()) == [""]:
        return flat[""]
    root: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split(_SEP)
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def _rebuild(node):
        if not isinstance(node, dict):
            return node
        if "__none__" in node and len(node) == 1:
            return None
        if "__empty__" in node and len(node) == 1:
            return {}
        if "__len__" in node:
            n, is_tuple = (int(x) for x in node["__len__"])
            items = [_rebuild(node[str(i)]) for i in range(n)]
            return tuple(items) if is_tuple else items
        return {k: _rebuild(v) for k, v in node.items()}

    return _rebuild(root)


def save_pytree_npz(path: str, tree) -> None:
    flat = _flatten(tree)
    np.savez(path, **flat)


def load_pytree_npz(path: str):
    with np.load(path, allow_pickle=False) as z:
        flat = {k: z[k] for k in z.files}
    return _unflatten(flat)


def save_checkpoint(ckpt_dir: str, params, state, opt_state, infos: dict,
                    histories: dict, suffix: str = "") -> None:
    """Write a full training checkpoint (reference train.py:36-52)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    import jax
    params = jax.device_get(params)
    state = jax.device_get(state)
    save_pytree_npz(os.path.join(ckpt_dir, f"model{suffix}.npz"),
                    {"params": params, "state": state})
    if opt_state is not None:
        import jax.tree_util as jtu
        leaves, treedef = jtu.tree_flatten(jax.device_get(opt_state))
        np.savez(os.path.join(ckpt_dir, f"optimizer{suffix}.npz"),
                 **{str(i): np.asarray(l) for i, l in enumerate(leaves)})
    with open(os.path.join(ckpt_dir, f"infos{suffix}.json"), "w") as f:
        json.dump(infos, f)
    with open(os.path.join(ckpt_dir, f"histories{suffix}.json"), "w") as f:
        json.dump(histories, f)


def load_checkpoint(ckpt_dir: str, suffix: str = "", opt_state_template=None):
    """Returns (params, state, opt_state, infos, histories)."""
    blob = load_pytree_npz(os.path.join(ckpt_dir, f"model{suffix}.npz"))
    params, state = blob["params"], blob["state"]
    opt_state = None
    opt_path = os.path.join(ckpt_dir, f"optimizer{suffix}.npz")
    if opt_state_template is not None and os.path.exists(opt_path):
        import jax.tree_util as jtu
        with np.load(opt_path) as z:
            leaves = [z[str(i)] for i in range(len(z.files))]
        treedef = jtu.tree_structure(opt_state_template)
        tmpl_leaves = jtu.tree_leaves(opt_state_template)
        if len(leaves) != len(tmpl_leaves) or any(
                getattr(a, "shape", None) != getattr(b, "shape", None)
                for a, b in zip(leaves, tmpl_leaves)):
            # optimizer-state layout changed (e.g. the round-3 optax.flatten
            # move) — model weights still restore; Adam moments reinitialize
            print(f"warning: optimizer state in {opt_path} does not match "
                  f"the current optimizer layout; reinitializing moments")
            opt_state = None
        else:
            opt_state = jtu.tree_unflatten(treedef, leaves)
    infos, histories = {}, {}
    ip = os.path.join(ckpt_dir, f"infos{suffix}.json")
    hp = os.path.join(ckpt_dir, f"histories{suffix}.json")
    if os.path.exists(ip):
        infos = json.load(open(ip))
    if os.path.exists(hp):
        histories = json.load(open(hp))
    return params, state, opt_state, infos, histories


def optimistic_restore(params, loaded, word_mapping=None, verbose=True):
    """Shape-tolerant restore + vocab-remap finetune (models/__init__.py:14-41,
    misc/utils.py:202-221).

    word_mapping: int array mapping new vocab index -> old vocab index (or -1)
    applied to the token embedding and logit rows like the reference's
    `word_mapping.npy` COCO->Flickr transfer.
    """
    import jax

    def merge(path, cur, new):
        if new is None:
            return cur
        if np.shape(cur) == np.shape(new):
            return np.asarray(new)
        if verbose:
            print(f"shape mismatch at {path}: have {np.shape(cur)}, "
                  f"ckpt {np.shape(new)}")
        if word_mapping is not None and path in (
                ("decoder", "embed"), ("decoder", "logit", "w"),
                ("decoder", "logit", "b")):
            new = np.asarray(new)
            cur = np.array(cur)
            wm = np.asarray(word_mapping)
            ok = wm >= 0
            if path == ("decoder", "embed"):
                cur[ok] = new[wm[ok]]
            elif path == ("decoder", "logit", "w"):
                cur[:, ok] = new[:, wm[ok]]
            else:
                cur[ok] = new[wm[ok]]
            return cur
        return cur

    def walk(path, cur, new):
        if isinstance(cur, dict):
            return {k: walk(path + (k,), cur[k],
                            (new or {}).get(k) if isinstance(new, dict) else None)
                    for k in cur}
        if isinstance(cur, (list, tuple)):
            t = type(cur)
            newlist = new if isinstance(new, (list, tuple)) else [None] * len(cur)
            return t(walk(path + (i,), c, n) for i, (c, n) in
                     enumerate(zip(cur, newlist)))
        return merge(path, cur, new)

    return walk((), params, loaded)
