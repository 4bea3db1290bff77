"""Test-split inference orchestration -> captions_*.npy artifacts.

Equivalent of `misc/eval_utils.py:87-172`: for each test image, encode the
scene graph, score+NMS sub-graphs, decode one caption per kept sub-graph,
sort captions by sGPN score, and write the predictions artifact in the
reference's exact format:

    captions_<iter>.npy  — list of {image_id, caption: [str],
                           subgraph_score: np[K], sorted_subgraph_ind: np[K]}

TPU-first design:
* Many images batch into ONE jitted dispatch (encoder batched, sGPN+NMS
  vmapped, all kept sub-graphs of the whole image batch decode together) —
  the reference loops beam search per sub-graph (AttModel.py:216-231).
* Dispatches are enqueued asynchronously and fetched afterwards, so
  host<->device transfer latency overlaps with device compute.
"""
from __future__ import annotations

import os
import time
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EvalConfig, ModelConfig
from ..data.dataset import EvalLoader
from ..decode import beam as beam_mod
from ..decode import greedy as greedy_mod
from ..graph import SceneGraph, SubgraphSet
from ..models import subgc
from ..utils.text import decode_sequence


def make_infer_fn(cfg: ModelConfig, ecfg: EvalConfig):
    """Single-image program (kept for tests/small runs)."""

    def infer(params, state, graph, subs, rng):
        enc = subgc.encode_image(params, state, graph, subs, cfg, ecfg)
        return _decode(params, enc, cfg, ecfg, rng)

    return jax.jit(infer)


def _decode(params, enc, cfg, ecfg, rng):
    all_beams = None
    if ecfg.beam_size > 1:
        out = beam_mod.beam_search(params, enc.feats, cfg, ecfg)
        seq, logprobs = out.seq, out.logprobs
        att_w = None
        if ecfg.verbose_beam:
            all_beams = out.all_seqs
    else:
        s = greedy_mod.sample(params, enc.feats, cfg, ecfg, rng)
        seq, logprobs = s.seq, s.logprobs
        att_w = s.att_weights if ecfg.return_att else None
    res = dict(seq=seq, logprobs=logprobs, scores=enc.scores,
               keep_ind=enc.keep_ind, keep_valid=enc.keep_valid)
    if att_w is not None:
        res["att_weights"] = att_w
    if all_beams is not None:
        res["all_beams"] = all_beams
    return res


def make_batched_infer_fn(cfg: ModelConfig, ecfg: EvalConfig, mesh=None):
    """[B]-image program: one dispatch for a whole image batch.

    mesh: when given, the flat [B*Smax] decode-ROW axis is shard-constrained
    over the ``data`` axis (sub-graph fan-out sharding — SURVEY.md §5's
    sequence-parallel analog at sub-graph granularity).  Inputs replicate:
    every device redundantly runs the tiny per-image encoder+NMS, then the
    fan-out decode — where all the FLOPs are — splits across the mesh.
    Unlike image-axis sharding this balances a SINGLE image's keep-1000
    fan-out over devices (B < n_devices included)."""

    def infer(params, state, graph, subs, rng):
        enc = subgc.encode_images_batched(params, state, graph, subs, cfg, ecfg)
        if mesh is not None:
            from ..parallel.mesh import batch_sharded, replicated
            rows = batch_sharded(mesh)
            rep = replicated(mesh)
            c = lambda x: None if x is None \
                else jax.lax.with_sharding_constraint(x, rows)
            r = lambda x: None if x is None \
                else jax.lax.with_sharding_constraint(x, rep)
            f = enc.feats
            # row-leading arrays shard; the per-image node streams (small)
            # replicate, so each row's att_img[img_ix] gather is local
            feats = f._replace(
                fc=c(f.fc), att=c(f.att), p_att=c(f.p_att), mask=c(f.mask),
                fc_ih=c(f.fc_ih), att_img=r(f.att_img),
                p_att_img=r(f.p_att_img), img_ix=c(f.img_ix))
            enc = enc._replace(feats=feats, scores=c(enc.scores),
                               keep_ind=c(enc.keep_ind),
                               keep_valid=c(enc.keep_valid))
        out = _decode(params, enc, cfg, ecfg, rng)
        B = graph.obj_fmap.shape[0]
        return {k: v.reshape((B, -1) + v.shape[1:]) for k, v in out.items()}

    return jax.jit(infer)


def _stack_examples(examples):
    graph = SceneGraph(*[np.concatenate([getattr(e.graph, f) for e in examples])
                         for f in SceneGraph._fields])
    subs = SubgraphSet(*[np.stack([getattr(e.subs, f) for e in examples])
                         for f in SubgraphSet._fields])
    return graph, subs


def run_test_split(params, state, loader: EvalLoader, cfg: ModelConfig,
                   ecfg: EvalConfig, vocab, split: str = "test",
                   num_images: int = -1, rng=None, verbose: bool = True,
                   collect_grounding=None, batch_images: int = 16,
                   mesh=None, shard_axis: str = "image",
                   keep_tokens: bool = False):
    """Decode the split.  Returns (predictions, wall_seconds, n_captions).

    collect_grounding: optional callback(example, sents, sorted_ind,
    att_weights, order) for the grounding path (grd_utils.py:13-61).

    mesh: optional jax.sharding.Mesh — params replicate and, per
    ``shard_axis``, either the image axis ("image": batch_images must
    divide by the mesh) or the flat sub-graph-row axis ("subgraph": any
    batch_images, single keep-1000 images balance across devices) shards
    over ``data`` (SURVEY.md §2.3/§5: this workload's sequence-parallel
    analog).
    """
    if shard_axis not in ("image", "subgraph"):
        raise ValueError(f"shard_axis must be 'image' or 'subgraph', "
                         f"got {shard_axis!r}")
    if shard_axis != "image" and mesh is None:
        raise ValueError(
            f"shard_axis={shard_axis!r} requires a mesh (it would silently "
            f"run unsharded otherwise); pass mesh= or use shard_axis='image'")
    if mesh is not None:
        from ..parallel import mesh as M
        params = M.replicate(mesh, params)
        state = M.replicate(mesh, state)
        if shard_axis == "subgraph":
            _place = lambda t: M.replicate(
                mesh, jax.tree_util.tree_map(jnp.asarray, t))
        else:
            _place = lambda t: M.shard_leading_axis(
                mesh, jax.tree_util.tree_map(jnp.asarray, t))
    else:
        _place = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
    infer = make_batched_infer_fn(
        cfg, ecfg, mesh=mesh if shard_axis == "subgraph" else None)
    rng = rng if rng is not None else jax.random.PRNGKey(2019)

    examples = list(loader.iter_split(split, num_images))
    if not examples:
        return [], 0.0, 0

    # fixed-size image batches (last one padded by repetition)
    batches = []
    for i in range(0, len(examples), batch_images):
        chunk = examples[i:i + batch_images]
        n_real = len(chunk)
        while len(chunk) < batch_images:
            chunk.append(chunk[-1])
        graph, subs = _stack_examples(chunk)
        batches.append((chunk[:n_real], graph, subs, n_real))

    t0 = time.time()
    # sliding window of in-flight dispatches: compute/transfer overlap
    # without pinning every batch's inputs in HBM for large splits
    max_inflight = 8
    pending = []
    predictions: List[dict] = []
    n_caps = 0
    # seeded locally: debug output stays reproducible run-to-run and the
    # global numpy stream is left untouched mid-eval
    vb_rng = np.random.RandomState(2019) if ecfg.verbose_beam else None

    def drain_one():
        nonlocal n_caps
        chunk, out_dev, n_real = pending.pop(0)
        out = jax.device_get(out_dev)
        for bi, ex in enumerate(chunk):
            keep_valid = out["keep_valid"][bi]
            n = int(keep_valid.sum())
            seq = out["seq"][bi][:n]
            scores = out["scores"][bi][:n]
            keep_ind = out["keep_ind"][bi][:n]

            if not ecfg.sct:
                # sort captions by sGPN score desc (eval_utils.py:105-114)
                order = np.argsort(-scores, kind="stable")
            else:
                # SCT keeps input order (eval_utils.py:115-120)
                order = np.arange(n)
            sents = decode_sequence(vocab, seq[order],
                                    remove_bad_endings=ecfg.remove_bad_endings)
            pred = {
                "image_id": ex.info.id,
                "caption": sents,
                "subgraph_score": scores[order],
                "sorted_subgraph_ind": keep_ind[order],
            }
            if keep_tokens:
                # raw sGPN-ordered token ids: lets callers re-render the
                # same decode through another vocab surface without a
                # second TPU pass (tools/metric_bounds.py real corpus)
                pred["tokens"] = seq[order]
            predictions.append(pred)
            n_caps += len(sents)
            if collect_grounding is not None:
                att = out.get("att_weights")
                collect_grounding(ex, sents, keep_ind[order],
                                  att[bi][:n][order] if att is not None else None,
                                  order)
            if ecfg.verbose_beam and "all_beams" in out and n:
                # one random kept sub-graph's full beam list per image
                # (eval_utils.py:124-130)
                i = int(vb_rng.choice(n))
                beams = decode_sequence(
                    vocab, out["all_beams"][bi][i],
                    remove_bad_endings=ecfg.remove_bad_endings)
                print(f"beam search sentences of image {ex.info.id} "
                      f"(sub-graph {int(out['keep_ind'][bi][i])}):")
                print("\n".join(beams))
                print("--" * 10)
            if verbose and len(predictions) <= 3:
                print(f"image {ex.info.id}: kept {n} sub-graphs; best: "
                      f"{sents[0] if sents else '<none>'!r}")

    for chunk, graph, subs, n_real in batches:
        rng, r = jax.random.split(rng)
        out = infer(params, state, _place(graph), _place(subs), r)
        pending.append((chunk, out, n_real))
        if len(pending) >= max_inflight:
            drain_one()
    while pending:
        drain_one()
    wall = time.time() - t0
    return predictions, wall, n_caps


def save_predictions(predictions, out_dir: str, iter_tag: str,
                     sct: bool = False) -> str:
    os.makedirs(out_dir, exist_ok=True)
    name = ("ctl_captions_{}.npy" if sct else "captions_{}.npy").format(iter_tag)
    path = os.path.join(out_dir, name)
    np.save(path, np.asarray(predictions, dtype=object), allow_pickle=True)
    return path
