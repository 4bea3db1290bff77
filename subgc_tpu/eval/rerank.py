"""Consensus reranking (misc/consensus_reranking/).

Pipeline (cr_mRNN_demo.py + concensus_reranking_utils/consensus_reranking.py):
1. take the top-k (default 4) sGPN-ranked captions per test image,
2. find the k=60 nearest training images by euclidean distance on global
   image features (ResNet-101 2048-d in the reference),
3. score each hypothesis by the summed top m=125 pairwise CIDEr similarities
   against the retrieved images' GT sentences,
4. rerank, write consensus_rerank_ind.npy, and COCO-eval the new top-1.

TPU-first changes vs the reference:
* the NN search is one batched matmul-based distance on device instead of a
  per-image scipy cdist loop (consensus_reranking.py:104-119),
* pairwise CIDEr vectors are computed ONCE per unique sentence instead of
  per (hypothesis, reference) pair (the reference recomputes both vectors
  inside the inner loop — hours at scale, SURVEY.md §3.4).
"""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from .tokenizer import tokenize


def find_nn_images(test_feats: np.ndarray, train_feats: np.ndarray,
                   num_nn: int = 1000, batch: int = 512) -> np.ndarray:
    """[num_te, num_nn] indices of nearest train images (euclidean).

    Uses |a-b|^2 = |a|^2 + |b|^2 - 2ab as batched matmuls; runs on the
    accelerator when available, numpy otherwise.
    """
    try:
        import jax
        import jax.numpy as jnp

        tr = jnp.asarray(train_feats, jnp.float32)
        tr_sq = (tr * tr).sum(-1)

        @jax.jit
        def chunk_nn(te):
            d2 = (te * te).sum(-1, keepdims=True) + tr_sq[None, :] \
                - 2.0 * te @ tr.T
            _, idx = jax.lax.top_k(-d2, min(num_nn, tr.shape[0]))
            return idx

        outs = []
        for i in range(0, test_feats.shape[0], batch):
            te = jnp.asarray(test_feats[i:i + batch], jnp.float32)
            outs.append(np.asarray(chunk_nn(te)))
        return np.concatenate(outs, 0)
    except Exception:
        d = ((test_feats[:, None, :] - train_feats[None, :, :]) ** 2).sum(-1)
        return np.argsort(d, axis=1)[:, :num_nn]


def select_top_captions(predictions: List[dict], top_k: int = 4,
                        rand_k: Optional[int] = None,
                        seed: int = 2019) -> List[dict]:
    """captions_*.npy -> mRNN-format list (cr_mRNN_demo.py:43-61)."""
    rng = np.random.RandomState(seed)
    out = []
    for item in predictions:
        caps = item["caption"]
        if rand_k is None:
            chosen = [caps[i].split(" ") for i in range(min(top_k, len(caps)))]
        else:
            ind = rng.choice(len(caps), min(rand_k, len(caps)), replace=False)
            chosen = [caps[i].split(" ") for i in ind]
        out.append({"id": item["image_id"], "caption": chosen})
    return out


def consensus_rerank(hypo_list: List[dict], ref_annos: List[dict],
                     nn_list: np.ndarray, df_refs: Dict[object, List[str]],
                     k: int = 60, m: int = 125) -> Dict[object, List[int]]:
    """Returns {image_id: reranked hypothesis order} (consensus_rerank_ind).

    hypo_list: [{'id', 'caption': [[tok, ...], ...]}]
    ref_annos: [{'id', 'sentences': [str]}] aligned with nn_list columns
    df_refs:   {img_id: [raw ref strings]} — corpus for the CIDEr
               document-frequency table (the eval annotation set, matching
               COCOEvalCapPairCider.setup)
    """
    from ..ops.native import pairwise_cider_matrix

    df_tok = tokenize({kk: [{"caption": c} for c in v]
                       for kk, v in df_refs.items()})
    df_docs = list(df_tok.values())

    rerank_ind: Dict[object, List[int]] = {}
    for ind_te, anno in enumerate(hypo_list):
        retrieved: List[str] = []
        for ind_nn in range(min(k, nn_list.shape[1])):
            retrieved += ref_annos[int(nn_list[ind_te][ind_nn])]["sentences"]
        hyps = [" ".join(sen) for sen in anno["caption"]]
        sim_mtx = pairwise_cider_matrix(df_docs, hyps, retrieved)
        top = np.sort(sim_mtx, axis=1)[:, ::-1][:, :m]
        sims = top.sum(axis=1)
        arg = np.argsort(-sims).tolist()
        anno["reranked"] = [anno["caption"][x] for x in arg]
        rerank_ind[anno["id"]] = arg
    return rerank_ind


def rerank_predictions(predictions: List[dict], train_annos: List[dict],
                       train_feats: np.ndarray, test_feats: np.ndarray,
                       df_refs: Dict[object, List[str]], top_k: int = 4,
                       k: int = 60, m: int = 125, num_nn: int = 1000):
    """Full pipeline.  Returns (rerank_ind dict, top1 {img_id: caption str})."""
    hypo = select_top_captions(predictions, top_k=top_k)
    nn = find_nn_images(test_feats, train_feats, num_nn=num_nn)
    rerank_ind = consensus_rerank(hypo, train_annos, nn, df_refs, k=k, m=m)
    top1 = {h["id"]: " ".join(h["reranked"][0]) for h in hypo}
    return rerank_ind, top1
