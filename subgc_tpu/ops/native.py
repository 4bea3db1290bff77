"""ctypes bindings for the native C++ host cores (native/subgc_native.cpp).

Builds the shared library on demand (g++ is baked into the image) and falls
back to the pure-Python implementations if compilation is unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libsubgc_native.so")

_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    src = os.path.join(_NATIVE_DIR, "subgc_native.cpp")
    try:
        if (not os.path.exists(_SO_PATH)
                or os.path.getmtime(_SO_PATH) < os.path.getmtime(src)):
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(_SO_PATH)
        lib.subgc_ptb_tokenize.restype = ctypes.c_void_p
        lib.subgc_ptb_tokenize.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.subgc_free.argtypes = [ctypes.c_void_p]
        lib.subgc_pairwise_cider.restype = ctypes.c_int
        lib.subgc_pairwise_cider.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_double, ctypes.POINTER(ctypes.c_double)]
        lib.subgc_mutual_bleu4.restype = ctypes.c_int
        lib.subgc_mutual_bleu4.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_double)]
        lib.subgc_sample_pos_neg.restype = ctypes.c_int
        lib.subgc_sample_pos_neg.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_double, ctypes.c_int, ctypes.c_ulonglong,
            ctypes.POINTER(ctypes.c_longlong)]
        _lib = lib
    except Exception as e:
        print(f"subgc_native unavailable ({e}); using python fallbacks")
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def ptb_tokenize_batch(sentences: Sequence[str],
                       lowercase: bool = True) -> List[str]:
    """Tokenize a batch of raw sentences -> cleaned token strings."""
    lib = _load()
    if lib is None:
        from ..eval.tokenizer import tokenize
        out = tokenize({0: [{"caption": s} for s in sentences]})
        return out[0]
    blob = "\n".join(_oneline(s) for s in sentences)
    ptr = lib.subgc_ptb_tokenize(blob.encode("utf-8"), 1 if lowercase else 0)
    try:
        result = ctypes.string_at(ptr).decode("utf-8")
    finally:
        lib.subgc_free(ptr)
    return result.split("\n")


def _oneline(s: str) -> str:
    """Collapse whitespace separators embedded in a sentence before it
    rides the '\\n'/'\\t'-framed native blobs.  An embedded newline would
    desync the C side's line count from the python-allocated output buffer
    (heap overflow); an embedded tab either splits a df doc in the wrong
    place or — because the C tokenizer splits on ' ' only while python's
    str.split() treats any whitespace as a separator — silently fuses two
    tokens into one and corrupts the score.  Space-collapsing is exactly
    python-fallback-neutral."""
    return s.replace("\n", " ").replace("\r", " ").replace("\t", " ")


def pairwise_cider_matrix(df_docs: Sequence[Sequence[str]],
                          hyps: Sequence[str], refs: Sequence[str],
                          sigma: float = 6.0) -> np.ndarray:
    """[len(hyps), len(refs)] pairwise CIDEr sims under a df corpus."""
    lib = _load()
    if lib is None:
        from ..eval.cider import PairwiseCider
        pc = PairwiseCider(df_docs, sigma=sigma)
        hv = [pc.vec(h) for h in hyps]
        rv = [pc.vec(r) for r in refs]
        return np.asarray([[pc.sim(h, r) for r in rv] for h in hv])
    df_blob = "\n".join("\t".join(_oneline(s) for s in doc)
                        for doc in df_docs)
    out = np.zeros((len(hyps), len(refs)), np.float64)
    rc = lib.subgc_pairwise_cider(
        df_blob.encode("utf-8"),
        "\n".join(_oneline(h) for h in hyps).encode("utf-8"),
        "\n".join(_oneline(r) for r in refs).encode("utf-8"), sigma,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    assert rc == 0
    return out


def mutual_bleu4(sentences: Sequence[str]) -> np.ndarray:
    """BLEU-4 of each sentence vs the others (mBLEU-4 inner loop)."""
    lib = _load()
    if lib is None:
        from ..eval.bleu import compute_bleu
        out = []
        for i, s in enumerate(sentences):
            gts = {0: [g for j, g in enumerate(sentences) if j != i]}
            res = {0: [s]}
            corpus, _, _ = compute_bleu(gts, res)
            out.append(corpus[3])
        return np.asarray(out)
    out = np.zeros((len(sentences),), np.float64)
    rc = lib.subgc_mutual_bleu4(
        "\n".join(_oneline(s) for s in sentences).encode("utf-8"),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    assert rc == 0
    return out


def sample_pos_neg_native(node_iou_mtx: np.ndarray, thres: float, half: int,
                          seq_per_img: int, seed: int):
    """C++ weighted pos/neg sub-graph sampler (the train input hot loop —
    61% of get_batch time in python).  Same branching/weights as
    data.dataset.sample_pos_neg; distribution-parity, not numpy-stream-
    parity (draws come from a mt19937_64 seeded by ``seed``).  Returns
    [seq_per_img, half, 2] int64 indices, or None if the library is
    unavailable (caller falls back to python)."""
    lib = _load()
    if lib is None:
        return None
    if node_iou_mtx.ndim != 2 or node_iou_mtx.shape[0] < seq_per_img:
        return None  # python fallback raises/handles short matrices
    # Pass ALL rows: the weight column-sums cover the whole matrix in
    # sample_pos_neg, even when only the first seq_per_img rows are sampled.
    m = np.ascontiguousarray(node_iou_mtx, np.float32)
    out = np.empty((seq_per_img, half, 2), np.int64)
    rc = lib.subgc_sample_pos_neg(
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        m.shape[0], seq_per_img, m.shape[1], float(thres), half,
        ctypes.c_ulonglong(int(seed) & 0xFFFFFFFFFFFFFFFF),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)))
    if rc != 0:
        return None
    return out
