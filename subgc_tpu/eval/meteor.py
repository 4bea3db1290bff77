"""METEOR reimplementation (exact + stem stages).

The reference shells out to the METEOR 1.5 Java jar
(`misc/coco-caption/pycocoevalcap/meteor/meteor.py:15,23-25`); the jar and
its paraphrase tables are NOT shipped in the repo (downloaded separately), so
this is a from-scratch Python implementation of the METEOR 1.5 algorithm:

* stage-wise word alignment — exact match, then Porter-stem match — chosen to
  (1) maximize matches and (2) minimize crossing/chunks (greedy approximation
  of the jar's beam search)
* recall-weighted harmonic mean + cubic fragmentation penalty; multi-
  reference = max over references

Parameters are the classic METEOR English settings (Banerjee & Lavie):
alpha=0.9 (Fmean = 10PR/(R+9P)), penalty = 0.5*(chunks/matches)^3, stage
weights (exact 1.0, stem 0.6).  DIVERGENCE from the 1.5 jar: no
WordNet-synonym or paraphrase stages (their data files are external
downloads the reference doesn't ship either); scores correlate but are not
bit-identical.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from .stemmer import porter_stem

ALPHA = 0.9       # recall weight in the harmonic mean
BETA = 3.0        # fragmentation exponent
GAMMA = 0.5       # max penalty
STAGE_WEIGHTS = [1.0, 0.6]    # exact, stem


def _align(hyp: List[str], ref: List[str]) -> List[Tuple[int, int, int]]:
    """Greedy stage-wise alignment.  Returns [(hyp_i, ref_j, stage)]."""
    matches = []
    used_h = [False] * len(hyp)
    used_r = [False] * len(ref)
    keys = [hyp, [porter_stem(w) for w in hyp]]
    rkeys = [ref, [porter_stem(w) for w in ref]]
    for stage in range(len(keys)):
        hk, rk = keys[stage], rkeys[stage]
        # prefer monotone pairs: walk hyp left-to-right, match nearest
        # unused ref occurrence (minimizes chunks in the common case)
        last_j = -1
        for i in range(len(hyp)):
            if used_h[i]:
                continue
            best = None
            for j in range(len(ref)):
                if used_r[j] or rk[j] != hk[i]:
                    continue
                d = (0 if j > last_j else 1, abs(j - (last_j + 1)))
                if best is None or d < best[0]:
                    best = (d, j)
            if best is not None:
                j = best[1]
                used_h[i] = True
                used_r[j] = True
                matches.append((i, j, stage))
                last_j = j
    return sorted(matches)


def _chunks(matches: List[Tuple[int, int, int]]) -> int:
    if not matches:
        return 0
    ch = 1
    for (i1, j1, _), (i2, j2, _) in zip(matches, matches[1:]):
        if i2 != i1 + 1 or j2 != j1 + 1:
            ch += 1
    return ch


def meteor_sentence(hypothesis: str, references: List[str]) -> float:
    hyp = hypothesis.split()
    if not hyp:
        return 0.0
    best = 0.0
    for reference in references:
        ref = reference.split()
        if not ref:
            continue
        matches = _align(hyp, ref)
        if not matches:
            continue
        m = sum(STAGE_WEIGHTS[s] for _, _, s in matches)
        P = m / len(hyp)
        R = m / len(ref)
        if P == 0 or R == 0:
            continue
        # Fmean = 10PR/(R+9P): recall-dominant harmonic mean
        f_mean = P * R / (ALPHA * P + (1 - ALPHA) * R)
        frag = _chunks(matches) / len(matches)
        penalty = GAMMA * (frag ** BETA)
        score = (1.0 - penalty) * f_mean
        best = max(best, score)
    return best


def compute_meteor(gts: Dict, res: Dict) -> Tuple[float, np.ndarray]:
    assert list(gts.keys()) == list(res.keys())
    scores = [meteor_sentence(res[k][0], gts[k]) for k in gts]
    return float(np.mean(scores)), np.asarray(scores)
