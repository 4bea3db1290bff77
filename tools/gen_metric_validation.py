"""Generate the pinned METEOR/SPICE validation corpus (VERDICT r1 item 2).

Builds a 250-pair caption corpus with a seeded perturbation model, scores it
with:

* subgc_tpu.eval.meteor (the shipped scorer),
* an INDEPENDENT oracle: nltk.translate.meteor_score — a separate
  implementation of the same Banerjee/Lavie alignment + penalty algorithm
  (exact + Porter-stem stages; WordNet stubbed out since its data is an
  external download, exactly like the reference's METEOR jar data,
  misc/coco-caption/pycocoevalcap/meteor/meteor.py:15,23-25),
* subgc_tpu.eval.spice (pinned for drift detection).

Writes tests/data/metric_validation.json with the corpus, all scores, and the
measured correlation/Δ statistics that tests/test_metric_fidelity.py asserts
as CI bounds.  Re-run deliberately after intentional scorer changes:

    python tools/gen_metric_validation.py
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from subgc_tpu.eval.meteor import SYNONYM_GROUPS, meteor_sentence
from subgc_tpu.eval.spice import parse_tuples, spice_sentence
from subgc_tpu.eval.spice_oracle import oracle_tuples, spice_sentence_oracle

NOUNS = ("man woman dog cat horse car bus bike boat plane child girl boy "
         "bench table chair pizza sandwich cake umbrella kite surfboard "
         "skateboard laptop phone cup plate bowl bottle clock vase street "
         "road beach ocean mountain field park kitchen bathroom bedroom "
         "train truck elephant giraffe zebra bear sheep cow bird").split()
ADJS = ("young old big small red blue green white black brown tall short "
        "happy pretty wooden plastic shiny dirty clean wet large little "
        "fast slow").split()
VERBS = ("riding holding eating watching standing sitting walking running "
         "jumping playing carrying wearing throwing catching flying "
         "crossing").split()
PREPS = "on in near under behind beside above at with by".split()

_SYN = {}
for grp in SYNONYM_GROUPS:
    ws = grp.split()
    for w in ws:
        _SYN[w] = ws


def _sentence(r: np.random.RandomState) -> list:
    words = ["a"]
    if r.rand() < 0.7:
        words.append(ADJS[r.randint(len(ADJS))])
    words.append(NOUNS[r.randint(len(NOUNS))])
    words.append(VERBS[r.randint(len(VERBS))])
    words.append("a")
    if r.rand() < 0.4:
        words.append(ADJS[r.randint(len(ADJS))])
    words.append(NOUNS[r.randint(len(NOUNS))])
    if r.rand() < 0.8:
        words += [PREPS[r.randint(len(PREPS))], "the",
                  NOUNS[r.randint(len(NOUNS))]]
    return words


def _perturb(words: list, n_edits: int, r: np.random.RandomState) -> list:
    out = list(words)
    for _ in range(n_edits):
        if not out:
            break
        op = r.randint(5)
        i = r.randint(len(out))
        if op == 0:                                   # substitute random word
            out[i] = (NOUNS + ADJS + VERBS)[r.randint(
                len(NOUNS) + len(ADJS) + len(VERBS))]
        elif op == 1:                                 # drop
            out.pop(i)
        elif op == 2:                                 # synonym swap
            if out[i] in _SYN:
                alts = [w for w in _SYN[out[i]] if w != out[i]]
                out[i] = alts[r.randint(len(alts))]
        elif op == 3:                                 # inflection change
            w = out[i]
            if w.endswith("ing"):
                out[i] = w[:-3] + ("s" if r.rand() < 0.5 else "")
            elif not w.endswith("s"):
                out[i] = w + "s"
        else:                                         # local swap
            if i + 1 < len(out):
                out[i], out[i + 1] = out[i + 1], out[i]
    return out


class _NoWordnet:
    """WordNet stub for the nltk oracle (data file is an external download)."""

    def synsets(self, word):
        return []


def build_corpus(n_pairs: int = 250, seed: int = 2019):
    r = np.random.RandomState(seed)
    corpus = []
    for _ in range(n_pairs):
        base = _sentence(r)
        refs = [" ".join(_perturb(base, r.randint(0, 3), r))
                for _ in range(r.randint(2, 4))]
        hyp = " ".join(_perturb(base, r.randint(0, 8), r))
        corpus.append({"hyp": hyp, "refs": refs})
    return corpus


def main():
    from nltk.translate.meteor_score import meteor_score

    corpus = build_corpus()
    wn = _NoWordnet()
    ours, matched, oracle, spice = [], [], [], []
    spice_orc = []
    tup_tp = tup_fp = tup_fn = 0
    for pair in corpus:
        ours.append(meteor_sentence(pair["hyp"], pair["refs"]))
        # matched config: exact+stem stages, unweighted — the exact algorithm
        # the nltk oracle implements, isolating alignment fidelity from the
        # intended METEOR-1.5 parameter differences
        matched.append(meteor_sentence(pair["hyp"], pair["refs"],
                                       stage_weights=[1.0, 1.0]))
        oracle.append(meteor_score([rf.split() for rf in pair["refs"]],
                                   pair["hyp"].split(), wordnet=wn))
        spice.append(spice_sentence(pair["hyp"], pair["refs"])["All"]["f"])
        # SPICE oracle: algorithmically independent extractor (closed POS
        # lexicon + NP/clause grammar vs morphology chunker) over the same
        # tuple space — subgc_tpu/eval/spice_oracle.py
        spice_orc.append(
            spice_sentence_oracle(pair["hyp"], pair["refs"])["All"]["f"])
        for cap in [pair["hyp"]] + pair["refs"]:
            t_c, t_o = parse_tuples(cap), oracle_tuples(cap)
            tup_tp += len(t_c & t_o)
            tup_fp += len(t_c - t_o)
            tup_fn += len(t_o - t_c)

    def _stats(a, b):
        a, b = np.asarray(a), np.asarray(b)
        return {"pearson_r": float(np.corrcoef(a, b)[0, 1]),
                "mean_abs_delta": float(np.mean(np.abs(a - b))),
                "max_abs_delta": float(np.max(np.abs(a - b))),
                "mean_delta": float(np.mean(a - b)),
                "exact_equal": int(np.sum(np.abs(a - b) < 1e-9)),
                "ge_oracle": int(np.sum(a >= b - 1e-9))}

    tp_p = tup_tp / (tup_tp + tup_fp)
    tp_r = tup_tp / (tup_tp + tup_fn)
    stats = {"shipped_vs_nltk": _stats(ours, oracle),
             "matched_vs_nltk": _stats(matched, oracle),
             "spice_vs_oracle": dict(
                 _stats(spice, spice_orc),
                 tuple_precision=tp_p, tuple_recall=tp_r,
                 tuple_f1=2 * tp_p * tp_r / (tp_p + tp_r))}
    print("METEOR vs nltk oracle / SPICE vs lexicon oracle:",
          json.dumps(stats, indent=2))

    out = {
        "corpus": corpus,
        "meteor_ours": [round(x, 10) for x in ours],
        "meteor_matched": [round(x, 10) for x in matched],
        "meteor_nltk_oracle": [round(x, 10) for x in oracle],
        "spice_ours": [round(x, 10) for x in spice],
        "spice_lexicon_oracle": [round(x, 10) for x in spice_orc],
        "stats": stats,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "data",
        "metric_validation.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path} ({len(corpus)} pairs)")


if __name__ == "__main__":
    main()
