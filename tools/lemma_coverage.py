"""Lemmatizer coverage over the full detector class vocabulary + a
frequency-weighted caption-token corpus (VERDICT r3 item 8).

The grounding eval replaces the reference's Stanford CoreNLP lemma server
(`misc/grounding/eval_grd_flickr30k_entities.py:124-126,164`) with the rule
lemmatizer in `subgc_tpu/utils/lemma.py`.  Its fidelity was previously
pinned only on ~200 hand-picked words (tests/test_lemma_breadth.py).  This
tool quantifies coverage on the two vocabularies the eval actually
lemmatizes:

1. **Full VG-1600 class vocabulary** (`data/object_names_1600-0-20.npy`,
   1,598 class names — the detector classes behind every scene graph).
   Ground truth is mined from the vocabulary itself: it contains both the
   singular and plural form for 240+ classes (``animal``/``animals``), so
   "plural class and its in-list singular must map to the same lemma" is a
   real, non-circular equivalence test.  Lookalike pairs that must NOT
   merge (``skies``/``ski``, ``stripes``/``strip``, ``panes``/``pan``) are
   the false-merge negatives.  What matters for the eval is EQUIVALENCE —
   `lemma(cls) == lemma(token)` — not the lemma string itself, because both
   sides pass through the same function (divergences that relabel both
   sides consistently are score-invariant, the same argument as the
   tokenizer axis in docs/METRICS.md).

2. **Caption-shaped token corpus**, frequency-weighted: the ~190 most
   frequent COCO/Flickr caption tokens (relative weights approximating the
   COCO caption distribution, which is heavily concentrated: "a/on/of/the/
   in/with/and" alone are ~30% of tokens), each with the lemma CoreNLP's
   morphology (Morpha) produces.  Tokens whose CoreNLP behavior is genuinely
   uncertain offline (pluralia tantum like ``pants``/``jeans``) are a
   separate documented bucket, reported by weight, not silently counted.

Writes docs/lemma_coverage.json; envelopes pinned in
tests/test_lemma_coverage.py; summary row in docs/METRICS.md.
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from subgc_tpu.utils.lemma import lemmatize

VG_CLASSES = "/root/reference/data/object_names_1600-0-20.npy"

# Pluralia-tantum / ambiguous classes: CoreNLP's Morpha behavior on these
# cannot be verified offline (it may strip jeans->jean, pants->pant, ...).
# Our per-word choices are documented in utils/lemma.py: pants/jeans/
# shorts/scissors/clothes/sunglasses stay invariant, glasses/woods/blinds/
# goggles take the regular-plural read.  Either way both sides of the
# grounding comparison go through the same function, so only a merge/split
# disagreement with CoreNLP can move scores; these words are excluded from
# the pair-recall denominator and reported separately.
AMBIGUOUS_CLASSES = {"clothes", "jeans", "pants", "shorts", "scissors",
                     "glasses", "sunglasses", "woods", "blinds", "goggles"}

# Lookalike (plural-of-X, different-word-Y) pairs mined from the class
# list: the plural's mechanical strip lands on ANOTHER in-list word.  The
# lemmatizer must NOT merge these.
FALSE_MERGE_NEGATIVES = [
    ("skies", "ski"), ("stripes", "strip"), ("panes", "pan"),
    ("bowls", "bow"), ("carts", "car"), ("seats", "sea"),
    ("planes", "plan"), ("pants", "pan"), ("beads", "bea"),
    ("grapes", "grap"), ("plates", "plat"), ("waves", "wav"),
]


def mine_class_pairs(names):
    """Gold (plural, singular) equivalence pairs: both forms appear in the
    class vocabulary and the plural is a regular/irregular inflection of
    the singular.  Mining is mechanical (suffix candidates checked against
    the list) — NOT via lemmatize(), so the test is non-circular."""
    single = [n for n in names if " " not in n]
    nameset = set(single)

    def strip_candidates(n):
        c = []
        if n.endswith("ies") and len(n) > 3:
            c += [n[:-3] + "y", n[:-1]]
        if n.endswith("ves") and len(n) > 3:
            c += [n[:-3] + "f", n[:-3] + "fe"]
        if n.endswith("es") and len(n) > 2:
            c += [n[:-2]]
        if n.endswith("s") and len(n) > 1:
            c += [n[:-1]]
        if n.endswith("men"):
            c += [n[:-3] + "man"]
        return [x for x in dict.fromkeys(c) if x in nameset and x != n]

    # hand adjudication for the only multi-candidate / lookalike cases in
    # the VG list (the candidate that is the true singular)
    ADJUDICATED = {"skies": "sky", "stripes": "stripe", "bowls": "bowl",
                   "carts": "cart", "seats": "seat", "planes": "plane",
                   "veggies": "veggie",
                   # 'panes' has no in-list true singular ('pane' absent);
                   # its only candidate 'pan' is a different word
                   "panes": None}
    pairs, skipped = [], []
    for n in sorted(single):
        if n in AMBIGUOUS_CLASSES:
            if strip_candidates(n):
                skipped.append(n)
            continue
        if n in ADJUDICATED:
            if ADJUDICATED[n] is not None:
                pairs.append((n, ADJUDICATED[n]))
            continue
        cands = strip_candidates(n)
        if len(cands) == 1:
            pairs.append((n, cands[0]))
        elif len(cands) > 1:
            raise AssertionError(
                f"unadjudicated multi-candidate class {n}: {cands}")
    return pairs, skipped


def class_vocab_eval():
    names = [str(x) for x in np.load(VG_CLASSES, allow_pickle=True).tolist()
             if str(x) != "__background__"]
    pairs, ambiguous = mine_class_pairs(names)
    misses = [(p, s, lemmatize(p), lemmatize(s)) for p, s in pairs
              if lemmatize(p) != lemmatize(s)]
    merges = [(a, b, lemmatize(a)) for a, b in FALSE_MERGE_NEGATIVES
              if lemmatize(a) == lemmatize(b)]
    # stability: lemma must be a fixed point for every class-name token
    # (the eval compares lemma(cls) to lemma(token) — an unstable lemma
    # would never match itself)
    toks = sorted({t for n in names for t in n.split()})
    unstable = [t for t in toks if lemmatize(lemmatize(t)) != lemmatize(t)]
    return {
        "n_classes": len(names),
        "n_gold_pairs": len(pairs),
        "pair_recall": round(1.0 - len(misses) / len(pairs), 6),
        "pair_misses": [list(m) for m in misses],
        "false_merges": [list(m) for m in merges],
        "n_class_tokens": len(toks),
        "unstable_tokens": unstable,
        "ambiguous_pluralia_tantum": sorted(ambiguous),
    }


# (token, relative weight, CoreNLP-style lemma or None if offline-uncertain)
# Weights approximate the COCO caption token distribution (top tokens cover
# the overwhelming majority of caption mass); identity lemmas spelled out.
CAPTION_TOKENS = [
    ("a", 1.000, "a"), ("on", 0.250, "on"), ("of", 0.210, "of"),
    ("the", 0.200, "the"), ("in", 0.190, "in"), ("with", 0.170, "with"),
    ("and", 0.150, "and"), ("is", 0.120, "be"), ("man", 0.100, "man"),
    ("sitting", 0.090, "sit"), ("standing", 0.060, "stand"),
    ("two", 0.060, "two"), ("at", 0.050, "at"), ("are", 0.050, "be"),
    ("to", 0.050, "to"), ("white", 0.040, "white"),
    ("woman", 0.040, "woman"), ("people", 0.040, None),
    ("street", 0.030, "street"), ("table", 0.030, "table"),
    ("holding", 0.030, "hold"), ("next", 0.030, "next"),
    ("person", 0.030, "person"), ("an", 0.030, "a"),
    ("riding", 0.025, "ride"), ("group", 0.020, "group"),
    ("top", 0.020, "top"), ("field", 0.020, "field"),
    ("small", 0.020, "small"), ("plate", 0.020, "plate"),
    ("near", 0.020, "near"), ("large", 0.020, "large"),
    ("front", 0.020, "front"), ("that", 0.015, "that"),
    ("some", 0.015, "some"), ("it", 0.015, "it"), ("his", 0.015, "his"),
    ("dog", 0.015, "dog"), ("black", 0.015, "black"),
    ("young", 0.014, "young"), ("tennis", 0.013, "tennis"),
    ("train", 0.013, "train"), ("water", 0.013, "water"),
    ("red", 0.013, "red"), ("food", 0.012, "food"),
    ("down", 0.011, "down"), ("playing", 0.011, "play"),
    ("walking", 0.011, "walk"), ("game", 0.010, "game"),
    ("bathroom", 0.010, "bathroom"), ("snow", 0.010, "snow"),
    ("room", 0.010, "room"), ("grass", 0.010, "grass"),
    ("beach", 0.010, "beach"), ("baseball", 0.010, "baseball"),
    ("each", 0.009, "each"), ("other", 0.009, "other"),
    ("green", 0.009, "green"), ("cat", 0.009, "cat"),
    ("wearing", 0.009, "wear"), ("eating", 0.008, "eat"),
    ("blue", 0.008, "blue"), ("by", 0.008, "by"), ("side", 0.008, "side"),
    ("kitchen", 0.008, "kitchen"), ("bus", 0.008, "bus"),
    ("pizza", 0.008, "pizza"), ("parked", 0.007, "park"),
    ("looking", 0.007, "look"), ("up", 0.007, "up"),
    ("flying", 0.007, "fly"), ("bench", 0.006, "bench"),
    ("covered", 0.006, "cover"), ("building", 0.006, "building"),
    ("road", 0.006, "road"), ("boy", 0.006, "boy"),
    ("couple", 0.006, "couple"), ("horse", 0.006, "horse"),
    ("city", 0.006, "city"), ("several", 0.006, "several"),
    ("girl", 0.006, "girl"), ("around", 0.005, "around"),
    ("bed", 0.005, "bed"), ("truck", 0.005, "truck"),
    ("ball", 0.005, "ball"), ("laying", 0.005, "lay"),
    ("while", 0.005, "while"), ("picture", 0.005, "picture"),
    ("her", 0.005, "her"), ("out", 0.005, "out"), ("dirt", 0.005, "dirt"),
    ("over", 0.005, "over"), ("men", 0.005, "man"),
    ("sign", 0.005, "sign"), ("car", 0.005, "car"),
    ("women", 0.004, "woman"), ("children", 0.004, "child"),
    ("three", 0.004, "three"), ("little", 0.004, "little"),
    ("air", 0.004, "air"), ("one", 0.004, "one"),
    ("cake", 0.004, "cake"), ("brown", 0.004, "brown"),
    ("there", 0.004, "there"), ("off", 0.004, "off"),
    ("playing", 0.004, "play"), ("through", 0.004, "through"),
    ("many", 0.004, "many"), ("elephant", 0.004, "elephant"),
    ("has", 0.004, "have"), ("player", 0.004, "player"),
    ("boat", 0.004, "boat"), ("its", 0.004, "its"),
    ("umbrella", 0.004, "umbrella"), ("as", 0.004, "as"),
    ("skateboard", 0.004, "skateboard"), ("giraffe", 0.004, "giraffe"),
    ("wooden", 0.003, "wooden"), ("plane", 0.003, "plane"),
    ("another", 0.003, "another"), ("zebra", 0.003, "zebra"),
    ("skis", 0.003, "ski"), ("from", 0.003, "from"),
    ("together", 0.003, "together"), ("filled", 0.003, "fill"),
    ("bear", 0.003, "bear"), ("very", 0.003, "very"),
    ("toilet", 0.003, "toilet"), ("computer", 0.003, "computer"),
    ("behind", 0.003, "behind"), ("clock", 0.003, "clock"),
    ("kite", 0.003, "kite"), ("cell", 0.003, "cell"),
    ("phone", 0.003, "phone"), ("window", 0.003, "window"),
    ("yellow", 0.003, "yellow"), ("under", 0.003, "under"),
    ("court", 0.003, "court"), ("area", 0.003, "area"),
    ("stands", 0.003, "stand"), ("sits", 0.003, "sit"),
    ("train", 0.003, "train"), ("motorcycle", 0.003, "motorcycle"),
    ("against", 0.003, "against"), ("surfboard", 0.003, "surfboard"),
    ("ocean", 0.003, "ocean"), ("tracks", 0.003, "track"),
    ("orange", 0.003, "orange"), ("wall", 0.003, "wall"),
    ("glass", 0.003, "glass"), ("talking", 0.003, "talk"),
    ("big", 0.003, "big"), ("sheep", 0.003, "sheep"),
    ("airplane", 0.003, "airplane"), ("hand", 0.003, "hand"),
    ("wave", 0.002, "wave"), ("herd", 0.002, "herd"),
    ("trees", 0.002, "tree"), ("fire", 0.002, "fire"),
    ("hydrant", 0.002, "hydrant"), ("across", 0.002, "across"),
    ("empty", 0.002, "empty"), ("hit", 0.002, "hit"),
    ("banana", 0.002, "banana"), ("cars", 0.002, "car"),
    ("plays", 0.002, "play"), ("surfer", 0.002, "surfer"),
    ("luggage", 0.002, "luggage"), ("driving", 0.002, "drive"),
    ("flowers", 0.002, "flower"), ("vase", 0.002, "vase"),
    ("being", 0.002, "be"), ("different", 0.002, "different"),
    ("floor", 0.002, "floor"), ("bird", 0.002, "bird"),
    ("into", 0.002, "into"), ("them", 0.002, "they"),
    ("stop", 0.002, "stop"), ("fence", 0.002, "fence"),
    ("crowd", 0.002, "crowd"), ("sand", 0.002, "sand"),
    ("their", 0.002, "their"), ("hot", 0.002, "hot"),
    ("was", 0.002, "be"), ("been", 0.002, "be"), ("had", 0.002, "have"),
    ("jumping", 0.002, "jump"), ("smiling", 0.002, "smile"),
    ("swinging", 0.002, "swing"), ("throwing", 0.002, "throw"),
    ("catching", 0.002, "catch"), ("running", 0.002, "run"),
    ("cutting", 0.002, "cut"), ("surfing", 0.002, "surf"),
    ("skiing", 0.002, "ski"), ("carrying", 0.002, "carry"),
    ("drinking", 0.002, "drink"), ("watching", 0.002, "watch"),
    ("getting", 0.002, "get"), ("making", 0.002, "make"),
    ("taking", 0.002, "take"), ("going", 0.002, "go"),
    ("using", 0.002, "use"), ("preparing", 0.001, "prepare"),
    ("decorated", 0.001, None), ("dressed", 0.001, "dress"),
    ("attached", 0.001, None), ("stacked", 0.001, "stack"),
    ("topped", 0.001, "top"), ("grazing", 0.001, "graze"),
    ("crossing", 0.001, "crossing"), ("waiting", 0.001, "wait"),
]


def caption_corpus_eval():
    total_w = sum(w for _, w, _ in CAPTION_TOKENS)
    agree_w = miss_w = amb_w = 0.0
    misses, ambiguous = [], []
    for tok, w, gold in CAPTION_TOKENS:
        if gold is None:
            amb_w += w
            ambiguous.append((tok, lemmatize(tok)))
            continue
        if lemmatize(tok) == gold:
            agree_w += w
        else:
            miss_w += w
            misses.append((tok, lemmatize(tok), gold))
    scored_w = agree_w + miss_w
    return {
        "n_tokens": len(CAPTION_TOKENS),
        "weighted_agreement": round(agree_w / scored_w, 6),
        "misses": [list(m) for m in misses],
        "ambiguous_mass_frac": round(amb_w / total_w, 6),
        "ambiguous": [list(a) for a in ambiguous],
    }


def main(json_out=None):
    report = {"class_vocab": class_vocab_eval(),
              "caption_corpus": caption_corpus_eval()}
    if json_out is None:
        json_out = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "docs", "lemma_coverage.json")
    with open(json_out, "w") as f:
        json.dump(report, f, indent=1)
    cv, cc = report["class_vocab"], report["caption_corpus"]
    print(json.dumps({
        "metric": "lemmatizer coverage",
        "vg1600_pair_recall": cv["pair_recall"],
        "vg1600_gold_pairs": cv["n_gold_pairs"],
        "false_merges": len(cv["false_merges"]),
        "unstable_class_tokens": len(cv["unstable_tokens"]),
        "caption_weighted_agreement": cc["weighted_agreement"],
        "caption_ambiguous_mass": cc["ambiguous_mass_frac"],
        "report": json_out}))
    return report


if __name__ == "__main__":
    main()
