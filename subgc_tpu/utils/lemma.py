"""Small rule-based English lemmatizer.

Replaces the Stanford CoreNLP lemma server the reference's grounding eval
shells into (`misc/grounding/eval_grd_flickr30k_entities.py:124-126` — only
ever called on single tokens).  Handles regular plural/verb inflections plus
a table of irregulars common in caption text.
"""
from __future__ import annotations

IRREGULAR = {
    "men": "man", "women": "woman", "children": "child", "people": "person",
    "feet": "foot", "teeth": "tooth", "geese": "goose", "mice": "mouse",
    "wolves": "wolf", "knives": "knife", "leaves": "leaf", "lives": "life",
    "shelves": "shelf", "loaves": "loaf", "scarves": "scarf",
    "was": "be", "were": "be", "is": "be", "are": "be", "am": "be",
    "been": "be", "being": "be", "has": "have", "had": "have",
    "ran": "run", "running": "run", "sat": "sit", "sitting": "sit",
    "stood": "stand", "standing": "stand", "held": "hold", "ate": "eat",
    "went": "go", "did": "do", "done": "do", "said": "say", "made": "make",
    "buses": "bus", "glasses": "glass", "dresses": "dress",
    "dishes": "dish", "benches": "bench", "beaches": "beach",
    "watches": "watch", "sandwiches": "sandwich", "churches": "church",
    "boxes": "box", "foxes": "fox",
}

_KEEP_S = {"gas", "bus", "grass", "glass", "dress", "class", "chess",
           "tennis", "jeans", "pants", "shorts", "scissors", "sunglasses",
           "clothes", "pliers", "series", "species", "news"}


def lemmatize(word: str) -> str:
    w = word.lower()
    if w in IRREGULAR:
        return IRREGULAR[w]
    if w in _KEEP_S:
        return w
    if len(w) > 3 and w.endswith("ies"):
        return w[:-3] + "y"
    if len(w) > 3 and w.endswith(("ches", "shes", "xes", "sses", "zes")):
        return w[:-2]
    if len(w) > 2 and w.endswith("s") and not w.endswith(("ss", "us", "is")):
        return w[:-1]
    return w
