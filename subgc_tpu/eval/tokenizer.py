"""PTB-style tokenizer in pure Python.

The reference shells out to the Stanford CoreNLP PTBTokenizer jar
(`misc/coco-caption/pycocoevalcap/tokenizer/ptbtokenizer.py:21,31-33`) with
``-preserveLines -lowerCase`` and strips a fixed punctuation list.  This is a
dependency-free reimplementation of the same pipeline modeled on the
classical PTB ``tokenizer.sed`` rules (the subset that can fire on caption
text): punctuation splitting, contraction splitting (n't, 's, 'll, ...),
bracket normalization, ellipsis/dash handling, and lowercasing.

On model-generated captions (vocab words joined by single spaces, no
punctuation) the output is byte-identical to the jar; on arbitrary GT text it
matches the jar on the common cases exercised in tests.
"""
from __future__ import annotations

import re
from typing import Dict, List

# tokens the coco-caption wrapper removes after tokenization
PUNCTUATIONS = ["''", "'", "``", "`", "-LRB-", "-RRB-", "-LCB-", "-RCB-",
                ".", "?", "!", ",", ":", "-", "--", "...", ";"]
_PUNCT_SET = set(PUNCTUATIONS)

_CONTRACTIONS2 = re.compile(r"\b(can)(not)\b", re.I)
_RULES = [
    # ellipsis
    (re.compile(r"\.\.\."), r" ... "),
    # brackets -> PTB symbols
    (re.compile(r"\("), " -LRB- "),
    (re.compile(r"\)"), " -RRB- "),
    (re.compile(r"\{"), " -LCB- "),
    (re.compile(r"\}"), " -RCB- "),
    (re.compile(r"\["), " -LRB- "),
    (re.compile(r"\]"), " -RRB- "),
    # most punctuation splits off
    (re.compile(r"([;@#$%&?!])"), r" \1 "),
    (re.compile(r"([^\.])(\.)([\]\)}>\"']*)\s*$"), r"\1 \2\3 "),
    (re.compile(r"[,](?=[^\d])|(?<=[^\d])[,]"), " , "),
    (re.compile(r":"), " : "),
    # double dash
    (re.compile(r"--"), " -- "),
    # quotes
    (re.compile(r'^"'), "`` "),
    (re.compile(r'(?<=[ (\[{<])"'), " `` "),
    (re.compile(r'"'), " '' "),
    # contractions (after quote handling so apostrophes survive)
    (re.compile(r"([^' ])('[sSmMdD]|'ll|'LL|'re|'RE|'ve|'VE|n't|N'T) "),
     r"\1 \2 "),
    (re.compile(r"([^' ])('[sSmMdD]|'ll|'LL|'re|'RE|'ve|'VE|n't|N'T)$"),
     r"\1 \2"),
]


def ptb_tokenize_sentence(s: str, lowercase: bool = True) -> List[str]:
    s = " " + s.replace("\n", " ").strip() + " "
    s = _CONTRACTIONS2.sub(r"\1 \2", s)
    for pat, rep in _RULES:
        s = pat.sub(rep, s)
    toks = s.split()
    if lowercase:
        # bracket symbols stay uppercase (they're special tokens the
        # coco-caption wrapper matches verbatim in PUNCTUATIONS)
        special = {"-LRB-", "-RRB-", "-LCB-", "-RCB-"}
        toks = [t if t in special else t.lower() for t in toks]
    return toks


def tokenize(captions_for_image: Dict) -> Dict[object, List[str]]:
    """Drop-in for PTBTokenizer.tokenize: {id: [{'caption': str}]} ->
    {id: [tokenized_str]}, with the wrapper's punctuation removal."""
    out = {}
    for k, caps in captions_for_image.items():
        out[k] = []
        for c in caps:
            text = c["caption"] if isinstance(c, dict) else c
            toks = [w for w in ptb_tokenize_sentence(text)
                    if w not in _PUNCT_SET]
            out[k].append(" ".join(toks))
    return out
