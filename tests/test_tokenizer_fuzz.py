"""PTB tokenizer fuzz vs an independent sed-rules oracle (VERDICT r1 item 7).

Oracle: nltk's TreebankWordTokenizer — an independent Python encoding of the
classic PTB tokenizer.sed rules — run through the same coco-caption
punctuation strip.  The reference's actual tokenizer is the CoreNLP jar
(misc/coco-caption/pycocoevalcap/tokenizer/ptbtokenizer.py:21,31-33), which
neither we nor nltk can invoke offline; where ours and nltk disagree, the
divergence classes are enumerated below with a note on which side matches
the jar's documented behavior.

Measured byte-level match rate on 3000 punctuation/contraction/bracket-rich
strings: 98.90% (seed 7).  Remaining divergence classes:

1. ``,3.5`` / ``:12,000`` at token start — we split the comma/colon, the
   nltk sed rules keep them glued to digits.  CoreNLP splits (jar-closer).
2. final period after an abbreviation-like word, e.g. ``(Mr.}`` — we keep
   ``mr.``, nltk strips the period through converted brackets.  CoreNLP is
   abbreviation-aware and keeps ``Mr.`` (jar-closer).
3. trailing apostrophe after a contraction at end of string, ``{I'm'`` —
   we emit ``i 'm '`` (quote split exposes the contraction), nltk keeps
   ``i'm`` and splits only the quote.  CoreNLP splits both (jar-closer).
4. doubled straight apostrophes inside a token, ``don't''dog`` — nltk
   treats ``''`` as a closing double quote and splits; we keep the token
   glued.  nltk is jar-closer here (rare in caption text).
"""
import numpy as np
import pytest

from subgc_tpu.eval.tokenizer import _PUNCT_SET, ptb_tokenize_sentence, tokenize

WORDS = ("a the man dog Cat riding SKATEBOARD red house it's don't can't "
         "cannot they'll we've I'm isn't o'clock won't 12,000 3.5 Mr. U.S. "
         "well-known").split()
PUNCT = [",", ".", "!", "?", ";", ":", "...", "--", "-", "(", ")", "[", "]",
         "{", "}", '"', "'"]


def _ours(s):
    return [t for t in ptb_tokenize_sentence(s) if t not in _PUNCT_SET]


def test_fuzz_vs_sed_oracle():
    nltk_tok = pytest.importorskip("nltk.tokenize")
    twt = nltk_tok.TreebankWordTokenizer()

    def oracle(s):
        toks = [t.lower() for t in twt.tokenize(s, convert_parentheses=True)]
        return [t for t in toks if t not in _PUNCT_SET]

    r = np.random.RandomState(7)
    n, match = 3000, 0
    for _ in range(n):
        k = r.randint(3, 12)
        parts = [(PUNCT[r.randint(len(PUNCT))] if r.rand() < 0.3
                  else WORDS[r.randint(len(WORDS))]) for _ in range(k)]
        s = ""
        for p in parts:
            if s and r.rand() < 0.5:
                s += " "
            s += p
        if _ours(s) == oracle(s):
            match += 1
    rate = match / n
    # measured 98.90% at generation; bound leaves slack for nltk updates
    assert rate >= 0.98, f"match rate fell to {rate:.4f}"


def test_divergence_classes_pinned():
    """The enumerated divergence cases keep their current (jar-informed)
    behavior — a change here is a deliberate tokenizer decision."""
    assert _ours(",3.5") == ["3.5"]                       # class 1
    assert _ours("(Mr.}") == ["-lrb-", "mr.", "-rcb-"]    # class 2
    assert _ours("{I'm'") == ["-lcb-", "i", "'m"]         # class 3
    assert _ours("don't''dog") == ["don't''dog"]          # class 4


def test_clean_captions_identity():
    """Model-generated captions (lowercase words, single spaces) pass
    through unchanged — the case the scorers actually exercise."""
    r = np.random.RandomState(3)
    # "cannot" excluded: PTB (jar included) splits it to "can not"
    words = [w.lower() for w in WORDS if w.isalpha() and w != "cannot"]
    for _ in range(200):
        s = " ".join(words[r.randint(len(words))]
                     for _ in range(r.randint(1, 17)))
        assert " ".join(_ours(s)) == s


def test_bracket_tokens_survive_like_the_jar():
    """The jar lowercases before the wrapper's case-sensitive strip, so
    bracket tokens survive the reference pipeline; ours must too."""
    out = tokenize({0: [{"caption": 'a (red) [dog] {sat} "here", and left.'}]})
    assert out[0][0] == "a -lrb- red -rrb- -lsb- dog -rsb- -lcb- sat -rcb- here and left"


def test_gt_style_sentences():
    """Realistic GT-annotation shapes."""
    cases = {
        "A man riding a horse.": "a man riding a horse",
        "Two dogs, one black and one white, play.":
            "two dogs one black and one white play",
        "It's a dog's life - isn't it?": "it 's a dog 's life is n't it",
        "The sign says \"STOP\" in red.": "the sign says stop in red",
        "He can't go; she won't stay...": "he ca n't go she wo n't stay",
        "Cannot see the U.S. flag.": "can not see the u.s. flag",
        "the players' uniforms are red": "the players uniforms are red",
    }
    for src, want in cases.items():
        assert " ".join(_ours(src)) == want, src
