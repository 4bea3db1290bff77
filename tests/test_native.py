"""Native C++ cores == pure-Python implementations."""
import numpy as np
import pytest

from subgc_tpu.eval.bleu import compute_bleu
from subgc_tpu.eval.cider import PairwiseCider
from subgc_tpu.eval.tokenizer import tokenize
from subgc_tpu.ops import native


@pytest.fixture(scope="module", autouse=True)
def require_native():
    if not native.available():
        pytest.skip("native library not buildable")


def test_tokenizer_matches_python():
    sents = ["A man, riding (fast) a horse.",
             "It's a dog's day; really!",
             "the cat -- a small one -- sat",
             "don't stop... now \"quoted\" text",
             "a man riding a horse on the beach"]
    py = tokenize({0: [{"caption": s} for s in sents]})[0]
    cc = native.ptb_tokenize_batch(sents)
    assert cc == py


def test_pairwise_cider_matches_python():
    rng = np.random.RandomState(0)
    vocab = "man woman dog cat ball park street red blue a the on".split()
    docs = [[" ".join(rng.choice(vocab, rng.randint(4, 9))) for _ in range(3)]
            for _ in range(12)]
    hyps = [" ".join(rng.choice(vocab, rng.randint(4, 9))) for _ in range(5)]
    refs = [" ".join(rng.choice(vocab, rng.randint(4, 9))) for _ in range(7)]

    pc = PairwiseCider(docs)
    want = np.asarray([[pc.score(h, r) for r in refs] for h in hyps])
    got = native.pairwise_cider_matrix(docs, hyps, refs)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_mutual_bleu4_matches_python():
    rng = np.random.RandomState(1)
    vocab = "man woman dog cat ball park street red blue".split()
    sents = [" ".join(rng.choice(vocab, rng.randint(4, 10)))
             for _ in range(5)]
    want = []
    for i, s in enumerate(sents):
        gts = {0: [g for j, g in enumerate(sents) if j != i]}
        corpus, _, _ = compute_bleu(gts, {0: [s]})
        want.append(corpus[3])
    got = native.mutual_bleu4(sents)
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-10)


def test_embedded_newlines_cannot_desync_native_blobs():
    """A '\\n' inside a caption must not desync the native line framing
    from the python-allocated output buffers (heap-overflow shape) — the
    wrappers collapse embedded separators, which is tokenization-neutral,
    so native == python fallback on such inputs."""
    from subgc_tpu.ops import native as N
    if not N.available():
        import pytest
        pytest.skip("native lib unavailable")
    docs = [["a man riding a\nhorse", "a dog in\tthe park"],
            ["a red ball on grass"]]
    # tabs INSIDE hyps/refs too: the C tokenizer splits on ' ' only, so an
    # unsanitized tab fuses two tokens and silently corrupts the score
    hyps = ["a man riding\na horse", "a dog in\tthe park"]
    refs = ["a man on a horse", "a\nred ball", "a dog in the park"]
    got = N.pairwise_cider_matrix(docs, hyps, refs)
    assert got.shape == (2, 3)
    # python fallback (same inputs; whitespace-equivalent tokenization)
    from subgc_tpu.eval.cider import PairwiseCider
    pc = PairwiseCider(docs)
    want = [[pc.sim(pc.vec(h), pc.vec(r)) for r in refs] for h in hyps]
    import numpy as np
    np.testing.assert_allclose(got, want, rtol=1e-9)

    mb = N.mutual_bleu4(["a dog in\tthe park", "a dog in the park",
                         "a dog in the park today"])
    assert mb.shape == (3,)
    assert np.isfinite(mb).all()
    # sentence 0 (tab) must score like the space version would: vs two
    # near-identical references its BLEU-4 is high, not ~0
    assert mb[0] > 0.5, mb
