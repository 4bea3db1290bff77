"""Diversity / consensus-reranking / grounding / controllability stacks."""
import numpy as np
import pytest

from subgc_tpu.eval.controllability import NounIoU, controllability_scores
from subgc_tpu.eval.diversity import (distinct_ratio, diversity_report, mbleu4,
                                      ngram_diversity, novel_count)
from subgc_tpu.eval.grounding import FlickrGrdEval, GroundingCollector, box_iou
from subgc_tpu.eval.rerank import (consensus_rerank, find_nn_images,
                                   rerank_predictions, select_top_captions)
from subgc_tpu.utils.lemma import lemmatize


def _preds(n_img=4, n_caps=30, seed=0):
    rng = np.random.RandomState(seed)
    vocab = "man woman dog cat ball park street red blue".split()
    preds = []
    for i in range(n_img):
        caps = [" ".join(rng.choice(vocab, rng.randint(4, 9)))
                for _ in range(n_caps)]
        preds.append({"image_id": 100 + i, "caption": caps,
                      "subgraph_score": rng.rand(n_caps),
                      "sorted_subgraph_ind": np.arange(n_caps)})
    return preds


def test_diversity_metrics():
    preds = _preds()
    d = distinct_ratio(preds)
    assert len(d) == 2 and all(0 < x <= 1 for x in d)
    ng = ngram_diversity(preds)
    assert ng.shape == (2, 2) and (ng > 0).all() and (ng <= 1).all()
    nc = novel_count(preds, ["a man in a park"])
    assert all(0 <= c <= 5 * len(preds) for c in nc)
    mb = mbleu4(preds)
    assert len(mb) == 2 and all(0 <= x <= 1 for x in mb)
    # duplicate captions -> lower distinct ratio, higher mBLEU-4
    dup = _preds()
    for p in dup:
        p["caption"] = [p["caption"][0]] * len(p["caption"])
    assert distinct_ratio(dup)[0] < d[0]
    assert mbleu4(dup)[0] > mb[0]
    rep = diversity_report(preds, ["a man"], evaluate_mb4=False)
    assert "distinct" in rep and "ngram" in rep and "novel" in rep


def test_nn_images():
    rng = np.random.RandomState(0)
    tr = rng.rand(50, 16).astype("f")
    te = tr[[3, 7, 11]] + 1e-4          # nearest = themselves
    nn = find_nn_images(te, tr, num_nn=5)
    assert nn.shape == (3, 5)
    np.testing.assert_array_equal(nn[:, 0], [3, 7, 11])


def test_consensus_rerank_pipeline():
    rng = np.random.RandomState(1)
    preds = _preds(n_img=3, n_caps=6)
    vocab = "man woman dog cat ball park street red blue walking".split()
    # "a man in a park" only in doc 0 — its n-grams keep nonzero idf
    train_annos = [{"id": i,
                    "sentences": (["a man in a park"] if i == 0 else []) +
                    [" ".join(rng.choice(vocab, rng.randint(4, 8)))]}
                   for i in range(10)]
    train_feats = rng.rand(10, 8)
    test_feats = rng.rand(3, 8)
    df_refs = {i: a["sentences"] for i, a in enumerate(train_annos)}
    rerank_ind, top1 = rerank_predictions(preds, train_annos, train_feats,
                                          test_feats, df_refs, top_k=4,
                                          k=3, m=5, num_nn=10)
    assert set(rerank_ind) == {100, 101, 102}
    for v in rerank_ind.values():
        assert sorted(v) == list(range(4))
    assert all(isinstance(s, str) for s in top1.values())
    # a hypothesis equal to a retrieved sentence must rank first
    preds2 = _preds(n_img=1, n_caps=4)
    preds2[0]["caption"][2] = "a man in a park"
    hypo = select_top_captions(preds2, top_k=4)
    nn = np.tile(np.arange(10), (1, 1))
    ri = consensus_rerank(hypo, train_annos, nn, df_refs, k=3, m=5)
    assert ri[100][0] == 2


def test_box_iou_and_grd_eval():
    b = np.array([0, 0, 10, 10], float)
    same = box_iou(b, np.array([[0, 0, 10, 10]], float))
    assert same[0] == pytest.approx(1.0)
    half = box_iou(b, np.array([[0, 0, 10, 4.5]], float))
    assert half[0] == pytest.approx(0.5)   # +1 extents: 60.5/121

    ref = [{"image_id": 1, "captions": [{
        "process_bnd_box": [[[0, 0, 10, 10]], [[20, 20, 30, 30]]],
        "process_idx": [1, 3],
        "process_clss": ["man", "dog"],
        "tokens": ["a", "man", "and", "dog", "running"],
    }]}]
    pred = {"1": [{"clss": ["man", "cat"], "idx_in_sent": [1, 4],
                   "bbox": [[0, 0, 10, 10], [50, 50, 60, 60]]}]}
    ev = FlickrGrdEval(ref, pred)
    out_all = ev.grd_eval("all")
    out_loc = ev.grd_eval("loc")
    # 'man' grounded correctly; 'dog' missed (recall 0); 'cat' hallucinated
    # (mean 0 either way with one entry) — num_vocab = 2
    assert out_all["recall_all"] == pytest.approx(0.5)
    assert out_all["precision_all"] == pytest.approx(0.5)
    assert out_loc["precision_loc"] == pytest.approx(0.5)
    assert out_all["F1_all"] == pytest.approx(0.5)


def test_lemmatizer():
    assert lemmatize("men") == "man"
    assert lemmatize("dogs") == "dog"
    assert lemmatize("benches") == "bench"
    assert lemmatize("ladies") == "lady"
    assert lemmatize("glass") == "glass"
    assert lemmatize("horse") == "horse"


def test_controllability():
    vecs = {w: np.random.RandomState(hash(w) % 1000).rand(8)
            for w in "man dog ball park street".split()}
    ni = NounIoU(vecs)
    assert ni.score("a man with a dog", "a man with a dog") == pytest.approx(1.0)
    assert ni.score("", "a man") == pytest.approx(1.0)    # m==0 -> 1
    assert ni.score("a man", "") == pytest.approx(0.0)

    preds = [{"image_id": 7, "caption": ["a man with a dog",
                                         "a ball in a park"]}]
    order = ["7"]
    gt_groups = [["a man with a dog"], ["a ball in the park"]]
    out = controllability_scores(preds, order, gt_groups, ni, use_spice=True)
    assert out["Bleu_1"] > 0.5
    assert 0 <= out["NounIoU"] <= 1
