"""Offline tools: scene-graph export (surgery) + sub-graph bank sampler."""
import numpy as np

from subgc_tpu.data.subgraph_sampler import (node_iou, nouns_to_nodes,
                                             sample_subgraph_bank)
from subgc_tpu.data.surgery import filter_dets


def test_filter_dets_ranking():
    rng = np.random.RandomState(0)
    n, k = 10, 30
    boxes = rng.rand(n, 4)
    obj_scores = rng.rand(n)
    obj_dist = rng.rand(n, 20)
    obj_fmap = rng.rand(n, 64)
    rel_inds = rng.randint(0, n, (k, 2))
    pred = rng.dirichlet(np.ones(5), k)
    out = filter_dets(boxes, obj_scores, obj_dist, obj_fmap, rel_inds, pred,
                      nonbg_thresh=0.2, max_rels=8)
    assert out["rel_ind"].shape[0] <= 8
    assert out["pred_dist"].shape == (out["rel_ind"].shape[0], 5)
    # surviving triplets are sorted by descending combined score
    nonbg = 1.0 - pred[:, 0]
    keep_mask = nonbg > 0.2
    score = pred[:, 1:].max(1) * obj_scores[rel_inds[:, 0]] \
        * obj_scores[rel_inds[:, 1]]
    expect = np.sort(score[keep_mask])[::-1][:8]
    got = out["pred_dist"][:, 1:].max(1) \
        * obj_scores[out["rel_ind"][:, 0]] \
        * obj_scores[out["rel_ind"][:, 1]]
    np.testing.assert_allclose(got, expect)


def test_nouns_to_nodes():
    classes = ["man", "dog", "park bench", "car"]
    hits = nouns_to_nodes(["men", "benches", "sky"], classes)
    assert set(hits.tolist()) == {0, 2}


def test_sample_subgraph_bank_format():
    rng = np.random.RandomState(0)
    n = 12
    rel = rng.randint(0, n, (20, 2))
    noun_nodes = [rng.choice(n, rng.randint(1, 4), replace=False)
                  for _ in range(5)]
    bank = sample_subgraph_bank(n, rel, noun_nodes, n_samples=30, seed=1)
    total = len(bank["subgraph_mask_list"])
    assert bank["node_iou_mtx"].shape == (5, total)
    assert total >= 10
    seen = set()
    for entry in bank["subgraph_mask_list"]:
        assert entry[1].shape == (36,) and entry[2].shape == (64,)
        nodes = frozenset(entry[1].nonzero()[0].tolist())
        assert nodes  # non-empty
        # relations inside the mask connect nodes of the sub-graph
        for r in entry[3]:
            assert 0 <= r[0] < len(nodes) and 0 <= r[1] < len(nodes)
    # sampled entries (after the 5 GT) are unique node sets
    sampled = [frozenset(e[1].nonzero()[0].tolist())
               for e in bank["subgraph_mask_list"][5:]]
    assert len(sampled) == len(set(sampled))
    # GT rows have IoU 1 with their own noun sets when expansion kept them
    for i, nn in enumerate(noun_nodes):
        assert bank["node_iou_mtx"][i].max() <= 1.0


def test_bank_feeds_training_sampler():
    """The generated bank plugs into the train-time pos/neg sampler."""
    from subgc_tpu.data.dataset import sample_pos_neg
    rng = np.random.RandomState(2)
    rel = rng.randint(0, 10, (15, 2))
    noun_nodes = [rng.choice(10, 2, replace=False) for _ in range(5)]
    bank = sample_subgraph_bank(10, rel, noun_nodes, n_samples=20, seed=3)
    idx = sample_pos_neg(bank["node_iou_mtx"], thres=0.75, half=2,
                         seq_per_img=5, rng=rng)
    assert idx.shape == (5, 2, 2)
    assert (idx >= 0).all()
