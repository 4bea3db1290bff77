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


def test_fetch_data_manifest_roundtrip(tmp_path):
    """fetch_data --check/--record-checksums/--verify against synthetic
    stand-ins: missing -> partial -> complete -> pinned -> tamper-detected."""
    import json
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools import fetch_data as fd

    root = str(tmp_path)
    assert fd.cmd_check(root) == 1          # everything missing

    # materialize every artifact (tiny stand-ins; npz trees under-count)
    for e in fd.MANIFEST:
        p = os.path.join(root, e["path"])
        if e["kind"] == "npz_tree":
            os.makedirs(p, exist_ok=True)
            for i in range(3):
                open(os.path.join(p, f"{i}.npz"), "wb").write(b"x" * 10)
        else:
            os.makedirs(os.path.dirname(p), exist_ok=True)
            open(p, "wb").write(e["path"].encode())
    # trees are "partial" (3 < expected count) — check reports missing work
    assert fd.cmd_check(root) == 1
    saved_counts = {e["path"]: e.get("count") for e in fd.MANIFEST
                    if e["kind"] == "npz_tree"}
    for e in fd.MANIFEST:       # pretend the tiny trees are complete
        if e["kind"] == "npz_tree":
            e["count"] = 3
    assert fd.cmd_check(root) == 0

    pin_file = os.path.join(root, "pins.json")
    orig = fd.CHECKSUM_FILE
    fd.CHECKSUM_FILE = pin_file
    try:
        assert fd.cmd_record(root) == 0
        pins = json.load(open(pin_file))
        assert len(pins) == len(fd.MANIFEST)
        assert fd.cmd_verify(root) == 0
        # tamper with one file -> verify must fail
        victim = next(e for e in fd.MANIFEST if e["kind"] == "file")
        open(os.path.join(root, victim["path"]), "wb").write(b"tampered")
        assert fd.cmd_verify(root) == 1
    finally:
        fd.CHECKSUM_FILE = orig
        for e in fd.MANIFEST:   # restore mutated counts for other tests
            if e["kind"] == "npz_tree":
                e["count"] = saved_counts[e["path"]]
