"""End-to-end equality vs the reference's OWN diversity/rerank scripts
(VERDICT r1 item 8).

The reference's `misc/diversity/diversity_score.py` and
`misc/consensus_reranking/cr_mRNN_demo.py` are CPU-runnable with their
vendored Python scorers; only the Java PTB tokenizer needs shimming
(generated captions are punctuation-free, so the tokenizer is an identity
there) and the final COCO eval (which spawns METEOR/SPICE jars) is no-op'd
— it runs AFTER `consensus_rerank_ind.npy` is written.  Each test runs the
reference script in a sandbox subprocess on a synthetic captions_*.npy and
diffs every output number / index against this framework's implementation.
"""
import json
import os
import pickle
import re
import subprocess
import sys

import numpy as np
import pytest

REF = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
VOCAB = ("man woman dog cat horse car street park tree sky ball hat "
         "red blue small large riding holding sitting standing near a the "
         "on in with and is").split()


def _mk_predictions(rng, n_images=8, n_caps_lo=22, n_caps_hi=40):
    """Synthetic captions_*.npy content: sGPN-sorted captions per image.

    Captions of one image are perturbations of a shared base sentence
    (realistic: sub-graph captions of the same image overlap heavily), so
    mBLEU-4 is meaningfully non-zero and the vendored Bleu smoothing paths
    are exercised."""
    preds = []
    for i in range(n_images):
        n = rng.randint(n_caps_lo, n_caps_hi)
        base = [VOCAB[rng.randint(len(VOCAB))] for _ in range(rng.randint(7, 11))]
        caps = []
        for _ in range(n):
            w = list(base)
            for _ in range(rng.randint(0, 4)):
                j = rng.randint(len(w))
                if rng.rand() < 0.5:
                    w[j] = VOCAB[rng.randint(len(VOCAB))]
                elif len(w) > 4:
                    w.pop(j)
            caps.append(" ".join(w))
        # inject duplicates so distinct-ratio < 1
        for d in range(rng.randint(0, 4)):
            caps[rng.randint(n)] = caps[rng.randint(n)]
        scores = np.sort(rng.rand(n).astype("f"))[::-1]   # sGPN-desc order
        preds.append({"image_id": 10000 + i, "caption": caps,
                      "subgraph_score": scores,
                      "sorted_subgraph_ind": np.arange(n)})
    return preds


def _run(driver, cwd):
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["PYTHONPATH"] = REPO
    r = subprocess.run([sys.executable, driver], cwd=cwd, env=env,
                       capture_output=True, text=True, timeout=540)
    assert r.returncode == 0, r.stderr[-3000:]
    return r.stdout


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference unavailable")
def test_diversity_e2e_vs_reference(tmp_path):
    rng = np.random.RandomState(5)
    preds = _mk_predictions(rng)

    # sandbox layout: cwd=sb/misc/diversity, train dict + captions in cwd,
    # MRNN split at ../../data/ (the script's relative paths)
    cwd = tmp_path / "misc" / "diversity"
    cwd.mkdir(parents=True)
    (tmp_path / "data").mkdir()
    np.save(str(cwd / "captions_test.npy"), np.asarray(preds, dtype=object))

    # train corpus: include a few generated captions so novel-count < max
    train_ids = [str(2000 + i) for i in range(6)]
    all_cap = {}
    stolen = [preds[0]["caption"][0], preds[3]["caption"][2]]
    for j, tid in enumerate(train_ids):
        sents = [" ".join(VOCAB[rng.randint(len(VOCAB))]
                          for _ in range(rng.randint(4, 9)))
                 for _ in range(4)]
        if j < len(stolen):
            sents[0] = stolen[j]
        all_cap[tid] = sents
    with open(cwd / "all_caption_dict.pkl", "wb") as f:
        pickle.dump(all_cap, f)
    np.save(str(tmp_path / "data" / "MRNN_split_dict.npy"),
            np.asarray({tid: "train" for tid in train_ids}, dtype=object))

    driver = cwd / "driver.py"
    driver.write_text(f"""
import sys, types, runpy
shim = types.ModuleType('ptbtokenizer')
class PTBTokenizer:
    def tokenize(self, caps):
        return {{k: [c['caption'] for c in v] for k, v in caps.items()}}
shim.PTBTokenizer = PTBTokenizer
sys.modules['ptbtokenizer'] = shim
sys.path.insert(0, {REF + '/misc/diversity'!r})
sys.argv = ['diversity_score.py', '--input_file', 'captions_test.npy',
            '--evaluate_mB4']
runpy.run_path({REF + '/misc/diversity/diversity_score.py'!r},
               run_name='__main__')
""")
    out = _run(str(driver), str(cwd))

    def grab(pat):
        m = re.search(pat, out)
        assert m, f"pattern {pat!r} not found in:\n{out}"
        return float(m.group(1))

    NUM = r"([0-9][0-9.eE+-]*)"

    ref_nums = {
        "mb4_20": grab(r"m-BLEU-4 for best-5 out of random 20 sentences: " + NUM + ""),
        "mb4_100": grab(r"m-BLEU-4 for best-5 out of random 100 sentences: " + NUM + ""),
        "g1_20": grab(r"1-gram diversity for best-5 out of random 20 sentences: " + NUM + ""),
        "g2_20": grab(r"2-gram diversity for best-5 out of random 20 sentences: " + NUM + ""),
        "g1_100": grab(r"1-gram diversity for best-5 out of random 100 sentences: " + NUM + ""),
        "g2_100": grab(r"2-gram diversity for best-5 out of random 100 sentences: " + NUM + ""),
        "novel_20": grab(r"Novel Caption for best-5 out of random 20 sentences: " + NUM + ""),
        "novel_100": grab(r"Novel Caption count for best-5 out of random 100 sentences: " + NUM + ""),
        "distinct_20": grab(r"Distinct Caption of random-20 sentences: " + NUM + ""),
        "distinct_100": grab(r"Distinct Caption of random-100 sentences: " + NUM + ""),
    }

    from subgc_tpu.eval.diversity import diversity_report
    train_sents = [s for tid in train_ids for s in all_cap[tid]]
    rep = diversity_report(preds, train_sentences=train_sents,
                           evaluate_mb4=True, seed=2019)

    assert rep["mBLEU4"][0] == pytest.approx(ref_nums["mb4_20"], abs=1e-9)
    assert rep["mBLEU4"][1] == pytest.approx(ref_nums["mb4_100"], abs=1e-9)
    assert rep["ngram"]["1gram@20"] == pytest.approx(ref_nums["g1_20"], abs=1e-9)
    assert rep["ngram"]["2gram@20"] == pytest.approx(ref_nums["g2_20"], abs=1e-9)
    assert rep["ngram"]["1gram@100"] == pytest.approx(ref_nums["g1_100"], abs=1e-9)
    assert rep["ngram"]["2gram@100"] == pytest.approx(ref_nums["g2_100"], abs=1e-9)
    assert rep["novel"][0] == int(ref_nums["novel_20"])
    assert rep["novel"][1] == int(ref_nums["novel_100"])
    assert rep["distinct"][0] == pytest.approx(ref_nums["distinct_20"], abs=1e-9)
    assert rep["distinct"][1] == pytest.approx(ref_nums["distinct_100"], abs=1e-9)
    # sanity: the synthetic corpus actually exercises the interesting ranges
    assert 0 < rep["novel"][0] < 80 and rep["distinct"][0] < 1.0


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference unavailable")
def test_rerank_e2e_vs_reference(tmp_path):
    rng = np.random.RandomState(9)
    n_train, n_test, dim = 64, 6, 2048   # conf_cr.py hardcodes dim 2048
    preds = _mk_predictions(rng, n_images=n_test, n_caps_lo=8, n_caps_hi=12)

    train_annos_ref, train_annos_ours = [], []
    for i in range(n_train):
        sents = [[VOCAB[rng.randint(len(VOCAB))]
                  for _ in range(rng.randint(4, 9))]
                 for _ in range(3)]
        train_annos_ref.append({"id": 2000 + i, "sentences": sents})
        train_annos_ours.append({"id": 2000 + i,
                                 "sentences": [" ".join(s) for s in sents]})
    train_feats = rng.rand(n_train, dim).astype(np.float64) * 10
    test_feats = rng.rand(n_test, dim).astype(np.float64) * 10
    feat_dct = {a["id"]: train_feats[i] for i, a in enumerate(train_annos_ref)}
    for i, p in enumerate(preds):
        feat_dct[p["image_id"]] = test_feats[i]

    # DF corpus = the eval annotation json (captions_val2014.json in the
    # reference, conf_cr.py:76-80): its OWN reference sentences
    df_refs = {}
    images, annotations = [], []
    aid = 1
    for i in range(n_test):
        img_id = 10000 + i
        refs = [" ".join(VOCAB[rng.randint(len(VOCAB))]
                         for _ in range(rng.randint(4, 9)))
                for _ in range(5)]
        df_refs[img_id] = refs
        images.append({"id": img_id})
        for rtext in refs:
            annotations.append({"image_id": img_id, "id": aid,
                                "caption": rtext})
            aid += 1
    coco_json = {"info": {"description": "synthetic"}, "licenses": [],
                 "type": "captions", "images": images,
                 "annotations": annotations}

    # sandbox: cwd=sb/cr with the demo's relative layout; eval ref json at
    # sb/coco-caption/annotations/ (conf uses ../coco-caption/annotations)
    cwd = tmp_path / "cr"
    (cwd / "hypotheses_mRNN").mkdir(parents=True)
    (cwd / "mscoco_anno_files").mkdir()
    (cwd / "image_features_mRNN").mkdir()
    ann_dir = tmp_path / "coco-caption" / "annotations"
    ann_dir.mkdir(parents=True)
    with open(ann_dir / "captions_val2014.json", "w") as f:
        json.dump(coco_json, f)
    os.symlink(os.path.join(REF, "misc/consensus_reranking/external"),
               str(cwd / "external"))
    np.save(str(cwd / "hypotheses_mRNN" / "captions_test.npy"),
            np.asarray(preds, dtype=object))
    np.save(str(cwd / "mscoco_anno_files" /
                "anno_list_mscoco_trainModelVal_m_RNN.npy"),
            np.asarray(train_annos_ref, dtype=object))
    np.save(str(cwd / "image_features_mRNN" /
                "res_feat_101_dct_mscoco_2014.npy"),
            np.asarray(feat_dct, dtype=object))

    driver = cwd / "driver.py"
    driver.write_text(f"""
import sys, types, runpy
# pycocotools/coco.py imports skimage.draw.polygon (segmentation-only, never
# called for captions) — shim it
sk = types.ModuleType('skimage'); skd = types.ModuleType('skimage.draw')
skd.polygon = None; sk.draw = skd
sys.modules['skimage'] = sk; sys.modules['skimage.draw'] = skd
sys.path.insert(0, './external/coco-caption')
import pycocoevalcap.tokenizer.ptbtokenizer as PT
class _IdTok:
    def tokenize(self, caps):
        return {{k: [c['caption'] for c in v] for k, v in caps.items()}}
PT.PTBTokenizer = _IdTok
import pycocoevalcap.eval_pair_cider as EPC
EPC.PTBTokenizer = _IdTok
import pycocoevalcap.eval as EV
EV.PTBTokenizer = _IdTok
EV.COCOEvalCap.evaluate = lambda self: None
sys.path.insert(0, {REF + '/misc/consensus_reranking'!r})
sys.argv = ['cr_mRNN_demo.py', '--input_file', 'captions_test.npy',
            '--top_k', '4', '--dataset', 'coco', '--split', 'MRNN']
runpy.run_path({REF + '/misc/consensus_reranking/cr_mRNN_demo.py'!r},
               run_name='__main__')
""")
    _run(str(driver), str(cwd))

    ref_ind = np.load(str(cwd / "consensus_rerank_ind.npy"),
                      allow_pickle=True).tolist()

    from subgc_tpu.eval.rerank import rerank_predictions
    our_ind, top1 = rerank_predictions(
        preds, train_annos_ours, train_feats, test_feats, df_refs,
        top_k=4, k=60, m=125, num_nn=1000)

    assert set(our_ind) == set(ref_ind)
    for img_id, order in ref_ind.items():
        assert our_ind[img_id] == list(order), img_id
