"""Measure the reference PyTorch model's caption throughput on this host CPU.

Pins tools/torch_baseline.json for bench.py's vs_baseline denominator
(x30 CPU->GPU estimate; the reference repo publishes no throughput numbers,
SURVEY.md §6).  Workload mirrors bench.py: Sub_GC_Kar dims, per image score a
sub-graph bucket, NMS keep 10, beam-3 decode per kept sub-graph.
"""
import json
import os
import sys
import time
import types

import numpy as np

REF = "/root/reference"
HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))
sys.path.insert(0, REF)


def main():
    import torch
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.set_num_threads(os.cpu_count() or 8)

    import misc.utils as ref_utils

    def fake_vectors(names, wv_type='glove.6B', wv_dir='data/', wv_dim=300):
        g = torch.Generator().manual_seed(0)
        return torch.randn(len(names), wv_dim, generator=g)

    ref_utils.obj_edge_vectors = fake_vectors
    import importlib
    importlib.import_module("models.AttModel")
    ref_att = sys.modules["models.AttModel"]
    ref_att.obj_edge_vectors = fake_vectors

    n_obj_names, n_pred_names = 1599, 21
    tmp = "/tmp/bench_torch_names"
    os.makedirs(tmp, exist_ok=True)
    np.save(tmp + "/obj.npy", np.array([f"o{i}" for i in range(n_obj_names)]))
    np.save(tmp + "/rel.npy", np.array([f"r{i}" for i in range(n_pred_names)]))

    opt = types.SimpleNamespace(
        vocab_size=9487, input_encoding_size=1000, rnn_size=1000, num_layers=2,
        drop_prob_lm=0.5, max_length=None, seq_length=16, fc_feat_size=2048,
        att_feat_size=2048, att_hid_size=512, use_bn=0, sampling_prob=0.0,
        use_gpn=1, embed_dim=300, gcn_dim=1024, noun_fuse=1, pred_emb_type=1,
        gcn_layers=2, gcn_residual=2, gcn_bn=0, obj_name_path=tmp + "/obj.npy",
        rel_name_path=tmp + "/rel.npy", use_gt_subg=0, test_LSTM=1,
        gpn_nms_thres=0.75, gpn_max_subg=10, use_topk_sampling=0,
        topk_temp=0.6, the_k=3, sct=0)
    torch.manual_seed(0)
    model = ref_att.TopDownModel(opt)
    model.eval()

    rng = np.random.RandomState(0)
    N, K = 37, 65
    bucket = int(os.environ.get("BENCH_BUCKET", "128"))
    M = bucket // 2
    n_images = int(os.environ.get("BENCH_TORCH_IMAGES", "4"))

    def make_inputs():
        att = torch.from_numpy(rng.rand(1, N, 2048).astype('f'))
        od = torch.from_numpy(rng.rand(1, N, 1599).astype('f'))
        ri = torch.from_numpy(rng.randint(0, N - 1, (1, K, 2)))
        pd = torch.from_numpy(rng.rand(1, K, 21).astype('f'))
        oi = np.full((5, 2, M, N), N - 1, np.int64)
        am = np.zeros((5, 2, M, N), np.float32)
        pm = np.zeros((5, 2, M, N, N), np.float32)
        pi = np.full((5, 2, M, K), K - 1, np.int64)
        for p in range(2):
            for m in range(M):
                n = rng.randint(3, 12)
                nodes = rng.choice(N - 1, n, replace=False)
                oi[:, p, m, :n] = nodes
                am[:, p, m, :n] = 1
                pm[:, p, m, np.arange(n), np.arange(n)] = 1
        return (att, od, ri, pd, torch.from_numpy(oi), torch.from_numpy(am),
                torch.from_numpy(pi), torch.from_numpy(pm))

    eval_kwargs = {"beam_size": int(os.environ.get("BENCH_BEAM", "3")),
                   "sample_max": 1}
    inputs = [make_inputs() for _ in range(n_images)]

    # warmup
    att, od, ri, pd, oi, am, pi, pm = inputs[0]
    with torch.no_grad():
        model(torch.zeros(1, 2048), att, am, None, od, None, ri, None, pd,
              oi, pi, None, pm, opt=eval_kwargs, mode="sample")

    t0 = time.time()
    caps = 0
    for att, od, ri, pd, oi, am, pi, pm in inputs:
        with torch.no_grad():
            seq, _, score, keep = model(torch.zeros(1, 2048), att, am, None,
                                        od, None, ri, None, pd, oi, pi, None,
                                        pm, opt=eval_kwargs, mode="sample")
        caps += seq.shape[0]
    wall = time.time() - t0
    cps = caps / wall
    out = {"captions_per_sec_cpu": cps, "n_images": n_images,
           "bucket": bucket, "beam": eval_kwargs["beam_size"],
           "torch_threads": torch.get_num_threads(),
           "note": "reference PyTorch on host CPU; bench.py multiplies by "
                   "30x as a GPU estimate"}
    with open(os.path.join(HERE, "torch_baseline.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
