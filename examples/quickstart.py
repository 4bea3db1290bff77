"""Hermetic end-to-end walkthrough of every subsystem on synthetic data.

    python examples/quickstart.py [workdir]

Generates a miniature dataset in the reference's on-disk format, trains a
few steps, decodes the test split with beam search, runs language eval with
the top-k oracle, and exercises the diversity / consensus-reranking /
grounding / controllability stacks.
"""
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    try:
        backend = jax.default_backend()
    except RuntimeError:
        backend = None
    if backend != "tpu":
        jax.config.update("jax_platforms", "cpu")

    workdir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp()
    print(f"workdir: {workdir}")

    from subgc_tpu.cli import test as test_cli
    from subgc_tpu.cli import train as train_cli
    from subgc_tpu.data.synthetic import generate_dataset

    man = generate_dataset(os.path.join(workdir, "data"), n_images=12,
                           seed=1, n_subgraphs=12)
    common = ["--input_json", man["input_json"],
              "--input_label_h5", man["input_label_h5"],
              "--sg_dir", man["sg_dir"], "--mask_dir", man["mask_dir"]]
    ckpt = os.path.join(workdir, "run")

    print("\n--- train (Sub_GC_Kar preset, 10 iterations)")
    train_cli.main(["Sub_GC_Kar", "--checkpoint_path", ckpt,
                    "--batch_size", "4", "--max_iters", "10",
                    "--save_checkpoint_every", "10", "--val_images_use", "4",
                    "--obj_name_path", man["obj_name_path"],
                    "--rel_name_path", man["rel_name_path"]] + common)

    print("\n--- decode + language eval (beam 2, oracle top-3)")
    test_cli.main(["Sub_GC_Kar", "--checkpoint_path", ckpt,
                   "--beam_size", "2", "--gpn_max_subg", "8",
                   "--bucket", "32", "--batch_images", "4",
                   "--language_eval", "1", "--oracle_num", "3"] + common)

    caps_path = os.path.join(ckpt, "captions_10.npy")
    preds = np.load(caps_path, allow_pickle=True).tolist()
    print(f"\n--- diversity metrics over {caps_path}")
    from subgc_tpu.eval.diversity import diversity_report
    print(json.dumps(diversity_report(preds, evaluate_mb4=True), indent=1))

    print("\n--- consensus reranking (synthetic train annos + features)")
    from subgc_tpu.eval.rerank import rerank_predictions
    rng = np.random.RandomState(0)
    train_annos = [{"id": i, "sentences": [
        " ".join(rng.choice(list("abcdefgh"), 5))]} for i in range(20)]
    rerank_ind, top1 = rerank_predictions(
        preds, train_annos, rng.rand(20, 16), rng.rand(len(preds), 16),
        {a["id"]: a["sentences"] for a in train_annos}, top_k=3, k=5, m=3,
        num_nn=20)
    print(f"reranked {len(rerank_ind)} images; "
          f"example order: {next(iter(rerank_ind.values()))}")

    print("\n--- done; artifacts in", ckpt)


if __name__ == "__main__":
    main()
