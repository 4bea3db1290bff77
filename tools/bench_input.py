"""Input-pipeline benchmark: npz-per-image vs packed-shard backends.

Measures TrainLoader.get_batch throughput on a synthetic dataset with both
data sources.  Usage: python tools/bench_input.py [n_images] [batch]
"""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")

    from subgc_tpu.config import DataConfig, ModelConfig, TrainConfig
    from subgc_tpu.data.dataset import TrainLoader
    from subgc_tpu.data.packed import PackedSpec, pack_image, write_shard
    from subgc_tpu.data.synthetic import generate_dataset
    from subgc_tpu.io.sg_npz import SGDir

    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    root = tempfile.mkdtemp()
    man = generate_dataset(root, n_images=n_images, seed=5,
                           n_subgraphs=32)
    spec = PackedSpec(feat_dim=man["feat_dim"],
                      n_obj_cls=man["n_obj_classes"],
                      n_rel_cls=man["n_rel_classes"], max_subg=40)
    sg = SGDir(man["sg_dir"])
    masks = SGDir(man["mask_dir"])
    images = json.load(open(man["input_json"]))["images"]
    t0 = time.time()
    recs = [pack_image(spec, img["id"], sg.get(img["id"]),
                       masks.get(img["id"])) for img in images]
    shard = os.path.join(root, "shard.bin")
    write_shard(shard, spec, recs)
    print(f"packed {n_images} images in {time.time() - t0:.2f}s "
          f"({os.path.getsize(shard) / 1e6:.1f} MB)")

    mcfg = ModelConfig(vocab_size=man["vocab_size"],
                       num_obj_classes=man["n_obj_classes"],
                       num_rel_classes=man["n_rel_classes"],
                       att_feat_size=man["feat_dim"])
    tcfg = TrainConfig(batch_size=batch)
    base = dict(input_json=man["input_json"],
                input_label_h5=man["input_label_h5"])

    for name, dcfg in [
            ("npz", DataConfig(sg_dir=man["sg_dir"],
                               mask_dir=man["mask_dir"], **base)),
            ("packed+native", DataConfig(packed_path=shard, **base))]:
        loader = TrainLoader(mcfg, tcfg, dcfg)
        loader.get_batch("train")     # warm caches
        t0 = time.time()
        n = 12
        for _ in range(n):
            loader.get_batch("train")
        dt = (time.time() - t0) / n
        print(f"{name:>16}: {dt * 1e3:8.1f} ms/batch "
              f"({batch / dt:7.1f} images/s)")


if __name__ == "__main__":
    main()
