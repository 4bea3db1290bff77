"""CLI end-to-end: train a few iters on synthetic data, then decode + eval."""
import json
import os

import numpy as np
import pytest

from subgc_tpu.data.synthetic import generate_dataset


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("synthcli")
    return generate_dataset(str(root), n_images=10, seed=7)


def test_train_then_test_cli(synth, tmp_path, monkeypatch):
    from subgc_tpu.cli import test as test_cli
    from subgc_tpu.cli import train as train_cli

    ckpt = str(tmp_path / "run")
    train_cli.main([
        "Sub_GC_Kar",
        "--checkpoint_path", ckpt,
        "--batch_size", "4",
        "--max_iters", "3",
        "--save_checkpoint_every", "3",
        "--val_images_use", "4",
        "--input_json", synth["input_json"],
        "--input_label_h5", synth["input_label_h5"],
        "--sg_dir", synth["sg_dir"],
        "--mask_dir", synth["mask_dir"],
        "--obj_name_path", synth["obj_name_path"],
        "--rel_name_path", synth["rel_name_path"],
    ])
    assert os.path.exists(os.path.join(ckpt, "model.npz"))
    infos = json.load(open(os.path.join(ckpt, "infos.json")))
    assert infos["iter"] == 3

    # NOTE: the synthetic fixture's real dims (2048-d features) make the
    # preset ModelConfig valid directly
    test_cli.main([
        "Sub_GC_Kar",
        "--checkpoint_path", ckpt,
        "--beam_size", "2",
        "--gpn_max_subg", "4",
        "--bucket", "16",
        "--batch_images", "2",
        "--language_eval", "1",
        "--oracle_num", "2",
        "--input_json", synth["input_json"],
        "--input_label_h5", synth["input_label_h5"],
        "--sg_dir", synth["sg_dir"],
        "--mask_dir", synth["mask_dir"],
    ])
    caps_path = os.path.join(ckpt, "captions_3.npy")
    assert os.path.exists(caps_path)
    preds = np.load(caps_path, allow_pickle=True).tolist()
    assert len(preds) >= 1
    assert all(isinstance(c, str) for c in preds[0]["caption"])
    scores_path = os.path.join(ckpt, "all_scores_3_2-subgraph.npy")
    assert os.path.exists(scores_path)
    scores = np.load(scores_path, allow_pickle=True).tolist()
    assert "top1" in scores and "oracle" in scores
    assert scores["oracle"]["CIDEr"] >= scores["top1"]["CIDEr"] - 1e-9

    # per-rank prediction caches (reference sentence_utils.py:85-94)
    for rank in range(2):
        cp = os.path.join(ckpt, "eval_results",
                          f".cache_Sub_GC_Kar_test{rank}.json")
        assert os.path.exists(cp)
        dump = json.load(open(cp))
        assert len(dump) == len(preds)
        assert {"image_id", "caption"} <= set(dump[0])

    # resume training from the checkpoint
    train_cli.main([
        "Sub_GC_Kar",
        "--checkpoint_path", ckpt,
        "--start_from", ckpt,
        "--batch_size", "4",
        "--max_iters", "5",
        "--obj_name_path", synth["obj_name_path"],
        "--rel_name_path", synth["rel_name_path"],
        "--save_checkpoint_every", "2",
        "--val_images_use", "4",
        "--input_json", synth["input_json"],
        "--input_label_h5", synth["input_label_h5"],
        "--sg_dir", synth["sg_dir"],
        "--mask_dir", synth["mask_dir"],
    ])
    infos = json.load(open(os.path.join(ckpt, "infos.json")))
    assert infos["iter"] == 5


def test_scst_cli(synth, tmp_path):
    """--self_critical_after 0 routes iterations through the SCST path."""
    from subgc_tpu.cli import train as train_cli
    ckpt = str(tmp_path / "scst_run")
    train_cli.main([
        "Sub_GC_Kar",
        "--checkpoint_path", ckpt,
        "--batch_size", "2",
        "--max_iters", "2",
        "--save_checkpoint_every", "2",
        "--val_images_use", "2",
        "--self_critical_after", "0",
        "--input_json", synth["input_json"],
        "--input_label_h5", synth["input_label_h5"],
        "--sg_dir", synth["sg_dir"],
        "--mask_dir", synth["mask_dir"],
        "--obj_name_path", synth["obj_name_path"],
        "--rel_name_path", synth["rel_name_path"],
    ])
    assert os.path.exists(os.path.join(ckpt, "model.npz"))


def test_auto_resume(synth, tmp_path):
    """--auto_resume 1 picks up checkpoint_path/model.npz after a restart
    (simulated preemption recovery); ignored on the first run."""
    from subgc_tpu.cli import train as train_cli
    ckpt = str(tmp_path / "resume_run")
    base = [
        "Sub_GC_Kar", "--checkpoint_path", ckpt, "--auto_resume", "1",
        "--batch_size", "4", "--save_checkpoint_every", "2",
        "--val_images_use", "2",
        "--input_json", synth["input_json"],
        "--input_label_h5", synth["input_label_h5"],
        "--sg_dir", synth["sg_dir"], "--mask_dir", synth["mask_dir"],
        "--obj_name_path", synth["obj_name_path"],
        "--rel_name_path", synth["rel_name_path"],
    ]
    train_cli.main(base + ["--max_iters", "2"])
    assert json.load(open(os.path.join(ckpt, "infos.json")))["iter"] == 2
    # "restart": same command, higher iter target -> resumes at 2, not 0
    train_cli.main(base + ["--max_iters", "3"])
    assert json.load(open(os.path.join(ckpt, "infos.json")))["iter"] == 3


def test_train_cli_model_overrides(synth, tmp_path):
    """Model-architecture flags (reference opts.py surface) reach the
    checkpointed config — incl. use_bn training end-to-end."""
    from subgc_tpu.cli import train as train_cli
    ckpt = str(tmp_path / "bn_run")
    train_cli.main([
        "Sub_GC_Kar", "--checkpoint_path", ckpt,
        "--batch_size", "2", "--max_iters", "1",
        "--save_checkpoint_every", "1", "--val_images_use", "2",
        "--use_bn", "2", "--gcn_layers", "1", "--rnn_size", "64",
        "--input_encoding_size", "48", "--drop_prob_lm", "0.2",
        "--input_json", synth["input_json"],
        "--input_label_h5", synth["input_label_h5"],
        "--sg_dir", synth["sg_dir"], "--mask_dir", synth["mask_dir"],
        "--obj_name_path", synth["obj_name_path"],
        "--rel_name_path", synth["rel_name_path"],
    ])
    infos = json.load(open(os.path.join(ckpt, "infos.json")))
    mc = json.loads(infos["model_config"])
    assert mc["use_bn"] == 2 and mc["gcn_layers"] == 1
    assert mc["rnn_size"] == 64 and mc["drop_prob_lm"] == 0.2


def test_debug_flags(synth, tmp_path, monkeypatch, capsys):
    """--verbose_beam / --verbose_loss / --dump_json / --dump_path
    (reference test.py:48-50,96-98, eval_utils.py:73-86,124-130)."""
    from subgc_tpu.cli import test as test_cli
    from subgc_tpu.cli import train as train_cli

    ckpt = str(tmp_path / "run")
    train_cli.main([
        "Sub_GC_Kar", "--checkpoint_path", ckpt,
        "--batch_size", "4", "--max_iters", "2",
        "--save_checkpoint_every", "2", "--val_images_use", "4",
        "--input_json", synth["input_json"],
        "--input_label_h5", synth["input_label_h5"],
        "--sg_dir", synth["sg_dir"], "--mask_dir", synth["mask_dir"],
        "--obj_name_path", synth["obj_name_path"],
        "--rel_name_path", synth["rel_name_path"],
    ])
    monkeypatch.chdir(tmp_path)   # vis/ lands here
    test_cli.main([
        "Sub_GC_Kar", "--checkpoint_path", ckpt,
        "--beam_size", "2", "--gpn_max_subg", "3", "--bucket", "16",
        "--batch_images", "2", "--num_images", "4",
        "--verbose_beam", "1", "--verbose_loss", "1",
        "--dump_json", "1", "--dump_path", "1",
        "--input_json", synth["input_json"],
        "--input_label_h5", synth["input_label_h5"],
        "--sg_dir", synth["sg_dir"], "--mask_dir", synth["mask_dir"],
    ])
    out = capsys.readouterr().out
    assert "beam search sentences of image" in out
    assert "test LM loss:" in out

    vis = json.load(open(tmp_path / "vis" / "vis.json"))
    assert len(vis) == 2      # the 10-image fixture has 2 test images
    assert {"image_id", "caption", "file_path"} <= set(vis[0])
    assert vis[0]["file_path"] == "synthetic/1004.jpg"


def test_cli_sharded_eval_matches_single(synth, tmp_path):
    """--n_devices 2: the test CLI shards the image batch over the virtual
    device mesh; captions must match the single-device run exactly."""
    from subgc_tpu.cli import test as test_cli
    from subgc_tpu.cli import train as train_cli

    ckpt = str(tmp_path / "run_shard")
    train_cli.main([
        "Sub_GC_Kar", "--checkpoint_path", ckpt,
        "--batch_size", "4", "--max_iters", "1",
        "--save_checkpoint_every", "1", "--val_images_use", "2",
        "--input_json", synth["input_json"],
        "--input_label_h5", synth["input_label_h5"],
        "--sg_dir", synth["sg_dir"], "--mask_dir", synth["mask_dir"],
        "--obj_name_path", synth["obj_name_path"],
        "--rel_name_path", synth["rel_name_path"],
    ])
    common = ["Sub_GC_Kar", "--checkpoint_path", ckpt,
              "--beam_size", "2", "--gpn_max_subg", "4", "--bucket", "16",
              "--batch_images", "2",
              "--input_json", synth["input_json"],
              "--input_label_h5", synth["input_label_h5"],
              "--sg_dir", synth["sg_dir"], "--mask_dir", synth["mask_dir"]]
    test_cli.main(common + ["--iter_tag", "single"])
    test_cli.main(common + ["--iter_tag", "sharded", "--n_devices", "2"])
    single = np.load(os.path.join(ckpt, "captions_single.npy"),
                     allow_pickle=True).tolist()
    sharded = np.load(os.path.join(ckpt, "captions_sharded.npy"),
                      allow_pickle=True).tolist()
    assert len(single) == len(sharded) >= 1
    for a, b in zip(single, sharded):
        assert a["image_id"] == b["image_id"]
        assert a["caption"] == b["caption"]
        np.testing.assert_allclose(a["subgraph_score"], b["subgraph_score"],
                                   rtol=1e-6)

    # --shard_subgraphs: row-axis sharding over MORE devices than the
    # image batch (4 > 2) — the divisibility requirement doesn't apply
    test_cli.main(common + ["--iter_tag", "rows", "--n_devices", "4",
                            "--shard_subgraphs"])
    rows = np.load(os.path.join(ckpt, "captions_rows.npy"),
                   allow_pickle=True).tolist()
    for a, b in zip(single, rows):
        assert a["image_id"] == b["image_id"]
        assert a["caption"] == b["caption"]
        np.testing.assert_allclose(a["subgraph_score"], b["subgraph_score"],
                                   rtol=1e-6)

    # misconfiguration is a clean error, not a shape crash
    with pytest.raises(SystemExit):
        test_cli.main(common + ["--iter_tag", "bad", "--n_devices", "3"])
    # --shard_subgraphs without a mesh would silently no-op; refuse it
    with pytest.raises(SystemExit):
        test_cli.main(common + ["--iter_tag", "bad2", "--shard_subgraphs"])
