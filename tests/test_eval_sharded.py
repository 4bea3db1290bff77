"""Multi-device eval: sharded image/sub-graph fan-out == single device."""
import numpy as np
import jax
import pytest

from subgc_tpu.config import DataConfig, EvalConfig, ModelConfig
from subgc_tpu.data.dataset import EvalLoader
from subgc_tpu.data.synthetic import generate_dataset
from subgc_tpu.eval.runner import run_test_split
from subgc_tpu.models.params import init_params
from subgc_tpu.parallel import mesh as M


def test_sharded_eval_matches_single(tmp_path):
    man = generate_dataset(str(tmp_path / "d"), n_images=12, seed=41)
    mcfg = ModelConfig(vocab_size=man["vocab_size"], rnn_size=48,
                       input_encoding_size=32, att_hid_size=24, gcn_dim=32,
                       fc_feat_size=48, att_feat_size=man["feat_dim"],
                       embed_dim=16, num_obj_classes=man["n_obj_classes"],
                       num_rel_classes=man["n_rel_classes"])
    dcfg = DataConfig(input_json=man["input_json"],
                      input_label_h5=man["input_label_h5"],
                      sg_dir=man["sg_dir"], mask_dir=man["mask_dir"])
    params, state = init_params(jax.random.PRNGKey(0), mcfg,
                                n_obj_names=mcfg.num_obj_classes,
                                n_pred_names=mcfg.num_rel_classes)
    ecfg = EvalConfig(beam_size=2, gpn_nms_thres=0.75, gpn_max_subg=4)

    loader = EvalLoader(mcfg, dcfg, bucket=16)
    single, _, _ = run_test_split(params, state, loader, mcfg, ecfg,
                                  loader.vocab, verbose=False, batch_images=8)

    mesh = M.make_mesh()
    assert mesh.devices.size == 8
    loader2 = EvalLoader(mcfg, dcfg, bucket=16)
    sharded, _, _ = run_test_split(params, state, loader2, mcfg, ecfg,
                                   loader2.vocab, verbose=False,
                                   batch_images=8, mesh=mesh)

    assert len(single) == len(sharded)
    for a, b in zip(single, sharded):
        assert a["image_id"] == b["image_id"]
        assert a["caption"] == b["caption"]
        np.testing.assert_allclose(a["subgraph_score"], b["subgraph_score"],
                                   rtol=1e-5)


@pytest.mark.parametrize("batch_images,beam_chunk", [(1, 0), (2, 0), (1, 8)])
def test_subgraph_axis_sharded_eval_matches_single(tmp_path, batch_images,
                                                   beam_chunk):
    """Row-axis (sub-graph fan-out) sharding: tokens equal single-device
    even when the image batch is SMALLER than the mesh — the case the
    image-axis shard cannot express (a lone keep-1000 image balances its
    rows over all devices; SURVEY.md §5 sequence-parallel analog)."""
    man = generate_dataset(str(tmp_path / "d"), n_images=6, seed=43)
    mcfg = ModelConfig(vocab_size=man["vocab_size"], rnn_size=48,
                       input_encoding_size=32, att_hid_size=24, gcn_dim=32,
                       fc_feat_size=48, att_feat_size=man["feat_dim"],
                       embed_dim=16, num_obj_classes=man["n_obj_classes"],
                       num_rel_classes=man["n_rel_classes"])
    dcfg = DataConfig(input_json=man["input_json"],
                      input_label_h5=man["input_label_h5"],
                      sg_dir=man["sg_dir"], mask_dir=man["mask_dir"])
    params, state = init_params(jax.random.PRNGKey(0), mcfg,
                                n_obj_names=mcfg.num_obj_classes,
                                n_pred_names=mcfg.num_rel_classes)
    # beam_chunk=8 < the 16-row bucket exercises the chunked-beam path
    # UNDER the row-sharding constraint (otherwise only the dryrun covers
    # that interplay)
    ecfg = EvalConfig(beam_size=2, gpn_nms_thres=0.75, gpn_max_subg=4,
                      beam_chunk=beam_chunk)

    loader = EvalLoader(mcfg, dcfg, bucket=16)
    single, _, _ = run_test_split(params, state, loader, mcfg, ecfg,
                                  loader.vocab, verbose=False,
                                  batch_images=batch_images)

    mesh = M.make_mesh()
    assert batch_images < mesh.devices.size
    loader2 = EvalLoader(mcfg, dcfg, bucket=16)
    sharded, _, _ = run_test_split(params, state, loader2, mcfg, ecfg,
                                   loader2.vocab, verbose=False,
                                   batch_images=batch_images, mesh=mesh,
                                   shard_axis="subgraph")

    assert len(single) == len(sharded)
    for a, b in zip(single, sharded):
        assert a["image_id"] == b["image_id"]
        assert a["caption"] == b["caption"]
        np.testing.assert_allclose(a["subgraph_score"], b["subgraph_score"],
                                   rtol=1e-5)
