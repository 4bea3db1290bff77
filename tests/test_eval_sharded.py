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


def _tiny_setup(tmp_path, n_images, seed):
    man = generate_dataset(str(tmp_path / "d"), n_images=n_images, seed=seed)
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
    return man, mcfg, dcfg, params, state


def _run(params, state, mcfg, dcfg, ecfg, collect=None, **kw):
    loader = EvalLoader(mcfg, dcfg, bucket=16)
    grd = []
    cb = None
    if collect:
        def cb(ex, sents, sorted_ind, att, order):
            grd.append((ex.info.id, tuple(sents),
                        tuple(int(i) for i in sorted_ind),
                        None if att is None else np.asarray(att)))
    preds, _, _ = run_test_split(params, state, loader, mcfg, ecfg,
                                 loader.vocab, verbose=False,
                                 collect_grounding=cb, **kw)
    return preds, grd


def _assert_same(single, sharded, grd_single=None, grd_sharded=None):
    assert len(single) == len(sharded)
    for a, b in zip(single, sharded):
        assert a["image_id"] == b["image_id"]
        assert a["caption"] == b["caption"]
        np.testing.assert_allclose(a["subgraph_score"], b["subgraph_score"],
                                   rtol=1e-5)
        assert list(a["sorted_subgraph_ind"]) == list(b["sorted_subgraph_ind"])
    if grd_single is not None:
        assert len(grd_single) == len(grd_sharded)
        for (ia, sa, ka, aa), (ib, sb, kb, ab) in zip(grd_single,
                                                      grd_sharded):
            assert (ia, sa, ka) == (ib, sb, kb)
            assert (aa is None) == (ab is None)
            if aa is not None:
                np.testing.assert_allclose(aa, ab, rtol=1e-4, atol=1e-6)


# the three decode modes VERDICT r4 item 2 flagged as unpinned under
# sharding: attention capture (Sub_GC_Flickr_GRD), top-k sampling
# (Sub_GC_S_MRNN — the per-step RNG split must be shard-invariant), and
# diverse-group beam (Full_GC-style G>1)
_MODE_ECFG = {
    "return_att": dict(beam_size=1, return_att=True,
                       gpn_nms_thres=0.75, gpn_max_subg=4),
    "topk": dict(beam_size=1, use_topk_sampling=True, the_k=3,
                 topk_temp=0.6, gpn_nms_thres=0.75, gpn_max_subg=4),
    "diverse_beam": dict(beam_size=2, group_size=2, diversity_lambda=0.5,
                         gpn_nms_thres=0.75, gpn_max_subg=4),
}


@pytest.mark.parametrize("mode", sorted(_MODE_ECFG))
def test_sharded_eval_matches_single_all_modes(tmp_path, mode):
    """Sharded == single-device for the remaining eval presets' decode
    modes, on BOTH shard axes (image and sub-graph row).  Covers the
    Sub_GC_Flickr_GRD / Sub_GC_S_MRNN / diverse-beam configs that
    test_sharded_eval_matches_single (plain beam) does not."""
    man, mcfg, dcfg, params, state = _tiny_setup(tmp_path, 8, 47 + len(mode))
    ecfg = EvalConfig(max_subgraph_bucket=16, **_MODE_ECFG[mode])
    collect = mode == "return_att"

    single, grd0 = _run(params, state, mcfg, dcfg, ecfg, collect=collect,
                        batch_images=8)
    mesh = M.make_mesh()
    assert mesh.devices.size == 8

    img_sharded, grd1 = _run(params, state, mcfg, dcfg, ecfg,
                             collect=collect, batch_images=8, mesh=mesh)
    _assert_same(single, img_sharded, grd0 if collect else None, grd1)

    # topk draws depend on the per-batch rng split, so its row-axis run
    # keeps batch_images=8 (same key sequence as the single run; sharding
    # itself must not change the draws).  The deterministic modes also
    # exercise batch < mesh, the case only row sharding can express.
    row_batch = 8 if mode == "topk" else 2
    row_sharded, grd2 = _run(params, state, mcfg, dcfg, ecfg,
                             collect=collect, batch_images=row_batch,
                             mesh=mesh, shard_axis="subgraph")
    _assert_same(single, row_sharded, grd0 if collect else None, grd2)


def test_subgraph_axis_requires_mesh(tmp_path):
    """shard_axis='subgraph' with no mesh is a config error, not a silent
    unsharded run (direct-API misuse guard mirroring cli/test.py)."""
    man, mcfg, dcfg, params, state = _tiny_setup(tmp_path, 2, 59)
    loader = EvalLoader(mcfg, dcfg, bucket=16)
    ecfg = EvalConfig(beam_size=1, gpn_max_subg=2, max_subgraph_bucket=16)
    with pytest.raises(ValueError, match="requires a mesh"):
        run_test_split(params, state, loader, mcfg, ecfg, loader.vocab,
                       verbose=False, shard_axis="subgraph")


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
