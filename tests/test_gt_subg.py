"""GT-sub-graph (Sup. model) branches: train sampling + SCT lookup."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from subgc_tpu.config import DataConfig, EvalConfig, ModelConfig, TrainConfig
from subgc_tpu.data.dataset import EvalLoader, TrainLoader
from subgc_tpu.data.sct import SCTLoader
from subgc_tpu.data.synthetic import generate_dataset
from subgc_tpu.eval.runner import run_test_split
from subgc_tpu.models.params import init_params
from subgc_tpu.train.optim import build_optimizer
from subgc_tpu.train.step import init_train_state, make_train_step


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("gtsubg")
    return generate_dataset(str(root), n_images=10, seed=61)


def _cfgs(man, use_gt_subg):
    mcfg = ModelConfig(vocab_size=man["vocab_size"], rnn_size=48,
                       input_encoding_size=32, att_hid_size=24, gcn_dim=32,
                       fc_feat_size=48, att_feat_size=man["feat_dim"],
                       embed_dim=16, num_obj_classes=man["n_obj_classes"],
                       num_rel_classes=man["n_rel_classes"],
                       use_gt_subg=use_gt_subg)
    dcfg = DataConfig(input_json=man["input_json"],
                      input_label_h5=man["input_label_h5"],
                      sg_dir=man["sg_dir"], mask_dir=man["mask_dir"])
    return mcfg, dcfg


def test_gt_subg_training(synth):
    """Sup. model: sentence i trains on GT sub-graph i (dataloader.py:305-333);
    no sGPN loss (gpn.py:58-62)."""
    mcfg, dcfg = _cfgs(synth, use_gt_subg=True)
    tcfg = TrainConfig(batch_size=4, warmup_n=2)
    loader = TrainLoader(mcfg, tcfg, dcfg)
    batch, infos, _ = loader.get_batch("train")
    # every pos/neg slot of sentence i holds GT sub-graph i: identical
    # node indices across the (2, half) axes
    so = batch.sub_obj_ind
    assert (so == so[:, :1, :1, :]).all()

    params, mstate = init_params(jax.random.PRNGKey(0), mcfg,
                                 n_obj_names=mcfg.num_obj_classes,
                                 n_pred_names=mcfg.num_rel_classes)
    assert "fc1" not in params["gpn"]   # no sGPN scorer in the Sup. model
    optimizer = build_optimizer(tcfg)
    ts = init_train_state(params, mstate, optimizer)
    step = make_train_step(mcfg, tcfg, optimizer)
    ts, metrics = step(ts, jax.tree_util.tree_map(jnp.asarray, batch),
                       jax.random.PRNGKey(1), jnp.zeros((), jnp.int32),
                       jnp.zeros(()))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["gpn_loss"]) == 0.0


def test_sct_gt_subgraph_lookup(synth, tmp_path):
    """Sup. SCT: region sets resolve to precomputed GT sub-graphs by exact
    seed-node-set match (dataloader_test_sct.py:356-380)."""
    mcfg, dcfg = _cfgs(synth, use_gt_subg=True)
    base = EvalLoader(mcfg, dcfg, bucket=8)

    # craft SCT region sets whose matched nodes EQUAL each GT sub-graph's
    # stored seed nodes (so the lookup must succeed)
    sct_dict, img_wh = {}, {}
    for pos in range(len(base)):
        ix = base.split_ix["test"][pos]
        img_id = base.ds.images[ix]["id"]
        sg = base.sg.get(img_id)
        boxes = np.asarray(sg["boxes"])
        md = base.masks.get(img_id)
        img_wh[img_id] = (592, 592)
        groups = []
        for gt_i in range(2):
            seeds = np.unique(np.asarray(md["subgraph_mask_list"][gt_i][4]))
            rs = np.zeros((len(seeds), 5))
            rs[:, :4] = boxes[seeds]
            rs[:, 4] = 1
            groups.append(rs)
        width = max(g.shape[0] for g in groups)
        arr = np.zeros((2, width, 5))
        for g_i, g in enumerate(groups):
            arr[g_i, :g.shape[0]] = g
        sct_dict[str(img_id)] = arr

    loader = SCTLoader(mcfg, dcfg, sct_dict, img_wh, use_greedy_subg=False,
                       use_gt_subg=True, bucket=8)
    ex = loader.example(0)
    img_id = ex.info.id
    md = base.masks.get(img_id)
    for g_i in range(2):
        want = np.asarray(md["subgraph_mask_list"][g_i][1]).nonzero()[0]
        got = np.asarray(ex.subs.obj_ind[g_i])[
            np.asarray(ex.subs.att_mask[g_i]) > 0]
        np.testing.assert_array_equal(np.sort(got), np.sort(want))

    # decode end-to-end: Sup. model scores are all ones, order preserved
    params, state = init_params(jax.random.PRNGKey(0), mcfg,
                                n_obj_names=mcfg.num_obj_classes,
                                n_pred_names=mcfg.num_rel_classes)
    ecfg = EvalConfig(beam_size=2, sct=True, use_gt_subg=True)
    preds, _, _ = run_test_split(params, state, loader, mcfg, ecfg,
                                 loader.vocab, verbose=False, batch_images=2)
    for p in preds:
        np.testing.assert_allclose(p["subgraph_score"], 1.0)
        assert len(p["caption"]) == 2
