"""Gradient parity: torch autograd on the reference model vs jax.grad.

Runs the full training loss (masked NLL + gpn BCE) on identical weights and
batch in both frameworks and compares parameter gradients — end-to-end
validation that the TPU training path optimizes the same objective.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from subgc_tpu.graph import SceneGraph
from subgc_tpu.models import subgc
from subgc_tpu.train.loss import language_model_loss

from .torch_ref import (load_reference_models, make_ref_opt,
                        make_train_batch, ref_model_to_params)


@pytest.fixture(scope="module")
def ref(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("refnames_grad")
    return load_reference_models(tmp)


def test_grad_parity(ref, tiny_cfg, rng_np):
    import torch
    ref_att, obj_path, pred_path = ref
    cfg = tiny_cfg
    opt = make_ref_opt(cfg, obj_path, pred_path)
    torch.manual_seed(31)
    model = ref_att.TopDownModel(opt)
    model.eval()    # disable dropout so both sides are deterministic
    params, state = ref_model_to_params(model, cfg)
    b = make_train_batch(rng_np, cfg)

    # ---- torch side
    t = {k: torch.from_numpy(np.asarray(v)) for k, v in b.items()
         if isinstance(v, np.ndarray)}
    out_t, gpn_loss_t, _ = model(
        torch.zeros(b["B"], cfg.att_feat_size), t["att_feats"], t["labels"],
        t["gpn_att_mask"], None, t["obj_dist"], None, t["rel_ind"], None,
        t["pred_dist"], t["gpn_obj_ind"], t["gpn_pred_ind"], None,
        t["gpn_pool_mtx"], mode="forward")
    tgt = t["labels"][:, 1:]
    msk = torch.from_numpy(np.asarray(b["masks"]))[:, 1:]
    nll = -(out_t.gather(2, tgt.unsqueeze(2)).squeeze(2) * msk).sum() / msk.sum()
    loss_t = nll + gpn_loss_t
    loss_t.backward()
    tgrads = {k: v.grad.numpy() if v.grad is not None else None
              for k, v in model.named_parameters()}

    # ---- jax side
    def loss_fn(p):
        lp, gl, _, _ = subgc.train_forward(
            p, state,
            SceneGraph(obj_fmap=jnp.asarray(b["att_feats"]),
                       obj_dist=jnp.asarray(b["obj_dist"]),
                       rel_ind=jnp.asarray(b["rel_ind"], jnp.int32),
                       pred_dist=jnp.asarray(b["pred_dist"])),
            jnp.asarray(b["labels"], jnp.int32),
            jnp.asarray(b["gpn_obj_ind"], jnp.int32),
            jnp.asarray(b["gpn_att_mask"]),
            jnp.asarray(b["img_ix"], jnp.int32), cfg, train=False)
        lang = language_model_loss(lp, jnp.asarray(b["labels"], jnp.int32)[:, 1:],
                                   jnp.asarray(b["masks"])[:, 1:])
        return lang + gl
    jgrads = jax.grad(loss_fn)(params)

    # NOTE: the reference GCN alternates bipartitely (obj update reads only
    # rel feats and vice versa, graph_conv.py:21-33), so at even depth the
    # predicate-embedding path and the layer-0 obj<-rel / layer-1 rel<-obj
    # units have NO gradient under the caption+gpn loss.  torch reports
    # grad=None there; the jax side must agree with (near) zero grads.
    pairs = [
        ("obj_v_proj.weight", ("fusion", "obj_v_proj", "w"), True),
        ("obj_emb_proj.bias", ("fusion", "obj_emb_proj", "b"), False),
        ("gpn_layer.gpn_fc.0.weight", ("gpn", "fc1", "w"), True),
        ("gpn_layer.read_out_proj.1.weight", ("gpn", "readout2", "w"), True),
        ("core.att_lstm.weight_ih", ("decoder", "att_lstm", "w_ih"), True),
        ("core.lang_lstm.weight_hh", ("decoder", "lang_lstm", "w_hh"), True),
        ("core.attention.h2att.weight", ("decoder", "h2att", "w"), True),
        ("logit.weight", ("decoder", "logit", "w"), True),
        ("embed.0.weight", ("decoder", "embed"), False),
        ("ctx2att.bias", ("decoder", "ctx2att", "b"), False),
        ("gcn_backbone.gcn.0.gcn_collect.collect_units.2.fc_lft.weight",
         ("gcn", 0, 2, "lft", "w"), True),
        ("gcn_backbone.gcn.1.gcn_collect.collect_units.0.fc_rgt.weight",
         ("gcn", 1, 0, "rgt", "w"), True),
    ]

    def jget(path):
        node = jgrads
        for p in path:
            node = node[p]
        return np.asarray(node)

    for tname, jpath, transpose in pairs:
        tg = tgrads[tname]
        jg = jget(jpath)
        if transpose:
            jg = jg.T
        assert tg is not None, tname
        np.testing.assert_allclose(jg, tg, rtol=5e-3, atol=2e-6,
                                   err_msg=tname)

    # gradient-dead paths agree (torch: None; jax: zeros)
    for tname, jpath in [
            ("pred_emb_prj.weight", ("fusion", "pred_emb_proj", "w")),
            ("gcn_backbone.gcn.0.gcn_collect.collect_units.0.fc_lft.weight",
             ("gcn", 0, 0, "lft", "w")),
            ("gcn_backbone.gcn.1.gcn_collect.collect_units.3.fc_rgt.weight",
             ("gcn", 1, 3, "rgt", "w"))]:
        assert tgrads[tname] is None, tname
        np.testing.assert_allclose(jget(jpath), 0.0, atol=1e-8,
                                   err_msg=jpath)


def test_bce_loss_saturated_endpoints_finite_grad():
    """The non-logits bce_loss path must keep gradients finite when scores
    saturate to exactly 0 or 1 (clip's zero cotangent times log's 1/0 vjp
    is 0*inf=NaN without the where-guard), while the forward value still
    matches torch.nn.BCELoss's -100 log clamp."""
    import jax
    import jax.numpy as jnp
    import torch
    from subgc_tpu.models.gpn import bce_loss

    scores = jnp.asarray([0.0, 1.0, 0.3, 1e-38])
    targets = jnp.asarray([1.0, 0.0, 1.0, 0.0])

    want = torch.nn.BCELoss()(torch.tensor(np.asarray(scores)),
                              torch.tensor(np.asarray(targets))).item()
    got = float(bce_loss(scores, targets))
    np.testing.assert_allclose(got, want, rtol=1e-6)

    g = jax.grad(lambda s: bce_loss(s, targets))(scores)
    assert np.isfinite(np.asarray(g)).all(), np.asarray(g)
    # interior point keeps the true BCE derivative: d/ds -log(s) = -1/s
    np.testing.assert_allclose(np.asarray(g)[2], (-1.0 / 0.3) / 4, rtol=1e-5)
