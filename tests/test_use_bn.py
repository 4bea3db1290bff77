"""att_embed BatchNorm (use_bn=1/2) parity vs torch.

The reference declares the Sequential at `models/AttModel.py:114-119`:
[BatchNorm1d] Linear(GCN_dim, rnn) ReLU Dropout [BatchNorm1d(rnn) if 2],
applied through pack_wrapper (`AttModel.py:28-37,364`) so BN statistics only
cover real (unmasked) nodes and padded rows come back as exact zeros.

Note the reference's BN0 is declared over att_feat_size but fed gcn_dim
(a latent crash for any config where they differ — none shipped enables
use_bn); the oracle here uses the true input dim, matching subgc_tpu.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from subgc_tpu.config import ModelConfig
from subgc_tpu.models import decoder as D
from subgc_tpu.models import subgc
from subgc_tpu.models.params import init_params

L, R = 12, 10


def _torch_att_embed(use_bn):
    torch.manual_seed(7)
    mods = []
    if use_bn:
        mods.append(torch.nn.BatchNorm1d(L))
    mods += [torch.nn.Linear(L, R), torch.nn.ReLU(), torch.nn.Dropout(0.0)]
    if use_bn == 2:
        mods.append(torch.nn.BatchNorm1d(R))
    return torch.nn.Sequential(*mods)


def _pack_apply(module, x, mask):
    """pack_wrapper semantics: module sees only valid rows; padding -> 0."""
    S, N, C = x.shape
    flat = x.reshape(S * N, C)
    sel = mask.reshape(-1).bool()
    out_rows = module(flat[sel])
    out = torch.zeros(S * N, out_rows.shape[-1])
    out[sel] = out_rows
    return out.reshape(S, N, -1)


def _j(t):
    # np.array(copy=True): jnp.asarray on CPU can alias the torch buffer, and
    # torch's in-place running-stat updates would then leak into the jax state
    return jnp.asarray(np.array(t.detach().numpy()))


def _to_jax(module, use_bn, cfg):
    params, state = init_params(jax.random.PRNGKey(0), cfg,
                                n_obj_names=5, n_pred_names=4)
    dec = params["decoder"]
    i = 0
    if use_bn:
        bn0 = module[0]
        dec["att_bn0"] = {"scale": _j(bn0.weight), "bias": _j(bn0.bias)}
        state["att_bn"]["bn0"] = {"mean": _j(bn0.running_mean),
                                  "var": _j(bn0.running_var)}
        i = 1
    lin = module[i]
    dec["att_embed"] = {"w": _j(lin.weight).T, "b": _j(lin.bias)}
    if use_bn == 2:
        bn1 = module[4]
        dec["att_bn1"] = {"scale": _j(bn1.weight), "bias": _j(bn1.bias)}
        state["att_bn"]["bn1"] = {"mean": _j(bn1.running_mean),
                                  "var": _j(bn1.running_var)}
    return params, state


@pytest.mark.parametrize("use_bn", [1, 2])
@pytest.mark.parametrize("train", [True, False])
def test_att_embed_bn_parity(use_bn, train, rng_np):
    cfg = ModelConfig(vocab_size=20, seq_length=8, rnn_size=R,
                      input_encoding_size=8, att_hid_size=8, gcn_dim=L,
                      fc_feat_size=8, att_feat_size=2 * L, embed_dim=6,
                      num_obj_classes=5, num_rel_classes=4,
                      use_bn=use_bn, drop_prob_lm=0.0)
    module = _torch_att_embed(use_bn)
    # desynchronize the running stats from their init so eval mode is a
    # real test (not 0-mean/1-var pass-through)
    for m in module:
        if isinstance(m, torch.nn.BatchNorm1d):
            g = torch.Generator().manual_seed(3)
            m.running_mean.copy_(torch.randn(m.num_features, generator=g) * .2)
            m.running_var.copy_(torch.rand(m.num_features, generator=g) + .5)
    params, state = _to_jax(module, use_bn, cfg)

    S, N = 4, 7
    x = rng_np.randn(S, N, L).astype(np.float32)
    mask = np.zeros((S, N), np.float32)
    for s in range(S):
        mask[s, :rng_np.randint(2, N + 1)] = 1.0

    module.train(train)
    with torch.no_grad():
        ref = _pack_apply(module, torch.from_numpy(x),
                          torch.from_numpy(mask)).numpy()

    got, new_bn = D.att_embed(params, jnp.asarray(x), jnp.asarray(mask), cfg,
                              train=train, bn_state=state["att_bn"])
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5, rtol=2e-5)

    # running-stat parity (torch updated its buffers in train mode)
    bn0 = module[0]
    np.testing.assert_allclose(np.asarray(new_bn["bn0"]["mean"]),
                               bn0.running_mean.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_bn["bn0"]["var"]),
                               bn0.running_var.numpy(), atol=1e-5)
    if use_bn == 2:
        bn1 = module[4]
        np.testing.assert_allclose(np.asarray(new_bn["bn1"]["mean"]),
                                   bn1.running_mean.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(new_bn["bn1"]["var"]),
                                   bn1.running_var.numpy(), atol=1e-5)


def test_train_forward_use_bn_end_to_end():
    """use_bn=2 through the full training forward: finite loss, stats move."""
    import __graft_entry__ as GE

    cfg = ModelConfig(vocab_size=30, seq_length=16, rnn_size=16,
                      input_encoding_size=12, att_hid_size=8, gcn_dim=8,
                      fc_feat_size=16, att_feat_size=16, embed_dim=6,
                      num_obj_classes=12, num_rel_classes=6, use_bn=2)
    params, state = init_params(jax.random.PRNGKey(0), cfg,
                                n_obj_names=12, n_pred_names=6)
    rng = np.random.RandomState(0)
    graph, labels, masks, sub_obj, sub_mask, img_ix = GE._example_inputs(
        cfg, 2, rng)
    logprobs, gpn_loss, scores, new_state = subgc.train_forward(
        params, state, graph, labels, sub_obj, sub_mask, img_ix, cfg,
        train=True, rng=jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(logprobs)).all()
    assert "att_bn" in new_state
    assert not np.allclose(np.asarray(new_state["att_bn"]["bn0"]["mean"]),
                           np.asarray(state["att_bn"]["bn0"]["mean"]))
    assert not np.allclose(np.asarray(new_state["att_bn"]["bn1"]["mean"]),
                           np.asarray(state["att_bn"]["bn1"]["mean"]))
