"""Bisect the decode-step cost at large batch on the real chip.

Times the per-step components at the batch-64 bench shape (640 kept
sub-graphs x beam 3 = 1920 rows): LSTM cells, attention, logit+log_softmax,
beam top-k selection — each as its own jitted 17-step scan so the numbers
compare against the full decode loop.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from subgc_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from subgc_tpu.config import EvalConfig, ModelConfig
    from subgc_tpu.decode.beam import _topk_small
    from subgc_tpu.models import decoder as D
    from subgc_tpu.models.params import init_params

    R = int(sys.argv[1]) if len(sys.argv) > 1 else 1920
    S = R // 3                     # sub-graphs (beam 3)
    T = 17
    cfg = ModelConfig(vocab_size=9487,
                      compute_dtype=os.environ.get("PROFILE_DTYPE",
                                                   "float32"),
                      bf16_lstm_gates=os.environ.get("PROFILE_BF16_GATES")
                      == "1")
    V1 = cfg.vocab_size + 1
    params, _ = init_params(jax.random.PRNGKey(0), cfg,
                            n_obj_names=1599, n_pred_names=21)
    rng = np.random.RandomState(0)
    params = D.cast_decoder_weights(params, cfg)
    store_dt = cfg.cdtype           # prepare_features' storage rule
    feats = D.PreparedFeatures(
        fc=jnp.asarray(rng.randn(R, cfg.rnn_size), jnp.float32),
        att=jnp.asarray(rng.randn(R, cfg.obj_num, cfg.rnn_size), store_dt),
        p_att=jnp.asarray(rng.randn(R, cfg.obj_num, cfg.att_hid_size),
                          store_dt),
        mask=jnp.ones((R, cfg.obj_num), jnp.float32),
        fc_ih=jnp.asarray(rng.randn(R, 4 * cfg.rnn_size), jnp.float32))

    def scan17(step_fn, init, fts):
        # feats MUST flow in as a jit argument: closing over the [R,37,1000]
        # att tensors embeds ~430 MB of literals into the HLO, which stalls
        # the remote compiler indefinitely (the cause of the earlier
        # "profiler hangs >25 min" stalls)
        def wrapped(carry, _):
            return step_fn(carry, fts), None
        out, _ = jax.lax.scan(wrapped, init, None, length=T)
        return out

    dec = params["decoder"]

    def full_step(carry, fts):
        state, tok = carry
        lp, state, _ = D.decode_step(params, state, tok, fts, cfg)
        tok = jnp.argmax(lp, -1).astype(jnp.int32)
        return state, tok

    def lstm_only(carry, fts):
        state, tok = carry
        xt = jax.nn.relu(dec["embed"][tok])
        x_att = jnp.concatenate([state.h_lang, fts.fc, xt], -1)
        h_att, c_att = D._lstm_cell(dec["att_lstm"], x_att, state.h_att,
                                    state.c_att, cfg.cdtype)
        x_lang = jnp.concatenate([h_att, h_att], -1)
        h_lang, c_lang = D._lstm_cell(dec["lang_lstm"], x_lang, state.h_lang,
                                      state.c_lang, cfg.cdtype)
        return D.DecoderState(h_att, c_att, h_lang, c_lang), tok

    def attention_only(carry, fts):
        state, tok = carry
        att_res, _ = D.attention(params, state.h_att, fts, cfg)
        return D.DecoderState(att_res.astype(state.h_att.dtype),
                              state.c_att, state.h_lang,
                              state.c_lang), tok

    def logit_only(carry, fts):
        state, tok = carry
        # mirror the real path: _dense accumulates into f32 logits
        lp = jax.nn.log_softmax(D._dense(state.h_lang, dec["logit"],
                                         cfg.cdtype), -1)
        tok = jnp.argmax(lp, -1).astype(jnp.int32)
        return state, tok

    def topk_only(carry, fts):
        state, tok = carry
        # emulate the beam candidate selection: per sub-graph, 3 argmax
        # passes over beam*vocab
        cand = (state.h_lang[:, :1].astype(jnp.float32)
                + jnp.zeros((R, V1))).reshape(S, 3 * V1)
        v, i = jax.vmap(lambda x: _topk_small(x, 3))(cand)
        tok = (i[:, 0] % V1).astype(jnp.int32)
        tok = jnp.repeat(tok, 3)[:R]
        return state, tok

    init = (D.init_state(R, cfg), jnp.zeros((R,), jnp.int32))
    components = [("full step x17", full_step),
                  ("lstm cells x17", lstm_only),
                  ("attention x17", attention_only),
                  ("logit+softmax x17", logit_only),
                  ("beam topk x17", topk_only)]
    only = os.environ.get("PROFILE_ONLY")
    if only:
        components = [(n, f) for n, f in components if only in n]
    for name, fn in components:
        print(f"compiling {name}...", flush=True)
        jit_fn = jax.jit(lambda i, fts, f=fn: scan17(f, i, fts))
        out = jit_fn(init, feats)
        jax.block_until_ready(out)
        out = jit_fn(init, feats)   # fetched warm-up (tunnel one-time work)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(10):
            out = jit_fn(init, feats)
        jax.block_until_ready(out)
        print(f"{name:>20}: {(time.time() - t0) / 10 * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
