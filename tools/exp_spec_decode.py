"""Measure the upper bound of speculative / multi-token decoding (VERDICT r3
item 7) on the greedy fan-out shape.

Speculative decoding's premise is that the expensive model can VERIFY K
drafted tokens in parallel — true for a transformer (one forward over K
positions), structurally false for this decoder: the TopDown core is two
LSTMs (models/decoder.py::decode_step; reference hot loop
models/AttModel.py:157-175,236-326), so verifying K tokens still takes K
sequential att-LSTM -> attention -> lang-LSTM -> logit steps because step
t+1 needs h_t/c_t, not just token t.  Token foreknowledge can only move
work that depends on the TOKEN but not on the STATE off the serial chain:
the embedding lookup + the word-embedding gate projection (xt @ w_ih[2R:]),
batched over all T steps as one [T*S, E] x [E, 4R] matmul — exactly the
teacher-forcing hoist the train step ships (decoder.py::forward_teacher).

This tool measures that bound directly, at the M-RNN greedy fan-out shape:

  A  greedy       the production serial decode (decode/greedy.py::sample):
                  argmax feeds the next step's embedding inside the scan.
  B  oracle       all T tokens known upfront (taken from A's own output =
                  100% acceptance): embed + xt@w_ih hoisted out of the scan,
                  but logits + argmax + token-compare still run per step —
                  the work ANY exact verifier must do.
  C  floor        B without the argmax/compare (selection hypothetically
                  free) — decomposes selection cost from the hoist.

A - B is the HARD ceiling of any speculation scheme: 100%-acceptance,
zero-cost draft.  A real scheme pays on top: a draft model (necessarily
recurrent, i.e. serial, and there is no smaller model family to draft
from), per-window re-dispatch or masked re-decode on rejection, and the
acceptance rate itself.  If A - B is small, the lever is dead by
measurement, not by argument.

Beam search (the kar headline) is strictly worse for speculation: the
per-step output IS the top-k expansion (decode/beam.py::_expand_group),
so an exact verifier must recompute the full [bdash, V1] selection anyway
and foreknowledge saves only the same xt hoist bounded here.

Usage: python tools/exp_spec_decode.py [S] [T]
Env:   EXP_DTYPE=float32|bfloat16 (default bfloat16), EXP_BF16_GATES=0|1
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
    from subgc_tpu.decode import greedy
    from subgc_tpu.models import decoder as D
    from subgc_tpu.models.params import init_params

    # S=4096: the mrnn fan-out scale (batch 4 x keep 1000), rounded to the
    # 128-row bf16 tiling so alignment effects don't confound the A/B
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    dtype = os.environ.get("EXP_DTYPE", "bfloat16")
    gates = os.environ.get("EXP_BF16_GATES",
                           "1" if dtype == "bfloat16" else "0") == "1"

    cfg = ModelConfig(vocab_size=9487, compute_dtype=dtype,
                      bf16_lstm_gates=gates, seq_length=T)
    ecfg = EvalConfig(beam_size=1)
    params, _ = init_params(jax.random.PRNGKey(0), cfg,
                            n_obj_names=1599, n_pred_names=21)
    rng = np.random.RandomState(0)
    store_dt = cfg.cdtype
    feats = D.PreparedFeatures(
        fc=jnp.asarray(rng.randn(S, cfg.rnn_size), jnp.float32),
        att=jnp.asarray(rng.randn(S, cfg.obj_num, cfg.rnn_size), store_dt),
        p_att=jnp.asarray(rng.randn(S, cfg.obj_num, cfg.att_hid_size),
                          store_dt),
        mask=jnp.ones((S, cfg.obj_num), jnp.float32),
        fc_ih=jnp.asarray(rng.randn(S, 4 * cfg.rnn_size),
                          store_dt if gates else jnp.float32))

    def oracle(params, feats, tokens, verify: bool):
        """Decode with all T tokens known upfront (the 100%-accept case).

        Hoists embed + xt @ w_ih[2R:] for every step as one [T*S, E] x
        [E, 4R] matmul; the scan still runs both LSTM cells, attention and
        the logit matmul per step (serial in h/c).  verify=True adds the
        per-step argmax + compare an exact verifier performs."""
        params = D.cast_decoder_weights(params, cfg)
        dec = params["decoder"]
        R1 = cfg.rnn_size
        dt = cfg.cdtype
        bf16g = cfg.bf16_lstm_gates and dt != jnp.float32
        # decode inputs: BOS then the chosen tokens shifted right
        inp = jnp.concatenate(
            [jnp.zeros((S, 1), jnp.int32), tokens[:, :-1]], axis=1)   # [S,T]
        xt = jax.nn.relu(dec["embed"][inp.T])                         # [T,S,E]
        # same numerics as the in-scan _matmul(xt, w_ih[2R:], dt, keep=bf16g)
        xt_ih_all = jax.vmap(
            lambda x: D._matmul(x, dec["att_lstm"]["w_ih"][2 * R1:], dt,
                                keep=bf16g))(xt)                      # [T,S,4R]

        def step(carry, inps):
            state, ok = carry
            xt_ih, tok_true = inps
            lp, state, _ = D.decode_step(params, state, tok_true, feats,
                                         cfg, xt_ih=xt_ih)
            if verify:
                nxt = jnp.argmax(lp, axis=-1)
                ok = ok & (nxt == tok_true)
            chosen = jnp.take_along_axis(lp, tok_true[:, None], -1)[:, 0]
            return (state, ok), chosen

        (_, ok), lps = jax.lax.scan(
            step, (D.init_state(S, cfg), jnp.ones((S,), bool)),
            (xt_ih_all, tokens.T))
        return ok, lps.T

    f_greedy = jax.jit(lambda p, f: greedy.sample(p, f, cfg, ecfg))
    f_oracle = jax.jit(lambda p, f, t: oracle(p, f, t, verify=True))
    f_floor = jax.jit(lambda p, f, t: oracle(p, f, t, verify=False))

    # warm up with FETCHED calls (axon one-time setup; CLAUDE.md recipe)
    out = f_greedy(params, feats)
    tokens = jnp.asarray(np.asarray(out.seq))           # A's own output
    ok, o_lps = f_oracle(params, feats, tokens)
    ok_np = np.asarray(ok)
    _, fl_lps = f_floor(params, feats, tokens)
    np.asarray(fl_lps)

    # sanity: with tokens from A, the verifier accepts every step up to EOS
    # masking (post-EOS tokens are zeroed in A, argmax may differ there)
    n_live = int(np.asarray((out.seq > 0).all(axis=1)).sum())
    acc_live = float(ok_np[np.asarray((out.seq > 0).all(axis=1))].mean()) \
        if n_live else 1.0
    print(f"S={S} T={T} dtype={dtype} gates={gates} "
          f"verify-accept on EOS-free rows: {acc_live:.4f} ({n_live} rows)",
          flush=True)

    def timeit(fn, *args, reps=10):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.time() - t0) / reps * 1e3

    ms_a = timeit(f_greedy, params, feats)
    ms_b = timeit(f_oracle, params, feats, tokens)
    ms_c = timeit(f_floor, params, feats, tokens)
    print(f"A greedy (serial argmax feedback): {ms_a:8.2f} ms  "
          f"({S * 1e3 / ms_a:7.0f} caps/s)")
    print(f"B oracle+verify (hoisted inputs):  {ms_b:8.2f} ms  "
          f"({S * 1e3 / ms_b:7.0f} caps/s)")
    print(f"C floor (selection free):          {ms_c:8.2f} ms  "
          f"({S * 1e3 / ms_c:7.0f} caps/s)")
    print(f"speculation ceiling (A-B)/A: {100 * (ms_a - ms_b) / ms_a:.1f}% "
          f"— 100% acceptance, zero-cost draft")
    print(f"selection cost (B-C)/A:      {100 * (ms_b - ms_c) / ms_a:.1f}%")


if __name__ == "__main__":
    main()
