"""Quantify the raw-tie-order question (VERDICT r4 item 8).

The beam/top-k tie-break parity target is the STABLE-SORT idealization of
the reference: on exactly equal candidate scores our word-major expansion
matches the reference's candidate order under a stable row sort
(decode/beam.py module docstring; fuzzed in tests/test_tie_breaks.py).
The reference's actual ``torch.sort`` is unstable at vocab size
(CaptionModel.py:56-69), so its raw tie order is an unspecified backend
artifact.  This tool measures whether that artifact could EVER matter on
converged weights: the raw order can change a final caption only if

  (a) some expansion step's selection boundary carries an EXACT tie —
      the bdash-th and (bdash+1)-th best candidate values are equal
      (different candidates, same f32 score), so an unstable sort could
      swap which survives; or
  (b) the final done-beam ranking's winner is exactly tied with a
      runner-up carrying a DIFFERENT token sequence.

Protocol: load the converged f32-trained production-dim weights from the
bf16 drill (tools/bf16_bound_prod.py --out /tmp/bf16_prod; 1000-image
synthetic corpus at real-COCO dims), decode the 200-image test split with
the Sub_GC_Kar eval preset (beam 2, keep 10) in float32, and at every
expansion step of every sub-graph run the production selection with ONE
extra variadic-reduce pass to expose the boundary margin
vals[bdash-1] - vals[bdash].  Reports: total expansion steps, exact-zero
boundary ties (all steps / live steps), minimum nonzero margin,
within-selection ties, and final-winner ties with differing sequences.

Expected: ~zero — converged logits are continuous f32 values; exact ties
have measure zero outside engineered integer-logit cases.  Measured
(docs/tie_margin.json): ONE boundary tie in 32,000 expansion steps, on a
LIVE beam (running sum -53.4, two different words from the same parent),
and zero final-winner ties.  Whether that one tie matters is settled by
the counterfactual: ``--probe IMG,ROW,T`` replays the recorded event
with the excluded candidate kept (the swap an unstable sort could make)
and merges the verdict into the JSON artifact — measured: the winning
caption is UNCHANGED and the row ranks 6th by sGPN (outside top-1 and
oracle-5), so the raw order could change 0 of 200 captions
(docs/TESTS.md).

Run (TPU, ~2 min):  python tools/tie_margin.py
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data", default="/tmp/bf16_prod")
    p.add_argument("--bucket", type=int, default=64)
    p.add_argument("--batch_images", type=int, default=16)
    p.add_argument("--json_out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "tie_margin.json"))
    p.add_argument("--probe", default=None, metavar="IMG,ROW,T",
                   help="counterfactual decode of one recorded tie event: "
                        "rerun that sub-graph's beam search selecting the "
                        "EXCLUDED tied candidate at step T (the swap an "
                        "unstable sort could make) and report whether the "
                        "winning caption changes and whether that row is "
                        "the image's top-1 sGPN pick")
    args = p.parse_args(argv)

    root = os.path.join(os.path.abspath(args.data), "d")
    ckpt = os.path.join(os.path.abspath(args.data), "run_kar_f32")
    if not os.path.exists(os.path.join(ckpt, "model.npz")):
        sys.exit(f"no converged weights at {ckpt}; run "
                 f"tools/bf16_bound_prod.py --out {args.data} first")

    import jax
    import jax.numpy as jnp

    from subgc_tpu.config import DataConfig, build_configs
    from subgc_tpu.data.dataset import EvalLoader
    from subgc_tpu.decode import beam as B
    from subgc_tpu.eval.runner import _stack_examples
    from subgc_tpu.models import decoder as D
    from subgc_tpu.models import subgc
    from subgc_tpu.train import checkpoint as C
    from subgc_tpu.utils.cache import enable_compilation_cache
    from subgc_tpu.utils.penalty import penalty_fn
    enable_compilation_cache()

    blob = C.load_pytree_npz(os.path.join(ckpt, "model.npz"))
    params = jax.tree_util.tree_map(jnp.asarray, blob["params"])
    state = jax.tree_util.tree_map(jnp.asarray, blob["state"])

    mcfg, ecfg, _ = build_configs("Sub_GC_Kar", mode="test")
    mcfg = mcfg.replace(compute_dtype="float32")
    dcfg = DataConfig(
        input_json=os.path.join(root, "talk.json"),
        input_label_h5=os.path.join(root, "talk_label.h5"),
        sg_dir=os.path.join(root, "sg_output_64"),
        mask_dir=os.path.join(root, "graph_mask"))
    loader = EvalLoader(mcfg, dcfg, bucket=args.bucket)
    mcfg = mcfg.replace(vocab_size=loader.vocab_size,
                        seq_length=loader.seq_length)

    bdash = ecfg.beam_size // ecfg.group_size
    assert ecfg.group_size == 1, "kar preset is G=1"
    T = mcfg.seq_length
    pen = penalty_fn(ecfg.length_penalty)

    def measured_beam_one(prms, feats_one, swap_t=None):
        """Production G=1 beam search (mirrors beam._expand_group exactly —
        same _topk_small_wordmajor passes select the survivors) plus one
        extra selection pass per step exposing the boundary margin.

        swap_t: counterfactual mode — at that step keep the (bdash+1)-th
        candidate instead of the bdash-th (the swap an unstable sort could
        make on an exact boundary tie)."""
        feats, gs = B._init_group(prms, feats_one, bdash, mcfg)

        def step(gs, local_t):
            lp, st, _ = D.decode_step(prms, gs.state, gs.token, feats, mcfg)
            V1 = lp.shape[-1]
            logprobsf = lp.at[:, V1 - 1].add(-1000.0)   # UNK suppression
            cand = gs.beam_sum[:, None] + logprobsf
            row_ok = (jnp.arange(bdash) < 1) | (local_t > 0)
            cand = jnp.where(row_ok[:, None], cand, -jnp.inf)
            vp, q, c = B._topk_small_wordmajor(cand, bdash + 1)

            # measurement: boundary margin + within-selection ties; a step
            # is "live" while any beam still carries a real running sum
            margin = vp[bdash - 1] - vp[bdash]
            within = jnp.any(vp[:bdash - 1] == vp[1:bdash]) \
                if bdash > 1 else jnp.asarray(False)
            live = jnp.any(gs.beam_sum > -999.0)
            # the tied value itself: a tie at a sum <= -999 sits on a
            # finished beam's knocked slot (CaptionModel.py:164 sets the
            # done beam's running sum to -1000) — such candidates can
            # never win the final penalized ranking.  The tied candidate
            # pairs (parent beam q, word c) let a counterfactual decode
            # (--probe) replay the swap the unstable sort could make.
            tie_val = jnp.stack([vp[bdash - 1],
                                 q[bdash - 1].astype(vp.dtype),
                                 c[bdash - 1].astype(vp.dtype),
                                 q[bdash].astype(vp.dtype),
                                 c[bdash].astype(vp.dtype)])

            sel = jnp.arange(bdash)
            if swap_t is not None:
                sel = jnp.where(local_t == swap_t,
                                sel.at[bdash - 1].set(bdash), sel)
            vp, q, c = vp[sel], q[sel], c[sel]
            new_seq = gs.beam_seq[:, q].at[local_t].set(c)
            new_lps = gs.beam_lps[:, q].at[local_t].set(logprobsf[q, c])
            st = jax.tree_util.tree_map(lambda x: x[q], st)
            beam_sum = vp
            is_done = (c == 0) | (local_t == T - 1)
            p_done = pen(local_t + 1, beam_sum)
            slot = local_t * bdash + jnp.arange(bdash)
            done_seq = gs.done_seq.at[slot].set(
                jnp.where(is_done[:, None], new_seq.T, gs.done_seq[slot]))
            done_lps = gs.done_lps.at[slot].set(
                jnp.where(is_done[:, None], new_lps.T, gs.done_lps[slot]))
            done_p = gs.done_p.at[slot].set(
                jnp.where(is_done, p_done, -jnp.inf))
            beam_sum = jnp.where(is_done, -1000.0, beam_sum)
            gs2 = B._GroupState(state=st, token=c, beam_seq=new_seq,
                                beam_lps=new_lps, beam_sum=beam_sum,
                                done_seq=done_seq, done_lps=done_lps,
                                done_p=done_p)
            return gs2, (margin, within, live, tie_val)

        gs, (margins, withins, lives, tie_vals) = jax.lax.scan(
            step, gs, jnp.arange(T))
        top_p, top_i = jax.lax.top_k(gs.done_p, 2)
        win_margin = top_p[0] - top_p[1]
        win_differs = jnp.any(gs.done_seq[top_i[0]] != gs.done_seq[top_i[1]])
        return (margins, withins, lives, tie_vals, win_margin, win_differs,
                gs.done_seq[top_i[0]])

    def measured_batch(prms, st, graph, subs, swap_t=None):
        enc = subgc.encode_images_batched(prms, st, graph, subs, mcfg, ecfg)
        prms2 = D.cast_decoder_weights(prms, mcfg)
        if mcfg.fold_embed_ih:
            prms2 = D.fold_embed_ih(prms2, mcfg)
        if mcfg.merge_lstm_matmuls:
            prms2 = D.merge_lstm_weights(prms2, mcfg)
        f = enc.feats
        if f.att_img is not None:
            ai = f.att_img if f.att_img.ndim == 3 else f.att_img[None]
            pi = f.p_att_img if f.p_att_img.ndim == 3 else f.p_att_img[None]
            ii = f.img_ix if f.img_ix is not None \
                else jnp.zeros((f.fc.shape[0],), jnp.int32)
            f = f._replace(att_img=ai, p_att_img=pi, img_ix=ii)
            axes = D.PreparedFeatures(fc=0, att=None, p_att=None, mask=0,
                                      fc_ih=0, att_img=None, p_att_img=None,
                                      img_ix=0)
            out = jax.vmap(lambda ff: measured_beam_one(prms2, ff, swap_t),
                           in_axes=(axes,))(f)
        else:
            out = jax.vmap(
                lambda ff: measured_beam_one(prms2, ff, swap_t))(f)
        return out + (enc.keep_valid, enc.scores)

    jbatch = jax.jit(measured_batch)

    examples = list(loader.iter_split("test", -1))

    if args.probe:
        img_pos, row, t_swap = map(int, args.probe.split(","))
        graph, subs = _stack_examples([examples[img_pos]])
        graph = jax.tree_util.tree_map(jnp.asarray, graph)
        subs = jax.tree_util.tree_map(jnp.asarray, subs)
        import functools
        base = jax.jit(measured_batch)(params, state, graph, subs)
        swapped = jax.jit(functools.partial(measured_batch, swap_t=t_swap))(
            params, state, graph, subs)
        seq_a = np.asarray(base[6][row])
        seq_b = np.asarray(swapped[6][row])
        valid = np.asarray(base[7])
        scores = np.where(valid, np.asarray(base[8], np.float64), -np.inf)
        out = {
            "probe": dict(image_pos=img_pos, row=row, t=t_swap),
            "winning_caption_changes": bool((seq_a != seq_b).any()),
            "base_winner_tokens": seq_a.tolist(),
            "swapped_winner_tokens": seq_b.tolist(),
            "row_is_image_top1_sgpn_pick": bool(int(np.argmax(scores)) == row),
            "row_sgpn_rank": int((scores > scores[row]).sum()),
        }
        print(json.dumps(out, indent=2))
        # merge the verdict into the artifact so a fresh probe run
        # reproduces the committed docs/tie_margin.json fields
        if os.path.exists(args.json_out):
            doc = json.load(open(args.json_out))
            doc["counterfactual_probe"] = {
                "note": f"python tools/tie_margin.py --probe {args.probe} — "
                        "replay of the recorded tie with the EXCLUDED "
                        "candidate kept (the swap an unstable sort could "
                        "make)",
                "winning_caption_changes": out["winning_caption_changes"],
                "row_is_image_top1_sgpn_pick":
                    out["row_is_image_top1_sgpn_pick"],
                "row_sgpn_rank": out["row_sgpn_rank"],
            }
            harmless = (not out["winning_caption_changes"]) \
                and not out["row_is_image_top1_sgpn_pick"]
            n_ties = len(doc.get("boundary_tie_values", []))
            doc["captions_changeable_by_raw_tie_order"] = \
                0 if (harmless and n_ties <= 1) else None
            with open(args.json_out, "w") as f:
                json.dump(doc, f, indent=2)
            print(f"[tie_margin] merged probe verdict into {args.json_out}")
        return

    print(f"[tie_margin] {len(examples)} test images, beam {bdash}, "
          f"T={T}", flush=True)

    stats = dict(steps=0, live_steps=0, zero_boundary=0,
                 zero_boundary_live=0, within_ties=0, min_margin=np.inf,
                 rows=0, final_zero_ties_diff_seq=0, min_final_margin=np.inf,
                 tie_values=[])
    for i in range(0, len(examples), args.batch_images):
        chunk = examples[i:i + args.batch_images]
        n_real = len(chunk)
        while len(chunk) < args.batch_images:
            chunk.append(chunk[-1])
        graph, subs = _stack_examples(chunk)
        graph = jax.tree_util.tree_map(jnp.asarray, graph)
        subs = jax.tree_util.tree_map(jnp.asarray, subs)
        (margins, withins, lives, tvals, win_m, win_d, _,
         valid, _) = jbatch(params, state, graph, subs)
        Smax = valid.shape[0] // args.batch_images
        # keep only real images' VALID (kept-by-NMS) sub-graph rows
        valid = np.asarray(valid).reshape(args.batch_images, Smax)[:n_real]
        m = np.asarray(margins, np.float64).reshape(
            args.batch_images, Smax, T)[:n_real][valid]
        w = np.asarray(withins).reshape(
            args.batch_images, Smax, T)[:n_real][valid]
        lv = np.asarray(lives).reshape(
            args.batch_images, Smax, T)[:n_real][valid]
        wm = np.asarray(win_m, np.float64).reshape(
            args.batch_images, Smax)[:n_real][valid]
        wd = np.asarray(win_d).reshape(
            args.batch_images, Smax)[:n_real][valid]
        stats["rows"] += int(valid.sum())
        stats["steps"] += m.size
        stats["live_steps"] += int(lv.sum())
        stats["zero_boundary"] += int((m == 0.0).sum())
        stats["zero_boundary_live"] += int(((m == 0.0) & lv).sum())
        tv = np.asarray(tvals, np.float64).reshape(
            args.batch_images, Smax, T, 5)[:n_real]
        img_r, row_r, t_r = np.nonzero(
            (np.asarray(margins, np.float64).reshape(
                args.batch_images, Smax, T)[:n_real] == 0.0)
            & valid[:, :, None])
        for ii, rr, tt in zip(img_r, row_r, t_r):
            v, q1, c1, q2, c2 = tv[ii, rr, tt]
            stats["tie_values"].append(dict(
                image_pos=int(i + ii), row=int(rr), t=int(tt),
                value=float(v),
                kept=[int(q1), int(c1)], excluded=[int(q2), int(c2)]))
        stats["within_ties"] += int((w & lv).sum())
        nz = m[(m > 0) & lv]
        if nz.size:
            stats["min_margin"] = min(stats["min_margin"], float(nz.min()))
        stats["final_zero_ties_diff_seq"] += int(((wm == 0.0) & wd).sum())
        fm = wm[wm > 0]
        if fm.size:
            stats["min_final_margin"] = min(stats["min_final_margin"],
                                            float(fm.min()))
        print(f"[tie_margin] {min(i + n_real, len(examples))}/"
              f"{len(examples)} images", flush=True)

    out = {
        "protocol": "Sub_GC_Kar f32 eval on the 1000-image drill corpus's "
                    "200 test images, converged f32-trained prod-dim "
                    "weights (tools/bf16_bound_prod.py)",
        "beam": bdash, "T": T,
        "subgraph_decodes": stats["rows"],
        "expansion_steps": stats["steps"],
        "live_expansion_steps": stats["live_steps"],
        "boundary_exact_ties": stats["zero_boundary"],
        "boundary_exact_ties_live": stats["zero_boundary_live"],
        "within_selection_ties_live": stats["within_ties"],
        # running-sum value at each exact boundary tie: <= -999 means the
        # tie sits on a finished beam's knocked slot (sum set to -1000 on
        # completion) — its done entry scores ~-1000/T penalized and can
        # never become the winning caption, so such a tie is harmless
        "boundary_tie_values": stats["tie_values"],
        "min_nonzero_boundary_margin_live": stats["min_margin"],
        "final_winner_exact_ties_with_diff_seq":
            stats["final_zero_ties_diff_seq"],
        "min_nonzero_final_margin": stats["min_final_margin"],
    }
    if stats["tie_values"]:
        e = stats["tie_values"][0]
        out["counterfactual_probe"] = (
            f"rerun with --probe {e['image_pos']},{e['row']},{e['t']} to "
            f"append the counterfactual replay verdict for this tie")
    print(json.dumps(out, indent=2))
    with open(args.json_out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"[tie_margin] wrote {args.json_out}")


if __name__ == "__main__":
    main()
