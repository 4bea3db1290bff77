"""Training CLI — `python -m subgc_tpu.cli.train <MODEL_TYPE> [flags]`.

Replaces `train.sh` + `train.py`: MODEL_TYPE presets resolve to the same
flag bundles (config.TRAIN_PRESETS); the loop mirrors `train.py:54-240`
(warmup/decay LR, scheduled sampling, periodic val + checkpoint) with the
whole step jitted and data-parallel over the available chips.
"""
from __future__ import annotations

import argparse
import os
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("model_type", nargs="?", default="Sub_GC_Kar")
    p.add_argument("--checkpoint_path", type=str, default="logs/run")
    p.add_argument("--start_from", type=str, default=None)
    p.add_argument("--auto_resume", type=int, default=0,
                   help="resume from checkpoint_path/model.npz if present "
                        "(preemption recovery for managed TPU jobs)")
    p.add_argument("--trace_steps", type=str, default=None,
                   help="'START:COUNT' — capture a jax.profiler device "
                        "trace over those train steps into "
                        "checkpoint_path/trace (view with xprof)")
    p.add_argument("--word_mapping", type=str, default=None,
                   help="word_mapping.npy for cross-dataset finetune: maps "
                        "new vocab index -> old (models/__init__.py:14-41)")
    p.add_argument("--max_iters", type=int, default=-1,
                   help="stop after N iterations (useful for smoke runs)")
    p.add_argument("--save_history_ckpt", type=int, default=0,
                   help="1: additionally keep an iteration-suffixed copy at "
                        "every checkpoint (reference opts.py:131)")
    p.add_argument("--self_critical_after", type=int, default=-1,
                   help="epoch to switch to SCST policy-gradient training "
                        "(-1 disables; reference opts.py:66 ships the flag "
                        "unused — train/scst.py implements the loop)")
    p.add_argument("--max_epochs", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--learning_rate", type=float, default=None)
    p.add_argument("--save_checkpoint_every", type=int, default=None)
    p.add_argument("--val_images_use", type=int, default=None)
    p.add_argument("--losses_log_every", type=int, default=None)
    p.add_argument("--input_json", type=str, default=None)
    p.add_argument("--input_label_h5", type=str, default=None)
    p.add_argument("--sg_dir", type=str, default=None)
    p.add_argument("--mask_dir", type=str, default=None)
    p.add_argument("--packed_path", type=str, default=None,
                   help="mmap'ed packed shard(s) (glob / comma-list) "
                        "replacing --sg_dir/--mask_dir (tools/pack_dataset)")
    p.add_argument("--glove_path", type=str, default=None)
    p.add_argument("--obj_name_path", type=str, default=None)
    p.add_argument("--rel_name_path", type=str, default=None)
    p.add_argument("--n_devices", type=int, default=None,
                   help="data-parallel devices (default: all)")
    p.add_argument("--compute_dtype", type=str, default=None,
                   choices=["float32", "bfloat16"],
                   help="matmul compute dtype (params/optimizer stay f32); "
                        "bfloat16 measures +31%% step throughput at batch 64 "
                        "(docs/PERF.md)")
    p.add_argument("--bf16_lstm_gates", type=int, default=None,
                   help="with bfloat16: run the [S,4R] LSTM gate streams in "
                        "bf16 too (c stays f32) — measured +1-3%% step "
                        "throughput, looser numerics (docs/PERF.md)")
    p.add_argument("--bf16_residuals", type=int, default=None,
                   help="store the decode scan's saved-for-backward LSTM "
                        "residuals in bf16 (forward numerics unchanged, "
                        "gradient rounding bounded in "
                        "tests/test_bf16_residuals.py; docs/PERF.md)")
    p.add_argument("--share_att_train", type=int, default=None,
                   help="teacher-forced attention over image-shared node "
                        "streams instead of per-row gathered copies — "
                        "seq_per_img x less attention HBM traffic in the "
                        "train scan; float-reassociated, att-dropout masks "
                        "shared per image (docs/PERF.md)")
    # model-architecture overrides (the reference exposes these on opts.py;
    # presets remain the defaults)
    p.add_argument("--use_bn", type=int, default=None, choices=[0, 1, 2],
                   help="att_embed BatchNorm (opts.py:46-47)")
    p.add_argument("--gcn_layers", type=int, default=None)
    p.add_argument("--gcn_residual", type=int, default=None)
    p.add_argument("--gcn_bn", type=int, default=None)
    p.add_argument("--gcn_dim", type=int, default=None)
    p.add_argument("--rnn_size", type=int, default=None)
    p.add_argument("--att_hid_size", type=int, default=None)
    p.add_argument("--input_encoding_size", type=int, default=None)
    p.add_argument("--pred_emb_type", type=int, default=None, choices=[1, 2])
    p.add_argument("--drop_prob_lm", type=float, default=None)
    p.add_argument("--seed", type=int, default=2019)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..parallel.distributed import maybe_initialize_distributed
    maybe_initialize_distributed()   # no-op unless SUBGC_COORDINATOR etc.

    from ..config import build_configs, config_to_json
    from ..data.dataset import TrainLoader
    from ..io.glove import class_embeddings
    from ..models.params import init_params
    from ..parallel import mesh as M
    from ..train import checkpoint as C
    from ..train.optim import build_optimizer, ss_prob
    from ..train.step import init_train_state, make_train_step, make_val_step

    overrides = {"train": {}, "data": {}, "model": {}}
    for k in ["max_epochs", "batch_size", "learning_rate",
              "save_checkpoint_every", "val_images_use", "losses_log_every"]:
        if getattr(args, k) is not None:
            overrides["train"][k] = getattr(args, k)
    for k in ["input_json", "input_label_h5", "sg_dir", "mask_dir",
              "packed_path", "glove_path", "obj_name_path", "rel_name_path"]:
        if getattr(args, k) is not None:
            overrides["data"][k] = getattr(args, k)

    if args.compute_dtype is not None:
        overrides["model"]["compute_dtype"] = args.compute_dtype
    if args.bf16_lstm_gates is not None:
        overrides["model"]["bf16_lstm_gates"] = bool(args.bf16_lstm_gates)
    if args.bf16_residuals is not None:
        overrides["model"]["bf16_residuals"] = bool(args.bf16_residuals)
    if args.share_att_train is not None:
        overrides["model"]["share_att_train"] = bool(args.share_att_train)
    for k in ["use_bn", "gcn_layers", "gcn_residual", "gcn_dim", "rnn_size",
              "att_hid_size", "input_encoding_size", "pred_emb_type",
              "drop_prob_lm"]:
        if getattr(args, k) is not None:
            overrides["model"][k] = getattr(args, k)
    if args.gcn_bn is not None:
        overrides["model"]["gcn_bn"] = bool(args.gcn_bn)
    mcfg, tcfg, dcfg = build_configs(args.model_type, mode="train", **overrides)
    loader = TrainLoader(mcfg, tcfg, dcfg, seed=args.seed)
    mcfg = mcfg.replace(vocab_size=loader.vocab_size,
                        seq_length=loader.seq_length)

    obj_names = np.load(dcfg.obj_name_path, allow_pickle=True,
                        encoding="latin1")
    rel_names = np.load(dcfg.rel_name_path, allow_pickle=True,
                        encoding="latin1")
    obj_vecs, rel_vecs = None, None
    if os.path.exists(dcfg.glove_path):
        obj_vecs = class_embeddings(list(obj_names), dcfg.glove_path,
                                    mcfg.embed_dim)
        rel_vecs = class_embeddings(list(rel_names), dcfg.glove_path,
                                    mcfg.embed_dim)

    params, mstate = init_params(jax.random.PRNGKey(args.seed), mcfg,
                                 obj_glove=obj_vecs, pred_glove=rel_vecs,
                                 n_obj_names=len(obj_names),
                                 n_pred_names=len(rel_names))
    optimizer = build_optimizer(tcfg)
    ts = init_train_state(params, mstate, optimizer)
    iteration, epoch = 0, 0
    histories = {"loss_history": {}, "lr_history": {}, "ss_prob_history": {},
                 "val_loss_history": {}}

    if (args.auto_resume and not args.start_from
            and os.path.exists(os.path.join(args.checkpoint_path,
                                            "model.npz"))):
        # preemption recovery: pick up where the last run in this
        # checkpoint dir stopped (the reference restarts from scratch —
        # SURVEY.md §5 lists no recovery path)
        args.start_from = args.checkpoint_path
        print(f"auto-resuming from {args.checkpoint_path}")
    if args.start_from:
        p2, s2, o2, infos, histories2 = C.load_checkpoint(
            args.start_from, opt_state_template=ts.opt_state)
        wm = None
        if args.word_mapping:
            wm = np.load(args.word_mapping, allow_pickle=True,
                         encoding="latin1")
        params = C.optimistic_restore(jax.device_get(ts.params), p2,
                                      word_mapping=wm)
        params = jax.tree_util.tree_map(jnp.asarray, params)
        ts = ts._replace(params=params,
                         model_state=jax.tree_util.tree_map(jnp.asarray, s2))
        if o2 is not None:
            ts = ts._replace(opt_state=o2)
        iteration = infos.get("iter", 0)
        epoch = infos.get("epoch", 0)
        ts = ts._replace(step=jnp.asarray(iteration, jnp.int32))
        histories = histories2 or histories

    n_dev = args.n_devices or len(jax.devices())
    while n_dev > 1 and tcfg.batch_size % n_dev != 0:
        n_dev -= 1          # data axis must divide the batch
    mesh = M.make_mesh(n_data=n_dev) if n_dev > 1 else None
    if mesh is not None:
        ts = ts._replace(params=M.replicate(mesh, ts.params),
                         model_state=M.replicate(mesh, ts.model_state),
                         opt_state=M.replicate(mesh, ts.opt_state))

    # two step programs, selected by whether the epoch's ss_prob is 0:
    # the ss-inactive one hoists the word-embedding gate matmuls out of the
    # decode scan (forward_teacher) — compiled lazily, so a run that never
    # crosses scheduled_sampling_start only ever builds the hoisted one
    step_ss = make_train_step(mcfg, tcfg, optimizer)
    step_hoisted = make_train_step(mcfg, tcfg, optimizer, ss_active=False)
    val_step = make_val_step(mcfg)
    scst_fns = None
    if args.self_critical_after >= 0:
        from ..train.scst import make_sample_fn, make_scst_update_fn
        scst_fns = (make_sample_fn(mcfg),
                    make_scst_update_fn(mcfg, tcfg, optimizer))
    rng = jax.random.PRNGKey(args.seed)
    os.makedirs(args.checkpoint_path, exist_ok=True)

    infos_base = {
        "model_config": config_to_json(mcfg),
        "train_config": config_to_json(tcfg),
        "data_config": config_to_json(dcfg),
        "model_type": args.model_type,
        "vocab": loader.vocab,
    }

    def save(suffix=""):
        infos = dict(infos_base, iter=iteration, epoch=epoch)
        C.save_checkpoint(args.checkpoint_path, ts.params, ts.model_state,
                          ts.opt_state, infos, histories, suffix=suffix)
        print(f"checkpoint saved to {args.checkpoint_path}{suffix or ''} "
              f"at iter {iteration}")

    print(f"training {args.model_type}: vocab {mcfg.vocab_size}, "
          f"{len(loader.split_ix['train'])} train images, "
          f"batch {tcfg.batch_size}, devices {n_dev}")
    import threading

    from ..data.prefetch import BatchPrefetcher
    from ..utils.profiling import PhaseTimers
    timers = PhaseTimers()
    if mesh is not None:
        # multi-host: every process assembles the same global batch
        # (identical seed -> identical RNG stream) but transfers only its
        # local slice; shard_leading_axis reassembles the global jax.Array
        from ..parallel.distributed import slice_local_shards
        place = (lambda b: M.shard_leading_axis(mesh, slice_local_shards(b)))
    else:
        place = None
    loader_lock = threading.Lock()   # val batches share the loader state

    def _next_train():
        with loader_lock:
            return loader.get_batch("train")

    prefetch = BatchPrefetcher(_next_train, depth=2, place=place)
    from ..utils.logging import MetricsLogger
    metrics_log = MetricsLogger(args.checkpoint_path)
    t_start = time.time()
    trace_start = trace_stop = -1
    if args.trace_steps:
        a, b = args.trace_steps.split(":")
        trace_start, trace_stop = int(a), int(a) + int(b)
    try:
      while True:
        sp = ss_prob(epoch, tcfg)
        if iteration == trace_start:
            jax.profiler.start_trace(
                os.path.join(args.checkpoint_path, "trace"))
        with timers.phase("data"):
            batch, (infos_b, wrapped) = prefetch.next()
        rng, r = jax.random.split(rng)
        use_scst = scst_fns is not None and epoch >= args.self_critical_after
        if use_scst:
            from ..train.scst import scst_train_step
            gts_tokens = []
            for info in infos_b:
                caps = loader.ds.captions_for(info.ix)
                gts_tokens.extend([caps] * tcfg.seq_per_img)
            with timers.phase("scst_step"):
                ts, scst_loss, mean_reward = scst_train_step(
                    ts, batch, gts_tokens, loader.vocab, scst_fns[0],
                    scst_fns[1], r, jnp.asarray(epoch, jnp.int32))
            metrics = {"loss": jnp.asarray(scst_loss),
                       "lang_loss": jnp.asarray(scst_loss),
                       "gpn_loss": jnp.zeros(()),
                       "lr": jnp.zeros(()), "grad_norm": jnp.zeros(())}
            if iteration % 5 == 0:
                print(f"scst iter {iteration}: loss {scst_loss:.4f} "
                      f"mean reward {mean_reward:.4f}")
        else:
            step = step_hoisted if sp == 0.0 else step_ss
            with timers.phase("step"):
                ts, metrics = step(ts, batch, r,
                                   jnp.asarray(epoch, jnp.int32),
                                   jnp.asarray(sp))
        iteration += 1
        if iteration == trace_stop:
            jax.block_until_ready(ts.params)
            jax.profiler.stop_trace()
            print(f"device trace ({trace_start}:{trace_stop}) -> "
                  f"{os.path.join(args.checkpoint_path, 'trace')}")

        if iteration % tcfg.losses_log_every == 0:
            m = jax.device_get(metrics)
            histories["loss_history"][str(iteration)] = float(m["loss"])
            histories["lr_history"][str(iteration)] = float(m["lr"])
            histories["ss_prob_history"][str(iteration)] = sp
            metrics_log.log(iteration, {
                "train_loss": float(m["loss"]),
                "gpn_loss": float(m["gpn_loss"]),
                "lang_loss": float(m["lang_loss"]),
                "learning_rate": float(m["lr"]),
                "scheduled_sampling_prob": sp,
                "grad_norm": float(m["grad_norm"])})
        if iteration % 5 == 0:
            m = jax.device_get(metrics)
            print(f"iter {iteration} (ep {epoch}): gpn {float(m['gpn_loss']):.3f} "
                  f"lang {float(m['lang_loss']):.3f} loss {float(m['loss']):.3f} "
                  f"lr {float(m['lr']):.2e} ({(time.time()-t_start)/iteration:.3f}s/it)")
        if wrapped:
            epoch += 1

        if iteration % tcfg.save_checkpoint_every == 0 or \
                (tcfg.max_epochs >= 0 and epoch >= tcfg.max_epochs) or \
                (args.max_iters > 0 and iteration >= args.max_iters):
            # quick val loss (eval_utils.py:73-86)
            vloss, nval = 0.0, 0
            loader.reset_iterator("val")
            max_val = tcfg.val_images_use // tcfg.batch_size
            for _ in range(max(1, min(2, max_val))):
                with loader_lock:
                    vb, _, vw = loader.get_batch("val")
                vloss += float(val_step(ts.params, ts.model_state,
                                        jax.tree_util.tree_map(jnp.asarray, vb)))
                nval += 1
                if vw:
                    break
            histories["val_loss_history"][str(iteration)] = vloss / max(nval, 1)
            metrics_log.log(iteration, {"val_loss": vloss / max(nval, 1)})
            print(f"val loss {vloss / max(nval, 1):.3f}")
            save()
            if args.save_history_ckpt:
                save(suffix=f"-{iteration}")
            if (tcfg.max_epochs >= 0 and epoch >= tcfg.max_epochs) or \
                    (args.max_iters > 0 and iteration >= args.max_iters):
                break
    except KeyboardInterrupt:
        # emergency checkpoint on interruption (the reference just prints a
        # traceback and exits, train.py:233-235; here state is preserved)
        print(f"interrupted at iter {iteration}; saving emergency checkpoint")
        save(suffix="_crash")
        prefetch.stop()
        raise SystemExit(1)
    except Exception:
        import traceback
        traceback.print_exc()
        print(f"training failed at iter {iteration}; saving emergency "
              f"checkpoint")
        save(suffix="_crash")
        prefetch.stop()
        raise
    prefetch.stop()
    print(timers.report())
    print(f"done at iter {iteration}, epoch {epoch}")


if __name__ == "__main__":
    main()
