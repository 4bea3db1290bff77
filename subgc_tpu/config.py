"""Configuration dataclasses for the Sub-GC TPU framework.

The reference (YiwuZhong/Sub-GC) configures everything through two argparse
surfaces (`opts.py:3-210` for training, `test.py:30-169` for eval) plus shell
presets (`train.sh`, `test.sh`).  Here the same surface is expressed as three
frozen dataclasses so configs are hashable (usable as jit static args) and
serializable for checkpoint metadata, with the same defaults as the reference.
"""
from __future__ import annotations

import dataclasses
import json
from typing import Optional

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture hyper-parameters.

    Mirrors the graph-model flags of the reference (`opts.py:154-189` and the
    model dims in `train.sh`), but as a single immutable struct.
    """
    vocab_size: int = 9487              # COCO talk vocab (without +1 for UNK row)
    seq_length: int = 16                # tokens per caption (h5 `labels` width)
    input_encoding_size: int = 1000
    rnn_size: int = 1000
    num_layers: int = 2                 # att-LSTM + lang-LSTM
    att_hid_size: int = 512
    fc_feat_size: int = 2048
    att_feat_size: int = 2048
    drop_prob_lm: float = 0.5
    use_bn: int = 0                     # batchnorm in att_embed (0/1/2)

    # scene-graph encoder
    embed_dim: int = 300                # GloVe dim
    gcn_dim: int = 1024
    gcn_layers: int = 2
    gcn_residual: int = 2
    gcn_bn: bool = False
    noun_fuse: bool = True              # Sub-GC fuses GloVe noun embeddings
    pred_emb_type: int = 1              # 1: argmax excl. background; 2: incl.
    num_obj_classes: int = 1599         # object_dist width
    num_rel_classes: int = 21           # pred_dist width

    # sGPN
    use_gpn: bool = True
    use_gt_subg: bool = False           # Sup. model: skip sGPN scoring
    gpn_hid_dim: int = 512

    # fixed graph shapes (36 detections + 1 dummy node / 64 rels + 1 dummy)
    obj_num: int = 37
    rel_num: int = 65

    # numerics: params live in float32; matmuls may run in bfloat16 on TPU
    compute_dtype: str = "float32"
    # keep the [S, 4R] LSTM gate streams in bfloat16 (c stays f32) — only
    # meaningful with compute_dtype="bfloat16"; measured trade-off in
    # docs/PERF.md (the decode LSTMs are bound by these streams, not MXU)
    bf16_lstm_gates: bool = False
    # training only: keep FORWARD compute exactly as configured but store the
    # decode scan's saved-for-backward LSTM residuals (gate preactivations,
    # c streams) in bfloat16 and recompute the elementwise derivatives from
    # them in the backward pass — halves the batch-proportional residual
    # bytes the train-step roofline identified as the limiter without the
    # bf16_lstm_gates forward-numerics trade (docs/PERF.md; bounded in
    # tests/test_bf16_residuals.py)
    bf16_residuals: bool = False
    # fused Pallas attention kernel in the decoder (ops/pallas_attention.py)
    use_pallas_attention: bool = False
    # inference decode optimizations (both exact transformations):
    # fold relu(embed) @ att_lstm.w_ih[2R:] into a per-vocab gate table —
    # one row gather replaces a [S, E] @ [E, 4R] matmul per decode step.
    # OFF by default: measured SLOWER on v5e (tools/exp_beam_ab.py: 46.2 vs
    # 44.1 ms at the bench shape — the [rows, 4R] gather loses to the MXU
    # matmul it replaces); kept as a validated option for gather-friendly
    # backends
    fold_embed_ih: bool = False
    # beam search: share the [N, R]/[N, H] attention feature streams across
    # the bdash beams of each sub-graph instead of broadcasting them per beam
    share_att_beams: bool = True
    # greedy fan-out AND beam search: attend over the image's projected
    # node streams directly (image-shared attention) instead of
    # per-sub-graph gathered copies — mathematically equal,
    # float-reassociated; auto-disabled only for attention-capture
    # (grounding / return_att) paths (docs/PERF.md)
    share_att_images: bool = True
    # TRAINING: teacher-forced attention over the image's projected node
    # streams (the eval fan-out's image-shared layout, attention() att_img
    # branch) instead of per-row [S, N, *] gathered copies — cuts the scan's
    # scan-invariant attention reads AND their backward gradient-accumulator
    # carries by seq_per_img x.  Same float-reassociation as
    # share_att_images, plus ONE training-noise change: att_embed dropout
    # samples per image node instead of per gathered row (an image's
    # seq_per_img sentences share att-dropout masks within a step).  Opt-in,
    # default off (reference-parity training noise); measured in docs/PERF.md
    share_att_train: bool = False
    # decode: merge each LSTM's input-side and hidden-side matmuls into one
    # concat matmul ([h_lang|xt|h_att] @ [w_ih[:R];w_ih[2R:];w_hh]) — fewer,
    # deeper-K MXU dispatches per step; requires merge_lstm_weights (the
    # decode entry points call it).  Numerics: identical contraction, but in
    # bf16-gates mode the single f32 accumulation replaces per-matmul bf16
    # rounding of partial sums (slightly MORE accurate than split)
    merge_lstm_matmuls: bool = False

    @property
    def cdtype(self):
        return jnp.dtype(self.compute_dtype)

    def replace(self, **kw) -> "ModelConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimization schedule, mirroring `opts.py` + `train.sh` presets."""
    batch_size: int = 64
    seq_per_img: int = 5
    gpn_batch: int = 2                  # pos/neg sub-graphs sampled per sentence
    gpn_label_thres: float = 0.75

    optim: str = "adam"
    learning_rate: float = 5e-4
    optim_alpha: float = 0.9            # adam beta1
    optim_beta: float = 0.999           # adam beta2
    optim_epsilon: float = 1e-8
    weight_decay: float = 0.0
    grad_clip_norm: float = 10.0        # global-norm clip (`train.py:163`)
    warmup_n: int = 300                 # linear LR warmup iterations
    learning_rate_decay_start: int = 0  # epoch; -1 disables
    learning_rate_decay_every: int = 3  # epochs
    learning_rate_decay_rate: float = 0.8

    scheduled_sampling_start: int = 0   # epoch; -1 disables
    scheduled_sampling_increase_every: int = 5
    scheduled_sampling_increase_prob: float = 0.05
    scheduled_sampling_max_prob: float = 0.25

    max_epochs: int = 35
    save_checkpoint_every: int = 4000
    val_images_use: int = 5000
    losses_log_every: int = 25
    seed: int = 2019

    def replace(self, **kw) -> "TrainConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    """Decode / eval-time settings (the `test.py:143-167` surface)."""
    beam_size: int = 1
    sample_max: int = 1
    group_size: int = 1
    diversity_lambda: float = 0.5
    decoding_constraint: int = 0
    length_penalty: str = ""            # "", "wu_X", "avg_X"
    gpn_nms_thres: float = 0.75
    gpn_max_subg: int = 1
    max_subgraph_bucket: int = 1024     # static padded size of the sub-graph axis
    # sequential chunking of the vmapped beam decode: XLA's tiling of the
    # fused decode program degrades ~1.7x past 1024 sub-graphs per dispatch
    # (measured cliff between S=1024 and S=1056 on v5e — docs/PERF.md);
    # larger batches decode in lax.map chunks of this size instead
    beam_chunk: int = 1024
    use_topk_sampling: bool = False
    topk_temp: float = 0.6
    the_k: int = 3
    return_att: bool = False
    sct: bool = False
    use_greedy_subg: bool = False
    use_gt_subg: bool = False
    only_sent_eval: int = 0
    oracle_num: int = 1
    num_images: int = -1
    remove_bad_endings: bool = False
    # debug: print every beam candidate of one random kept sub-graph per
    # image (the reference's --verbose_beam, eval_utils.py:124-130).
    # Default off (the reference defaults on, which floods large runs).
    verbose_beam: int = 0

    def replace(self, **kw) -> "EvalConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Dataset paths + split routing (reference `opts.py:7-25,180`)."""
    input_json: str = "data/cocotalk.json"
    input_label_h5: str = "data/cocotalk_label.h5"
    sg_dir: str = ""                    # *_sg_output_64 directory
    mask_dir: str = ""                  # *_graph_mask_1000_rm_duplicate dir
    packed_path: str = ""               # optional packed shard (tools/pack_dataset.py)
    obj_name_path: str = "data/object_names_1600-0-20.npy"
    rel_name_path: str = "data/predicate_names_1600-0-20.npy"
    glove_path: str = "data/glove.6B.300d.txt"
    use_MRNN_split: bool = False
    mrnn_split_dict: str = "data/MRNN_split_dict.npy"
    train_only: int = 0
    num_workers: int = 6

    def replace(self, **kw) -> "DataConfig":
        return dataclasses.replace(self, **kw)


# ---------------------------------------------------------------------------
# MODEL_TYPE presets — same registry as the reference shell scripts.
# ---------------------------------------------------------------------------

_SUB_GC_MODEL = dict(noun_fuse=True, pred_emb_type=1, gcn_layers=2,
                     gcn_residual=2, gcn_bn=False, use_gpn=True)
_FULL_GC_MODEL = dict(noun_fuse=False, pred_emb_type=2, gcn_layers=4,
                      gcn_residual=1, gcn_bn=True, use_gpn=False)

TRAIN_PRESETS = {
    # train.sh:6-16
    "Sub_GC_MRNN": dict(model=_SUB_GC_MODEL,
                        train=dict(batch_size=64, max_epochs=35),
                        data=dict(use_MRNN_split=True)),
    # train.sh:18-27
    "Sub_GC_Kar": dict(model=_SUB_GC_MODEL,
                       train=dict(batch_size=64, max_epochs=35),
                       data=dict()),
    # train.sh:29-38
    "Full_GC_Kar": dict(model=_FULL_GC_MODEL,
                        train=dict(batch_size=100, max_epochs=35,
                                   save_checkpoint_every=3000),
                        data=dict()),
    # train.sh:40-49
    "Sub_GC_Flickr": dict(model=_SUB_GC_MODEL,
                          train=dict(batch_size=64, max_epochs=36),
                          data=dict(input_json="data/flickr30ktalk.json",
                                    input_label_h5="data/flickr30ktalk_label.h5")),
    # train.sh:51-58
    "Sub_GC_Sup_Flickr": dict(model={**_SUB_GC_MODEL, "use_gt_subg": True},
                              train=dict(batch_size=64, max_epochs=36),
                              data=dict(input_json="data/flickr30ktalk.json",
                                        input_label_h5="data/flickr30ktalk_label.h5")),
}

TEST_PRESETS = {
    # test.sh:8-18
    "Sub_GC_MRNN": dict(model=_SUB_GC_MODEL,
                        eval=dict(beam_size=1, gpn_nms_thres=0.55, gpn_max_subg=1000),
                        data=dict(use_MRNN_split=True)),
    # test.sh:20-31
    "Sub_GC_S_MRNN": dict(model=_SUB_GC_MODEL,
                          eval=dict(beam_size=1, gpn_nms_thres=0.55, gpn_max_subg=1000,
                                    use_topk_sampling=True, topk_temp=0.6, the_k=3),
                          data=dict(use_MRNN_split=True)),
    # test.sh:33-42
    "Sub_GC_Kar": dict(model=_SUB_GC_MODEL,
                       eval=dict(beam_size=2, gpn_nms_thres=0.75, gpn_max_subg=10),
                       data=dict()),
    # test.sh:44-53
    "Full_GC_Kar": dict(model=_FULL_GC_MODEL,
                        eval=dict(beam_size=3),
                        data=dict()),
    # test.sh:57-67
    "Sub_GC_Flickr": dict(model=_SUB_GC_MODEL,
                          eval=dict(beam_size=2, gpn_nms_thres=0.75, gpn_max_subg=10),
                          data=dict(input_json="data/flickr30ktalk.json",
                                    input_label_h5="data/flickr30ktalk_label.h5")),
    # test.sh:69-80
    "Sub_GC_Flickr_GRD": dict(model=_SUB_GC_MODEL,
                              eval=dict(beam_size=1, gpn_nms_thres=0.75,
                                        gpn_max_subg=10, return_att=True),
                              data=dict(input_json="data/flickr30ktalk.json",
                                        input_label_h5="data/flickr30ktalk_label.h5")),
    # test.sh:84-95
    "Sub_GC_Flickr_CTL": dict(model=_SUB_GC_MODEL,
                              eval=dict(beam_size=2, gpn_nms_thres=0.75,
                                        gpn_max_subg=10, sct=True,
                                        use_greedy_subg=True),
                              data=dict(input_json="data/flickr30ktalk.json",
                                        input_label_h5="data/flickr30ktalk_label.h5")),
    # test.sh:97-108
    "Sub_GC_Sup_Flickr_CTL": dict(model={**_SUB_GC_MODEL, "use_gt_subg": True},
                                  eval=dict(beam_size=2, gpn_nms_thres=0.75,
                                            gpn_max_subg=10, sct=True,
                                            use_gt_subg=True),
                                  data=dict(input_json="data/flickr30ktalk.json",
                                            input_label_h5="data/flickr30ktalk_label.h5")),
}


def build_configs(model_type: str, mode: str = "test", vocab_size: Optional[int] = None,
                  **overrides):
    """Resolve a MODEL_TYPE preset into (ModelConfig, TrainConfig|EvalConfig, DataConfig)."""
    registry = TRAIN_PRESETS if mode == "train" else TEST_PRESETS
    if model_type not in registry:
        raise KeyError(f"unknown MODEL_TYPE {model_type!r}; have {sorted(registry)}")
    preset = registry[model_type]
    mkw = dict(preset.get("model", {}))
    if vocab_size is not None:
        mkw["vocab_size"] = vocab_size
    mkw.update(overrides.get("model", {}))
    model = ModelConfig(**mkw)
    data = DataConfig(**{**preset.get("data", {}), **overrides.get("data", {})})
    if mode == "train":
        other = TrainConfig(**{**preset.get("train", {}), **overrides.get("train", {})})
    else:
        other = EvalConfig(**{**preset.get("eval", {}), **overrides.get("eval", {})})
    return model, other, data


def config_to_json(cfg) -> str:
    return json.dumps(dataclasses.asdict(cfg), sort_keys=True)


def config_from_json(cls, blob: str):
    return cls(**json.loads(blob))
