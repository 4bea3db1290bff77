#!/usr/bin/env bash
# Drop-in equivalent of the reference train.sh: `bash train.sh <MODEL_TYPE>`.
# MODEL_TYPE -> flag bundles live in subgc_tpu/config.py (TRAIN_PRESETS);
# data paths default to the reference layout under data/.
set -e
MODEL_TYPE=${1:-Sub_GC_Kar}
shift || true

case "$MODEL_TYPE" in
  Sub_GC_MRNN)      CKPT=logs/sub_gc_MRNN ;;
  Sub_GC_Kar)       CKPT=logs/sub_gc_karpathy ;;
  Full_GC_Kar)      CKPT=logs/full_gc ;;
  Sub_GC_Flickr)    CKPT=logs/sub_gc_flickr ;;
  Sub_GC_Sup_Flickr) CKPT=logs/sub_gc_sup_flickr ;;
  *) echo "unknown MODEL_TYPE $MODEL_TYPE"; exit 1 ;;
esac

exec python -m subgc_tpu.cli.train "$MODEL_TYPE" --checkpoint_path "$CKPT" "$@"
