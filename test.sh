#!/usr/bin/env bash
# Drop-in equivalent of the reference test.sh: `bash test.sh <MODEL_TYPE>`.
# MODEL_TYPE -> beam/NMS/sampling bundles live in subgc_tpu/config.py
# (TEST_PRESETS, mirroring the reference's eight configs).
set -e
MODEL_TYPE=${1:-Sub_GC_Kar}
shift || true

case "$MODEL_TYPE" in
  Sub_GC_MRNN|Sub_GC_S_MRNN)      CKPT=${CKPT:-pretrained/sub_gc_MRNN} ;;
  Sub_GC_Kar)                     CKPT=${CKPT:-pretrained/sub_gc_karpathy} ;;
  Full_GC_Kar)                    CKPT=${CKPT:-pretrained/full_gc} ;;
  Sub_GC_Flickr|Sub_GC_Flickr_GRD|Sub_GC_Flickr_CTL)
                                  CKPT=${CKPT:-pretrained/sub_gc_flickr} ;;
  Sub_GC_Sup_Flickr_CTL)          CKPT=${CKPT:-pretrained/sub_gc_sup_flickr} ;;
  *) echo "unknown MODEL_TYPE $MODEL_TYPE"; exit 1 ;;
esac

exec python -m subgc_tpu.cli.test "$MODEL_TYPE" --checkpoint_path "$CKPT" \
    --language_eval 1 "$@"
