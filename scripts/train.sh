#!/bin/sh
# Toy-dataset training wrapper (parity with the reference's dev/mip/train.sh:
# same flags against the bundled strip format).
cd "$(dirname "$0")/.." || exit 1
python -m svbrdf_tpu.main \
    --mode train \
    --input-dir "${SVBRDF_DATA:-./data}/train" \
    --image-count 10 \
    --epochs 100 \
    --save-frequency 50 \
    --model-dir "${SVBRDF_MODEL_DIR:-./model}" \
    --retrain "$@"
