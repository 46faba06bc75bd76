#!/bin/sh
# Toy-dataset training wrapper (parity with the reference's dev/mip/train.sh:
# same flags against the bundled strip format). Works on a fresh clone: the
# procedural toy dataset is generated on first use.
cd "$(dirname "$0")/.." || exit 1
DATA_DIR="${SVBRDF_DATA:-./data}"
if [ ! -d "$DATA_DIR/train" ]; then
    echo "No toy dataset at $DATA_DIR — generating it"
    python -m svbrdf_tpu.data.toy "$DATA_DIR" || exit 1
fi
python -m svbrdf_tpu.main \
    --mode train \
    --input-dir "$DATA_DIR/train" \
    --image-count 10 \
    --epochs 100 \
    --save-frequency 50 \
    --model-dir "${SVBRDF_MODEL_DIR:-./model}" \
    --retrain "$@"
