#!/bin/sh
# Toy-dataset test wrapper (parity with the reference's dev/mip/test.sh).
cd "$(dirname "$0")/.." || exit 1
DATA_DIR="${SVBRDF_DATA:-./data}"
if [ ! -d "$DATA_DIR/test" ]; then
    echo "No toy dataset at $DATA_DIR — generating it"
    python -m svbrdf_tpu.data.toy "$DATA_DIR" || exit 1
fi
python -m svbrdf_tpu.main \
    --mode test \
    --input-dir "$DATA_DIR/test" \
    --image-count 10 \
    --model-dir "${SVBRDF_MODEL_DIR:-./model}" "$@"
