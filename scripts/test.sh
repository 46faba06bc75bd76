#!/bin/sh
# Toy-dataset test wrapper (parity with the reference's dev/mip/test.sh).
cd "$(dirname "$0")/.." || exit 1
python -m svbrdf_tpu.main \
    --mode test \
    --input-dir "${SVBRDF_DATA:-./data}/test" \
    --image-count 10 \
    --model-dir "${SVBRDF_MODEL_DIR:-./model}" "$@"
