#!/usr/bin/env bash
# Compare a PyTorch-reference-trained checkpoint against one of OUR
# checkpoints, map by map (RMSE + SSIM + fixed-scene rendering RMSE), on
# the same test strips — one command per side (VERDICT r3 #6).
#
# Usage:
#   scripts/compare_reference.sh <torch_checkpoint> <our_model_dir> \
#       [test_data_dir] [image_count]
#
# <torch_checkpoint>: the reference's checkpoint.tar (or legacy
#   model.data), e.g. a released model trained with
#   /root/reference/development/multiImage_pytorch/main.py. Weights are
#   ported through interop/torch_port.py (strict layout mapping,
#   tests/test_interop.py).
# <our_model_dir>: a model dir trained by this framework.
#
# Both sides run the SAME `--mode test` pass: identical test strips,
# identical fixed metric scenes (metrics.METRIC_SCENE_KEY), identical
# metrics.json schema — so the two JSON files are directly comparable.
set -euo pipefail

TORCH_CKPT=${1:?torch checkpoint path}
OUR_DIR=${2:?our model dir}
DATA=${3:-$(dirname "$0")/../../reference/development/multiImage_pytorch/data/test}
COUNT=${4:-10}
OUT=${OUT:-/tmp/compare_reference}
# EXTRA_ARGS: additional CLI flags both sides share (e.g. "--image-size 32
# --model-depth 5 --num-filters 8" for reduced-size models).
COMMON=(--mode test --input-dir "$DATA" --image-count "$COUNT"
        ${EXTRA_ARGS:-})

mkdir -p "$OUT/reference" "$OUT/ours"

echo "== reference-trained model (ported torch weights) =="
python -m svbrdf_tpu.main "${COMMON[@]}" \
    --model-dir "$OUT/reference" \
    --import-torch-checkpoint "$TORCH_CKPT"

echo "== our model =="
python -m svbrdf_tpu.main "${COMMON[@]}" --model-dir "$OUR_DIR"

python - "$OUT/reference/test_outputs/metrics.json" \
         "$OUR_DIR/test_outputs/metrics.json" <<'EOF'
import json, sys
ref = json.load(open(sys.argv[1]))["mean"]
ours = json.load(open(sys.argv[2]))["mean"]
print(f"{'metric':22s} {'reference':>12s} {'ours':>12s} {'delta':>12s}")
for k in sorted(ref):
    better = (ours[k] - ref[k]) if k.startswith("ssim") else (ref[k] - ours[k])
    tag = "tie" if better == 0 else ("ours better" if better > 0
                                     else "ref better")
    print(f"{k:22s} {ref[k]:12.4f} {ours[k]:12.4f} "
          f"{ours[k] - ref[k]:+12.4f}  ({tag})")
EOF
