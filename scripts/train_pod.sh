#!/bin/sh
# TPU-pod (multi-host) training launch recipe — the TPU-native analogue of
# the reference's SLURM job (reference development/scripts/train.sbatch:6-37,
# which requests exactly 1 node / 1 GPU; a v5e pod slice instead runs ONE
# process per host, and XLA's ICI collectives replace the reference's
# nonexistent distributed layer, SURVEY.md §2.3).
#
# On Cloud TPU the same command runs on every host (the TPU runtime
# provides coordinator address / process count / process id automatically,
# so no --coordinator flags are needed):
#
#   gcloud compute tpus tpu-vm ssh "$TPU_NAME" --worker=all --command="
#     cd svbrdf_tpu && sh scripts/train_pod.sh \
#       --input-dir gs://bucket/deep_materials --image-count 0 \
#       --model-dir /data/model --epochs 2050"
#
# Requirements encoded below:
#   * global --batch-size must divide evenly across ALL devices in the
#     slice (the trainer refuses partial meshes in multi-host mode);
#   * every host must see its own shard of the dataset (the dataset
#     shards the file list by jax.process_index()).
#
# For a local smoke test of the same code path (2 processes x 4 virtual
# CPU devices, collectives over Gloo), run tests/test_multihost.py or:
#
#   python -m svbrdf_tpu.parallel.multihost \
#       --coordinator localhost:9898 --num-processes 2 --process-id 0 \
#       --virtual-cpu-devices 4 -- --mode train ... &
#   python -m svbrdf_tpu.parallel.multihost \
#       --coordinator localhost:9898 --num-processes 2 --process-id 1 \
#       --virtual-cpu-devices 4 -- --mode train ...
cd "$(dirname "$0")/.." || exit 1
exec python -m svbrdf_tpu.parallel.multihost -- --mode train "$@"
