"""Command-line interface.

Flag surface = reference cli.py:3-88 (same 16 flags + the same cross-flag
validation), plus TPU-native extensions: --loss, --dtype, --num-devices,
--batch-size and --learning-rate (the reference hard-codes batch 8 at
main.py:63 and lr 1e-5 at main.py:74).
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="SVBRDF estimation from images (TPU-native)")

    p.add_argument("--mode", "-M", dest="mode", required=True,
                   choices=["train", "test"],
                   help="Mode in which the program is executed.")
    p.add_argument("--renderer", "-R", dest="renderer",
                   choices=["local", "pathtracing"], default="local",
                   help="Renderer used by the rendering loss.")
    p.add_argument("--input-dir", "-i", dest="input_dir", required=True,
                   help="Directory containing the input data.")
    p.add_argument("--image-count", "-c", dest="image_count", required=True,
                   type=int,
                   help="Number of photographs per sample strip in the "
                        "dataset.")
    p.add_argument("--linear-input", dest="linear_input",
                   action="store_true", default=False,
                   help="Input images are already linear RGB.")
    p.add_argument("--no-svbrdf-input", dest="no_svbrdf_input",
                   action="store_true", default=False,
                   help="Samples contain no SVBRDF maps (photos only).")
    p.add_argument("--used-image-count", "-u", dest="used_image_count",
                   type=int, default=1,
                   help="Number of input images fed to the model; missing "
                        "ones are synthesized on device.")
    p.add_argument("--image-size", "-s", dest="image_size", type=int,
                   default=256,
                   help="Model input/output resolution.")
    p.add_argument("--scale-mode", dest="scale_mode",
                   choices=["crop", "resize"], default="crop",
                   help="How larger samples are fit to --image-size.")
    p.add_argument("--use-coords", dest="use_coords", action="store_true",
                   default=False,
                   help="Append x/y coordinate channels to the input.")
    p.add_argument("--omit-optimizer-state-save",
                   dest="omit_optimizer_state_save", action="store_true",
                   default=False,
                   help="Smaller checkpoints; resume quality suffers.")
    p.add_argument("--model-dir", "-m", dest="model_dir", required=True,
                   help="Directory for checkpoints and logs.")
    p.add_argument("--model-type", dest="model_type",
                   choices=["single", "multi"], default="single",
                   help="Single-view or multi-view model.")
    p.add_argument("--gpu-id", "-g", dest="gpu_id", type=int, default=0,
                   help="Compatibility flag; device selection is automatic "
                        "on TPU (< 0 forces CPU).")
    p.add_argument("--save-frequency", dest="save_frequency", type=int,
                   choices=range(1, 1000), default=50, metavar="[1-999]",
                   help="Epochs between checkpoints.")
    p.add_argument("--validation-frequency", dest="validation_frequency",
                   type=int, choices=range(1, 1000), default=25,
                   metavar="[1-999]",
                   help="Epochs between validation passes.")
    p.add_argument("--epochs", "-e", dest="epochs", type=int, default=100,
                   help="Train up to this epoch.")
    p.add_argument("--retrain", dest="retrain", action="store_true",
                   default=False,
                   help="Ignore any checkpoint in the model directory.")

    # --- TPU-native extensions ---
    p.add_argument("--loss", dest="loss", choices=["mixed", "l1", "render"],
                   default="mixed", help="Training objective.")
    p.add_argument("--fused-loss", dest="fused_loss",
                   action=argparse.BooleanOptionalAction, default=None,
                   help="Pallas tile-fused rendering loss (local renderer "
                        "only). Default: auto — on for TPU backends.")
    p.add_argument("--batch-size", dest="batch_size", type=int, default=8,
                   help="Global batch size (split across the device mesh).")
    p.add_argument("--learning-rate", dest="learning_rate", type=float,
                   default=1e-5, help="Adam learning rate.")
    p.add_argument("--dtype", dest="dtype",
                   choices=["auto", "float32", "bfloat16"], default="auto",
                   help="Model compute dtype (params stay float32). "
                        "'auto' = bfloat16 on TPU, float32 elsewhere — the "
                        "same configuration bench.py measures.")
    p.add_argument("--master-dtype", dest="master_dtype",
                   choices=["auto", "f32", "bf16sr"], default="auto",
                   help="Master-parameter storage policy for bf16 models "
                        "(changes the trained artifact: 'bf16sr' stores "
                        ">=2-D leaves bf16, updated with stochastic "
                        "rounding; 'f32' keeps f32 masters). 'auto' = "
                        "SVBRDF_MASTER_DTYPE env var, default bf16sr "
                        "(parity evidence: docs/bf16_parity.md). Recorded "
                        "in the checkpoint and restored on resume.")
    p.add_argument("--upconv", dest="upconv",
                   choices=["auto", "dilated", "fold", "naive"],
                   default="auto",
                   help="Decoder upsample+conv rewrite (all exact-"
                        "equivalent; models/layers.UPCONV_IMPL): 'fold' is "
                        "REQUIRED for spatial (H-axis) sharding. 'auto' = "
                        "SVBRDF_UPCONV env var, whose default 'auto' picks "
                        "per level ('naive' at spatial extents <= "
                        "SVBRDF_UPCONV_AUTO_MAX=4, 'dilated' above — "
                        "fastest measured on v5e). Recorded in the "
                        "checkpoint and restored on resume.")
    p.add_argument("--num-devices", dest="num_devices", type=int, default=0,
                   help="Devices in the data mesh (0 = all).")
    p.add_argument("--shard-spatial", dest="shard_spatial", type=int,
                   default=0,
                   help="Shard the image HEIGHT axis over N devices "
                        "(spatial SPMD; activations sharded, params "
                        "replicated, fused loss shard_mapped with exact "
                        "psum'd values). For inputs too large for one "
                        "chip. Forces upconv='fold' and f32 masters; "
                        "requires the local renderer and a rendering-"
                        "based loss. 0 = off (batch data parallelism).")
    p.add_argument("--device-data-cache", dest="device_data_cache",
                   action="store_true", default=False,
                   help="Decode the whole dataset once and keep it in "
                        "device HBM as uint8; every training batch is an "
                        "on-device gather (no per-step host transfer). "
                        "For corpora that fit device memory, e.g. the "
                        "~1 GB multi-view set. Requires scale-mode=crop; "
                        "single-process runs only.")
    p.add_argument("--model-depth", dest="model_depth", type=int, default=8,
                   help="U-Net depth (8 = reference architecture; inputs "
                        "must be at least 2^depth pixels).")
    p.add_argument("--num-filters", dest="num_filters", type=int, default=64,
                   help="Base filter count ('ngf'); 64 = reference.")
    p.add_argument("--steps-per-call", dest="steps_per_call", type=int,
                   default=0,
                   help="Run N optimizer steps per device dispatch "
                        "(lax.scan) — amortizes per-dispatch host latency. "
                        "Requires --device-data-cache (batches must be "
                        "on-device). 0 = auto: 16 when the device cache "
                        "is on, else 1. Per-step losses and the RNG "
                        "stream are identical to --steps-per-call 1.")
    p.add_argument("--log-every", dest="log_every", type=int, default=1,
                   help="Fetch and log the training loss every N steps "
                        "(1 = reference parity). Each fetch is a blocking "
                        "host sync; raise N on high-latency hosts. The "
                        "NaN guard checks the fetched losses.")
    p.add_argument("--seed", dest="seed", type=int, default=313,
                   help="Base PRNG seed (reference utils.py:7 uses 313).")
    p.add_argument("--profile-dir", dest="profile_dir", default=None,
                   help="If set, write a jax.profiler trace for the first "
                        "few steps here.")
    p.add_argument("--import-torch-checkpoint",
                   dest="import_torch_checkpoint", default=None,
                   help="Path to a PyTorch reference checkpoint "
                        "(checkpoint.tar, legacy model.data, or a "
                        "directory holding one); weights are converted to "
                        "this framework's layout. A reference checkpoint "
                        "sitting in --model-dir is also detected "
                        "automatically.")
    p.add_argument("--export-torch-checkpoint",
                   dest="export_torch_checkpoint", default=None,
                   help="Write the restored model as a PyTorch reference "
                        "checkpoint.tar at this path (test mode; the "
                        "reference loads it with persistence.Checkpoint). "
                        "Requires torch.")
    return p


def parse_args(argv=None):
    args = build_parser().parse_args(argv)

    # Cross-flag validation (reference cli.py:80-86).
    if args.no_svbrdf_input:
        if args.mode == "train":
            raise RuntimeError(
                "Cannot train on samples without SVBRDF maps.")
        if args.image_count == 0:
            raise RuntimeError(
                "No SVBRDF and no image input. What are we supposed to do?")
    return args
