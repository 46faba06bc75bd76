"""Entry point: `python -m svbrdf_tpu.main --mode train ...`.

Flow contract = reference main.py:15-44: parse args -> load checkpoint
(unless --retrain) -> checkpoint args override CLI -> train or test.
"""

from __future__ import annotations

import os


def main(argv=None):
    from svbrdf_tpu.cli import parse_args

    args = parse_args(argv)

    if args.gpu_id < 0:  # reference main.py:33-35: gpu_id < 0 => CPU
        os.environ["JAX_PLATFORMS"] = "cpu"

    from svbrdf_tpu.training import loop

    if args.mode == "train":
        loop.run_training(args)
        # After training, visualize the VALIDATION split like reference
        # main.py:156-165. Switch to test mode so setup() loads the
        # just-saved checkpoint (train+retrain would skip the load and
        # predict with fresh init). The torch-import flag must be cleared
        # too: leaving it set would make setup() re-import the ORIGINAL
        # (pre-training) torch weights instead of the trained checkpoint.
        # Multi-host note: every process calls run_test — the checkpoint
        # restore inside is a coordinated (barriered) operation — but only
        # the main host predicts and writes outputs.
        args.mode = "test"
        args.retrain = False
        args.import_torch_checkpoint = None
        loop.run_test(args, validation_split_only=True)
    else:
        loop.run_test(args)

    import jax

    if jax.process_count() > 1:
        # Exit together (both modes): an early-exiting idle host would
        # trip the distributed runtime's shutdown barrier while the main
        # host is still writing visualizations.
        from svbrdf_tpu.parallel import mesh as mesh_lib

        mesh_lib.sync_hosts("pre_exit", timeout_ms=3_600_000)


if __name__ == "__main__":
    main()
