"""Multi-host (multi-process) SPMD training launcher.

The reference is strictly single-process (SURVEY.md §2.3). On TPU pods,
JAX runs one process per host; this module wires that up for the trainer:
it initializes the JAX distributed runtime, then delegates to the normal
CLI — the training loop detects `jax.process_count() > 1` and switches to
per-host input shards (data/dataset.shard_files_for_host), per-process
batch slices assembled into the global mesh
(parallel/mesh.shard_batch via make_array_from_process_local_data),
main-host-only checkpoint/TensorBoard writes, and per-host local
validation.

Launch one process per host (TPU pod: flags can be omitted — the TPU
runtime provides coordinator/count/id automatically):

    python -m svbrdf_tpu.parallel.multihost \
        --coordinator host0:9898 --num-processes 2 --process-id $i -- \
        --mode train --input-dir ... --image-count 10 --model-dir ...

For CI / a single machine, `--virtual-cpu-devices N` forces each process
onto N virtual CPU devices (collectives ride Gloo); this is how
tests/test_multihost.py exercises the path with 2 processes x 4 devices.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> None:
    p = argparse.ArgumentParser(
        description="Multi-process SPMD launcher",
        epilog="Arguments after `--` go to svbrdf_tpu.main.")
    p.add_argument("--coordinator", default=None,
                   help="coordinator address host:port (TPU pods: "
                        "auto-detected when omitted)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--virtual-cpu-devices", type=int, default=0,
                   help="force N virtual CPU devices per process "
                        "(testing without TPU hardware)")
    args, rest = p.parse_known_args(argv)
    if rest and rest[0] == "--":
        rest = rest[1:]

    if args.virtual_cpu_devices:
        from svbrdf_tpu.parallel.dryrun import force_virtual_cpu

        force_virtual_cpu(args.virtual_cpu_devices)

    import jax

    jax.distributed.initialize(args.coordinator, args.num_processes,
                               args.process_id)
    print(f"process {jax.process_index()}/{jax.process_count()}: "
          f"{jax.local_device_count()} local / {jax.device_count()} "
          f"global devices")

    from svbrdf_tpu.main import main as cli_main

    cli_main(rest)


if __name__ == "__main__":
    main(sys.argv[1:])
