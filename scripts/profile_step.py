"""Capture a device profile of the headline bench program (scan K=16).

Usage: python scripts/profile_step.py [trace_dir]   (default /tmp/prof)

The program/inputs come from svbrdf_tpu.utils.bench_setup — the single
source of truth for the headline configuration.
"""

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from svbrdf_tpu.utils import bench_setup  # noqa: E402


def main(outdir: str = "/tmp/prof") -> None:
    prog = bench_setup.build_headline_program()

    for i in range(3):  # compile + warmup
        loss = prog.run(i)
    float(jnp.sum(loss))

    with jax.profiler.trace(outdir):
        for i in range(4):
            loss = prog.run(100 + i)
        float(jnp.sum(loss))
    print(f"trace written to {outdir}")


if __name__ == "__main__":
    main(*sys.argv[1:2])
