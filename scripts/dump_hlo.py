"""Dump compiled HLO text of the headline bench program (scan K=16).

Usage: python scripts/dump_hlo.py [out.txt]   (default /tmp/step_hlo.txt)

The program/inputs come from svbrdf_tpu.utils.bench_setup — the single
source of truth for the headline configuration — and lowering goes
through the public TrainStep.lower API.
"""

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from svbrdf_tpu.utils import bench_setup  # noqa: E402


def main(out_path: str = "/tmp/step_hlo.txt") -> None:
    prog = bench_setup.build_headline_program()
    key_info = ((jax.random.fold_in(prog.key, 0), jnp.int32(0))
                if prog.scan_k > 1 else jax.random.fold_in(prog.key, 0))
    compiled = prog.step.lower(prog.params, prog.opt_state, prog.raw,
                               key_info).compile()
    with open(out_path, "w") as f:
        f.write(compiled.as_text())
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main(*sys.argv[1:2])
