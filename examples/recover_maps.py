"""Recover SVBRDF maps by optimizing through the rendering loss.

The reference's differentiability-validation experiment
(development/notebooks/website.ipynb cell 15) as a script:

    python examples/recover_maps.py <strip.png> diffuse out.png [steps]
"""

import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))  # run without install

import jax
import numpy as np

from svbrdf_tpu.data import strips
from svbrdf_tpu.experiments import recover_maps
from svbrdf_tpu import viz


def main():
    if len(sys.argv) < 4:
        raise SystemExit(__doc__.strip())
    strip_path, which, out = sys.argv[1], sys.argv[2], sys.argv[3]
    steps = int(sys.argv[4]) if len(sys.argv) > 4 else 200

    _, svbrdf = strips.load_sample(strip_path, input_image_count=10,
                                   used_input_image_count=0)
    result = recover_maps(jax.random.key(0), svbrdf,
                          optimize=(which,), steps=steps)
    print(f"loss {float(result.losses[0]):.4f} -> "
          f"{float(result.losses[-1]):.4f} over {steps} steps")
    viz.save_comparison_grid(out, np.zeros_like(svbrdf[..., :3]), svbrdf,
                             np.asarray(result.svbrdf))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
