"""Render a turntable animation of an SVBRDF sample.

Equivalent of the reference's final-viz notebook turntable cells
(presentations/final/final-viz.ipynb).

    python examples/turntable.py <strip.png> out.gif [n_frames]
"""

import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))  # run without install

from svbrdf_tpu.data import strips
from svbrdf_tpu import viz


def main():
    if len(sys.argv) < 3:
        raise SystemExit(__doc__.strip())
    strip_path, out = sys.argv[1], sys.argv[2]
    n_frames = int(sys.argv[3]) if len(sys.argv) > 3 else 36
    _, svbrdf = strips.load_sample(strip_path, input_image_count=10,
                                   used_input_image_count=0)
    frames = viz.turntable_frames(svbrdf, n_frames=n_frames)
    viz.save_animation(out, frames)
    print(f"wrote {out} ({n_frames} frames)")


if __name__ == "__main__":
    main()
