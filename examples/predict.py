"""Estimate SVBRDF maps from photographs with a trained checkpoint.

    python examples/predict.py <model_dir> out_dir photo1.png [photo2.png ...]
"""

import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))  # run without install

from svbrdf_tpu.estimator import SvbrdfEstimator


def main():
    if len(sys.argv) < 4:
        raise SystemExit(__doc__.strip())
    model_dir, out_dir = sys.argv[1], sys.argv[2]
    photos = sys.argv[3:]
    est = SvbrdfEstimator.from_checkpoint(model_dir)
    for path in est.predict_to_files(photos, out_dir):
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
