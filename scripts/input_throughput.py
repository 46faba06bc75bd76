"""Host input-pipeline throughput: can the host feed the device step?

Measures the SvbrdfDataset batch path (native libpng decode pool + RAM
cache + uint8 slicing) in isolation — no device, no transfer — over a real
on-disk corpus:

  cold epoch: every sample PNG-decoded (the decode-bound rate)
  warm epoch: RAM-cache hits only (the steady-state rate once the corpus
              is resident, which is how multi-epoch training runs)

The device step consumes batch_size / step_time samples/s (bench.py); the
warm rate here must exceed that for the host not to be the bottleneck.
Prints one JSON line per phase.

Usage:
  JAX_PLATFORMS=cpu python scripts/input_throughput.py <corpus_dir> \
      [--image-count 10] [--batch 8] [--max-samples 0] [--cache-gb 8]
"""

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402


def run_epoch(data, order, batch):
    n = 0
    t0 = time.perf_counter()
    data.prefetch(order[:batch])
    for lo in range(0, len(order), batch):
        idx = order[lo:lo + batch]
        data.prefetch(order[lo + batch:lo + 2 * batch])
        b = data.raw_batch(idx)
        n += len(idx)
        assert b["svbrdf"].shape[0] == len(idx)
    dt = time.perf_counter() - t0
    return n, dt


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("corpus_dir")
    p.add_argument("--image-count", type=int, default=10)
    p.add_argument("--used-image-count", type=int, default=1)
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--max-samples", type=int, default=0,
                   help="cap the per-epoch sample count (0 = full epoch)")
    p.add_argument("--cache-gb", type=float, default=8.0)
    p.add_argument("--threads", type=int, default=2)
    args = p.parse_args(argv)

    from svbrdf_tpu.data.dataset import SvbrdfDataset

    data = SvbrdfDataset(
        data_directory=args.corpus_dir,
        image_size=args.image_size,
        input_image_count=args.image_count,
        used_input_image_count=args.used_image_count,
        mix_materials=(args.image_count == 0),
        cache_bytes=int(args.cache_gb * (1 << 30)),
        prefetch_threads=args.threads,
    )
    order = np.random.default_rng(0).permutation(len(data))
    if args.max_samples:
        order = order[:args.max_samples]

    for phase in ("cold", "warm"):
        n, dt = run_epoch(data, order, args.batch)
        print(json.dumps({
            "metric": f"host_input_pipeline_{phase}",
            "value": round(n / dt, 1),
            "unit": "samples/s",
            "samples": n,
            "seconds": round(dt, 2),
            "batch": args.batch,
        }), flush=True)


if __name__ == "__main__":
    main()
