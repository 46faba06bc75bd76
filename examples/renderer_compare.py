"""Side-by-side local-renderer vs path-tracer comparison grid.

Script equivalent of the reference's renderer smoke test
(reference renderers.py:272-337: toy SVBRDFs rendered with LocalRenderer
and RednerRenderer in a matplotlib grid) — headless: writes a PNG grid of
[ GT maps row | local renders row | path-traced renders row ] under a few
shared scenes.

    python examples/renderer_compare.py <strip.png> out.png [n_scenes]
"""

import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))  # run without install

import numpy as np


def main():
    if len(sys.argv) < 3:
        raise SystemExit(__doc__.strip())
    strip_path, out = sys.argv[1], sys.argv[2]
    n_scenes = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    import jax
    import jax.numpy as jnp

    from svbrdf_tpu.data import strips
    from svbrdf_tpu.ops import codecs, pathtrace, render, sampling
    from svbrdf_tpu import viz

    _, svbrdf = strips.load_sample(strip_path, input_image_count=10,
                                   used_input_image_count=0)
    svbrdf = jnp.asarray(svbrdf)

    key = jax.random.key(0)
    scenes = sampling.generate_random_scenes(key, n_scenes)

    local = render.render(scenes, svbrdf[None])          # (S, H, W, 3)
    traced = pathtrace.render(scenes, svbrdf[None],
                              key=jax.random.fold_in(key, 1))

    maps = codecs.unpack_svbrdf(svbrdf)
    row_maps = [codecs.encode_as_unit_interval(maps.normals),
                maps.diffuse, maps.roughness, maps.specular]
    tone = lambda r: np.asarray(
        codecs.gamma_encode(jnp.clip(r, 0.0, 1.0)))
    row_local = [tone(local[s]) for s in range(n_scenes)]
    row_traced = [tone(traced[s]) for s in range(n_scenes)]

    n_cols = max(len(row_maps), n_scenes)
    pad = lambda row: row + [np.zeros_like(row[0])] * (n_cols - len(row))
    grid = np.concatenate(
        [np.concatenate(pad([np.asarray(x) for x in row]), axis=1)
         for row in (row_maps, row_local, row_traced)], axis=0)
    from PIL import Image

    Image.fromarray(
        (np.clip(grid, 0.0, 1.0) * 255).astype(np.uint8)).save(out)
    print(f"wrote {out} (rows: GT maps / local renderer / path tracer, "
          f"{n_scenes} shared scenes)")


if __name__ == "__main__":
    main()
