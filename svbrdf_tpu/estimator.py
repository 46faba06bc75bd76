"""High-level inference API: checkpoint -> SVBRDF maps.

The reference's only inference path is the test-mode matplotlib block in
main.py:167-223; this gives library users a serving-friendly object:

    est = SvbrdfEstimator.from_checkpoint("./model")
    maps = est.predict(images)            # (B, H, W, 12) NHWC
    est.predict_to_files(["photo.png"], "./out")
"""

from __future__ import annotations

import pathlib
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from svbrdf_tpu.data import strips
from svbrdf_tpu.models import build_model
from svbrdf_tpu.ops import codecs
from svbrdf_tpu.training.checkpoint import Checkpoint


class SvbrdfEstimator:
    def __init__(self, model, params):
        self.model = model
        self.params = params
        self._predict = jax.jit(
            lambda p, x: model.apply({"params": p}, x, deterministic=True))

    @classmethod
    def from_checkpoint(cls, model_dir, dtype=jnp.float32,
                        image_size: int = 256) -> "SvbrdfEstimator":
        """Accepts every model-dir layout `Checkpoint.load` accepts: our
        Orbax state + meta.json, a reference `checkpoint.tar`, or the
        legacy `model.data` (+`state.json`) pair — the architecture args
        come from the checkpoint itself (restore_args), exactly as the
        CLI setup path resolves them."""
        d = pathlib.Path(model_dir)
        ck = Checkpoint.load(d)
        if not ck.is_valid():
            raise FileNotFoundError(f"no checkpoint in '{model_dir}'")
        import argparse

        spec = argparse.Namespace(model_type="single", use_coords=False,
                                  model_depth=8, num_filters=64)
        spec = ck.restore_args(spec)
        model = build_model(
            spec.model_type,
            use_coords=spec.use_coords,
            depth=spec.model_depth,
            num_filters=spec.num_filters,
            dtype=dtype,
        )
        sample = jnp.zeros((1, 1, image_size, image_size, 3), jnp.float32)
        params = model.init(jax.random.key(0), sample)["params"]
        params = ck.restore_params(params)
        return cls(model, params)

    def predict(self, images) -> np.ndarray:
        """images: (B, H, W, 3) or (B, N, H, W, 3) linear RGB in [0, 1]
        -> (B, H, W, 12) packed SVBRDF."""
        return np.asarray(self._predict(self.params, jnp.asarray(images)))

    def predict_from_photos(self, paths: Sequence[str],
                            is_linear: bool = False) -> np.ndarray:
        """Photograph files -> SVBRDF maps (single batch)."""
        imgs = np.stack([strips.read_image(p) for p in paths])
        if not is_linear:
            imgs = np.clip(imgs, 0.0, 1.0) ** 2.2
        return self.predict(imgs)

    def predict_to_files(self, paths: Sequence[str], out_dir: str,
                         is_linear: bool = False) -> list:
        """Write per-input [normals|diffuse|roughness|specular] map strips."""
        out = pathlib.Path(out_dir)
        out.mkdir(parents=True, exist_ok=True)
        svbrdfs = self.predict_from_photos(paths, is_linear)
        written = []
        for path, sv in zip(paths, svbrdfs):
            maps = codecs.unpack_svbrdf(sv)
            strip = np.concatenate([
                np.asarray(codecs.encode_as_unit_interval(maps.normals)),
                np.asarray(maps.diffuse),
                np.asarray(maps.roughness),
                np.asarray(maps.specular),
            ], axis=1)
            name = pathlib.Path(path).stem + "_svbrdf.png"
            target = out / name
            strips.write_image(str(target), strip)
            written.append(str(target))
        return written
