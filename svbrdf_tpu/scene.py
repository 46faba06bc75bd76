"""Scene value objects as JAX pytrees (struct-of-arrays).

The reference holds scenes as Python objects (Camera/Light/Scene,
reference environment.py:4-15) and loops over them per sample
(reference losses.py:34-44). On TPU a scene *batch* is a pytree of arrays
with a leading scene axis, so rendering vmaps/broadcasts over scenes with
no Python loop and no retracing.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Scene:
    """A batch of point-light scenes.

    Fields broadcast against each other; each has trailing dim 3 (xyz / rgb).
    A single scene has shape (3,); a batch has shape (..., 3). Arbitrary
    leading batch axes are supported (e.g. (B, S, 3) for per-item scene sets).
    """

    camera_pos: jnp.ndarray   # (..., 3) camera position in patch space
    light_pos: jnp.ndarray    # (..., 3) point light position
    light_color: jnp.ndarray  # (..., 3) RGB light intensity

    @property
    def batch_shape(self):
        return jnp.broadcast_shapes(
            self.camera_pos.shape[:-1],
            self.light_pos.shape[:-1],
            self.light_color.shape[:-1],
        )

    @classmethod
    def make(cls, camera_pos, light_pos, light_color) -> "Scene":
        return cls(
            camera_pos=jnp.asarray(camera_pos, jnp.float32),
            light_pos=jnp.asarray(light_pos, jnp.float32),
            light_color=jnp.asarray(light_color, jnp.float32),
        )
