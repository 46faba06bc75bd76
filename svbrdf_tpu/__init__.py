"""svbrdf_tpu — a TPU-native (JAX/XLA/Pallas/pjit) SVBRDF-estimation framework.

A ground-up re-design of the capabilities of mworchel/svbrdf-estimation
(reference: /root/reference/development/multiImage_pytorch) for TPU hardware:

- channels-last (NHWC) layouts everywhere so XLA can tile convs onto the MXU,
- pure functional renderers (vmappable over a scene axis) instead of
  per-sample Python loops,
- a fused Pallas rendering-loss kernel replacing the reference's
  144-render-per-step Python loop (reference losses.py:29-52),
- explicit PRNG key threading instead of global seeds (reference utils.py:7-13),
- pjit/shard_map data parallelism over a jax.sharding.Mesh (the reference is
  single-device; see SURVEY.md §2.3).
"""

__version__ = "0.1.0"

from svbrdf_tpu.ops import codecs, render, sampling  # noqa: F401
from svbrdf_tpu.scene import Scene  # noqa: F401
