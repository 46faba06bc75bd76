"""Subprocess health probe for custom XLA layout support.

The tunneled TPU backend's custom-layout path is INTERMITTENTLY broken at
the service level (measured across one day: four AUTO-layout train-step
benches succeeded, then every later attempt failed — relayout requests
silently dropped, then InvalidArgument on execution, and once an
AUTO-layout program fails in a session, even PLAIN compiles in that
session start failing). AUTO layouts are worth ~0.6 ms/step on the
headline program, so they should be used when the backend is healthy —
but the decision must be made BEFORE the first custom-layout compile, in
a THROWAWAY process, because a failed attempt poisons the client session.

The probe: in a subprocess, force a non-default layout onto a small conv
kernel (the exact shape/layout class that failed in production), verify
the resulting array's layout metadata AND its round-tripped values. Any
crash, mismatch, or timeout marks the backend unhealthy.

Override: SVBRDF_AUTO_LAYOUT=1 trusts the backend (skips the probe),
SVBRDF_AUTO_LAYOUT=0 disables AUTO layouts outright.
"""

from __future__ import annotations

import os
import subprocess
import sys

_PROBE = r"""
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental.layout import Format, Layout

vals = np.arange(4 * 4 * 128 * 9, dtype=np.float32).reshape(4, 4, 128, 9)
x = jnp.asarray(vals, jnp.bfloat16)
tgt = Layout(major_to_minor=(1, 3, 0, 2))
y = jax.jit(lambda v: jax.lax.optimization_barrier(v),
            out_shardings=Format(tgt, x.sharding))(x)
assert y.format.layout.major_to_minor == (1, 3, 0, 2), y.format.layout
back = np.asarray(y, dtype=np.float32)
ref = np.asarray(x, dtype=np.float32)
assert np.array_equal(back, ref), "relayout changed values"
print("LAYOUTS_OK")
"""

_cached: bool | None = None


def custom_layouts_healthy(timeout: float = 180.0) -> bool:
    """True when the backend demonstrably honors custom layouts right now.

    Result is cached per process (the health state is sticky enough for a
    run's lifetime, and each probe costs a subprocess + a tiny remote
    compile, ~10-30 s through the tunnel)."""
    global _cached
    override = os.environ.get("SVBRDF_AUTO_LAYOUT")
    if override == "1":
        return True
    if override == "0":
        return False
    if _cached is not None:
        return _cached
    try:
        out = subprocess.run(
            [sys.executable, "-c", _PROBE],
            capture_output=True, text=True, timeout=timeout,
            env=os.environ.copy())
        _cached = out.returncode == 0 and "LAYOUTS_OK" in out.stdout
    except Exception:
        _cached = False
    if not _cached:
        import warnings

        warnings.warn(
            "backend failed the custom-layout health probe; AUTO-layout "
            "programs are disabled for this process (~0.6 ms/step slower "
            "on v5e). Set SVBRDF_AUTO_LAYOUT=1 to force them on.",
            stacklevel=2)
    return _cached
