"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware isn't available in CI; sharding tests validate
pjit/shard_map layouts on 8 virtual CPU devices instead
(xla_force_host_platform_device_count).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell presets axon (TPU)

# The axon TPU-tunnel site hook intercepts XLA compilation and slows CPU
# compiles ~7x; tests run pure-CPU, so drop it before JAX initializes.
import sys  # noqa: E402

sys.path[:] = [p for p in sys.path if ".axon_site" not in p]
os.environ["PYTHONPATH"] = ":".join(
    p for p in os.environ.get("PYTHONPATH", "").split(":")
    if p and ".axon_site" not in p)
for _mod in [m for m in list(sys.modules) if "axon" in m.lower()]:
    del sys.modules[_mod]

# A persistent compile cache makes test re-runs cheap. (Must go through
# jax.config — the env var is not picked up.)
import jax  # noqa: E402

# jax may already be imported by a pytest plugin before this conftest runs,
# in which case the JAX_PLATFORMS env var set above is too late — force the
# platform through the config (valid until backends initialize).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
# NOTE: JAX's default conv/matmul precision is bf16-grade even on CPU;
# parity tests that compare against PyTorch f32 pass precision=HIGHEST
# explicitly (globally pinning it here made every conv compile ~2-5x
# slower on this 1-core box).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import pathlib
import sys

import pytest

REPO_ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

REFERENCE_DIR = pathlib.Path("/root/reference/development/multiImage_pytorch")


@pytest.fixture(scope="session")
def reference_modules():
    """Import the PyTorch reference (read-only) as a numerical oracle.

    Used only to generate golden values in tests — never vendored into the
    package. Skips when the reference checkout is absent.
    """
    if not REFERENCE_DIR.exists():
        pytest.skip("reference checkout not available")
    sys.path.insert(0, str(REFERENCE_DIR))
    try:
        # The reference's renderers.py imports pyredner (GPU wheel, absent
        # here); stub it — only LocalRenderer (pure torch) is used as oracle.
        if "pyredner" not in sys.modules:
            import types
            stub = types.ModuleType("pyredner")
            sys.modules["pyredner"] = stub
        import utils as ref_utils  # noqa: F401
        import models as ref_models  # noqa: F401
        import renderers as ref_renderers  # noqa: F401
        import environment as ref_environment  # noqa: F401
        import losses as ref_losses  # noqa: F401
        import dataset as ref_dataset  # noqa: F401
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")
    finally:
        sys.path.pop(0)
    return {
        "utils": ref_utils,
        "models": ref_models,
        "renderers": ref_renderers,
        "environment": ref_environment,
        "losses": ref_losses,
        "dataset": ref_dataset,
    }


@pytest.fixture(scope="session")
def toy_data_dir():
    d = REFERENCE_DIR / "data"
    if not d.exists():
        pytest.skip("toy dataset not available")
    return d


@pytest.fixture(autouse=True)
def _isolate_master_dtype_override():
    """Hermetic tests regardless of order: snapshot/restore the process-
    wide master-dtype override around every test. Production runs scope
    the override themselves (parallel/step.master_dtype_scope); this
    guards the suite against any future code path that forgets to."""
    from svbrdf_tpu.parallel import step as step_lib

    prev = step_lib._MASTER_DTYPE_OVERRIDE
    yield
    step_lib.set_master_dtype_policy(prev)
