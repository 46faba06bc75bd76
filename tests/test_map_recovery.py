"""Automated version of the reference's notebook differentiability
experiments: recovering maps through the rendering loss converges."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svbrdf_tpu.experiments import map_recovery
from svbrdf_tpu.ops import sampling
from tests.test_render import random_svbrdf


@pytest.fixture(scope="module")
def target():
    rng = np.random.default_rng(0)
    return jnp.asarray(random_svbrdf(rng, 16, 16))


def test_fixed_scene_loss_zero_on_identical(target):
    scenes = sampling.generate_random_scenes(jax.random.key(0), 4)
    loss = map_recovery.fixed_scene_rendering_loss(target, target, scenes)
    assert float(loss) == 0.0


@pytest.mark.slow
def test_diffuse_recovery_converges(target):
    result = map_recovery.recover_maps(
        jax.random.key(1), target, optimize=("diffuse",), steps=100,
        learning_rate=5e-2)
    first, last = float(result.losses[0]), float(result.losses[-1])
    assert last < first * 0.3, (first, last)
    # Recovered diffuse should approach the target's.
    d_err = float(jnp.mean(jnp.abs(result.svbrdf[..., 3:6]
                                   - target[..., 3:6])))
    assert d_err < 0.12, d_err


@pytest.mark.slow
def test_roughness_recovery_fixed_scenes(target):
    scenes = sampling.generate_specular_scenes(jax.random.key(2), 8)
    result = map_recovery.recover_maps(
        jax.random.key(3), target, optimize=("roughness",), steps=100,
        learning_rate=5e-2, scenes=scenes)
    assert float(result.losses[-1]) < float(result.losses[0])
