"""Key-threaded scene/direction samplers (struct-of-arrays).

Replaces the reference's global-RNG scene factories (environment.py:18-55,
utils.py:100-111) with explicit `jax.random` keys returning Scene pytrees
with a leading scene axis — jit/vmap friendly, deterministic by key.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from svbrdf_tpu.scene import Scene


def cosine_hemisphere_direction(key, count: int,
                                min_eps: float = 0.001,
                                max_eps: float = 0.05) -> jnp.ndarray:
    """Cosine-weighted unit directions on the upper hemisphere, (count, 3).

    r1 ~ U(min_eps, 1-max_eps); r = sqrt(r1); phi = 2*pi*U(0,1);
    z = sqrt(1 - r^2). Reference utils.py:100-111
    (generate_normalized_random_direction).
    """
    k1, k2 = jax.random.split(key)
    r1 = jax.random.uniform(k1, (count, 1), minval=min_eps, maxval=1.0 - max_eps)
    r2 = jax.random.uniform(k2, (count, 1))
    r = jnp.sqrt(r1)
    phi = 2.0 * math.pi * r2
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    z = jnp.sqrt(1.0 - r1)
    return jnp.concatenate([x, y, z], axis=-1)


def generate_random_scenes(key, count: int) -> Scene:
    """Random view & light on the hemisphere, light color (20,20,20).

    Reference environment.py:18-30. Returns a Scene batch of shape (count, 3)
    per field instead of a list of objects.
    """
    kv, kl = jax.random.split(key)
    view = cosine_hemisphere_direction(kv, count, 0.001, 0.1)
    light = cosine_hemisphere_direction(kl, count, 0.001, 0.1)
    color = jnp.full((count, 3), 20.0, jnp.float32)
    return Scene(camera_pos=view, light_pos=light, light_color=color)


def generate_specular_scenes(key, count: int) -> Scene:
    """Mirror-configuration scenes guaranteeing specular highlights.

    light = view * (-1,-1,1); independent log-normal distances
    exp(N(0.5, 0.75)); shared xy shift ~ U(-1,1) (z shift 1e-4) to move the
    highlight; light color (50,50,50). Reference environment.py:32-55.
    """
    kv, kdv, kdl, ks = jax.random.split(key, 4)
    view = cosine_hemisphere_direction(kv, count, 0.001, 0.1)
    light = view * jnp.array([-1.0, -1.0, 1.0])

    distance_view = jnp.exp(0.5 + 0.75 * jax.random.normal(kdv, (count, 1)))
    distance_light = jnp.exp(0.5 + 0.75 * jax.random.normal(kdl, (count, 1)))

    shift_xy = jax.random.uniform(ks, (count, 2), minval=-1.0, maxval=1.0)
    shift = jnp.concatenate(
        [shift_xy, jnp.full((count, 1), 1e-4, jnp.float32)], axis=-1)

    view = view * distance_view + shift
    light = light * distance_light + shift
    color = jnp.full((count, 3), 50.0, jnp.float32)
    return Scene(camera_pos=view, light_pos=light, light_color=color)


def generate_loss_scenes(key, batch_size: int,
                         n_random: int = 3, n_specular: int = 6) -> Scene:
    """Per-item scene sets for the rendering loss, shape (B, n_r+n_s, 3).

    The reference draws a fresh 3-random + 6-specular scene list per batch
    item inside a Python loop (losses.py:34-35); here the whole (B, 9)
    scene batch is one key-split, fully vectorized.
    """
    def per_item(k):
        kr, ks = jax.random.split(k)
        rand = generate_random_scenes(kr, n_random)
        spec = generate_specular_scenes(ks, n_specular)
        return Scene(
            camera_pos=jnp.concatenate([rand.camera_pos, spec.camera_pos], 0),
            light_pos=jnp.concatenate([rand.light_pos, spec.light_pos], 0),
            light_color=jnp.concatenate([rand.light_color, spec.light_color], 0),
        )

    return jax.vmap(per_item)(jax.random.split(key, batch_size))
