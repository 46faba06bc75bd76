"""Reduced-precision Adam state (parallel/optimizer.py): unbiased
stochastic rounding, EMA tracking that plain bf16 provably fails, update
parity with optax.adam, and checkpoint-compatible state structure."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from svbrdf_tpu.parallel.optimizer import adam_bf16sr, sr_bf16
from svbrdf_tpu.parallel.step import make_optimizer


def test_sr_bf16_unbiased():
    """Mean over many dither salts recovers the f32 value (SR is unbiased;
    round-to-nearest would give a constant offset)."""
    x = jnp.asarray(np.random.default_rng(0).uniform(1e-8, 1e-4, (64,)),
                    jnp.float32)
    acc = np.zeros(64, np.float64)
    n = 400
    for s in range(n):
        acc += np.asarray(sr_bf16(x, jnp.int32(s)), np.float64)
    mean = acc / n
    # bf16 quantization step is ~0.4%; the SR mean must land well inside
    # one step of the true value (standard error ~0.4%/sqrt(400)).
    np.testing.assert_allclose(mean, np.asarray(x, np.float64), rtol=1e-3)


def test_sr_bf16_rounds_to_neighbours():
    """Every SR output is one of the two bracketing bf16 values."""
    x = jnp.asarray([1.2345e-3, 7.7e2, 3.3e-6], jnp.float32)
    lo = x.astype(jnp.bfloat16)  # round-to-nearest, may be above or below
    for s in range(50):
        out = sr_bf16(x, jnp.int32(s))
        for i in range(3):
            v = float(out[i])
            a, b = float(lo[i]), float(x[i])
            # distance to the true value is below one bf16 ulp
            assert abs(v - b) <= abs(b) * 2 ** -7


def test_ema_tracks_where_bf16_stalls():
    """nu follows a constant-gradient EMA to ~the asymptote; deterministic
    bf16 storage freezes once increments drop below the mantissa step."""
    g = 0.1
    beta2 = 0.999
    steps = 3000

    nu_sr = jnp.zeros((128,), jnp.bfloat16)
    nu_det = jnp.zeros((128,), jnp.bfloat16)

    @jax.jit
    def step_sr(nu, s):
        nu32 = nu.astype(jnp.float32) * beta2 + (1 - beta2) * g * g
        return sr_bf16(nu32, s)

    @jax.jit
    def step_det(nu):
        nu32 = nu.astype(jnp.float32) * beta2 + (1 - beta2) * g * g
        return nu32.astype(jnp.bfloat16)

    for s in range(steps):
        nu_sr = step_sr(nu_sr, jnp.int32(s))
        nu_det = step_det(nu_det)

    target = g * g * (1 - beta2 ** steps)  # exact f32 EMA value
    mean_sr = float(jnp.mean(nu_sr.astype(jnp.float32)))
    mean_det = float(jnp.mean(nu_det.astype(jnp.float32)))
    # SR lands within a few percent of the true EMA.
    np.testing.assert_allclose(mean_sr, target, rtol=0.05)
    # Deterministic bf16 demonstrably undershoots: the EMA stalls at the
    # value where the per-step increment falls below one ulp.
    assert mean_det < 0.8 * target


def test_adam_bf16sr_matches_adam_updates():
    """Per-step updates match f32 optax.adam within bf16-state tolerance
    over a short optimization trace."""
    params = {"w": jnp.asarray(np.random.default_rng(1).normal(
        0, 1, (32, 32)).astype(np.float32))}
    ref_opt = optax.adam(1e-3)
    sr_opt = adam_bf16sr(1e-3)
    ref_state = ref_opt.init(params)
    sr_state = sr_opt.init(params)
    ref_p, sr_p = params, params
    rng = np.random.default_rng(2)
    for i in range(20):
        g = {"w": jnp.asarray(rng.normal(0, 0.1, (32, 32)).astype(
            np.float32))}
        ref_u, ref_state = ref_opt.update(g, ref_state)
        sr_u, sr_state = sr_opt.update(g, sr_state)
        ref_p = optax.apply_updates(ref_p, ref_u)
        sr_p = optax.apply_updates(sr_p, sr_u)
    np.testing.assert_allclose(np.asarray(sr_p["w"]), np.asarray(ref_p["w"]),
                               rtol=2e-2, atol=2e-4)


def test_state_structure_matches_adam():
    """adam_bf16sr's state tree has optax.adam's structure (ScaleByAdamState,
    EmptyState) so checkpoint save/restore code paths are shared."""
    params = {"w": jnp.ones((4, 4))}
    s_sr = adam_bf16sr(1e-3).init(params)
    s_ref = optax.adam(1e-3, mu_dtype=jnp.bfloat16).init(params)
    assert (jax.tree_util.tree_structure(s_sr)
            == jax.tree_util.tree_structure(s_ref))
    assert s_sr[0].nu["w"].dtype == jnp.bfloat16


def test_one_d_leaves_keep_f32_moments():
    """Moments are bf16 only for >=2-D leaves; 1-D biases/norm scales keep
    f32 moments (mirroring the master-dtype policy's >=2-D rule) — their
    bandwidth is negligible and SR noise on them buys nothing."""
    params = {"w": jnp.ones((4, 4), jnp.float32),
              "b": jnp.ones((4,), jnp.float32)}
    opt = adam_bf16sr(1e-3)
    state = opt.init(params)
    assert state[0].mu["w"].dtype == jnp.bfloat16
    assert state[0].nu["w"].dtype == jnp.bfloat16
    assert state[0].mu["b"].dtype == jnp.float32
    assert state[0].nu["b"].dtype == jnp.float32
    g = jax.tree.map(lambda p: jnp.full_like(p, 1e-3), params)
    _, new_state = opt.update(g, state)
    assert new_state[0].nu["b"].dtype == jnp.float32
    # the 1-D nu update is exact f32 (no SR noise)
    np.testing.assert_allclose(np.asarray(new_state[0].nu["b"]),
                               1e-6 * (1 - 0.999) * np.ones(4), rtol=1e-6)


def test_make_optimizer_selection():
    assert make_optimizer(1e-5, jnp.float32, "f32")
    opt = make_optimizer(1e-5, jnp.bfloat16, "bf16sr")
    params = {"w": jnp.ones((4, 4), jnp.float32)}
    state = opt.init(params)
    assert state[0].nu["w"].dtype == jnp.bfloat16
    g = {"w": jnp.full((4, 4), 0.01, jnp.float32)}
    u, _ = opt.update(g, state)
    assert jnp.all(jnp.isfinite(u["w"]))
