"""Adam with reduced-precision state for bandwidth-bound TPU training.

At 80M params the f32 Adam state dominates the train step's HBM traffic on
v5e: the second moment alone is 320 MB of read+write per step (~0.4 ms at
819 GB/s). Plain bf16 storage would BREAK Adam's second moment — its EMA
increments are (1-beta2)=1e-3-scale relative changes, far below bf16's
~0.4% mantissa step, so round-to-nearest freezes nu entirely. Stochastic
rounding fixes this: adding uniform dither below the rounding cutoff makes
the truncation unbiased (E[sr_bf16(x)] = x), so the EMA is followed in
expectation with zero systematic drift — the standard low-precision-state
technique (e.g. 8-bit/16-bit optimizers, Dettmers et al. 2021; TPUs have
hardware SR for exactly this reason). The dither comes from a counter-based
integer hash fused into the (bandwidth-bound) update kernel, so it is
effectively free.

The math is otherwise EXACTLY optax.adam (same bias correction, same eps
placement, mu stored bf16 round-to-nearest as before); the state pytree is
optax's ScaleByAdamState, so checkpoints interoperate (restore casts
moments to the template dtype, training/checkpoint.py).

Update semantics reference: the torch reference trains with
torch.optim.Adam(lr=1e-5) (reference main.py:98); parity of the f32 path
is pinned by tests/test_training.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def _dither_bits(shape, salt: jnp.ndarray) -> jnp.ndarray:
    """Per-element uint32 hash (murmur3-style mixing over linear index and
    a per-step salt), sized for the TPU VPU: TWO vector integer multiplies
    (the salt multiply is scalar and free). Not cryptographic — it only
    needs to be uncorrelated dither for stochastic rounding, and the
    update fusions it rides in are VPU-bound, so every dropped multiply
    shows up in step time. Calibration (test_sr_bf16_unbiased, 400
    sequential salts): ONE multiply (idx*C + salt, xor-shift) is biased —
    its dither sweeps a contiguous range instead of covering [0, 2^16) —
    at 5.4e-3 max relative error; two rounds are equidistributed at
    3.2e-4, well inside the 1e-3 tolerance; a third round (full murmur
    finalizer) adds nothing but VPU cycles."""
    n = 1
    for d in shape:
        n *= d
    idx = jax.lax.iota(jnp.uint32, n).reshape(shape)
    z = idx * jnp.uint32(0x9E3779B9) + salt.astype(jnp.uint32) * jnp.uint32(
        0x85EBCA6B)
    z = z ^ (z >> 16)
    z = z * jnp.uint32(0x7FEB352D)
    z = z ^ (z >> 15)
    return z ^ (z >> 16)


def sr_bf16(x: jnp.ndarray, salt: jnp.ndarray) -> jnp.ndarray:
    """Stochastically round f32 -> bf16: add uniform dither to the 16
    dropped mantissa bits, then truncate. Unbiased: E[result] == x."""
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    noise = _dither_bits(x.shape, salt) & jnp.uint32(0xFFFF)
    hi = ((bits + noise) >> 16).astype(jnp.uint16)
    return jax.lax.bitcast_convert_type(hi, jnp.bfloat16)


def _moment_dtype(p) -> jnp.dtype:
    """bf16 moments only for >=2-D leaves (conv/FC kernels — where the
    bandwidth lives); 1-D biases/norm scales keep f32 moments, mirroring
    the master-dtype policy's >=2-D rule (parallel/step.master_cast): the
    bandwidth win on 1-D leaves is negligible while their second moments
    would take SR noise for nothing."""
    return jnp.bfloat16 if jnp.ndim(p) >= 2 else jnp.float32


def scale_by_adam_bf16sr(b1: float = 0.9, b2: float = 0.999,
                         eps: float = 1e-8) -> optax.GradientTransformation:
    """optax.scale_by_adam with mu stored bf16 (round-to-nearest — its 10%
    -scale increments are representable) and nu stored bf16 via stochastic
    rounding (unbiased EMA), for >=2-D leaves (_moment_dtype); all
    arithmetic runs in f32."""

    def init(params):
        def zeros(p):
            return jnp.zeros(jnp.shape(p), _moment_dtype(p))

        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(zeros, params),
            nu=jax.tree.map(zeros, params),
        )

    def update(updates, state, params=None):
        del params
        count = optax.safe_int32_increment(state.count)
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)

        def one(g, mu, nu, salt):
            g32 = g.astype(jnp.float32)
            mu32 = mu.astype(jnp.float32) * b1 + g32 * (1.0 - b1)
            nu32 = nu.astype(jnp.float32) * b2 + g32 * g32 * (1.0 - b2)
            u = (mu32 / bc1) / (jnp.sqrt(nu32 / bc2) + eps)
            nu_out = (sr_bf16(nu32, salt) if nu.dtype == jnp.bfloat16
                      else nu32.astype(nu.dtype))
            return u, mu32.astype(mu.dtype), nu_out

        leaves, treedef = jax.tree.flatten(updates)
        mu_l = treedef.flatten_up_to(state.mu)
        nu_l = treedef.flatten_up_to(state.nu)
        out = [one(g, m, n, count * jnp.int32(1000003) + jnp.int32(i))
               for i, (g, m, n) in enumerate(zip(leaves, mu_l, nu_l))]
        new_updates = treedef.unflatten([o[0] for o in out])
        new_mu = treedef.unflatten([o[1] for o in out])
        new_nu = treedef.unflatten([o[2] for o in out])
        return new_updates, optax.ScaleByAdamState(count=count, mu=new_mu,
                                                   nu=new_nu)

    return optax.GradientTransformation(init, update)


def adam_bf16sr(learning_rate: float, b1: float = 0.9, b2: float = 0.999,
                eps: float = 1e-8) -> optax.GradientTransformation:
    """Adam(lr) with bf16 moments (nu stochastically rounded). Same chain
    shape as optax.adam (scale_by_adam then scale by -lr), so optimizer
    checkpoints keep the (ScaleByAdamState, EmptyState) structure."""
    return optax.chain(
        scale_by_adam_bf16sr(b1=b1, b2=b2, eps=eps),
        optax.scale(-learning_rate),
    )
