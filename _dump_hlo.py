"""Dump compiled HLO text of the headline bench program (scan K=16)."""
import jax
import jax.numpy as jnp
import numpy as np

from svbrdf_tpu import losses
from svbrdf_tpu.models import SingleViewModel
from svbrdf_tpu.parallel import make_mesh, mesh as mesh_lib
from svbrdf_tpu.parallel.step import (PrepConfig, make_train_step,
                                      make_optimizer, master_cast)

batch, size = 8, 256
dtype = jnp.bfloat16
mesh = make_mesh()
model = SingleViewModel(use_coords=False, dtype=dtype)
optimizer = make_optimizer(1e-5, dtype)
loss_fn = losses.make_loss_fn("mixed", "local")
prep = PrepConfig(used_input_image_count=1, use_augmentation=True,
                  is_linear=False, mix_materials=True)
scan_k = 16
step = make_train_step(model, optimizer, loss_fn, prep, mesh,
                       donate=True, scan_steps=scan_k)

rng = np.random.default_rng(0)
n = rng.uniform(-1, 1, (batch, size, size, 3)).astype(np.float32)
n[..., 2] = np.abs(n[..., 2]) + 0.5
n /= np.linalg.norm(n, axis=-1, keepdims=True)
maps = rng.uniform(0.05, 0.95, (batch, size, size, 9)).astype(np.float32)
svbrdf = np.concatenate(
    [np.round((n * 0.5 + 0.5) * 255.0), np.round(maps * 255.0)],
    axis=-1).astype(np.uint8)


def planes_u8(sv):
    b, hh, ww, c = sv.shape
    p = sv.reshape(b, hh // 2, 2, ww // 2, 2, c)
    return p.transpose(0, 2, 4, 5, 1, 3).reshape(b, 4 * c, hh // 2, ww // 2)


raw = {
    "inputs": np.zeros((batch, 0, size, size, 3), np.uint8),
    "svbrdf": svbrdf,
    "partner_svbrdf": svbrdf[::-1].copy(),
    "svbrdf_planes": planes_u8(svbrdf),
    "partner_svbrdf_planes": planes_u8(svbrdf[::-1]),
}
raw = jax.tree.map(
    lambda x: jax.device_put(
        np.broadcast_to(x, (scan_k,) + x.shape).copy(),
        mesh_lib.stacked_batch_sharding(mesh)), raw)

key = jax.random.key(0)
params = model.init(jax.random.fold_in(key, 1),
                    jnp.zeros((1, 1, size, size, 3)))["params"]
params = master_cast(params, dtype)
opt_state = optimizer.init(params)
repl = mesh_lib.replicated_sharding(mesh)
params = jax.device_put(params, repl)
opt_state = jax.device_put(opt_state, repl)

c, d = step._state(params)
abstract = jax.tree.map(
    lambda x: jax.ShapeDtypeStruct(jnp.shape(x), x.dtype),
    (params, opt_state, c, d, raw,
     (jax.random.fold_in(key, 0), jnp.int32(0))))
compiled = step._jit.lower(*abstract).compile()
with open("/tmp/step_hlo.txt", "w") as f:
    f.write(compiled.as_text())
print("wrote /tmp/step_hlo.txt")
