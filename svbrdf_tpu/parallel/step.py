"""Jitted, sharded train / eval steps.

One fused program per step: on-device batch preparation (mix, gamma,
input synthesis) -> model fwd -> loss (incl. batched rendering loss) ->
bwd -> Adam update. The reference splits this across CPU DataLoader
workers and a Python autograd loop (reference main.py:104-124,
dataset.py:45-103); fusing it is what the <10 ms step target needs.

Sharding: batch axis over the `data` mesh axis; params/opt state
replicated; XLA derives the gradient all-reduce over ICI from the
annotations. Buffers are donated so params/opt update in place.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from svbrdf_tpu.data import pipeline
from svbrdf_tpu.parallel import mesh as mesh_lib


class PrepConfig(NamedTuple):
    """Static batch-preparation switches (see data/pipeline.prepare_batch)."""

    used_input_image_count: int = 1
    use_augmentation: bool = True
    is_linear: bool = False
    mix_materials: bool = False
    # Emit the loss target directly in the fused kernel's phase-planes
    # layout (set automatically by make_train_step/make_eval_step when the
    # loss advertises accepts_phase_planes — saves the NHWC -> planes
    # conversion copies, ~0.5 ms/step at 256^2 batch 8 on v5e).
    planes_target: bool = False


def _prepare(key, raw_batch, prep: PrepConfig):
    return pipeline.prepare_batch(
        key,
        raw_batch["inputs"],
        raw_batch["svbrdf"],
        raw_batch.get("partner_svbrdf") if prep.mix_materials else None,
        used_input_image_count=prep.used_input_image_count,
        use_augmentation=prep.use_augmentation,
        is_linear=prep.is_linear,
        planes_target=prep.planes_target,
        raw_svbrdf_planes=raw_batch.get("svbrdf_planes"),
        partner_svbrdf_planes=raw_batch.get("partner_svbrdf_planes"),
    )


def _cast_inputs(batch, model):
    """Cast the prepared input images to a bf16 model's compute dtype at
    the prep/model boundary instead of inside the generator (which casts
    first thing anyway — generator.py:59 — so the values are bit-identical).
    Placed here, the convert fuses into the prep producer and the layout
    copy XLA inserts for the first conv's batch-minor input layout moves
    bf16 instead of reading f32 (measured 0.103 ms -> ~0.04 ms at 256^2
    batch 8 on v5e). The barrier pins that order: XLA otherwise fuses the
    convert INTO the relayout copy, putting the f32 read back."""
    dt = getattr(model, "dtype", None)
    if dt == jnp.bfloat16 and batch["inputs"].dtype != dt:
        batch = dict(batch)
        batch["inputs"] = jax.lax.optimization_barrier(
            batch["inputs"].astype(dt))
    return batch


def _with_planes_target(prep: PrepConfig, phase_kwargs) -> PrepConfig:
    """Planes targets pair with planes predictions: only when the model
    emits output_layout='phase_planes' does the fused loss take both sides
    in the kernel layout. SVBRDF_PLANES_TARGET=0 forces the NHWC target
    path (A/B lever for the layout experiments in STATUS.md)."""
    import os

    if os.environ.get("SVBRDF_PLANES_TARGET", "1") == "0":
        return prep
    return prep._replace(planes_target=(
        phase_kwargs.get("output_layout") == "phase_planes"))


def make_optimizer(learning_rate: float, model_dtype=None,
                   state_precision: str = None
                   ) -> optax.GradientTransformation:
    """Adam configured for the model's compute dtype.

    bf16 models (state_precision auto -> 'bf16sr') store BOTH moments in
    bf16: mu round-to-nearest (its decay increments are 10%-scale, well
    inside bf16's mantissa), nu via STOCHASTIC rounding (its 1e-3-scale
    EMA increments vanish under round-to-nearest; SR keeps the EMA
    unbiased — parallel/optimizer.py). Halving both moments removes
    ~0.8 ms/step of pure HBM traffic at 80M params on v5e; update
    arithmetic stays f32 and the math is exactly optax.adam's. f32 models
    (CPU tests, the parity oracle) get the plain f32-state Adam.
    state_precision: None (auto) | 'f32' | 'bf16' (mu only) | 'bf16sr'.
    """
    import os

    if state_precision is None:
        state_precision = os.environ.get("SVBRDF_OPT_STATE", "auto")
    if state_precision == "auto":
        state_precision = ("bf16sr" if model_dtype == jnp.bfloat16
                          else "f32")
    if state_precision == "bf16sr":
        from svbrdf_tpu.parallel.optimizer import adam_bf16sr

        return adam_bf16sr(learning_rate)
    if state_precision == "bf16":
        return optax.adam(learning_rate, mu_dtype=jnp.bfloat16)
    return optax.adam(learning_rate)


# Process-level policy override (set by the CLI's --master-dtype flag or a
# checkpoint's recorded policy); None = fall back to the env var.
_MASTER_DTYPE_OVERRIDE = None


def set_master_dtype_policy(policy) -> None:
    """Set the process-wide master-dtype policy explicitly ('f32' |
    'bf16sr'; None restores env-var control). Used by the CLI flag
    --master-dtype and by checkpoint restore (the policy is recorded in
    the checkpoint meta — it changes the trained artifact's leaf dtypes)."""
    global _MASTER_DTYPE_OVERRIDE
    if policy not in (None, "f32", "bf16sr"):
        raise ValueError(f"unknown master dtype policy '{policy}'")
    _MASTER_DTYPE_OVERRIDE = policy


from contextlib import contextmanager


@contextmanager
def _no_persistent_cache():
    """Temporarily disable JAX's persistent compilation cache.

    Programs with custom (AUTO-chosen or requested) layouts restored from
    that cache carry wrong layout behavior on the tunneled TPU backend —
    see TrainStep._compile_auto_layout. Programs compiled in this scope
    are always fresh and never stored."""
    cache_on = jax.config.jax_enable_compilation_cache
    if cache_on:
        jax.config.update("jax_enable_compilation_cache", False)
    try:
        yield
    finally:
        if cache_on:
            jax.config.update("jax_enable_compilation_cache", True)


@contextmanager
def master_dtype_scope():
    """Scope the process-wide master-dtype override to a run.

    The CLI drivers (training/loop.py, training/spatial_loop.py) set the
    override from the --master-dtype flag or checkpoint meta; this context
    manager snapshots the override at entry and restores it at exit so
    back-to-back runs in one process (tests, notebooks) never inherit a
    previous run's explicit policy (round-4 regression: CLI-level tests
    poisoned later tests that monkeypatch SVBRDF_MASTER_DTYPE)."""
    prev = _MASTER_DTYPE_OVERRIDE
    try:
        yield
    finally:
        set_master_dtype_policy(prev)


def master_dtype_policy() -> str:
    """Master-parameter storage policy for bf16 models.

    'bf16sr' (default): >=2-D master leaves stored bf16, updated with
    STOCHASTIC rounding (unbiased; parallel/optimizer.py) — the params
    ARE the compute tree, removing the f32 read+write AND the
    compute-copy write (~0.3 ms/step at 80M params on v5e). 1-D leaves
    (biases, norm scales) stay f32. Quality evidence: 200-epoch toy
    parity vs f32 masters, mean relative loss diff 0.27%, max 1.29%
    (docs/bf16_parity.md).
    'f32': f32 masters + a carried bf16 compute-copy tree (exact Adam
    apply; 640 MB/step of f32 param HBM traffic at 80M params).
    CLI: --master-dtype (set_master_dtype_policy). Env: SVBRDF_MASTER_DTYPE.
    """
    import os

    if _MASTER_DTYPE_OVERRIDE is not None:
        return _MASTER_DTYPE_OVERRIDE
    return os.environ.get("SVBRDF_MASTER_DTYPE", "bf16sr")


def master_cast(params, model_dtype):
    """Bring a (restored or freshly initialized) f32 param tree to the
    master storage dtypes the current policy trains in."""
    if master_dtype_policy() == "bf16sr" and model_dtype == jnp.bfloat16:
        return compute_cast(params, jnp.bfloat16)
    return params


def make_derive_fn(model, phase_kwargs):
    """Pure function params -> tree of transformed conv kernels.

    The decoder's upsample+conv blocks shade with algebraically transformed
    kernels (dilated 5x5 / phase-folded 3x3 — models/layers.py). Computing
    the transforms inside the forward re-materializes them every step and
    XLA stages each fresh tensor into its conv's layout (measured ~0.7 ms
    of per-step copies at 256^2 on v5e). The train step instead CARRIES
    the transformed tree as donated state: this derive function rebuilds
    it from the (updated) compute-dtype params once per optimizer step in
    the update epilogue, and jax.vjp of it routes the transformed-kernel
    cotangents back onto the stored 4x4 parameters — the exact chain rule
    the inline autodiff applied, restructured so the hot convs read a
    stable buffer.

    Implementation: one apply() with mutable=['derived'] on a minimal
    dummy input; every transforming module records its transformed kernel
    (layers.derived_kernel) and XLA dead-code-eliminates the dummy conv
    work, leaving only the transforms. Returns None when the model has no
    transformed kernels.
    """
    depth = int(getattr(model, "depth", 8))
    side = 2 ** depth

    def derive(params):
        dummy = jnp.zeros((1, 1, side, side, 3), jnp.float32)
        _, out = model.apply({"params": params}, dummy, deterministic=True,
                             mutable=["derived"], **phase_kwargs)
        return out.get("derived", {}) or None

    return derive


def compute_cast(params, dtype):
    """bf16 'compute copies' of the master params: every >=2-D leaf (conv /
    dense kernels — 99.9% of the bytes) cast to `dtype`; 1-D leaves
    (biases, norm scales) stay f32, exactly as the flax modules would cast
    them per-use anyway. Carrying this tree across steps removes the
    per-step f32 param reads the in-step casts cost (~0.4 ms at 80M
    params on v5e)."""
    return jax.tree.map(
        lambda x: x.astype(dtype) if jnp.ndim(x) >= 2 else x, params)


def _relayout_best_effort(tree, formats):
    """Bring the leaves of `tree` to the target `formats` (layout AND
    sharding — the program's input_formats; the state may arrive
    unsharded and must land on the program's mesh like the layouts).

    Returns (new_tree, n_failed). Requested layouts are silently dropped
    for a subset of leaves by both jax.device_put(x, Format) and jitted
    identities on this stack — partly a dispatch-cache collision between
    jit calls sharing the same function object but different
    out_shardings (reproduced deterministically), partly layouts the
    transfer path simply refuses to materialize (reproduced: a
    bf16[4,4,128,9] conv kernel cannot be brought to the (1,3,0,2)
    major_to_minor the AUTO-layout program asks for, by any mechanism).
    Defense: whole-tree relayout from a FRESH lambda (its own cache
    identity), verify each leaf's resulting layout metadata, retry
    stragglers per-leaf (fresh lambda, then device_put), and REPORT
    what could not be applied — the caller falls back to recompiling the
    program against the layouts the state actually has."""
    if tree is None:
        return None, 0

    def ok(x, f):
        return (x.format.layout == f.layout
                and x.sharding.is_equivalent_to(f.sharding, x.ndim))

    out = jax.jit(lambda t: jax.lax.optimization_barrier(t),
                  out_shardings=formats)(tree)
    failed = [0]

    def fix(x, f):
        if ok(x, f):
            return x
        y = jax.jit(lambda v: jax.lax.optimization_barrier(v),
                    out_shardings=f)(x)
        if not ok(y, f):
            y = jax.device_put(x, f)
        if not ok(y, f):
            # The backend refused this layout. Worse, an array that went
            # through a refused relayout can be CORRUPT (metadata and
            # bytes disagree; executing with it raises InvalidArgument
            # deep in the backend) — rematerialize a clean default-layout
            # copy through the host (refused leaves are small conv
            # kernels; a one-time host round-trip is cheap) on the
            # required SHARDING and let the caller recompile against it.
            failed[0] += 1
            return jax.device_put(np.asarray(x), f.sharding)
        return y

    return jax.tree.map(fix, out, formats), failed[0]


class TrainStep:
    """Callable train step owning its compile strategy and (for bf16
    models) the carried compute-param tree.

    step(params, opt_state, raw_batch, key) -> (params, opt_state, loss) —
    the compute tree is internal state: derived from `params` on first
    call, donated through every step, and re-emitted by the step's fused
    Adam update (the f32 -> bf16 cast rides the update kernel's epilogue
    instead of re-reading the f32 masters each step). Gradients are taken
    wrt the bf16 compute tree, so weight-grads arrive in bf16 — standard
    mixed-precision training; the Adam moments stay f32.

    auto_layout: compile with `Format(Layout.AUTO)` on the donated state
    args. By default XLA assigns the jit-boundary layout to
    params/opt_state, then inserts per-step relayout copies for every conv
    kernel whose compute layout differs (~2.4 ms/step for the 256^2 U-Net
    on v5e); AUTO lets the compiler pick ONE layout, the state is
    re-laid-out once on the first call, and donation stays copy-free.
    """

    def __init__(self, jitted, compute_dtype=None, auto_layout=False,
                 compute_box=None, derive_fn=None, derived_box=None,
                 rebuild=None):
        self._jit = jitted
        self._compute_dtype = compute_dtype
        self._auto_layout = auto_layout
        self._compiled = None
        # AUTO-layout steps validate their first executed call (relayout
        # state into the compiler-chosen layouts, force the async error
        # barrier) even when aot_compile() already produced the executable.
        self._validated = not auto_layout
        # rebuild(state_formats) -> a fresh jit of the same step with the
        # state in/out shardings pinned to explicit Formats — the fallback
        # when the backend cannot materialize the AUTO program's layouts.
        self._rebuild = rebuild
        # The carried compute tree lives in a shared one-slot box so that
        # programs of different chunk sizes (the K-step scan program and
        # its remainder-chunk sibling) always see the CURRENT tree — a
        # per-program slot would go stale the moment the other program
        # stepped the params.
        self._compute_box = [None] if compute_box is None else compute_box
        # Same one-slot sharing for the carried transformed-kernel tree
        # (make_derive_fn). _derived_box[0] is 'unset' until first use,
        # then the tree or None (model has no transformed kernels).
        # _derived_box[1] tracks the params tree the carried state belongs
        # to (the first leaf of the params THIS step family last returned):
        # if a caller swaps params externally (fresh init, restored
        # checkpoint), the carried state is stale and is re-derived.
        self._derive_fn = derive_fn
        self._derived_box = (["unset", None] if derived_box is None
                             else derived_box)

    @property
    def state_formats(self):
        """(params, opt_state, compute, derived) input formats of the
        compiled program (available once compiled). A sibling program pins
        its own boundary to these so state never relayouts between
        programs."""
        if self._compiled is None:
            raise ValueError("step not compiled yet")
        return tuple(self._compiled.input_formats[0][:4])

    @property
    def compute_box(self):
        return self._compute_box

    @property
    def derived_box(self):
        return self._derived_box

    def _ensure_compute(self, params):
        if self._compute_dtype is not None and self._compute_box[0] is None:
            self._compute_box[0] = jax.jit(compute_cast, static_argnums=1)(
                params, self._compute_dtype)
        return self._compute_box[0]

    def _ensure_derived(self, params, compute):
        if self._derive_fn is None:
            return None
        if self._derived_box[0] == "unset":
            self._derived_box[0] = jax.jit(self._derive_fn)(
                params if compute is None else compute)
        return self._derived_box[0]

    def _state(self, params):
        leaves = jax.tree.leaves(params)
        first = leaves[0] if leaves else None
        if (self._derived_box[1] is not None
                and self._derived_box[1] is not first):
            # Params replaced outside the step family: drop carried state.
            self._compute_box[0] = None
            self._derived_box[0] = "unset"
            self._derived_box[1] = None
        c = self._ensure_compute(params)
        return c, self._ensure_derived(params, c)

    def _lower_args(self, params, opt_state, raw_batch, key):
        c, d = self._state(params)
        args = (params, opt_state, c, d, raw_batch, key)
        if self._auto_layout:
            # An AUTO-layout jit rejects concrete arrays (they carry a
            # committed layout that conflicts with the AUTO request);
            # lower through abstract shapes, as _compile_auto_layout does.
            args = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(jnp.shape(x), x.dtype), args)
        return args

    def lower(self, params, opt_state, raw_batch, key):
        return self._jit.lower(
            *self._lower_args(params, opt_state, raw_batch, key))

    def aot_compile(self, params, opt_state, raw_batch, key):
        """Compile without executing — multi-host runs sync a barrier
        between compilation and first collective execution (loop.py)."""
        self._compiled = self._jit.lower(
            *self._lower_args(params, opt_state, raw_batch, key)).compile()

    def _compile_auto_layout(self, params, opt_state, compute, derived,
                             raw_batch, key):
        """Compile (or exec-cache-load) the AUTO-layout program; sets
        self._compiled and returns the 4 state-arg input Layout trees.

        AUTO-layout lowering needs abstract args (concrete arrays carry a
        committed layout, which would conflict). The program is ALWAYS
        compiled fresh, never through JAX's persistent compilation cache:
        executables RESTORED from that cache carry unreliable
        custom-layout behavior on the tunneled TPU backend (measured with
        a warm /tmp/jax_cache: the restored program's input_formats
        disagree with the layouts the executable actually requires), and
        jax.experimental.serialize_executable round-trips fail outright at
        execution (InvalidArgument) — fresh compiles are the only
        trustworthy source of both the executable and its input formats.
        """
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(jnp.shape(x), x.dtype),
            (params, opt_state, compute, derived, raw_batch, key))
        lowered = self._jit.lower(*abstract)
        with _no_persistent_cache():
            self._compiled = lowered.compile()
        return self._compiled.input_formats[0][:4]

    def _rebuild_with_formats(self, state_formats, params, opt_state,
                              compute, derived, raw_batch, key):
        """Compile the step pinned to explicit state Formats (the layouts
        the state arrays actually hold) — see __call__'s fallback."""
        if self._rebuild is None:
            raise RuntimeError(
                "AUTO-layout relayout failed and this TrainStep has no "
                "rebuild closure to pin explicit state formats")
        jitted = self._rebuild(state_formats)
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(jnp.shape(x), x.dtype),
            (params, opt_state, compute, derived, raw_batch, key))
        return jitted.lower(*abstract).compile()

    def _first_call_auto(self, params, opt_state, compute, derived,
                         raw_batch, key):
        """First invocation of the AUTO-layout program, validated.

        Compiles with compiler-chosen state layouts, relayouts the state
        into them (see _relayout_best_effort for the backend's layout
        hazards), recompiles against the materialized layouts when the
        backend refuses some, then runs the first step and FORCES the
        async error barrier — this backend has been observed to
        intermittently break custom-layout execution entirely (an
        InvalidArgument surfacing only at the next host fetch), and the
        first call is the one place a failure can still be recovered: the
        caller falls back to default layouts with the pre-relayout state."""
        if self._compiled is not None:  # aot_compile already built it
            state_formats = self._compiled.input_formats[0][:4]
        else:
            state_formats = self._compile_auto_layout(
                params, opt_state, compute, derived, raw_batch, key)
        with _no_persistent_cache():
            failures = 0
            params, f = _relayout_best_effort(params, state_formats[0])
            failures += f
            opt_state, f = _relayout_best_effort(opt_state,
                                                 state_formats[1])
            failures += f
            compute, f = _relayout_best_effort(compute, state_formats[2])
            failures += f
            derived, f = _relayout_best_effort(derived, state_formats[3])
            failures += f
        if failures:
            # Some leaves cannot be materialized in the layouts the AUTO
            # program requires (backend refusal). Recompile the program
            # against the layouts the state ACTUALLY has: the inputs then
            # match by construction, XLA inserts in-program copies only
            # for the (small) divergent leaves, and donation stays exact
            # because in/out formats are equal.
            import warnings

            warnings.warn(
                f"AUTO-layout state relayout failed for {failures} "
                f"leaves; recompiling the train step against the "
                f"materialized layouts", stacklevel=2)
            actual = tuple(
                None if t is None else jax.tree.map(lambda x: x.format, t)
                for t in (params, opt_state, compute, derived))
            with _no_persistent_cache():
                self._compiled = self._rebuild_with_formats(
                    actual, params, opt_state, compute, derived,
                    raw_batch, key)
        out = self._compiled(params, opt_state, compute, derived,
                             raw_batch, key)
        jax.tree.map(np.asarray, out[-1])  # error barrier (host fetch)
        return out

    def __call__(self, params, opt_state, raw_batch, key):
        compute, derived = self._state(params)
        if self._auto_layout and not self._validated:
            try:
                out = self._first_call_auto(params, opt_state, compute,
                                            derived, raw_batch, key)
            except jax.errors.JaxRuntimeError as e:
                # The AUTO-layout program (or the relayout into it, or
                # even a compile carrying ANY explicit layout annotation)
                # is broken on this backend right now. The pre-relayout
                # state is untouched (relayouts copy); rebuild the step
                # with PLAIN shardings — no layout annotations anywhere —
                # measured cost on v5e: ~0.6 ms/step — and carry on.
                # Never silently: training at a known slower layout is an
                # operational fact worth a warning.
                import warnings

                warnings.warn(
                    f"AUTO-layout train step failed on this backend "
                    f"({type(e).__name__}: {e}); falling back to plain "
                    f"default layouts (~0.6 ms/step slower on v5e)",
                    stacklevel=2)
                self._compiled = self._rebuild_with_formats(
                    None, params, opt_state, compute, derived,
                    raw_batch, key)
                out = self._compiled(params, opt_state, compute, derived,
                                     raw_batch, key)
            self._validated = True
        else:
            fn = self._compiled if self._compiled is not None else self._jit
            out = fn(params, opt_state, compute, derived, raw_batch, key)
        params, opt_state, self._compute_box[0], self._derived_box[0], \
            loss = out
        out_leaves = jax.tree.leaves(params)
        self._derived_box[1] = out_leaves[0] if out_leaves else None
        return params, opt_state, loss


def _phase_kwargs(model, loss_fn):
    """Pick the space-to-depth output layout the loss can consume.

    Preferred: 'phase_planes' ((B, 48, h, w) — the fused mixed loss
    kernel grid-indexes the phase cell, so no interleave is materialized
    on the forward or backward path). Fallback: 'phase' (legacy
    (B, h, w, 4, 12)). Without support on either side, the spatial
    12-channel prediction is produced as usual."""
    if not getattr(loss_fn, "accepts_phase", False):
        return {}
    if (getattr(model, "supports_phase_planes_output", False)
            and getattr(loss_fn, "accepts_phase_planes", False)):
        return {"output_layout": "phase_planes"}
    if getattr(model, "supports_phase_output", False):
        return {"output_layout": "phase"}
    return {}


def make_train_step(model, optimizer: optax.GradientTransformation,
                    loss_fn: Callable, prep: PrepConfig,
                    mesh=None, donate: bool = True,
                    auto_layout: bool = None, scan_steps: int = 1,
                    state_formats=None, share_compute_with=None):
    """Build the train step (a TrainStep callable).

    step(params, opt_state, raw_batch, key) -> (params, opt_state, loss).
    raw_batch: {'inputs': (B, N, H, W, 3), 'svbrdf': (B, H, W, 12)
                [, 'partner_svbrdf': (B, H, W, 12)]} host-decoded strips.
    auto_layout (None = on for single-process TPU runs) removes XLA's
    per-step conv-kernel relayout copies (see TrainStep). bf16 models get
    carried bf16 compute copies of the f32 master params (compute_cast).

    scan_steps=K > 1 builds the multi-step program the device-cache
    trainer uses: ONE dispatch runs K optimizer steps via lax.scan —
    step(params, opt_state, raw_batches, (root_key, base_index)) ->
    (params, opt_state, losses (K,)). raw_batches leaves are stacked on a
    leading K axis; per-step keys are fold_in(root_key, base_index + j + 1)
    for j in [0, K), EXACTLY the single-step trainer's key stream, so the
    K-step program reproduces K sequential single-step calls. Amortizes
    the per-dispatch host latency (~1 ms/step through a tunneled chip).

    state_formats: pin the (params, opt_state, compute) boundary to
    another compiled program's formats (TrainStep.state_formats) instead
    of AUTO — sibling chunk-size programs then exchange state with zero
    relayout copies. share_compute_with: reuse that TrainStep's carried
    compute tree (one slot, never stale) when several programs step the
    same params."""

    phase_kwargs = _phase_kwargs(model, loss_fn)
    prep = _with_planes_target(prep, phase_kwargs)

    master_sr = (master_dtype_policy() == "bf16sr"
                 and getattr(model, "dtype", None) == jnp.bfloat16)
    # With bf16-SR masters the params ARE the compute tree (>=2-D leaves
    # bf16, 1-D leaves f32) — no carried copy, and the f32 master
    # read+write leaves the step entirely.
    compute_dtype = (jnp.bfloat16
                     if (getattr(model, "dtype", None) == jnp.bfloat16
                         and not master_sr)
                     else None)

    derive_fn = make_derive_fn(model, phase_kwargs)

    def one_step(params, opt_state, compute, derived, raw_batch, key):
        k_prep, k_drop, k_loss = jax.random.split(key, 3)
        batch = _cast_inputs(_prepare(k_prep, raw_batch, prep), model)

        target = batch.get("svbrdf_planes", batch["svbrdf"])

        # Differentiate wrt the bf16 compute tree when carried: the conv
        # weight-grads then arrive in bf16 and the f32 -> bf16 promotion
        # fuses into Adam's elementwise update (reads halve); without a
        # compute tree this is the plain f32 step.
        ct = params if compute is None else compute

        if derived is None:
            def loss_of(p):
                pred = model.apply({"params": p}, batch["inputs"],
                                   deterministic=False,
                                   rngs={"dropout": k_drop}, **phase_kwargs)
                return loss_fn(pred, target, k_loss)

            loss, grads = jax.value_and_grad(loss_of)(ct)
        else:
            # Carried transformed-kernel tree (make_derive_fn): the model
            # reads the transforms from the donated 'derived' buffers; the
            # chain rule back onto the stored 4x4 params is applied
            # explicitly — d/dp loss(p, derive(p)) = g_p + derive^T(g_d),
            # identical math to differentiating the inline transform.
            def loss_of(p, d):
                pred = model.apply({"params": p, "derived": d},
                                   batch["inputs"], deterministic=False,
                                   rngs={"dropout": k_drop}, **phase_kwargs)
                return loss_fn(pred, target, k_loss)

            loss, (g_p, g_d) = jax.value_and_grad(
                loss_of, argnums=(0, 1))(ct, derived)
            _, pull = jax.vjp(derive_fn, ct)
            g_extra, = pull(g_d)
            grads = jax.tree.map(jnp.add, g_p, g_extra)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        if master_sr:
            # p + u under STOCHASTIC rounding for the bf16 master leaves:
            # at lr=1e-5 the relative update (~1e-4) is far below bf16's
            # mantissa step (~4e-3), so round-to-nearest would drop nearly
            # every update; SR applies them in expectation (see
            # parallel/optimizer.py). Salt from the step key: decorrelated
            # across steps, deterministic per (seed, step).
            from svbrdf_tpu.parallel import optimizer as opt_lib

            salt = jax.random.randint(jax.random.fold_in(key, 17), (),
                                      0, 2 ** 31 - 1, jnp.int32)
            leaves, treedef = jax.tree.flatten(params)
            up_l = treedef.flatten_up_to(updates)
            new_l = []
            for i, (p, u) in enumerate(zip(leaves, up_l)):
                if p.dtype == jnp.bfloat16:
                    new_l.append(opt_lib.sr_bf16(
                        p.astype(jnp.float32) + u.astype(jnp.float32),
                        salt + jnp.int32(i)))
                else:
                    new_l.append(p + u.astype(p.dtype))
            new_params = treedef.unflatten(new_l)
        else:
            new_params = optax.apply_updates(params, updates)
        if compute is None:
            new_compute = None
        else:
            # Recompute p + u for the bf16 copy instead of casting
            # new_params: the duplicate add lets XLA multi-output-fuse the
            # cast into the SAME update fusion (a cast of new_params is a
            # consumer of another fusion's output and runs as its own
            # full-tensor pass — measured 0.75 ms at 80M params).
            new_compute = jax.tree.map(
                lambda p, u, c: ((p + u.astype(p.dtype)).astype(c.dtype)
                                 if c.dtype != p.dtype else p + u.astype(p.dtype)),
                params, updates, compute)
        # Refresh the carried transformed kernels from the UPDATED compute
        # params (write-only: the transforms are recomputed, not patched).
        new_derived = (None if derived is None else derive_fn(
            new_params if new_compute is None else new_compute))
        return new_params, new_opt_state, new_compute, new_derived, loss

    if scan_steps > 1:
        def step(params, opt_state, compute, derived, raw_batches, key_info):
            root_key, base_index = key_info

            def body(carry, xs):
                p, o, c, d = carry
                raw, j = xs
                key = jax.random.fold_in(root_key, base_index + j + 1)
                p, o, c, d, loss = one_step(p, o, c, d, raw, key)
                return (p, o, c, d), loss

            (params, opt_state, compute, derived), losses = jax.lax.scan(
                body, (params, opt_state, compute, derived),
                (raw_batches, jnp.arange(scan_steps, dtype=jnp.int32)))
            return params, opt_state, compute, derived, losses
    else:
        step = one_step

    donate_args = (0, 1, 2, 3) if donate else ()
    if auto_layout is None:
        auto_layout = (jax.default_backend() == "tpu"
                       and jax.process_count() == 1)
        if auto_layout:
            # The backend's custom-layout support is intermittently broken
            # at the service level, and a failed AUTO-layout attempt
            # poisons the whole client session (even plain compiles start
            # failing) — so probe health in a throwaway subprocess BEFORE
            # committing to AUTO (utils/layout_probe.py).
            from svbrdf_tpu.utils.layout_probe import custom_layouts_healthy

            auto_layout = custom_layouts_healthy()
    compute_box = (share_compute_with.compute_box
                   if share_compute_with is not None else None)
    derived_box = (share_compute_with.derived_box
                   if share_compute_with is not None else None)

    def wrap(jitted, auto=False, rebuild=None):
        return TrainStep(jitted, compute_dtype, auto_layout=auto,
                         compute_box=compute_box, derive_fn=derive_fn,
                         derived_box=derived_box, rebuild=rebuild)

    if mesh is None:
        if state_formats is not None:
            fp, fo, fc, fd = state_formats
            jitted = jax.jit(
                step, in_shardings=(fp, fo, fc, fd, None, None),
                out_shardings=(fp, fo, fc, fd, None),
                donate_argnums=donate_args)
            return wrap(jitted)
        if auto_layout:
            from jax.experimental.layout import Format, Layout

            auto = Format(Layout.AUTO)
            jitted = jax.jit(
                step, in_shardings=(auto, auto, auto, auto, None, None),
                out_shardings=(auto, auto, auto, auto, None),
                donate_argnums=donate_args)

            def rebuild(fmts):
                # fmts=None: plain default-layout jit (the safe fallback
                # when the backend rejects ALL custom-layout programs).
                if fmts is None:
                    return jax.jit(step, donate_argnums=donate_args)
                fp, fo, fc, fd = fmts
                return jax.jit(
                    step, in_shardings=(fp, fo, fc, fd, None, None),
                    out_shardings=(fp, fo, fc, fd, None),
                    donate_argnums=donate_args)

            return wrap(jitted, auto=True, rebuild=rebuild)
        return wrap(jax.jit(step, donate_argnums=donate_args))

    repl = mesh_lib.replicated_sharding(mesh)
    data = (mesh_lib.stacked_batch_sharding(mesh) if scan_steps > 1
            else mesh_lib.batch_sharding(mesh))
    if state_formats is not None:
        fp, fo, fc, fd = state_formats
        jitted = jax.jit(step,
                         in_shardings=(fp, fo, fc, fd, data, repl),
                         out_shardings=(fp, fo, fc, fd, repl),
                         donate_argnums=donate_args)
        return wrap(jitted)
    if auto_layout:
        from jax.experimental.layout import Format, Layout

        auto = Format(Layout.AUTO, repl)
        jitted = jax.jit(step,
                         in_shardings=(auto, auto, auto, auto, data, repl),
                         out_shardings=(auto, auto, auto, auto, repl),
                         donate_argnums=donate_args)

        def rebuild(fmts):
            # fmts=None: plain replicated-sharding jit (the safe fallback
            # when the backend rejects ALL custom-layout programs).
            if fmts is None:
                fp = fo = fc = fd = repl
            else:
                fp, fo, fc, fd = fmts
            return jax.jit(step,
                           in_shardings=(fp, fo, fc, fd, data, repl),
                           out_shardings=(fp, fo, fc, fd, repl),
                           donate_argnums=donate_args)

        return wrap(jitted, auto=True, rebuild=rebuild)
    return wrap(jax.jit(
        step,
        in_shardings=(repl, repl, repl, repl, data, repl),
        out_shardings=(repl, repl, repl, repl, repl),
        donate_argnums=donate_args,
    ))


def make_eval_step(model, loss_fn: Callable, prep: PrepConfig, mesh=None):
    """Validation step: deterministic model, same loss. Reference main.py:129-147."""

    phase_kwargs = _phase_kwargs(model, loss_fn)
    prep = _with_planes_target(prep, phase_kwargs)

    def step(params, raw_batch, key):
        k_prep, k_loss = jax.random.split(key)
        batch = _cast_inputs(_prepare(k_prep, raw_batch, prep), model)
        pred = model.apply({"params": params}, batch["inputs"],
                           deterministic=True, **phase_kwargs)
        return loss_fn(pred, batch.get("svbrdf_planes", batch["svbrdf"]),
                       k_loss)

    if mesh is None:
        return jax.jit(step)
    repl = mesh_lib.replicated_sharding(mesh)
    data = mesh_lib.batch_sharding(mesh)
    return jax.jit(step, in_shardings=(repl, data, repl),
                   out_shardings=repl)


def make_predict_fn(model, mesh=None):
    """Inference: images -> SVBRDF maps (deterministic)."""

    def predict(params, images):
        return model.apply({"params": params}, images, deterministic=True)

    if mesh is None:
        return jax.jit(predict)
    repl = mesh_lib.replicated_sharding(mesh)
    data = mesh_lib.batch_sharding(mesh)
    return jax.jit(predict, in_shardings=(repl, data), out_shardings=data)
