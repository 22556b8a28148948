"""Inference / serving path.

The reference has no serve or export story (SURVEY.md §3.5 — inference exists
only as in-loop eval).  Here:

* ``make_predict_fn`` — a jit'd eval-mode callable (logits / probs / labels).
* ``cache_hoisted_operators`` — frozen-params serving optimization: pin the
  hoisted ADI layers' sweep inverse operators as constants so batched AMP
  serving stops paying the per-request operator precompute (the reason AMP
  lost at batch 1, PERF.md §serving).
* ``export_model`` / ``load_exported`` — ahead-of-time serialization via
  jax.export (StableHLO): the exported artifact reloads and runs without the
  model-building Python code, the TPU-native analogue of torchscript/ONNX.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .nn.core import Ctx

__all__ = ["make_predict_fn", "cache_hoisted_operators",
           "clear_operator_cache", "linearize_pde_layers",
           "clear_linear_cache", "select_linearize_grade",
           "export_model", "load_exported"]

# Measured serving frontier (PERF.md §linearized-int8,
# §serving-batch-frontier, one-process chained A/Bs on v5e): int8 W8A8 wins
# from batch ~256 up (its dynamic activation-quant pass amortizes; keeps
# climbing to the bs-1024 champion while bf16 declines past 512); below
# that bf16 matrices are at-or-better everywhere measured (bs-1 int8 is
# -32% vs bf16), and for small-D presets (mnist/fashion D=784: matrices a
# few MB) every grade is within noise, so the traffic-halving bf16 default
# stands.  f32 is the exact-numerics grade — explicitly requested only.
_INT8_MIN_BATCH = 256
_SMALL_FEATURE_DIM = 2048


def select_linearize_grade(batch_size, feature_dim=None):
    """Storage dtype for ``linearize_pde_layers`` from the measured serving
    frontier (table above): int8 for ``batch_size >= 256`` on large-D
    models, bf16 otherwise.  ``feature_dim`` is the linearized D = C·H·W
    (small-D models stay bf16 at every batch size — their matrices are too
    small for quantization to pay).  Used by ``--linearize auto``."""
    if feature_dim is not None and feature_dim < _SMALL_FEATURE_DIM:
        return jnp.bfloat16
    if batch_size >= _INT8_MIN_BATCH:
        return jnp.int8
    return jnp.bfloat16


def _pinned_caches(model):
    """[(layer, attr)] for every pinned frozen-params serving cache."""
    from .pde.amp import iter_adi_layers
    from .pde.linearize import iter_linear_pde_layers

    pins = [(lay, "linear_cache") for lay in iter_linear_pde_layers(model)
            if getattr(lay, "linear_cache", None) is not None]
    pins += [(lay, "operator_cache") for lay in iter_adi_layers(model)
             if getattr(lay, "operator_cache", None) is not None]
    return pins


def make_predict_fn(model, params, state, output="logits", mesh=None,
                    bind="args", buckets=None):
    """output: 'logits' | 'probs' | 'labels'.

    ``buckets``: optional ascending batch sizes to pad requests to (last
    row repeated; padded outputs sliced off).  XLA compiles one executable
    per SHAPE, so arbitrary client batch sizes mean one compile each —
    with buckets a handful of executables serve every size (requests above
    the largest bucket run unpadded).  Under ``mesh``, every bucket must
    be divisible by the 'data' axis size.

    ``mesh``: optional ``jax.sharding.Mesh`` with a 'data' axis — batched
    data-parallel serving: the request batch is sharded over 'data', params
    replicated, outputs sharded; XLA runs each shard's forward on its own
    chip with no collectives (inference has no gradient all-reduce).  The
    batch size must be divisible by the 'data' axis size.

    ``bind``: how weights (params/state and any pinned linear/operator
    caches) enter the jitted graph.  'args' (default) passes them as jit
    ARGUMENTS — measured faster than closure constants on TPU for the
    linearized path (flagship bs 64: 0.093 vs 0.140 ms/batch, and bf16
    matrices recover their small-batch traffic win only as arguments —
    PERF.md §linearized, tools/ab_serve_args.py); 'const' embeds them as
    jaxpr constants (the pre-round-2 behavior, kept for A/B)."""
    pins = _pinned_caches(model)
    caches = [getattr(lay, attr) for lay, attr in pins]

    def bucketize(call):
        if not buckets:
            return call
        bs = sorted(int(b) for b in buckets)

        def wrapped(images):
            n = int(images.shape[0])
            target = next((b for b in bs if b >= n), None)
            if target is None or target == n:
                return call(images)
            pad = jnp.broadcast_to(images[-1:],
                                   (target - n,) + tuple(images.shape[1:]))
            return call(jnp.concatenate([jnp.asarray(images), pad]))[:n]

        return wrapped

    def forward(p, s, cs, images):
        saved = [getattr(lay, attr) for lay, attr in pins]
        try:
            for (lay, attr), c in zip(pins, cs):
                setattr(lay, attr, c)  # tracers during trace
            logits, _ = model.apply(p, s, images, Ctx(train=False))
        finally:
            for (lay, attr), c0 in zip(pins, saved):
                setattr(lay, attr, c0)
        if output == "probs":
            return jax.nn.softmax(logits, axis=-1)
        if output == "labels":
            return jnp.argmax(logits, axis=-1)
        return logits

    if mesh is None:
        batch_s = rep_s = None
    else:
        from .parallel.mesh import dp_shardings

        batch_s, rep_s = dp_shardings(mesh)

    if bind == "const":
        impl = lambda images: forward(params, state, caches, images)
        if mesh is None:
            return bucketize(jax.jit(impl))
        return bucketize(jax.jit(impl, in_shardings=(batch_s,),
                                 out_shardings=batch_s))
    if bind != "args":
        raise ValueError(f"bind must be 'args' or 'const', got {bind!r}")

    if mesh is None:
        jitted = jax.jit(forward)
    else:
        # weights keep their own committed shardings (replicated under DP,
        # column/row-sharded under TP — tp_serving test); only the request
        # batch and outputs are constrained
        jitted = jax.jit(forward,
                         in_shardings=(None, None, None, batch_s),
                         out_shardings=batch_s)
    fn = bucketize(lambda images: jitted(params, state, caches, images))
    # expose the unbound forward + weight pytree so callers embedding the
    # predict inside an OUTER jit (e.g. a chained steady-state loop) can
    # thread the weights through their own boundary as arguments — closing
    # over `fn` would re-constify them there
    fn.forward = forward
    fn.argtree = (params, state, caches)
    return fn


def cache_hoisted_operators(model, params, state, sample_images):
    """Precompute and PIN the sweep inverse operators of every hoisted ADI
    layer in ``model``, for serving with frozen params.

    The hoisted layers normally compute their operators in-graph from params
    (so training stays correct); at serving time params never change, so the
    operators are constants the per-request graph keeps recomputing — the
    fixed cost that made AMP lose batch-1 serving (PERF.md §serving).  This
    runs ONE jitted probe forward (operators are batch-free — a batch-1
    sample suffices), materializes each layer's operators, and pins them on
    the layer as ``operator_cache``; predict functions built afterwards
    embed them as jaxpr constants.

    Training with a cache pinned raises (the cache carries no gradient path
    and goes stale when params change) — ``clear_operator_cache`` undoes it.
    Returns the number of layers cached."""
    from .pde.amp import iter_adi_layers
    from .pde.diffusion import capture_operators

    hoisted = [l for l in iter_adi_layers(model)
               if getattr(l, "hoisted", False)]
    if not hoisted:
        return 0

    with capture_operators() as cap:
        @jax.jit
        def probe(p, s, x):
            model.apply(p, s, x, Ctx(train=False))
            # cap is populated at trace time; returning the tracers
            # materializes the operators as concrete arrays, in layer order
            return [xs for _, xs in cap]

        concrete = probe(params, state, sample_images[:1])
    for (lay, _), xs in zip(cap, concrete):
        lay.operator_cache = xs
    return len(cap)


def linearize_pde_layers(model, params, state, sample_images, max_dim=4096,
                         precision=None, dtype=None, serve_batch_size=None):
    """Frozen-params serving: collapse each linear PDE layer's ENTIRE
    multi-step evolution into one composed (D, D) matrix, D = C·H·W.

    Every PDE front-end layer here is linear in u (pde/linearize.py
    docstring — clamps/sigmoids act on params, never activations), so with
    frozen params the whole sequential sweep chain is one matmul.  The
    matrix is built by evolving the identity basis through the layer's own
    forward (every variant quirk baked in by construction); layers with
    D > max_dim are left sequential (e.g. Tiny-ImageNet's 64·64·3 = 12288
    would be a 604 MB matrix for a front-end that costs ~0.3 ms).

    ``precision``: lax precision for the serving matmul (None = DEFAULT =
    bf16-pass MXU, the same AMP serving grade as ``enable_amp``;
    'highest' for f32-exact passes).  Numerics vs the sequential path:
    ~1e-5 relative f32 reassociation at HIGHEST, bf16 scale at DEFAULT.

    ``dtype``: storage dtype for the pinned matrices.  ``jnp.bfloat16``
    halves the per-request matrix HBM traffic — the dominant small-batch
    cost (the flagship's three 3072² f32 matrices are 113 MB) — applying
    with bf16 operands and f32 accumulation; composition stays f32.
    ``'int8'`` (or ``jnp.int8``) quantizes to W8A8: per-output-column
    int8 weights + dynamic per-row activation quantization, int32 MXU
    accumulation (quarter the f32 matrix traffic, 2x the bf16 MXU rate;
    ~0.5% relative output error — pde/linearize.py::QuantizedMatrix).

    ``dtype='auto'`` picks the grade from the measured batch frontier via
    ``select_linearize_grade(serve_batch_size, D)`` — pass
    ``serve_batch_size`` (the batch the server will actually run, e.g. the
    largest shape bucket); it defaults to the sample batch size.  D is
    taken from the sample (C·H·W).

    Composes with ``cache_hoisted_operators``: if operator caches are
    pinned, the composed matrix bakes in their (possibly bf16) numerics.
    Training with a pinned ``linear_cache`` raises —
    ``clear_linear_cache`` undoes it.  Returns the number of layers
    linearized."""
    from .pde.linearize import capture_linearized

    if isinstance(dtype, str) and dtype == "auto":
        import numpy as np

        dtype = select_linearize_grade(
            serve_batch_size if serve_batch_size is not None
            else int(sample_images.shape[0]),
            feature_dim=int(np.prod(sample_images.shape[1:])))

    with capture_linearized(max_dim=max_dim) as cap:
        @jax.jit
        def probe(p, s, x):
            model.apply(p, s, x, Ctx(train=False))
            # cap is populated at trace time; returning the tracers
            # materializes the matrices as concrete arrays, in layer order
            return [m for _, m in cap.items]

        concrete = probe(params, state, sample_images[:1])
    quantize = dtype is not None and jnp.dtype(dtype) == jnp.int8
    if quantize:
        from .pde.linearize import quantize_int8
    for (lay, _), m in zip(cap.items, concrete):
        if quantize:
            lay.linear_cache = quantize_int8(m)
        else:
            lay.linear_cache = m if dtype is None else m.astype(dtype)
        lay.linear_precision = precision
    return len(cap.items)


def clear_linear_cache(model):
    """Unpin matrices cached by linearize_pde_layers (e.g. to resume
    training).  Returns the number of layers cleared."""
    from .pde.linearize import iter_linear_pde_layers

    n = 0
    for lay in iter_linear_pde_layers(model):
        if getattr(lay, "linear_cache", None) is not None:
            lay.linear_cache = None
            n += 1
    return n


def clear_operator_cache(model):
    """Unpin operators cached by cache_hoisted_operators (e.g. to resume
    training).  Returns the number of layers cleared."""
    from .pde.amp import iter_adi_layers

    n = 0
    for lay in iter_adi_layers(model):
        if getattr(lay, "operator_cache", None) is not None:
            lay.operator_cache = None
            n += 1
    return n


def export_model(model, params, state, sample_images, path=None):
    """Serialize an eval-mode forward to StableHLO bytes (optionally to a
    file).  The artifact embeds the weights."""
    from jax import export as jexport

    def fwd(images):
        logits, _ = model.apply(params, state, images, Ctx(train=False))
        return logits

    exported = jexport.export(jax.jit(fwd))(
        jax.ShapeDtypeStruct(sample_images.shape, sample_images.dtype))
    blob = exported.serialize()
    if path is not None:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def load_exported(path_or_bytes):
    """Reload an exported model; returns a callable(images) -> logits."""
    from jax import export as jexport

    if isinstance(path_or_bytes, (bytes, bytearray)):
        blob = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            blob = f.read()
    exported = jexport.deserialize(blob)
    return lambda images: exported.call(images)


if __name__ == "__main__":  # python -m cnn_pde_tpu.serve
    from .serve_cli import main

    main()
