"""Production inference: AOT compilation, batch padding, export.

The reference has no serving story (its eval path re-enters the python
forward per batch, modules pinned to one device). TPU-native serving
means: compile the forward ONCE ahead of time for a fixed batch shape
(`jax.jit(...).lower(...).compile()` — no tracing or compile on the
request path), pad ragged request batches to that shape, optionally run
the whole graph in bfloat16, and ship a self-contained StableHLO
artifact (`jax.export`) that reloads without the model code.

Works for any architecture in the zoo: static-GSO models (forward =
``arch(params, x)``) and the time-varying DB family (forward =
``arch.apply(params, x, S)``, including EllGso graph inputs — pytrees
pad leaf-wise).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["InferenceEngine", "export_model", "load_exported"]


def _pad_leaf(a, B):
    n = a.shape[0]
    if n == B:
        return jnp.asarray(a)
    assert n < B, f"batch {n} exceeds compiled batch size {B}"
    widths = [(0, B - n)] + [(0, 0)] * (a.ndim - 1)
    return jnp.pad(jnp.asarray(a), widths)


def _cast_floats(tree, dtype):
    if dtype is None:
        return tree

    def cast(a):
        if isinstance(a, (jnp.ndarray, np.ndarray)) and \
                jnp.issubdtype(a.dtype, jnp.floating):
            return jnp.asarray(a, dtype)
        return a

    return jax.tree_util.tree_map(cast, tree)


def _forward_fn(archit, dtype=None):
    """Raw traced forward (no host-side f32 coercion — bf16 stays bf16):
    core.apply with the static ctx when the architecture has one, the
    (x, S) contract for the DB family otherwise."""
    core = getattr(archit, "core", None)
    ctx = getattr(archit, "ctx", None)
    if core is not None and ctx is not None:
        ctx = _cast_floats(ctx, dtype)
        return lambda p, *args: core.apply(p, *args, ctx)[0]
    if core is not None:
        return lambda p, *args: core.apply(p, *args)[0]
    return lambda p, *args: archit.apply(p, *args)


class InferenceEngine:
    """Fixed-shape AOT-compiled forward for serving.

    archit: any architecture (uses ``archit.apply``); params: trained
    pytree; example_args: ONE example of the forward's (batched) arg
    tuple, e.g. ``(x,)`` or ``(x, S)`` — shapes/dtypes (after optional
    `dtype` cast and batch-padding to `batch_size`) fix the compiled
    program. Ragged request batches are padded up and the output
    sliced back; nothing traces or compiles after construction.

    dtype=jnp.bfloat16 runs params and float inputs in bf16 (MXU-native)
    and returns f32 outputs.
    """

    def __init__(self, archit, params, example_args: Sequence[Any],
                 batch_size: Optional[int] = None,
                 dtype: Optional[Any] = None):
        first = jax.tree_util.tree_leaves(example_args[0])[0]
        self.batch_size = int(first.shape[0] if batch_size is None
                              else batch_size)
        self.dtype = dtype
        B = self.batch_size
        params = _cast_floats(jax.tree_util.tree_map(jnp.asarray, params),
                              dtype)
        self._params = jax.device_put(params)
        raw = _forward_fn(archit, dtype)

        def fwd(p, *args):
            y = raw(p, *args)
            return jax.tree_util.tree_map(
                lambda a: a.astype(jnp.float32)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, y)

        padded = tuple(
            jax.tree_util.tree_map(lambda a: _pad_leaf(a, B), arg)
            for arg in _cast_floats(tuple(example_args), dtype))
        specs = jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), padded)
        p_spec = jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(jnp.asarray(a).shape,
                                           jnp.asarray(a).dtype),
            self._params)
        self._jitted = jax.jit(fwd)
        self._lowered = self._jitted.lower(p_spec, *specs)
        self._compiled = self._lowered.compile()

    # -- request path --------------------------------------------------------
    def __call__(self, *args):
        first = jax.tree_util.tree_leaves(args[0])[0]
        n = first.shape[0]
        B = self.batch_size
        padded = tuple(
            jax.tree_util.tree_map(lambda a: _pad_leaf(a, B), arg)
            for arg in _cast_floats(tuple(args), self.dtype))
        y = self._compiled(self._params, *padded)
        return jax.tree_util.tree_map(lambda a: a[:n], y)

    # -- introspection -------------------------------------------------------
    def cost_analysis(self):
        """XLA's FLOP/byte estimate for one compiled batch."""
        c = self._compiled.cost_analysis()
        return c[0] if isinstance(c, (list, tuple)) else c

    def memory_analysis(self):
        return self._compiled.memory_analysis()

    def flops_per_sample(self) -> float:
        c = self.cost_analysis() or {}
        return float(c.get("flops", float("nan"))) / self.batch_size


def export_model(archit, params, example_args: Sequence[Any],
                 path: Optional[str] = None,
                 dtype: Optional[Any] = None) -> bytes:
    """Serialize the forward as a self-contained StableHLO artifact
    (weights baked in as constants) via ``jax.export``. Reloads with
    ``load_exported`` — no model code or params file needed."""
    from jax import export as jexport
    params = _cast_floats(jax.tree_util.tree_map(jnp.asarray, params),
                          dtype)
    example_args = _cast_floats(
        jax.tree_util.tree_map(jnp.asarray, tuple(example_args)), dtype)
    raw = _forward_fn(archit, dtype)

    def fwd(*args):
        y = raw(params, *args)
        return jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float32)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, y)

    specs = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(jnp.asarray(a).shape,
                                       jnp.asarray(a).dtype),
        example_args)
    exported = jexport.export(jax.jit(fwd))(*specs)
    blob = exported.serialize()
    if path is not None:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def load_exported(path_or_bytes):
    """Load an ``export_model`` artifact; returns a callable forward."""
    from jax import export as jexport
    blob = path_or_bytes
    if isinstance(blob, str):
        with open(blob, "rb") as f:
            blob = f.read()
    exported = jexport.deserialize(blob)
    return lambda *args: exported.call(*args)
