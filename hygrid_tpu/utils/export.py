"""AOT model export for serving (beyond reference parity).

The reference has no deployment story beyond pickled images — its models
live inside a running torch process.  Here a trained hex model exports to
a **self-contained serialized artifact** via ``jax.export``: the traced
StableHLO module with the parameters baked in as constants.  A server
loads the artifact and runs inference with *no model code, no flax, no
parameter files* — just ``hygrid_tpu.utils.export.load_exported(path)``
and a batch of images.

Properties:

- **Self-contained**: ``close_over`` pytrees (params, plan tables) are
  captured as module constants; the artifact is one file.
- **Symbolic batch** (``symbolic_batch=True``): the leading axis of every
  example input is exported as a symbolic dimension, so one artifact
  serves any batch size.  Spatial dims stay concrete — resample plans are
  trace-time data-dependent (``ops/sampling.py``) and hex kernels tile on
  them.
- **Cross-platform lowering** (``platforms=("tpu", "cpu")``): one
  artifact runs on both; note Pallas fast paths are TPU-lowered, so
  export compute paths that the target platform supports (the library's
  ``auto`` routing is trace-time — it bakes the route of the *exporting*
  process; XLA routes run everywhere, Mosaic custom-calls only on TPU).

Round-trip: ``export_fn`` -> ``save_exported`` -> ``load_exported`` ->
call.  ``load_exported`` returns a jit-compatible callable.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from jax import export as jexport

__all__ = ["export_fn", "export_inference", "save_exported",
           "load_exported", "exported_info"]


def _specs(example_args, symbolic_batch: bool):
    """ShapeDtypeStructs for the example pytree, optionally with the
    leading axis of every array replaced by one shared symbolic dim."""
    leaves, treedef = jax.tree_util.tree_flatten(example_args)
    if not symbolic_batch:
        specs = [jax.ShapeDtypeStruct(jnp.shape(l), jnp.asarray(l).dtype)
                 for l in leaves]
        return jax.tree_util.tree_unflatten(treedef, specs)
    batches = {jnp.shape(l)[0] for l in leaves}
    if len(batches) != 1:
        raise ValueError(
            f"symbolic_batch requires one shared leading dim; got {batches}")
    (b,) = jexport.symbolic_shape("b")
    specs = [jax.ShapeDtypeStruct((b,) + tuple(jnp.shape(l)[1:]),
                                  jnp.asarray(l).dtype)
             for l in leaves]
    return jax.tree_util.tree_unflatten(treedef, specs)


def export_fn(fn: Callable, example_args: Sequence[Any], *,
              close_over: Any = None,
              symbolic_batch: bool = False,
              platforms: Optional[Sequence[str]] = None) -> jexport.Exported:
    """Export ``fn(close_over, *example_args)`` (or ``fn(*example_args)``
    when ``close_over`` is None) as a serializable AOT artifact.

    ``close_over`` (e.g. a params pytree) is captured by value — it
    becomes constants inside the exported module.  ``example_args`` fix
    the input shapes/dtypes (leading axis symbolic when
    ``symbolic_batch``).  ``platforms`` defaults to the exporting
    process's default backend.
    """
    if close_over is not None:
        const = jax.tree_util.tree_map(jnp.asarray, close_over)
        wrapped = functools.partial(fn, const)
    else:
        wrapped = fn
    specs = _specs(tuple(example_args), symbolic_batch)
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(p.lower() for p in platforms)
    return jexport.export(jax.jit(wrapped), **kwargs)(*specs)


def export_inference(model, params, example_input, *,
                     hexify: bool = True,
                     symbolic_batch: bool = False,
                     platforms: Optional[Sequence[str]] = None,
                     **apply_kwargs) -> jexport.Exported:
    """Export a flax hex model's inference path, params baked in.

    ``example_input`` is a rect image batch ``(B, C, H, W)`` when
    ``hexify`` (the artifact embeds the rect->hex resample plan — callers
    feed plain camera/file pixels), else an already-hex batch.
    """
    from ..models.train import hexify_batch

    def infer(p, x):
        if hexify:
            x = hexify_batch(x)
        return model.apply(p, x, **apply_kwargs)

    return export_fn(infer, (example_input,), close_over=params,
                     symbolic_batch=symbolic_batch, platforms=platforms)


def save_exported(path: str, exported: jexport.Exported) -> None:
    """Serialize an :func:`export_fn` artifact to one file."""
    data = exported.serialize()
    with open(path, "wb") as f:
        f.write(data)


def load_exported(path: str) -> Callable:
    """Load a :func:`save_exported` artifact as a jit-compatible callable.

    Needs only jax at load time — no model code, no flax, no params.
    """
    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())
    return exported.call


def exported_info(path: str) -> dict:
    """Inspect an artifact: input signature, platforms, output shapes."""
    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())
    return {
        "platforms": list(exported.platforms),
        "in_avals": [str(a) for a in exported.in_avals],
        "out_avals": [str(a) for a in exported.out_avals],
        "nr_devices": exported.nr_devices,
    }
