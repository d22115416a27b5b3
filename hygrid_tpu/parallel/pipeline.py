"""Pipeline parallelism: GPipe-style microbatched stage pipeline over ICI.

The reference has no multi-device story at all (SURVEY.md section 2.4); this
module fills the pipeline-parallel slot the TPU-native way: stages are laid
out over a ``"pp"`` mesh axis, activations hop stage-to-stage with a ring
``jax.lax.ppermute`` (neighbour ICI traffic only), and the whole schedule is
one ``jax.lax.scan`` under ``shard_map`` — a single compiled SPMD program,
differentiable end-to-end, no host round trips between ticks.

Schedule: classic GPipe fill-drain.  With S stages and M microbatches the
scan runs T = M + S - 1 ticks; each device computes its stage on every tick
(idle ticks compute on placeholder data whose results are never consumed),
so the bubble fraction is (S - 1) / T.  Increase ``microbatches`` to
amortise it.

Constraints (inherent to SPMD collective pipelining, not this code):
* every stage must map activations of one fixed shape/dtype to the same
  shape/dtype (true for the framework's 'same' hex-conv stacks);
* stage parameters must be a pytree whose leaves carry a leading
  ``num_stages`` axis (see :func:`stack_stage_params`).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ..nn import functional as F

__all__ = ["stack_stage_params", "pipeline_apply", "pipeline_hex_conv_stack"]


def _to_varying(x, axis_name):
    """Mark ``x`` as device-varying over ``axis_name`` under shard_map's
    check_vma.  ``jax.lax.pvary`` is deprecated in favour of
    ``jax.lax.pcast(..., to='varying')``; support both jax generations."""
    pcast = getattr(jax.lax, "pcast", None)
    if pcast is not None:
        return pcast(x, axis_name, to="varying")
    return jax.lax.pvary(x, (axis_name,))  # pragma: no cover - older jax


def stack_stage_params(stage_params_list):
    """Stack a list of per-stage param pytrees into one pytree whose leaves
    have a leading ``num_stages`` axis (the axis :func:`pipeline_apply`
    shards over ``pp``)."""
    return jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves), *stage_params_list)


def pipeline_apply(stage_fn: Callable[[Any, jax.Array], jax.Array],
                   stage_params, x, mesh: Mesh, *, microbatches: int,
                   axis_name: str = "pp"):
    """Run ``x`` through ``num_stages`` sequential stages pipelined over the
    ``axis_name`` mesh axis.

    ``stage_fn(params_for_one_stage, microbatch) -> microbatch`` is the
    per-stage computation; ``stage_params`` leaves have leading dim equal to
    ``mesh.shape[axis_name]``.  ``x`` is the global batch ``(B, ...)``;
    it is split into ``microbatches`` equal microbatches.  Returns the
    equivalent of ``stage_fn(p[S-1], ... stage_fn(p[0], x))``, replicated
    over the pipeline axis.

    Differentiable (the schedule is a ``lax.scan``; ``ppermute`` and the
    final ``psum`` transpose cleanly), so it composes with ``jax.grad`` for
    pipeline-parallel training.
    """
    S = mesh.shape[axis_name]
    B = x.shape[0]
    M = int(microbatches)
    if M < 1 or B % M:
        raise ValueError(f"batch {B} must split into {M} equal microbatches")
    if M < S:
        raise ValueError(f"need microbatches >= stages ({S}); got {M}")
    mb = B // M
    x_mb = x.reshape((M, mb) + x.shape[1:])
    ring = [(i, (i + 1) % S) for i in range(S)]

    def body(params, xm):
        # shard_map hands each device a (1, ...)-leading slice of the stacked
        # params: drop the slice axis to get this stage's own params.
        params = jax.tree_util.tree_map(lambda a: a[0], params)
        idx = jax.lax.axis_index(axis_name)
        T = M + S - 1

        def tick(carry, t):
            feed = jnp.minimum(t, M - 1)          # clamp drain-phase reads
            inp = jnp.where(idx == 0, xm[feed], carry)
            y = stage_fn(params, inp)
            nxt = jax.lax.ppermute(y, axis_name, ring)
            return nxt, y

        carry0 = _to_varying(jnp.zeros_like(xm[0]), axis_name)
        _, ys = jax.lax.scan(tick, carry0, jnp.arange(T))
        # The last stage emits microbatch m at tick m + S - 1; earlier ticks
        # (its fill phase) and other stages' outputs are never consumed.
        out = ys[S - 1:]                          # (M, mb, ...)
        out = jnp.where(idx == S - 1, out, jnp.zeros_like(out))
        return jax.lax.psum(out, axis_name)      # replicate the real result

    pspec = jax.tree_util.tree_map(
        lambda a: P(*((axis_name,) + (None,) * (a.ndim - 1))), stage_params)
    out = shard_map(
        body, mesh=mesh,
        in_specs=(pspec, P()), out_specs=P())(stage_params, x_mb)
    return out.reshape((B,) + out.shape[2:])


def pipeline_hex_conv_stack(x, kernels, mesh: Mesh, *, radius: int,
                            even_odd_offset: int = 0,
                            microbatches: int | None = None,
                            axis_name: str = "pp",
                            activation: Callable | None = None):
    """Pipeline a uniform-width 'same' hex-conv stack over the ``pp`` axis.

    ``kernels``: array ``(L, C, C, kernelnum)`` — L layers, equal in/out
    channels (the shape the flagship north-star stack uses).  L must divide
    into ``mesh.shape[axis_name]`` equal stages.  Each stage applies its
    L/S layers sequentially (optionally interleaved with ``activation``);
    activations hop stages over ICI.

    Numerically equivalent (tested) to applying the L convs sequentially
    with ``hex_conv2d(..., padding=radius-1)`` on one device.
    """
    if even_odd_offset:
        # every framework op outputs offset 0 (CLAUDE.md convention), so a
        # uniform per-layer stage scan is only correct for offset-0 input
        raise ValueError("pipeline_hex_conv_stack requires even_odd_offset=0 "
                         "(all framework ops output offset 0)")
    kernels = jnp.asarray(kernels)
    L = kernels.shape[0]
    S = mesh.shape[axis_name]
    if L % S:
        raise ValueError(
            f"stage count {S} must divide the layer count {L}")
    per = L // S
    if microbatches is None:
        # GPipe bubble is (S-1)/(M+S-1): aim for M ~ 4S (<~20% bubble)
        # while keeping microbatches as large as possible (MXU batching);
        # among divisors of B that are >= S, take the one nearest 4S
        B = x.shape[0]
        divs = [m for m in range(1, B + 1) if B % m == 0 and m >= S]
        if not divs:
            raise ValueError(
                f"batch {B} has no divisor >= the {S} pipeline stages; "
                "pass microbatches= explicitly or pad the batch")
        microbatches = min(divs, key=lambda m: (abs(m - 4 * S), m))
    stage_k = kernels.reshape((S, per) + kernels.shape[1:])

    def stage_fn(ks, xm):
        def layer(h, k):
            h = F.hex_conv2d(h, k, even_odd_offset=even_odd_offset,
                             radius=radius, padding=radius - 1)
            if activation is not None:
                h = activation(h)
            return h, None
        out, _ = jax.lax.scan(layer, xm, ks)
        return out

    return pipeline_apply(stage_fn, stage_k, x, mesh,
                          microbatches=microbatches, axis_name=axis_name)
