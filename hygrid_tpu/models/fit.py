"""High-level training loop (``fit``) with mesh-aware data parallelism.

The reference ships no trainer (experiments withheld, ``README.md:4-5``);
this is the batteries-included loop: jitted steps, optional device mesh
(batch sharded over "dp"), metric aggregation, periodic eval, checkpointing.
"""
from __future__ import annotations

import time
from typing import Callable, Iterable, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .train import TrainState, create_train_state, train_step, eval_step
from ..utils.profiling import get_logger

__all__ = ["fit"]


def fit(model, train_data: Iterable[Tuple], *, rng=None,
        num_epochs: int = 1, eval_data: Optional[Iterable[Tuple]] = None,
        tx=None, learning_rate: float = 1e-3, mesh=None,
        state: Optional[TrainState] = None,
        checkpoint_path: Optional[str] = None,
        log_every: int = 50) -> Tuple[TrainState, dict]:
    """Train ``model`` over (images, labels) batches.

    Args:
        train_data: iterable (re-iterable per epoch) of (images, labels);
            images (B, C, H, W) hex storage.
        mesh: optional ``jax.sharding.Mesh`` with a "dp" axis — batches are
            sharded over it, parameters replicated.
        state: resume from an existing TrainState instead of initialising.

    Returns ``(final_state, history)`` where history maps metric name to a
    list of per-log values.
    """
    logger = get_logger()
    rng = rng if rng is not None else jax.random.key(0)
    data_iter = iter(train_data)
    first = next(data_iter)
    images0, labels0 = first
    if state is None:
        state = create_train_state(model, rng, jnp.asarray(images0[:1]),
                                   tx=tx, learning_rate=learning_rate)

    shard = None
    if mesh is not None:
        from ..parallel import shard_batch, replicate, batch_spec, P
        from jax.sharding import NamedSharding
        state = state.replace(
            params=replicate(state.params, mesh),
            opt_state=replicate(state.opt_state, mesh),
            batch_stats=(replicate(state.batch_stats, mesh)
                         if state.batch_stats is not None else None))

        def shard(images, labels):
            return (shard_batch(jnp.asarray(images), mesh),
                    jax.device_put(jnp.asarray(labels),
                                   NamedSharding(mesh, P("dp"))))

    step_fn = jax.jit(train_step)
    eval_fn = jax.jit(eval_step)
    history: dict = {"loss": [], "accuracy": [], "eval_loss": [],
                     "eval_accuracy": []}

    def batches():
        yield first
        yield from data_iter

    global_step = 0
    metrics = None
    t0 = time.perf_counter()
    for epoch in range(num_epochs):
        it = batches() if epoch == 0 else iter(train_data)
        steps_this_epoch = 0
        for images, labels in it:
            if shard is not None:
                images, labels = shard(images, labels)
            else:
                images, labels = jnp.asarray(images), jnp.asarray(labels)
            state, metrics = step_fn(state, images, labels)
            global_step += 1
            steps_this_epoch += 1
            if global_step % log_every == 0:
                loss = float(metrics["loss"])
                acc = float(metrics["accuracy"])
                history["loss"].append(loss)
                history["accuracy"].append(acc)
                logger.info("step %d epoch %d loss %.4f acc %.3f (%.1f s)",
                            global_step, epoch, loss, acc,
                            time.perf_counter() - t0)
        if steps_this_epoch and global_step % log_every != 0 \
                and metrics is not None:
            # record the epoch's final step so short runs (fewer than
            # log_every steps) still produce a history; epochs that ran
            # zero steps (exhausted generator) must not re-append stale
            # metrics
            history["loss"].append(float(metrics["loss"]))
            history["accuracy"].append(float(metrics["accuracy"]))
        if not steps_this_epoch and epoch > 0:
            logger.warning(
                "epoch %d yielded no batches — train_data must be "
                "re-iterable for multi-epoch fit()", epoch)
        if eval_data is not None:
            agg = []
            for images, labels in eval_data:
                if shard is not None:
                    images, labels = shard(images, labels)
                m = eval_fn(state, jnp.asarray(images), jnp.asarray(labels))
                agg.append((float(m["loss"]), float(m["accuracy"])))
            el = float(np.mean([a for a, _ in agg]))
            ea = float(np.mean([b for _, b in agg]))
            history["eval_loss"].append(el)
            history["eval_accuracy"].append(ea)
            logger.info("epoch %d eval loss %.4f acc %.3f", epoch, el, ea)
        if checkpoint_path is not None:
            from ..utils.checkpoint import save_checkpoint
            save_checkpoint(f"{checkpoint_path}_e{epoch}.npz", state.params)
    return state, history
