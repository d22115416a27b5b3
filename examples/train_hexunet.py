"""Dense-prediction demo: HexUNet segmenting noisy shape scenes on the hex
lattice — the in-framework proof of the reference's mmsegmentation ambition
(its layers exist to be consumed by segmentation configs, ``HexModules.py:16``,
but the experiment code was withheld).

    python examples/train_hexunet.py                 # short single-device run
    python examples/train_hexunet.py --mesh          # data-parallel over all
        visible devices (8 virtual CPU devices under the test conftest)
    python examples/train_hexunet.py --convergence   # full run: trains to
        >= 0.85 eval mIoU on the 8-device dp mesh and writes the loss/mIoU
        curves plus a prediction panel to docs/assets/hexunet_training.png

Task: rect scenes of noisy colored disks/squares/diamonds are hexified
(images through the bilinear plan, labels through the bit-exact nearest
path); HexUNet predicts a class per hex cell; the metric is mean IoU.
"""
import logging
import os
import sys

import numpy as np

if os.environ.get("JAX_PLATFORMS"):
    import jax
    jax.config.update("jax_platforms",
                      os.environ["JAX_PLATFORMS"].split(",")[0])
import jax
import jax.numpy as jnp

logging.basicConfig(level=logging.INFO)

NUM_CLASSES = 4


def run(n_train=192, n_eval=48, num_epochs=8, batch_size=16,
        widths=(16, 32), use_mesh=False, target_miou=None, curve_path=None,
        learning_rate=3e-3, seed=0):
    from hygrid_tpu.models import (HexUNet, synthetic_hex_shapes, mean_iou,
                                   create_train_state, train_step)
    from hygrid_tpu import parallel

    rng = np.random.default_rng(seed)
    x, y = synthetic_hex_shapes(rng, n_train)
    xe, ye = synthetic_hex_shapes(rng, n_eval)

    model = HexUNet(num_classes=NUM_CLASSES, widths=widths, norm="GN")
    state = create_train_state(model, jax.random.key(seed), x[:1],
                               learning_rate=learning_rate)

    mesh = None
    if use_mesh:
        mesh = parallel.create_mesh({"dp": len(jax.devices())})
        from hygrid_tpu.parallel import shard_batch, replicate
        state = state.replace(params=replicate(state.params, mesh),
                              opt_state=replicate(state.opt_state, mesh))

    step = jax.jit(train_step)
    apply = jax.jit(lambda p, v: model.apply({"params": p}, v))
    history = {"loss": [], "miou": []}
    for epoch in range(num_epochs):
        perm = rng.permutation(len(x))
        losses = []
        for i in range(0, len(x) - batch_size + 1, batch_size):
            sel = perm[i:i + batch_size]
            bx, by = x[sel], y[sel]
            if mesh is not None:
                from hygrid_tpu.parallel import shard_batch
                bx, by = shard_batch(bx, mesh), shard_batch(by, mesh)
            state, met = step(state, bx, by)
            losses.append(float(met["loss"]))
        miou = float(mean_iou(apply(state.params, xe), ye, NUM_CLASSES))
        history["loss"].append(float(np.mean(losses)))
        history["miou"].append(miou)
        logging.info("epoch %d  loss %.3f  eval mIoU %.3f",
                     epoch, history["loss"][-1], miou)
        if target_miou and miou >= target_miou and epoch >= 6:
            break

    if curve_path:
        _write_curves(curve_path, history, model, state, xe, ye)
    return state, history, model, (xe, ye)


def _write_curves(path, history, model, state, xe, ye):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from hygrid_tpu.models import mean_iou

    os.makedirs(os.path.dirname(path), exist_ok=True)
    fig, axes = plt.subplots(1, 4, figsize=(16, 3.6))
    ep = np.arange(len(history["loss"]))
    axes[0].plot(ep, history["loss"], "-o", ms=3)
    axes[0].set_title("train loss")
    axes[0].set_xlabel("epoch")
    axes[1].plot(ep, history["miou"], "-o", ms=3, color="tab:green")
    axes[1].axhline(0.85, color="gray", ls="--", lw=1)
    axes[1].set_title(f"eval mIoU (final {history['miou'][-1]:.3f})")
    axes[1].set_xlabel("epoch")
    logits = model.apply({"params": state.params}, xe[:1])
    pred = np.asarray(jnp.argmax(logits, 1))[0]
    axes[2].imshow(np.asarray(ye[0]), vmin=0, vmax=3, cmap="viridis")
    axes[2].set_title("truth (hex cells)")
    axes[3].imshow(pred, vmin=0, vmax=3, cmap="viridis")
    axes[3].set_title("prediction")
    for a in axes[2:]:
        a.set_xticks([])
        a.set_yticks([])
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    logging.info("wrote %s", path)


def main(argv):
    use_mesh = "--mesh" in argv or "--convergence" in argv
    if "--convergence" in argv:
        state, hist, *_ = run(
            n_train=256, n_eval=64, num_epochs=20, use_mesh=use_mesh,
            target_miou=0.85,
            curve_path=os.path.join(os.path.dirname(__file__), "..",
                                    "docs", "assets",
                                    "hexunet_training.png"))
        final = hist["miou"][-1]
        print(f"final eval mIoU: {final:.3f} "
              f"({'PASS' if final >= 0.85 else 'BELOW TARGET'} vs 0.85)")
    else:
        _, hist, *_ = run(num_epochs=4, use_mesh=use_mesh)
        print(f"eval mIoU after {len(hist['miou'])} epochs: "
              f"{hist['miou'][-1]:.3f}")


if __name__ == "__main__":
    main(sys.argv[1:])
