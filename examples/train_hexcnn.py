"""Training demo: HexCNN classifier on synthetic hex-CIFAR, optionally over
a device mesh.

    python examples/train_hexcnn.py            # single device
    python examples/train_hexcnn.py --mesh     # data-parallel over all devices
"""
import logging
import sys

import numpy as np
import jax

logging.basicConfig(level=logging.INFO)


def main(use_mesh: bool = False):
    from hygrid_tpu.models import fit, hexcnn_tiny, synthetic_hex_cifar
    from hygrid_tpu import parallel

    rng = np.random.default_rng(0)
    x, y = synthetic_hex_cifar(rng, 512)
    xe, ye = synthetic_hex_cifar(rng, 128)
    batches = [(np.asarray(x[i:i + 64]), np.asarray(y[i:i + 64]))
               for i in range(0, 512, 64)]
    eval_batches = [(np.asarray(xe), np.asarray(ye))]

    mesh = None
    if use_mesh:
        n = len(jax.devices())
        mesh = parallel.create_mesh({"dp": n})
        print(f"training data-parallel over {n} devices")

    model = hexcnn_tiny(norm="GN")
    state, hist = fit(model, batches, num_epochs=5, eval_data=eval_batches,
                      mesh=mesh, log_every=4, learning_rate=3e-3)
    print("final train loss:", hist["loss"][-1])
    print("eval accuracy per epoch:", [round(a, 3)
                                       for a in hist["eval_accuracy"]])


if __name__ == "__main__":
    main("--mesh" in sys.argv)
