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


def main(use_mesh: bool = False, n_train: int = 512, n_eval: int = 128,
         num_epochs: int = 5, batch_size: int = 64):
    from hygrid_tpu.models import fit, hexcnn_tiny, synthetic_hex_cifar
    from hygrid_tpu import parallel

    rng = np.random.default_rng(0)
    x, y = synthetic_hex_cifar(rng, n_train)
    xe, ye = synthetic_hex_cifar(rng, n_eval)
    batches = [(np.asarray(x[i:i + batch_size]), np.asarray(y[i:i + batch_size]))
               for i in range(0, n_train, batch_size)]
    eval_batches = [(np.asarray(xe), np.asarray(ye))]

    mesh = None
    if use_mesh:
        n = len(jax.devices())
        mesh = parallel.create_mesh({"dp": n})
        print(f"training data-parallel over {n} devices")

    model = hexcnn_tiny(norm="GN")
    state, hist = fit(model, batches, num_epochs=num_epochs,
                      eval_data=eval_batches, mesh=mesh, log_every=4,
                      learning_rate=3e-3)
    print("final train loss:", hist["loss"][-1])
    print("eval accuracy per epoch:", [round(a, 3)
                                       for a in hist["eval_accuracy"]])
    return hist


if __name__ == "__main__":
    main("--mesh" in sys.argv)
