"""Freeze goldens for the archived-ops tier by exec'ing the reference's
``codes in old versions.txt`` in a torch namespace (the archive is not an
importable module).  Run where /root/reference exists."""
import os
import sys

import numpy as np


def load_archive_namespace():
    import math
    import torch
    import torch.nn as nn
    import torch.nn.functional as TF
    from torch import Tensor
    from torch.nn import init
    sys.path.insert(0, "/root/reference/HyGrid")
    import HexFrames as HF
    ns = dict(torch=torch, nn=nn, F=TF, np=np, math=math, Tensor=Tensor,
              init=init, pad=HF.pad, heximage_to_type1=HF.heximage_to_type1,
              type1_to_heximage=HF.type1_to_heximage,
              max_pooling=HF.max_pooling, min_pooling=HF.min_pooling,
              average_pooling=HF.average_pooling)
    src = open("/root/reference/HyGrid/codes in old versions.txt").read()
    exec(compile(src, "archive", "exec"), ns)
    return ns


def main():
    import torch
    ns = load_archive_namespace()
    rng = np.random.default_rng(7)
    data = {}

    x = rng.random((2, 3, 10, 8)).astype(np.float32)
    data["x"] = x

    for n, (off, s) in enumerate([(1, 1), (0, 1), (1, 2), (0, 2)]):
        m = ns["HexConvTranspose2d"](3, 4, off, 2, stride=s, bias=False)
        with torch.no_grad():
            data[f"convT{n}_out"] = m(torch.tensor(x)).numpy()
        data[f"convT{n}_kernel"] = m.kernel.detach().numpy()

    for n, u in enumerate([2, 3]):
        xs = rng.random((1, 4 * u * u, 6, 5)).astype(np.float32)
        data[f"ps{n}_x"] = xs
        m = ns["HexPixelShuffle"](u)
        with torch.no_grad():
            data[f"ps{n}_out"] = m(torch.tensor(xs)).numpy()

    for n, off in enumerate([0, 1]):
        m = ns["Hex_to_Square_Conv2d_by_Double_Stride"](3, off,
                                                        downsample_factor=2)
        with torch.no_grad():
            data[f"h2s{n}_out"] = m(torch.tensor(x)).numpy()
        data[f"h2s{n}_kernel"] = m.kernel.detach().numpy()

    xs = rng.random((1, 3, 10, 11)).astype(np.float32)
    data["s2h_x"] = xs
    m = ns["Square_to_Hex_Conv2d_by_Double_Stride"](3, 2)
    with torch.no_grad():
        data["s2h_out"] = m(torch.tensor(xs)).numpy()
    data["s2h_kernel"] = m.kernel.detach().numpy()

    m = ns["Hex_to_Square_original_resolution"](3, 0)
    xo = rng.random((1, 3, 8, 7)).astype(np.float32)
    data["h2so_x"] = xo
    with torch.no_grad():
        data["h2so_out"] = m(torch.tensor(xo)).numpy()

    m = ns["Quadtree_HexPooling"]("max")
    xq = rng.random((1, 2, 12, 9)).astype(np.float32)
    data["quad_x"] = xq
    with torch.no_grad():
        data["quad_out"] = m(torch.tensor(xq), 0).numpy()

    m = ns["im2col_HexConv2d"](2, 3, 0, 2, bias=False)
    xi = rng.random((1, 2, 9, 9)).astype(np.float32)
    data["im2col_x"] = xi
    data["im2col_weight"] = m.weight.detach().numpy()
    with torch.no_grad():
        data["im2col_out"] = m(torch.tensor(xi)).numpy()

    out = os.path.join(os.path.dirname(__file__), "..", "goldens")
    os.makedirs(out, exist_ok=True)
    np.savez_compressed(os.path.join(out, "experimental_goldens.npz"), **data)
    print("wrote experimental_goldens.npz")


if __name__ == "__main__":
    main()
