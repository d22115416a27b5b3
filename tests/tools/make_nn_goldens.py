"""Freeze NN-layer goldens from the reference torch implementation
(``HexFrames.py`` runs on CPU torch).  Run where /root/reference exists::

    python tests/tools/make_nn_goldens.py
"""
import os
import sys

import numpy as np

REF = "/root/reference/HyGrid"
OUT = os.path.join(os.path.dirname(__file__), "..", "goldens")

CONV_CONFIGS = [
    # (radius, stride, padding, dilation, groups, offset, bias)
    (1, 1, 0, 1, 1, 0, True),
    (2, 1, 0, 1, 1, 0, True),
    (2, 1, 1, 1, 1, 0, False),
    (2, 2, 0, 1, 1, 0, True),
    (2, 1, 2, 1, 1, 1, True),
    (3, 1, 2, 1, 1, 1, True),
    (2, 1, 0, 2, 1, 0, True),
    (2, 2, 1, 1, 2, 0, True),
    (3, 2, 3, 2, 1, 1, False),
    (4, 1, 3, 1, 1, 0, True),
]

POOL_CONFIGS = [
    # (method, kernel, stride, padding, offset, ceil, count_include_pad)
    ("max", 2, 2, 0, 0, False, True),
    ("average", 2, 2, 0, 0, False, True),
    ("min", 3, 2, 0, 0, False, True),
    ("max", 2, 2, 1, 0, False, True),
    ("max", 2, 2, 0, 0, True, True),
    ("average", 3, 3, 0, 0, True, False),
    ("average", 2, 2, 2, 1, False, True),
]

ADAPTIVE_CONV_CONFIGS = [
    # (radius, stride, padding, dilation, offset)
    (2, 1, 0, 1, 0),
    (2, 2, 0, 1, 0),
    (3, 2, 1, 1, 1),
]


def main():
    sys.path.insert(0, REF)
    import torch
    import HexFrames as ref

    torch.manual_seed(0)
    rng = np.random.default_rng(42)
    data = {}

    x = rng.random((2, 4, 15, 13)).astype(np.float32)
    data["conv_x"] = x
    for n, (r, s, p, d, g, off, bias) in enumerate(CONV_CONFIGS):
        cin, cout = 4, 6
        m = ref.HexConv2d(cin, cout, off, r, stride=s, padding=p,
                          dilation=d, groups=g, bias=bias)
        with torch.no_grad():
            out = m(torch.tensor(x)).numpy()
        data[f"conv{n}_kernel"] = m.kernel.detach().numpy()
        if bias:
            data[f"conv{n}_bias"] = m.bias.detach().numpy()
        data[f"conv{n}_out"] = out

    px = rng.random((2, 3, 14, 12)).astype(np.float32)
    data["pool_x"] = px
    for n, (meth, k, s, p, off, ceil, cip) in enumerate(POOL_CONFIGS):
        m = ref.HexPool2d(meth, kernel_size=k, stride=s, padding=p,
                          even_odd_offset=off, ceil_mode=ceil,
                          count_include_pad=cip)
        with torch.no_grad():
            data[f"pool{n}_out"] = m(torch.tensor(px)).numpy()

    for n, (r, s, p, d, off) in enumerate(ADAPTIVE_CONV_CONFIGS):
        m = ref.HexConv2dAdaptivePadding(4, 6, off, r, stride=s, padding=p,
                                         dilation=d)
        with torch.no_grad():
            out = m(torch.tensor(x)).numpy()
        data[f"aconv{n}_kernel"] = m.kernel.detach().numpy()
        data[f"aconv{n}_bias"] = m.bias.detach().numpy()
        data[f"aconv{n}_out"] = out

    os.makedirs(OUT, exist_ok=True)
    np.savez_compressed(os.path.join(OUT, "nn_goldens.npz"), **data)
    print("wrote", os.path.join(OUT, "nn_goldens.npz"))


if __name__ == "__main__":
    main()
