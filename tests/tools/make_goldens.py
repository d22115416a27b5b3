"""Regenerate golden parity files from the reference implementation.

Run only where the reference snapshot is mounted (``/root/reference``)::

    python tests/tools/make_goldens.py

The goldens freeze the reference's *working* code paths as the executable
spec (SURVEY.md section 4 item 1).  Paths that are broken in the reference
(hex-source 'nearest' tuple-unpack bug, numba ``hexresize``, torch CPU warp)
have no goldens and are covered by the independent oracle instead.
"""
import os
import sys

import numpy as np

REF = "/root/reference/HyGrid"
OUT = os.path.join(os.path.dirname(__file__), "..", "goldens")


def main():
    sys.path.insert(0, REF)
    import geometry_np as ref

    rng = np.random.default_rng(1234)
    data = {}

    img = rng.random((3, 17, 13))
    data["img_a"] = img
    data["r2h_nearest"] = ref.rect_to_hex_resample(img, (9, 15), "nearest")
    data["r2h_bilinear"] = ref.rect_to_hex_resample(img, (9, 15), "bilinear")
    data["resize_linear"] = ref.hexresize(img, (23, 11), "linear")
    data["h2r_linear"] = ref.hex_to_rect_resample(img, (14, 19), "linear")

    H = np.array([[1.6, 0.0, 0.0], [0.0, 0.7, 0.0], [0.0, 0.0, 1.0]])
    data["warp_H"] = H
    data["warp_linear"] = ref.image_geometric_transformation(img, H, "linear")

    Hr = np.array([[0.9, 0.3, 1.0], [-0.2, 1.1, -2.0], [0.0, 0.0, 1.0]])
    data["warp_Hr"] = Hr
    data["warp_rot_linear"] = ref.image_geometric_transformation(img, Hr, "linear")

    # NOTE: the reference's rect_to_hex_resample cannot take 2-D input at all
    # (sets c=1 but never expands dims before the [1,2,0] transpose,
    # geometry_np.py:365-389) — no golden; covered by a consistency test.

    imgu8 = (rng.random((3, 17, 13)) * 255).astype(np.uint8)
    data["img_u8"] = imgu8
    data["r2h_u8_nearest"] = ref.rect_to_hex_resample(imgu8, (9, 15), "nearest")

    os.makedirs(OUT, exist_ok=True)
    np.savez_compressed(os.path.join(OUT, "geometry_goldens.npz"), **data)
    print("wrote", os.path.join(OUT, "geometry_goldens.npz"))


if __name__ == "__main__":
    main()
