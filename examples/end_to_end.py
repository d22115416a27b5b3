"""End-to-end demo: the full hybrid-grid workflow in one script.

    python examples/end_to_end.py [output_dir]

Loads (or synthesises) an RGB image, hexifies it, filters on the hex
lattice, warps it, renders a true hexagon mosaic, round-trips through the
``.heximg`` container and the type-1 packed raster, and reports timings.
Runs on CPU or TPU unchanged.
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def load_demo_image():
    try:
        from PIL import Image
        import matplotlib
        path = os.path.join(os.path.dirname(matplotlib.__file__),
                            "mpl-data", "sample_data", "grace_hopper.jpg")
        im = Image.open(path).resize((256, 256))
        return np.asarray(im).transpose(2, 0, 1).astype(np.float32)
    except Exception:
        yy, xx = np.mgrid[0:256, 0:256] / 256
        return np.stack([np.sin(8 * xx), np.cos(6 * yy),
                         np.sin(5 * (xx + yy))]).astype(np.float32) * 127 + 128


def main(out_dir="demo_out"):
    os.makedirs(out_dir, exist_ok=True)
    import hygrid_tpu as hg
    from hygrid_tpu.nn import filters
    from hygrid_tpu.viz import render_mosaic
    from hygrid_tpu.image import HEXIMAGE, codecs

    img = load_demo_image()
    print(f"input: {img.shape} on {jax.default_backend()}")

    t0 = time.perf_counter()
    hexed = hg.rect_to_hex_resample(img, (128, 128), "bilinear")
    blurred = filters.hex_gaussian_blur(jnp.asarray(hexed)[None])[0]
    edges = filters.hex_edge_detect(jnp.asarray(hexed)[None])[0]
    warped = hg.image_geometric_transformation(
        np.asarray(hexed), np.array([[1.2, 0.25, 0], [-0.25, 1.2, 0],
                                     [0, 0, 1.0]]), "linear")
    back = hg.hex_to_rect_resample(np.asarray(blurred), (256, 256), "linear")
    jax.block_until_ready(back)
    print(f"hexify+filter+warp+back: {time.perf_counter() - t0:.3f}s "
          "(includes compilation)")

    # true hexagon mosaic render
    frame = np.asarray(render_mosaic(jnp.asarray(hexed), (768, 768)))
    codecs.write_raster(os.path.join(out_dir, "mosaic.png"),
                        np.clip(frame, 0, 255).astype(np.uint8))

    # container + packed-raster round trips
    him = HEXIMAGE(data=np.asarray(hexed))
    him.SaveHexImage(os.path.join(out_dir, "image.heximg"))
    him.SaveHexImage(os.path.join(out_dir, "type1.png"), imagetype=1)
    again = HEXIMAGE(os.path.join(out_dir, "image.heximg"))
    assert np.allclose(again.HexagonImage, np.asarray(hexed))

    codecs.write_raster(os.path.join(out_dir, "roundtrip.png"),
                        np.clip(np.asarray(back), 0, 255).astype(np.uint8))
    codecs.write_raster(os.path.join(out_dir, "edges.png"),
                        np.clip(np.abs(np.asarray(edges)) * 4, 0,
                                255).astype(np.uint8))
    print(f"wrote {out_dir}/: mosaic.png type1.png image.heximg "
          "roundtrip.png edges.png")


if __name__ == "__main__":
    main(*sys.argv[1:])
