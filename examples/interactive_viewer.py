"""Interactive viewer: the reference's live GLFW loop
(``HexPixelArt/window.py:46-123``) as (a) a scripted event session and
(b) a LIVE browser-served view.

    python examples/interactive_viewer.py [output_dir]     # scripted -> GIF
    python examples/interactive_viewer.py --serve [port]   # live viewer

``--serve`` starts ``Window.serve``: an MJPEG stream at
http://127.0.0.1:<port>/ where WASD/arrows pan, the mouse wheel zooms,
mouse-drag pans and +/- steps the mosaic hierarchy — the same bindings and
deltas as the reference's GLFW callbacks, re-rendered live by the
jit-compiled mosaic kernel.

The scripted mode replays a pan / zoom / hierarchy session through the
same key bindings and writes an animated GIF plus a contact sheet,
demonstrating the interactive capability headlessly.
"""
import os
import sys

import numpy as np

if os.environ.get("JAX_PLATFORMS"):
    import jax
    jax.config.update("jax_platforms",
                      os.environ["JAX_PLATFORMS"].split(",")[0])


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


# one scripted session: settle, pan east, zoom in, drag back, coarsen
SESSION = (
    [None] * 2
    + ["d"] * 6 + ["w"] * 4                 # WASD pan
    + ["scroll_up"] * 3                     # zoom in (clamped 1.1 steps)
    + [("drag", (300, 200), (230, 240))]    # mouse drag pan
    + ["scroll_down"] * 2
    + ["+"] + [None] * 2                    # hierarchy: coarser mosaic
    + ["-"] + [None] * 2                    # ... and back
)


def main(out_dir="demo_out", size=420):
    import hygrid_tpu as hg
    from hygrid_tpu.viz import Window, Texture

    os.makedirs(out_dir, exist_ok=True)
    img = load_demo_image()
    hexed = np.asarray(hg.rect_to_hex_resample(img, (128, 128), "bilinear"))

    win = Window(size, size, "hygrid viewer session")
    tex = Texture(imgarr=hexed)

    frames = []
    for ev in SESSION:
        if isinstance(ev, tuple) and ev[0] == "drag":
            win.drag(ev[1], ev[2])
        elif ev is not None:
            win.key_event(ev)
        frames.append(win.render_texture(tex))
    print(f"rendered {len(frames)} frames at {size}x{size}")

    from PIL import Image
    pil_frames = [Image.fromarray(f.transpose(1, 2, 0)) for f in frames]
    gif = os.path.join(out_dir, "viewer_session.gif")
    pil_frames[0].save(gif, save_all=True, append_images=pil_frames[1:],
                       duration=120, loop=0)

    # contact sheet: every 4th frame in a row
    picks = frames[::4][:6]
    sheet = np.concatenate(picks, axis=2).transpose(1, 2, 0)
    Image.fromarray(sheet).save(os.path.join(out_dir, "viewer_sheet.png"))
    print(f"wrote {gif} and viewer_sheet.png")
    return frames


def serve(port="8142", size=560):
    import hygrid_tpu as hg
    from hygrid_tpu.viz import Window, Texture

    img = load_demo_image()
    hexed = np.asarray(hg.rect_to_hex_resample(img, (128, 128), "bilinear"))
    win = Window(int(size), int(size), "hygrid live viewer")
    win.serve(Texture(imgarr=hexed), port=int(port), block=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--serve":
        serve(*sys.argv[2:])
    else:
        main(*sys.argv[1:])
