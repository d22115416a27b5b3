"""HexUNet: dense-prediction (segmentation) model family on the hex lattice.

The reference targets segmentation through external mmsegmentation configs
(registry hook at ``HexModules.py:16``) and archives the pieces a decoder
needs — ``HexConvTranspose2d`` and ``HexPixelShuffle``
(``codes in old versions.txt:68-274``).  This model wires those archived
ops together with the production conv/pool stack into a working encoder/
decoder, so dense prediction is available in-framework.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..nn.modules import HexConvModule
from ..nn import functional as F
from ..nn import experimental as E

__all__ = ["HexUNet", "HexConvTranspose2d", "HexPixelShuffleUpsample"]


class HexConvTranspose2d(nn.Module):
    """Flax wrapper over the archived transposed hex conv
    (``codes in old versions.txt:129-274``)."""

    in_channels: int
    out_channels: int
    even_odd_offset: int
    hexkernel_radius: int
    stride: int = 1
    groups: int = 1
    use_bias: bool = False
    param_dtype: jnp.dtype = jnp.float32
    dtype: jnp.dtype = None     # compute dtype; None = the input's
    data_format: str = "NCHW"

    @nn.compact
    def __call__(self, x):
        kn = F.hex_kernel_num(self.hexkernel_radius)
        fan_in = (self.in_channels // self.groups) * kn
        bound = 1.0 / (fan_in ** 0.5)
        kernel = self.param(
            "kernel",
            lambda key, shape, dtype: jax.random.uniform(
                key, shape, dtype, -bound, bound),
            (self.out_channels, self.in_channels // self.groups, kn),
            self.param_dtype)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.out_channels,), self.param_dtype)
                if self.use_bias else None)
        # cast params DOWN to the compute dtype: the executor computes in
        # kernel.dtype, so f32 master params silently upcast a bf16 input
        # and run the whole tconv at f32 (measured 2.55 vs 1.09 ms on the
        # UNet up1 leg, PERF.md round 4)
        cdt = self.dtype or x.dtype
        kernel = kernel.astype(cdt)
        if bias is not None:
            bias = bias.astype(cdt)
        return E.hex_conv_transpose2d(
            x, kernel, bias, even_odd_offset=self.even_odd_offset,
            radius=self.hexkernel_radius, stride=self.stride,
            groups=self.groups, data_format=self.data_format)


class HexPixelShuffleUpsample(nn.Module):
    """1x1-expand + hex pixel shuffle (archived ``HexPixelShuffle``,
    ``codes in old versions.txt:68-126``)."""

    channels: int
    factor: int = 2
    param_dtype: jnp.dtype = jnp.float32
    dtype: jnp.dtype = None     # compute dtype; None = the input's

    @nn.compact
    def __call__(self, x):
        expand = nn.Dense(self.channels * self.factor ** 2,
                          param_dtype=self.param_dtype,
                          dtype=self.dtype or x.dtype)
        x = jnp.moveaxis(expand(jnp.moveaxis(x, 1, -1)), -1, 1)
        return E.hex_pixel_shuffle(x, self.factor)


def _crop_or_pad_to(x, target_hw, nhwc: bool = False):
    th, tw = target_hw
    ha, wa = (1, 2) if nhwc else (2, 3)
    h, w = x.shape[ha], x.shape[wa]
    sl = [slice(None)] * 4
    sl[ha], sl[wa] = slice(0, min(h, th)), slice(0, min(w, tw))
    x = x[tuple(sl)]
    ph, pw = th - x.shape[ha], tw - x.shape[wa]
    if ph or pw:
        pads = [(0, 0)] * 4
        pads[ha], pads[wa] = (0, ph), (0, pw)
        x = jnp.pad(x, pads)
    return x


class HexUNet(nn.Module):
    """Encoder/decoder over the hex lattice with skip connections.

    Encoder: conv(+norm)(+ReLU) stages + stride-2 hex max-pool.
    Decoder: HexConvTranspose2d (or pixel-shuffle) upsampling + skip concat.
    Output: per-cell class logits at input hex resolution.

    With ``norm`` in (``"GN"``, ``None``) and ``use_stack=True`` (default)
    each conv stage runs as one :class:`~hygrid_tpu.nn.layers.HexConvStack`
    — the whole conv->GN->ReLU chain on the packed-domain Pallas kernel
    (VERDICT r2 item 1); decoder skip-join stages ride the same kernel via
    the fused concat split (``extra=``: conv(up, Ka) + conv(skip, Kb),
    no 2W concat ever materialised); ``depth`` sets conv layers per stage
    (classic UNets use 2).  Other norms fall back to chained
    HexConvModules.
    """

    num_classes: int
    widths: Sequence[int] = (32, 64, 128)
    radius: int = 2
    depth: int = 1
    norm: str = "GN"
    upsample: str = "transpose"  # or "pixelshuffle"
    use_stack: bool = True
    stack_min_cells: int = 1024
    dtype: jnp.dtype = jnp.float32

    def _packed_chain_ok(self, cin: int, h: int, w: int) -> bool:
        """Static check that the encoder chain (stack -> packed pool ->
        stack ...) can run in the packed-plane domain: doubling widths
        dividing 128 (the packed pool repacks q -> q/2 exactly), even
        heights at every stage, every stage past ``stack_min_cells``
        (same envelope as HexCNN's packed chain)."""
        chs = list(self.widths)
        if cin > chs[0] or any(c > 128 or 128 % c for c in chs):
            return False
        if any(b != 2 * a for a, b in zip(chs, chs[1:])):
            return False
        hs, ws = h, w
        for s, c in enumerate(chs):
            if hs % 2:
                return False
            q = 128 // c
            if (hs // 2) * (-(-ws // q)) < self.stack_min_cells:
                return False
            if s != len(chs) - 1:
                if (hs // 2) % 2:
                    return False
                hs, ws = hs // 2, (ws - 1) // 2
        return True

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ..nn.layers import HexConvStack
        x = jnp.asarray(x, self.dtype)
        cin = x.shape[1]
        stacked = self.use_stack and self.norm in ("GN", None)
        # Fastest route: pack ONCE at the stem and run the whole encoder
        # in the margined-plane domain (stack -> packed max-pool -> stack,
        # zero per-stage layout conversions); skips unpack straight to
        # NHWC (a pure reshape) and the decoder stays channels-last, each
        # skip-join stage riding the fused concat-split stack.  Same param
        # tree as the stage-wise route below (tested equal).
        if stacked and self._packed_chain_ok(cin, x.shape[2], x.shape[3]):
            from ..kernels.conv_pallas import (
                hex_packed_maxpool2, pack_planes, unpack_planes)
            hcur, wcur = x.shape[2], x.shape[3]
            xl = jnp.moveaxis(x, 1, -1)
            if cin < self.widths[0]:
                xl = jnp.pad(xl,
                             ((0, 0),) * 3 + ((0, self.widths[0] - cin),))
            planes = pack_planes(xl, radius=self.radius, dilation=1)
            skips = []
            c_prev = cin
            for i, width in enumerate(self.widths):
                planes = HexConvStack(
                    in_channels=c_prev, width=width, depth=self.depth,
                    hexkernel_radius=self.radius, norm=self.norm,
                    num_groups=8, min_cells=self.stack_min_cells,
                    data_format="NHWC", dtype=self.dtype,
                    name=f"enc{i}")(planes, packed_io=True,
                                    image_width=wcur)
                c_prev = width
                if i != len(self.widths) - 1:
                    skips.append(unpack_planes(
                        planes, w=wcur, cout=width, radius=self.radius))
                    planes = hex_packed_maxpool2(
                        planes, image_width=wcur, in_channels=width,
                        out_channels=self.widths[i + 1], radius=self.radius)
                    hcur, wcur = hcur // 2, (wcur - 1) // 2
            xl = unpack_planes(planes, w=wcur, cout=self.widths[-1],
                               radius=self.radius)
            for i, width in enumerate(reversed(self.widths[:-1])):
                if self.upsample == "transpose":
                    # the matmul tconv is channels-last natively: no
                    # NHWC<->NCHW round trip in the decoder hot loop
                    xl = HexConvTranspose2d(
                        in_channels=xl.shape[-1], out_channels=width,
                        even_odd_offset=0, hexkernel_radius=self.radius,
                        stride=2, data_format="NHWC", name=f"up{i}")(xl)
                else:
                    xc = HexPixelShuffleUpsample(channels=width, factor=2,
                                                 name=f"up{i}")(
                        jnp.moveaxis(xl, -1, 1))
                    xl = jnp.moveaxis(xc, 1, -1)
                skip = skips.pop()
                xl = _crop_or_pad_to(xl, skip.shape[1:3], nhwc=True)
                xl = HexConvStack(
                    in_channels=2 * width, width=width, depth=self.depth,
                    hexkernel_radius=self.radius, norm=self.norm,
                    num_groups=8, min_cells=self.stack_min_cells,
                    data_format="NHWC", dtype=self.dtype,
                    name=f"dec{i}")(xl, extra=skip)
            xl = nn.Dense(self.num_classes, dtype=self.dtype,
                          name="head")(xl)
            return jnp.moveaxis(xl, -1, 1)
        norm_cfg = dict(type=self.norm, num_groups=8) if self.norm == "GN" \
            else (dict(type=self.norm) if self.norm else None)

        def stage(v, c_in, width, name):
            if stacked and c_in <= width:
                return HexConvStack(
                    in_channels=c_in, width=width, depth=self.depth,
                    hexkernel_radius=self.radius, norm=self.norm,
                    num_groups=8, min_cells=self.stack_min_cells,
                    dtype=self.dtype, name=name)(v)
            for d in range(self.depth):
                v = HexConvModule(
                    in_channels=c_in if d == 0 else width,
                    out_channels=width, even_odd_offset=0,
                    hexkernel_radius=self.radius,
                    padding=self.radius - 1, norm_cfg=norm_cfg,
                    name=f"{name}_conv{d}")(v, train=train)
            return v

        skips = []
        for i, width in enumerate(self.widths):
            x = stage(x, cin, width, f"enc{i}")
            cin = width
            if i != len(self.widths) - 1:
                skips.append(x)
                x = F.hex_pool2d(x, "max", kernel_size=2, stride=2)

        for i, width in enumerate(reversed(self.widths[:-1])):
            if self.upsample == "transpose":
                x = HexConvTranspose2d(
                    in_channels=cin, out_channels=width, even_odd_offset=0,
                    hexkernel_radius=self.radius, stride=2,
                    name=f"up{i}")(x)
            else:
                x = HexPixelShuffleUpsample(channels=width, factor=2,
                                            name=f"up{i}")(x)
            skip = skips.pop()
            x = _crop_or_pad_to(x, skip.shape[-2:])
            if stacked:
                # skip-join stage: conv(concat(up, skip)) runs as the
                # fused conv(up, Ka) + conv(skip, Kb) split inside the
                # packed stack kernel — the 2W concatenation is never
                # materialised (HexConvStack extra=, PERF.md r3)
                x = HexConvStack(
                    in_channels=2 * width, width=width, depth=self.depth,
                    hexkernel_radius=self.radius, norm=self.norm,
                    num_groups=8, min_cells=self.stack_min_cells,
                    dtype=self.dtype, name=f"dec{i}")(x, extra=skip)
            else:
                x = jnp.concatenate([x, skip], axis=1)
                x = stage(x, width * 2, width, f"dec{i}")
            cin = width

        head = nn.Dense(self.num_classes, dtype=self.dtype, name="head")
        x = jnp.moveaxis(head(jnp.moveaxis(x, 1, -1)), -1, 1)
        return x
