"""ConvGRU update machinery (rebuild of core/update.py).

The reference mutates a list of per-scale hidden states in place
(core/update.py:115-138); here the update block is a pure function
(net_tuple, inputs) → (net_tuple, mask, delta) so the iterative refinement
loop can be a ``lax.scan`` with parameters broadcast.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from dkt_stereo_tpu.nn.blocks import _ConvParams, conv
from dkt_stereo_tpu.ops.resize import interp_bilinear_align, pool2x


def thin_conv3x3(x, kernel, bias, dtype):
    """3×3 same-pad conv with FEW output channels as a full-lane matmul plus
    9 shifted adds.

    A direct conv with cout ∈ {1,2,4} pads the output to a full 128-lane
    tile on the MXU — 64×+ wasted FLOPs (measured: the flow head ran at
    55 TF/s vs the chip's 135). Instead compute z = x @ W reshaped to
    (cin, 9·cout) — a dense matmul with a huge M dimension — then reduce
    the 9 tap planes with spatially shifted adds (VPU, bandwidth-trivial).
    Exact same math; accumulation order differs at fp-epsilon level.
    """
    kh, kw, cin, cout = kernel.shape
    B, H, W, _ = x.shape
    # w[d, (ky·kw+kx)·cout + c] = kernel[ky, kx, d, c]
    w = kernel.reshape(kh * kw, cin, cout).transpose(1, 0, 2).reshape(cin, kh * kw * cout)
    z = jnp.einsum(
        "bhwd,dk->bhwk", x.astype(dtype), w.astype(dtype),
        preferred_element_type=jnp.float32,
    )
    zp = jnp.pad(z, ((0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2), (0, 0)))
    out = jnp.zeros((B, H, W, cout), jnp.float32)
    for ky in range(kh):
        for kx in range(kw):
            k = ky * kw + kx
            out = out + jax.lax.slice(
                zp,
                (0, ky, kx, k * cout),
                (B, ky + H, kx + W, (k + 1) * cout),
            )
    return (out + bias.astype(jnp.float32)).astype(dtype)


def cond_mask_head(net0, k1, b1, k2, b2, dtype, mask_pred):
    """Convex-upsample mask head (conv3×3 → relu → conv1×1, ×0.25 gradient
    balancing, core/update.py:110-113,137) from raw conv params, optionally
    gated by ``mask_pred`` under ``lax.cond``: in test mode only the FINAL
    iteration's mask is consumed (raft_stereo.py:168-177 discards the rest)
    and the head is ~30% of the per-iteration cost at eval sizes. Raw params
    keep the ``nn.Conv`` tree layout for checkpoint import. Shared by the
    RAFT and PCVNet multi-update blocks."""

    def _head(x):
        m = jax.lax.conv_general_dilated(
            x.astype(dtype), k1.astype(dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b1.astype(dtype)
        m = jax.lax.conv_general_dilated(
            nn.relu(m), k2.astype(dtype), (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b2.astype(dtype)
        return 0.25 * m

    if mask_pred is None:
        return _head(net0)
    return jax.lax.cond(
        mask_pred,
        _head,
        lambda x: jnp.zeros(net0.shape[:3] + (k2.shape[-1],), dtype),
        net0,
    )


class FlowHead(nn.Module):
    """core/update.py:6-14. The 2nd conv's tiny output channel count runs
    through :func:`thin_conv3x3` (same parameter tree as ``nn.Conv``)."""

    hidden_dim: int = 256
    output_dim: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.relu(conv(self.hidden_dim, 3, 1, 1, self.dtype, name="conv1")(x))
        k, b = _ConvParams(self.output_dim, self.hidden_dim, 3, name="conv2")()
        return thin_conv3x3(x, k, b, self.dtype)


class ConvGRU(nn.Module):
    """core/update.py:16-32: 3×3 gated recurrence with context biases.

    ``ctx`` is the per-scale (cz, cr, cq) triple precomputed from the context
    features (raft_stereo.py:114); pass zeros-like tensors when absent.

    TPU note: z and r share the input ``hx``, so their convolutions run as a
    single fused conv (kernels concatenated on the output axis at apply time;
    XLA constant-folds the concat). Parameter tree is identical to three
    separate convs — checkpoint-import compatible.
    """

    hidden_dim: int
    kernel_size: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h, ctx, *x_list):
        cz, cr, cq = ctx
        x = jnp.concatenate(x_list, axis=-1)
        hx = jnp.concatenate([h, x], axis=-1)
        k, p = self.kernel_size, self.kernel_size // 2
        in_ch = hx.shape[-1]
        hd = self.hidden_dim

        kz, bz = _ConvParams(hd, in_ch, k, name="convz")()
        kr, br = _ConvParams(hd, in_ch, k, name="convr")()
        kzr = jnp.concatenate([kz, kr], axis=-1).astype(self.dtype)
        bzr = jnp.concatenate([bz, br]).astype(self.dtype)
        zr = (
            jax.lax.conv_general_dilated(
                hx.astype(self.dtype), kzr, (1, 1), [(p, p), (p, p)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            + bzr
        )
        z = nn.sigmoid(zr[..., :hd] + cz)
        r = nn.sigmoid(zr[..., hd:] + cr)
        q = nn.tanh(
            conv(hd, k, 1, p, self.dtype, name="convq")(
                jnp.concatenate([r * h, x], axis=-1)
            )
            + cq
        )
        return (1 - z) * h + z * q


class SepConvGRU(nn.Module):
    """core/update.py:34-62: 1×5 then 5×1 separable GRU (no context biases)."""

    hidden_dim: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h, *x_list):
        x = jnp.concatenate(x_list, axis=-1)

        def gate(name, kernel, padding, inp):
            return conv(self.hidden_dim, kernel, 1, padding, self.dtype, name=name)(inp)

        for axis, suffix in ((1, "1"), (2, "2")):
            kernel = (1, 5) if axis == 1 else (5, 1)
            pad = [(0, 0), (2, 2)] if axis == 1 else [(2, 2), (0, 0)]
            hx = jnp.concatenate([h, x], axis=-1)
            z = nn.sigmoid(gate(f"convz{suffix}", kernel, pad, hx))
            r = nn.sigmoid(gate(f"convr{suffix}", kernel, pad, hx))
            q = nn.tanh(
                gate(f"convq{suffix}", kernel, pad, jnp.concatenate([r * h, x], axis=-1))
            )
            h = (1 - z) * h + z * q
        return h


class BasicMotionEncoder(nn.Module):
    """core/update.py:64-85. ``corr``: (B,H,W,levels*(2r+1)); ``flow``:
    (B,H,W,2) (vertical channel constant zero in stereo). Output 128ch
    (126 fused + 2 flow)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, flow, corr):
        cor = nn.relu(conv(64, 1, 1, 0, self.dtype, name="convc1")(corr))
        cor = nn.relu(conv(64, 3, 1, 1, self.dtype, name="convc2")(cor))
        flo = nn.relu(conv(64, 7, 1, 3, self.dtype, name="convf1")(flow))
        flo = nn.relu(conv(64, 3, 1, 1, self.dtype, name="convf2")(flo))
        out = nn.relu(
            conv(126, 3, 1, 1, self.dtype, name="conv")(
                jnp.concatenate([cor, flo], axis=-1)
            )
        )
        return jnp.concatenate([out, flow], axis=-1)


class BasicMultiUpdateBlock(nn.Module):
    """core/update.py:97-138: 3-level GRU hierarchy with cross-scale exchange.

    ``net``: tuple fine→coarse; ``inp``: tuple of (cz, cr, cq) triples per
    scale. Flags mirror the reference's iter08/16/32 + update arguments used
    by the slow-fast schedule (raft_stereo.py:157-161).
    """

    n_gru_layers: int = 3
    n_downsample: int = 2
    hidden_dims: Sequence[int] = (128, 128, 128)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        net,
        inp,
        corr=None,
        flow=None,
        iter08=True,
        iter16=True,
        iter32=True,
        update=True,
        mask_pred=None,
    ):
        hd = self.hidden_dims
        net = list(net)
        encoder_output_dim = 128

        gru08 = ConvGRU(hd[2], dtype=self.dtype, name="gru08")
        gru16 = ConvGRU(hd[1], dtype=self.dtype, name="gru16")
        gru32 = ConvGRU(hd[0], dtype=self.dtype, name="gru32")

        if iter32:
            net[2] = gru32(net[2], inp[2], pool2x(net[1]))
        if iter16:
            if self.n_gru_layers > 2:
                net[1] = gru16(
                    net[1],
                    inp[1],
                    pool2x(net[0]),
                    interp_bilinear_align(net[2], net[1].shape[1:3]),
                )
            else:
                net[1] = gru16(net[1], inp[1], pool2x(net[0]))
        if iter08:
            motion = BasicMotionEncoder(self.dtype, name="encoder")(flow, corr)
            if self.n_gru_layers > 1:
                net[0] = gru08(
                    net[0],
                    inp[0],
                    motion,
                    interp_bilinear_align(net[1], net[0].shape[1:3]),
                )
            else:
                net[0] = gru08(net[0], inp[0], motion)

        if not update:
            return tuple(net)

        delta_flow = FlowHead(256, 2, self.dtype, name="flow_head")(net[0])
        factor = 2**self.n_downsample
        k1, b1 = _ConvParams(256, net[0].shape[-1], 3, name="mask_conv1")()
        k2, b2 = _ConvParams(factor**2 * 9, 256, 1, name="mask_conv2")()
        mask = cond_mask_head(net[0], k1, b1, k2, b2, self.dtype, mask_pred)
        return tuple(net), mask, delta_flow
