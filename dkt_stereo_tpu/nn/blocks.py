"""Residual feature/context encoders (NHWC, bf16-capable).

Rebuild of core/extractor.py: ``ResidualBlock`` (:6-60), ``BottleneckBlock``
(:64-120), ``BasicEncoder`` (:122-197), ``MultiBasicEncoder`` (:199-300).
Weight init is kaiming-normal fan-out (``:155-162``). Parameter tree names
mirror the torch attribute names for checkpoint import.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from dkt_stereo_tpu.nn.norms import Norm, band_refresh

# torch kaiming_normal_(mode='fan_out', nonlinearity='relu')
kaiming_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def conv(features, kernel, stride=1, padding=0, dtype=jnp.float32, name=None, use_bias=True):
    return nn.Conv(
        features,
        (kernel, kernel) if isinstance(kernel, int) else kernel,
        strides=(stride, stride),
        padding=padding if isinstance(padding, str) else [(padding, padding)] * 2
        if isinstance(padding, int)
        else padding,
        use_bias=use_bias,
        kernel_init=kaiming_out,
        dtype=dtype,
        name=name,
    )


class ResidualBlock(nn.Module):
    """core/extractor.py:6-60. Two 3×3 convs + optional 1×1 downsample."""

    in_planes: int
    planes: int
    norm_fn: str = "group"
    stride: int = 1
    use_running_average: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ng = self.planes // 8
        ura = self.use_running_average
        y = conv(self.planes, 3, self.stride, 1, self.dtype, name="conv1")(x)
        y = Norm(self.norm_fn, ng, ura, self.dtype, name="norm1")(y)
        y = nn.relu(y)
        y = conv(self.planes, 3, 1, 1, self.dtype, name="conv2")(y)
        y = Norm(self.norm_fn, ng, ura, self.dtype, name="norm2")(y)
        y = nn.relu(y)

        if not (self.stride == 1 and self.in_planes == self.planes):
            x = conv(self.planes, 1, self.stride, 0, self.dtype, name="downsample_conv")(x)
            x = Norm(self.norm_fn, ng, ura, self.dtype, name="norm3")(x)
        return nn.relu(x + y)


class BottleneckBlock(nn.Module):
    """core/extractor.py:64-120 (1×1 → 3×3 → 1×1, quarter-width middle)."""

    in_planes: int
    planes: int
    norm_fn: str = "group"
    stride: int = 1
    use_running_average: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ng = self.planes // 8
        ura = self.use_running_average
        y = conv(self.planes // 4, 1, 1, 0, self.dtype, name="conv1")(x)
        y = nn.relu(Norm(self.norm_fn, ng, ura, self.dtype, name="norm1")(y))
        y = conv(self.planes // 4, 3, self.stride, 1, self.dtype, name="conv2")(y)
        y = nn.relu(Norm(self.norm_fn, ng, ura, self.dtype, name="norm2")(y))
        y = conv(self.planes, 1, 1, 0, self.dtype, name="conv3")(y)
        y = nn.relu(Norm(self.norm_fn, ng, ura, self.dtype, name="norm3")(y))

        if self.stride != 1:
            x = conv(self.planes, 1, self.stride, 0, self.dtype, name="downsample_conv")(x)
            x = Norm(self.norm_fn, ng, ura, self.dtype, name="norm4")(x)
        return nn.relu(x + y)


def _res_pair(in_planes, dim, norm_fn, stride, ura, dtype, name):
    """A two-ResidualBlock stage (core/extractor.py:164-170)."""

    class _Stage(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = ResidualBlock(in_planes, dim, norm_fn, stride, ura, dtype, name="0")(x)
            x = ResidualBlock(dim, dim, norm_fn, 1, ura, dtype, name="1")(x)
            return x

    return _Stage(name=name)


class _ConvParams(nn.Module):
    """Raw conv parameters with nn.Conv's tree layout ({kernel, bias}), for
    paths that consume weights without running the module: the fused Pallas
    encoder chain, ConvGRU's fused z/r conv, and the lax.cond mask heads.
    Keeping nn.Conv's exact parameter paths is what lets the .pth importer
    map reference state dicts onto these fused formulations."""

    features: int
    in_ch: int
    kernel: int = 3

    @nn.compact
    def __call__(self):
        k = self.kernel
        kernel = self.param(
            "kernel", kaiming_out, (k, k, self.in_ch, self.features), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return kernel, bias


class _RawBNInner(nn.Module):
    ch: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.ch,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.ch,), jnp.float32)
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.ch,), jnp.float32)
        )
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.ch,), jnp.float32)
        )
        return scale, bias, mean.value, var.value


class _RawBN(nn.Module):
    """Raw BatchNorm parameters matching the ``Norm`` wrapper's tree
    (norm module -> anonymous nn.BatchNorm child)."""

    ch: int

    @nn.compact
    def __call__(self):
        return _RawBNInner(self.ch, name="BatchNorm_0")()


class _ResBlockParams(nn.Module):
    """Parameter tree of one stride-1 same-width ResidualBlock (two 3x3
    convs; norm params only when the norm has any) without the computation.
    Returns ((k1, b1, bn1), (k2, b2, bn2)) with bn = None for instance."""

    dim: int
    norm_fn: str = "instance"

    @nn.compact
    def __call__(self):
        out = []
        for c, n in (("conv1", "norm1"), ("conv2", "norm2")):
            k, b = _ConvParams(self.dim, self.dim, 3, name=c)()
            bn = _RawBN(self.dim, name=n)() if self.norm_fn == "batch" else None
            out.append((k, b, bn))
        return tuple(out)


class _ResPairParams(nn.Module):
    """Parameter tree of a stride-1 ``_res_pair`` stage; returns the four
    (kernel, bias, bn) triples."""

    dim: int
    norm_fn: str = "instance"

    @nn.compact
    def __call__(self):
        a = _ResBlockParams(self.dim, self.norm_fn, name="0")()
        b = _ResBlockParams(self.dim, self.norm_fn, name="1")()
        return [*a, *b]


def bn_eval_affine(bn, conv_bias=None, eps=1e-5):
    """Eval-mode BatchNorm (+ optionally the preceding conv's bias) folded to
    the affine x -> a*x + b. The single source of this fold — used by the
    fused w2d encoder (:func:`_bn_fold`) and IGEV's cond-gated spx chain."""
    import jax

    scale, bias, mean, var = bn
    a = scale * jax.lax.rsqrt(var + eps)
    b = bias - mean * a
    if conv_bias is not None:
        b = b + conv_bias * a
    return a, b


def _bn_fold(bn, conv_bias=None, eps=1e-5):
    """:func:`bn_eval_affine` in w2d duplicated form."""
    a, b = bn_eval_affine(bn, conv_bias, eps)
    return jnp.concatenate([a, a]), jnp.concatenate([b, b])


def fused_fullres_layer1(
    x, stem_kernel, triples, norm_fn, dtype, stem_bn=None, stem_bias=None
):
    """stem conv + norm1 + layer1 of an encoder via the fused w2d chain.

    ``x``: normalized input image (B, H, W, Cin). ``stem_kernel``: logical
    (7, 7, Cin, 64) stride-1 stem weights — run as a dense-w2d XLA conv so
    the full-resolution activations never leave w2d layout. The stem BIAS is
    deliberately dropped: instance norm is shift-invariant, and eval-mode
    BatchNorm folds it into the static affine (pass it via ``stem_bn``).
    ``triples``: four (kernel, conv_bias, bn) from :class:`_ResPairParams`.
    ``norm_fn``: 'instance' (per-sample affines from in-kernel statistics;
    conv biases are irrelevant) or 'batch' (eval-mode: all affines static).
    Returns the layer1 output (B, H, W, 64) in ``dtype``.

    Matches ResidualBlock's y = relu(norm2(conv2(relu(norm1(conv1(x))))));
    out = relu(x + y) (core/extractor.py:37-60).
    """
    import jax

    import functools

    from dkt_stereo_tpu.ops.pallas.encoder_conv import (
        encoder_stage_ad as _encoder_stage,
        in_affine,
        pick_rb,
        w2d_conv3x3_weights,
        w2d_pack,
        w2d_pad,
        w2d_slice,
        w2d_stem_weights,
        w2d_unpack,
    )

    B, H, W, _ = x.shape
    # VMEM-bounded rows/step at large widths; fp32 activations halve the
    # row budget (encoder_conv.pick_rb docstring)
    rb = pick_rb(W // 2 + 2, H, jnp.dtype(dtype).itemsize)
    encoder_stage = functools.partial(_encoder_stage, rb=rb)
    C = triples[0][0].shape[-1]
    count = float(H * W)
    interpret = jax.default_backend() == "cpu"
    batch = norm_fn == "batch"

    ws = [w2d_conv3x3_weights(k.astype(dtype)) for k, _, _ in triples]

    # ---- stem: dense-w2d 7x7 conv, output stays in w2d layout
    xw = w2d_pack(x.astype(dtype))
    wstem = w2d_stem_weights(stem_kernel.astype(dtype))
    s = jax.lax.conv_general_dilated(
        xw, wstem, (1, 1), [(3, 3), (2, 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )

    if batch:
        a_s2, b_s2 = _bn_fold(stem_bn, conv_bias=stem_bias)
        a_s2 = jnp.broadcast_to(a_s2, (B, 2 * C))
        b_s2 = jnp.broadcast_to(b_s2, (B, 2 * C))
        affines = []
        for k, cb, bn in triples:
            a, b = _bn_fold(bn, cb)
            affines.append(
                (jnp.broadcast_to(a, (B, 2 * C)), jnp.broadcast_to(b, (B, 2 * C)))
            )
    else:
        # stem IN folded to a per-(sample, channel) affine (phase pairs
        # combined -> per logical channel)
        s_sum = jnp.sum(s, axis=(1, 2), dtype=jnp.float32)
        s_ssq = jnp.sum(jnp.square(s.astype(jnp.float32)), axis=(1, 2))
        a_s2, b_s2 = in_affine(s_sum, s_ssq, count)

    sp = w2d_pad(s, rb)
    Hp = sp.shape[1]
    # v-stream for the block-1 residual must live in the same shift frame
    # as K3's primary input (shift 2): rows move down by 2
    sp2 = jnp.pad(sp, ((0, 0), (2, 0), (0, 0), (0, 0)))[:, :Hp]

    def aff(i, st, ssq):
        if batch:
            return affines[i]
        return in_affine(st, ssq, count)

    y1, s1, ss1 = encoder_stage(sp, a_s2, b_s2, ws[0], H=H, shift_in=0, interpret=interpret)
    a1, b1 = aff(0, s1, ss1)
    y2, s2, ss2 = encoder_stage(y1, a1, b1, ws[1], H=H, shift_in=1, interpret=interpret)
    a2, b2 = aff(1, s2, ss2)
    # block-1 output o1 = relu(h0 + relu(norm(y2))) is K3's transformed
    # input; emit it for the block-2 residual tap
    y3, s3, ss3, o1 = encoder_stage(
        y2, a2, b2, ws[2], H=H, shift_in=2,
        v=sp2, a2=a_s2, b2=b_s2, emit_h=True, interpret=interpret,
    )
    a3, b3 = aff(2, s3, ss3)
    y4, s4, ss4 = encoder_stage(y3, a3, b3, ws[3], H=H, shift_in=3, interpret=interpret)
    a4, b4 = aff(3, s4, ss4)

    o1s = w2d_slice(o1, 2, H).astype(jnp.float32)
    y4s = w2d_slice(y4, 4, H).astype(jnp.float32)
    t4 = jnp.maximum(y4s * a4[:, None, None, :] + b4[:, None, None, :], 0.0)
    o2 = jnp.maximum(o1s + t4, 0.0)
    return w2d_unpack(o2).astype(dtype)


class BasicEncoder(nn.Module):
    """Feature encoder (core/extractor.py:122-197): 7×7 stem + 3 stages
    (64, 96, 128) + 1×1 head. With downsample=2 (RAFT base config) output is
    1/4 resolution; downsample=3 gives 1/8.

    ``fused_fullres=True`` (instance norm, downsample=2): the
    full-resolution section (norm1 + layer1) runs as the fused Pallas w2d
    kernel chain (ops/pallas/encoder_conv.py) — exact instance-norm
    statistics, one HBM round-trip per conv. Trainable since round 4
    (encoder_stage_ad custom VJP). Parameter tree is identical to the XLA
    path."""

    output_dim: int = 128
    norm_fn: str = "batch"
    downsample: int = 3
    use_running_average: bool = True
    dtype: jnp.dtype = jnp.float32
    fused_fullres: bool = False

    @nn.compact
    def __call__(self, x):
        d, ura = self.downsample, self.use_running_average
        fused = (
            self.fused_fullres
            and d == 2
            and self.norm_fn in ("instance", "instance_fast")
            and x.shape[2] % 2 == 0
        )
        if fused:
            stem_k, _ = _ConvParams(64, x.shape[-1], 7, name="conv1")()
            triples = _ResPairParams(64, "instance", name="layer1")()
            x = fused_fullres_layer1(x, stem_k, triples, "instance", self.dtype)
        else:
            x = conv(64, 7, 1 + (d > 2), 3, self.dtype, name="conv1")(x)
            x = Norm(self.norm_fn, 8, ura, self.dtype, name="norm1")(x)
            x = nn.relu(x)
            x = _res_pair(64, 64, self.norm_fn, 1, ura, self.dtype, "layer1")(x)
        # band_refresh: no-ops everywhere except exact banded eval
        # (eval/tiled.py), where it exchanges halo rows between bands so
        # cross-band conv contamination never accumulates past the halo
        x = band_refresh(x)
        x = _res_pair(64, 96, self.norm_fn, 1 + (d > 1), ura, self.dtype, "layer2")(x)
        x = band_refresh(x)
        x = _res_pair(96, 128, self.norm_fn, 1 + (d > 0), ura, self.dtype, "layer3")(x)
        x = band_refresh(x)
        x = conv(self.output_dim, 1, 1, 0, self.dtype, name="conv2")(x)
        return x


class _ConvOut(nn.Module):
    """ResidualBlock + 3×3 conv output head (core/extractor.py:229-231)."""

    dim: int
    norm_fn: str
    use_running_average: bool
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        x = ResidualBlock(128, 128, self.norm_fn, 1, self.use_running_average, self.dtype, name="res")(x)
        return conv(self.dim, 3, 1, 1, self.dtype, name="conv")(x)


class MultiBasicEncoder(nn.Module):
    """Multi-scale context encoder (core/extractor.py:199-300).

    Returns a tuple over scales (fine → coarse: 1/4, 1/8, 1/16 at
    downsample=2) of ``[head_0(x), head_1(x), ...]`` — one head per entry in
    ``output_dim`` (RAFT passes [hidden_dims, context_dims]). Head channel
    indexing follows the reference: finest scale uses dim[2], coarsest dim[0].

    ``dual_inp=True`` additionally returns the full-batch layer3 features
    (used by the shared-backbone path, raft_stereo.py:97-99), with the heads
    applied to the first half of the batch only.
    """

    output_dim: Sequence[Sequence[int]] = ((128, 128, 128),)
    norm_fn: str = "batch"
    downsample: int = 3
    num_layers: int = 3
    use_running_average: bool = True
    dtype: jnp.dtype = jnp.float32
    fused_fullres: bool = False

    @nn.compact
    def __call__(self, x, dual_inp: bool = False):
        d, ura, dt = self.downsample, self.use_running_average, self.dtype
        # Instance norm only: eval-mode BatchNorm folds into the convs at
        # the XLA level already (no stats sweeps), and at cnet's B=1 the
        # kernel's 2x dense-w2d FLOPs outweigh its layout win (measured
        # 18.3 -> 21.9 ms). IN is where XLA pays for runtime statistics.
        fused = (
            self.fused_fullres
            and d == 2
            and self.norm_fn in ("instance", "instance_fast")
            and x.shape[2] % 2 == 0
        )
        if fused:
            # norm_fn is guaranteed non-'batch' here (the ``fused`` gate
            # above); fused_fullres_layer1's batch arm stays available for
            # direct callers (unit-tested in tests/test_pallas_encoder.py)
            # but is deliberately not wired up to this model path.
            stem_k, _ = _ConvParams(64, x.shape[-1], 7, name="conv1")()
            triples = _ResPairParams(64, "instance", name="layer1")()
            x = fused_fullres_layer1(x, stem_k, triples, "instance", dt)
        else:
            x = conv(64, 7, 1 + (d > 2), 3, dt, name="conv1")(x)
            x = Norm(self.norm_fn, 8, ura, dt, name="norm1")(x)
            x = nn.relu(x)
            x = _res_pair(64, 64, self.norm_fn, 1, ura, dt, "layer1")(x)
        x = band_refresh(x)  # exact banded eval only; no-op otherwise
        x = _res_pair(64, 96, self.norm_fn, 1 + (d > 1), ura, dt, "layer2")(x)
        x = band_refresh(x)
        x = _res_pair(96, 128, self.norm_fn, 1 + (d > 0), ura, dt, "layer3")(x)
        x = band_refresh(x)

        v = None
        if dual_inp:
            v = x
            x = x[: x.shape[0] // 2]

        outputs08 = [
            _ConvOut(dim[2], self.norm_fn, ura, dt, name=f"outputs08_{i}")(x)
            for i, dim in enumerate(self.output_dim)
        ]
        if self.num_layers == 1:
            return (outputs08, v) if dual_inp else (outputs08,)

        y = band_refresh(_res_pair(128, 128, self.norm_fn, 2, ura, dt, "layer4")(x))
        outputs16 = [
            _ConvOut(dim[1], self.norm_fn, ura, dt, name=f"outputs16_{i}")(y)
            for i, dim in enumerate(self.output_dim)
        ]
        if self.num_layers == 2:
            return (outputs08, outputs16, v) if dual_inp else (outputs08, outputs16)

        # layer5 (the 1/16-scale branch, stride 16 per conv row) is what
        # breaks banded exactness without refresh: its receptive reach in
        # input rows exceeds any practical halo (the round-2 ~4.6% boundary
        # error). The exchange here resets contamination before the heads.
        z = band_refresh(_res_pair(128, 128, self.norm_fn, 2, ura, dt, "layer5")(y))
        outputs32 = [
            conv(dim[0], 3, 1, 1, dt, name=f"outputs32_{i}")(z)
            for i, dim in enumerate(self.output_dim)
        ]
        return (
            (outputs08, outputs16, outputs32, v)
            if dual_inp
            else (outputs08, outputs16, outputs32)
        )
