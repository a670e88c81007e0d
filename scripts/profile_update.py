"""Update-block component profiler (single chip, 736x1280 eval geometry).

Times each piece of the per-iteration GRU update in isolation, scanned x32
with a real carry dependency (so XLA cannot elide iterations), plus a pure
bf16 matmul calibration of the chip's MXU peak. Prints one JSON line per
measurement.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def timeit(fn, *args, reps=5, warm=2):
    import jax

    for _ in range(warm):
        np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / reps * 1000  # ms


def main():
    sys.path.insert(0, ".")
    import jax
    import jax.numpy as jnp

    from dkt_stereo_tpu.nn.gru import (
        BasicMotionEncoder,
        BasicMultiUpdateBlock,
        ConvGRU,
        FlowHead,
    )

    dt = jnp.bfloat16
    B, H, W = 1, 736, 1280
    H4, W4 = H // 4, W // 4
    H8, W8 = H // 8, W // 8
    H16, W16 = H // 16, W // 16
    rng = np.random.default_rng(0)

    def arr(*shape):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32)).astype(dt)

    results = {}

    # --- MXU peak calibration: dense bf16 matmul ---
    a = arr(4096, 4096)
    b = arr(4096, 4096)

    @jax.jit
    def mm(a, b):
        def step(c, _):
            return jnp.dot(c, b, preferred_element_type=jnp.bfloat16), ()

        out, _ = jax.lax.scan(step, a, None, length=16)
        return jnp.sum(out.astype(jnp.float32))

    ms = timeit(mm, a, b)
    tf = 16 * 2 * 4096**3 / (ms / 1e3) / 1e12
    results["mxu_peak_bf16_tf"] = round(tf, 1)

    # --- components, scanned x32 with carry dependency ---
    def scan32(apply_fn, carry0, consts):
        @jax.jit
        def run(carry0, consts):
            def step(c, _):
                return apply_fn(c, consts), ()

            out, _ = jax.lax.scan(step, carry0, None, length=32)
            # scalar output: the axon tunnel download would otherwise dominate
            return sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree_util.tree_leaves(out))

        return run

    # motion encoder: carry = flow (B,H4,W4,2); corr const
    me = BasicMotionEncoder(dt)
    corr = arr(B, H4, W4, 36)
    flow0 = arr(B, H4, W4, 2)
    mp = me.init(jax.random.PRNGKey(0), flow0, corr)

    def me_step(flow, consts):
        out = me.apply(mp, flow, consts)
        return out[..., -2:]  # keep flow shape

    results["motion_x32"] = timeit(scan32(me_step, flow0, corr), flow0, corr)

    # gru08: carry = h (B,H4,W4,128); x = motion(128) + interp16(128)
    g8 = ConvGRU(128, dtype=dt)
    h0 = arr(B, H4, W4, 128)
    ctx8 = (arr(B, H4, W4, 128), arr(B, H4, W4, 128), arr(B, H4, W4, 128))
    x8a, x8b = arr(B, H4, W4, 128), arr(B, H4, W4, 128)
    gp8 = g8.init(jax.random.PRNGKey(0), h0, ctx8, x8a, x8b)

    def g8_step(h, consts):
        ctx, xa, xb = consts
        return g8.apply(gp8, h, ctx, xa, xb)

    results["gru08_x32"] = timeit(scan32(g8_step, h0, (ctx8, x8a, x8b)), h0, (ctx8, x8a, x8b))

    # gru16: h (B,H8,W8,128); x = pool(net0)(128)+interp(net2)(128)
    g16 = ConvGRU(128, dtype=dt)
    h16 = arr(B, H8, W8, 128)
    ctx16 = (arr(B, H8, W8, 128), arr(B, H8, W8, 128), arr(B, H8, W8, 128))
    x16a, x16b = arr(B, H8, W8, 128), arr(B, H8, W8, 128)
    gp16 = g16.init(jax.random.PRNGKey(0), h16, ctx16, x16a, x16b)

    def g16_step(h, consts):
        ctx, xa, xb = consts
        return g16.apply(gp16, h, ctx, xa, xb)

    results["gru16_x32"] = timeit(
        scan32(g16_step, h16, (ctx16, x16a, x16b)), h16, (ctx16, x16a, x16b)
    )

    # gru32: h (B,H16,W16,128); x = pool(net1)(128)
    g32 = ConvGRU(128, dtype=dt)
    h32 = arr(B, H16, W16, 128)
    ctx32 = (arr(B, H16, W16, 128), arr(B, H16, W16, 128), arr(B, H16, W16, 128))
    x32 = arr(B, H16, W16, 128)
    gp32 = g32.init(jax.random.PRNGKey(0), h32, ctx32, x32)

    def g32_step(h, consts):
        ctx, xa = consts
        return g32.apply(gp32, h, ctx, xa)

    results["gru32_x32"] = timeit(scan32(g32_step, h32, (ctx32, x32)), h32, (ctx32, x32))

    # flow head on net0
    fh = FlowHead(256, 2, dt)
    fhp = fh.init(jax.random.PRNGKey(0), h0)

    def fh_step(h, _):
        d = fh.apply(fhp, h)
        return h + jnp.pad(d, ((0, 0), (0, 0), (0, 0), (0, 126))).astype(h.dtype)

    results["flowhead_x32"] = timeit(scan32(fh_step, h0, ()), h0, ())

    # full update block x32 (test mode, mask off)
    ub = BasicMultiUpdateBlock(3, 2, (128, 128, 128), dt)
    net = (h0, h16, h32)
    inp = (ctx8, ctx16, ctx32)
    up = ub.init(jax.random.PRNGKey(0), net, inp, corr, flow0, mask_pred=jnp.array(False))

    def ub_step(carry, consts):
        net, flow = carry
        corr = consts
        net, mask, delta = ub.apply(up, net, inp, corr, flow, mask_pred=jnp.array(False))
        return net, flow + delta.astype(flow.dtype)

    @jax.jit
    def ub_run(net, flow, corr):
        def step(c, _):
            return ub_step(c, corr), ()

        out, _ = jax.lax.scan(step, (net, flow), None, length=32)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree_util.tree_leaves(out))

    results["update_block_x32"] = timeit(ub_run, net, flow0, corr)

    for k, v in results.items():
        print(json.dumps({"stage": k, "ms": round(float(v), 2)}), flush=True)


if __name__ == "__main__":
    main()
