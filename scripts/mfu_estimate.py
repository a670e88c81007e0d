"""Frame-level MFU / roofline denominator for the headline bench.

Counts the FLOPs of the full RAFT-Stereo eval forward (736×1280, 32 GRU
iterations — the bench.py protocol) via XLA's HLO cost analysis of the
lowered graph (trace-only, CPU backend; the XLA "reg" correlation path, so
the count excludes only the negligible relu-tap lookup arithmetic the Pallas
kernel replaces). Combined with the benched frame time and the chip's
measured matmul peak (docs/PERF.md: 134.8 TF/s sustained on a dense bf16
matmul chain), this gives the whole-frame MFU — the "how far from
speed-of-light" denominator for docs/PERF.md.

Run anywhere (no chip needed):  python scripts/mfu_estimate.py [frame_ms]
"""

from __future__ import annotations

import json
import os
import sys


def main():
    sys.path.insert(0, ".")
    os.environ.setdefault("XLA_FLAGS", "")
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    from dkt_stereo_tpu.models import RAFTStereo, RAFTStereoConfig

    # base XLA config: same conv/GRU math as the benched Pallas config; the
    # bf16 compute policy matches configs/raft_stereo/pallas.json.
    # scan_unroll=32: XLA's HLO cost analysis counts a loop BODY once,
    # ignoring the trip count — fully unrolling the 32-iteration scan puts
    # all 32 refinement steps into one body so the count is the true frame
    # total (numerics identical; pinned by tests, see scan_unroll docs).
    cfg = RAFTStereoConfig(corr_implementation="reg", scan_unroll=32)
    model = RAFTStereo(cfg, iters=32, test_mode=True)
    B, H, W = 1, 736, 1280
    img = jnp.zeros((B, H, W, 3), jnp.float32)
    params = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                           jnp.zeros((1, 64, 64, 3)))
    )
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), params
    )

    lowered = jax.jit(lambda p, a, b: model.apply(p, a, b)[1]).lower(params, img, img)
    ca = lowered.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops = float(ca["flops"])

    frame_ms = float(sys.argv[1]) if len(sys.argv) > 1 else None
    out = {
        "protocol": "XLA HLO cost analysis of the lowered RAFT eval forward, "
                    "736x1280 batch 1, 32 iters (scan fully unrolled so the "
                    "loop body is counted 32x), reg corr path",
        "frame_flops": flops,
        "frame_gflops": round(flops / 1e9, 1),
        "measured_matmul_peak_tfs": 134.8,
    }
    if frame_ms:
        tfs = flops / (frame_ms * 1e-3) / 1e12
        out["frame_ms"] = frame_ms
        out["achieved_tfs"] = round(tfs, 1)
        out["mfu_vs_measured_peak"] = round(tfs / 134.8, 3)
        out["mfu_vs_datasheet_peak"] = round(tfs / 197.0, 3)
        out["speed_of_light_ms"] = round(flops / 134.8e12 * 1e3, 1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
