"""Chip probes for the KERNELS_r03 model-level failures (full tracebacks).

1. row_sample VJP: dvol vs dpos split comparison.
2. IGEV reg_cuda vs reg divergence growth over iterations (chaos at random
   init vs real kernel bug).
3. encoder_conv fp32 model case (after the pick_rb itemsize fix).
4. alt_cuda fp32 model case — full error if it still fails.
"""

from __future__ import annotations

import json
import sys
import traceback

import numpy as np


def main():
    sys.path.insert(0, ".")
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)

    # ---- 1. row_sample split probe ---------------------------------------
    from dkt_stereo_tpu.ops.pallas.row_sample import row_sample_pallas
    from dkt_stereo_tpu.ops.sampler import sample_row_1d

    B, H, W1, W2, K = 1, 184, 320, 320, 36
    vol = jnp.asarray(rng.standard_normal((B, H, W1, W2)).astype(np.float32))
    pos = jnp.asarray(rng.uniform(-3, W1 + 2, (B, H, W1, K)).astype(np.float32))
    gx = jax.jit(jax.grad(lambda v, p: (sample_row_1d(v, p) ** 2).sum(), argnums=(0, 1)))(vol, pos)
    gp = jax.jit(jax.grad(lambda v, p: (row_sample_pallas(v, p) ** 2).sum(), argnums=(0, 1)))(vol, pos)
    for name, a, b in (("dvol", gp[0], gx[0]), ("dpos", gp[1], gx[1])):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        err = np.abs(a - b)
        idx = np.unravel_index(err.argmax(), err.shape)
        print(json.dumps({
            "probe": f"row_sample_{name}",
            "max_abs_err": float(err.max()),
            "argmax": [int(i) for i in idx],
            "pallas_at": float(a[idx]),
            "xla_at": float(b[idx]),
            "n_gt_1e3": int((err > 1e-3).sum()),
            "scale": float(np.abs(b).max()),
        }), flush=True)
    del vol, pos, gx, gp

    # ---- 2. IGEV divergence growth over iterations ------------------------
    from dkt_stereo_tpu.models import get_model

    Hf, Wf = 736, 1280
    i1 = jnp.asarray(rng.uniform(0, 255, (1, Hf, Wf, 3)).astype(np.float32))
    i2 = jnp.asarray(rng.uniform(0, 255, (1, Hf, Wf, 3)).astype(np.float32))

    def model_disp(name, iters, **cfg_kw):
        cls, cfg_cls, _ = get_model(name)
        cfg = cfg_cls.from_dict({"mixed_precision": False, **cfg_kw})
        m = cls(cfg, iters=iters, test_mode=True)
        p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)))
        return np.asarray(jax.jit(lambda a, b: m.apply(p, a, b)[1])(i1, i2))

    for iters in (1, 2, 4, 8):
        try:
            a = model_disp("IGEVStereo", iters, corr_implementation="reg_cuda")
            b = model_disp("IGEVStereo", iters, corr_implementation="reg")
            print(json.dumps({
                "probe": "igev_growth", "iters": iters,
                "max_abs_err": float(np.abs(a - b).max()),
                "disp_scale": float(np.abs(b).max()),
            }), flush=True)
        except Exception as e:
            print(json.dumps({"probe": "igev_growth", "iters": iters,
                              "error": str(e)[:200]}), flush=True)

    # ---- 3+4. the two compile-failure cases, full traceback ---------------
    for probe, cfg_kw in (
        ("encoder_conv_fp32", dict(corr_implementation="reg", corr_dtype="float32",
                                   pallas_encoder=True)),
        ("alt_cuda_fp32", dict(corr_implementation="alt_cuda")),
    ):
        try:
            a = model_disp("RAFTStereo", 2, **cfg_kw)
            print(json.dumps({"probe": probe, "ok": True,
                              "disp_scale": float(np.abs(a).max())}), flush=True)
        except Exception:
            print(f"=== {probe} FULL TRACEBACK ===", flush=True)
            traceback.print_exc()
            sys.stdout.flush()


if __name__ == "__main__":
    main()
