"""Eval harness: mask/threshold/aggregation semantics via oracle forwards."""

import os

import numpy as np
import cv2
import jax.numpy as jnp
from PIL import Image

from dkt_stereo_tpu.eval.metrics import D1_metric, EPE_metric, Thres_metric
from dkt_stereo_tpu.eval.validate import validate_kitti, validate_eth3d


def _make_kitti(tmp_path, rng, n=3, const_disp=17.0):
    r15 = tmp_path / "KITTI" / "KITTI_2015"
    for sub in ["training/image_2", "training/image_3", "training/disp_occ_0"]:
        os.makedirs(r15 / sub, exist_ok=True)
    H, W = 60, 100
    for i in range(n):
        img = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
        Image.fromarray(img).save(r15 / "training/image_2" / f"{i:06d}_10.png")
        Image.fromarray(img).save(r15 / "training/image_3" / f"{i:06d}_10.png")
        disp = np.full((H, W), const_disp * 256, np.uint16)
        disp[0, 0] = 0  # one invalid pixel
        cv2.imwrite(str(r15 / "training/disp_occ_0" / f"{i:06d}_10.png"), disp)
    return str(tmp_path / "KITTI")


def _oracle(disp_value):
    def forward(img1, img2):
        B, H, W, _ = img1.shape
        return jnp.full((B, H, W), -disp_value, jnp.float32)

    return forward


def test_validate_kitti_oracle_perfect(tmp_path, rng):
    root = _make_kitti(tmp_path, rng, const_disp=17.0)
    res = validate_kitti(_oracle(17.0), split="2015", data_root=root)
    assert res["kitti-2015-epe"] < 1e-5
    assert res["kitti-2015-d1"] == 0.0


def test_validate_kitti_oracle_biased(tmp_path, rng):
    root = _make_kitti(tmp_path, rng, const_disp=17.0)
    res = validate_kitti(_oracle(22.0), split="2015", data_root=root)  # 5px off
    np.testing.assert_allclose(res["kitti-2015-epe"], 5.0, atol=1e-4)
    assert res["kitti-2015-d1"] == 100.0  # all > 3px


def _make_eth3d(tmp_path, rng, n=2, const_disp=9.0):
    from dkt_stereo_tpu.data.readers import writePFM

    root = tmp_path / "ETH3D"
    H, W = 48, 80
    for i in range(n):
        scene = root / "two_view_training" / f"scene{i}"
        gt = root / "two_view_training_gt" / f"scene{i}"
        os.makedirs(scene), os.makedirs(gt)
        img = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
        Image.fromarray(img).save(scene / "im0.png")
        Image.fromarray(img).save(scene / "im1.png")
        writePFM(str(gt / "disp0GT.pfm"), np.full((H, W), const_disp, np.float32))
        occ = np.full((H, W), 255, np.uint8)
        occ[:, :10] = 0  # occluded band excluded from metric
        Image.fromarray(occ).save(gt / "mask0nocc.png")
    return str(root)


def test_validate_eth3d_nocc_mask(tmp_path, rng):
    root = _make_eth3d(tmp_path, rng, const_disp=9.0)

    # oracle wrong ONLY inside the occluded band -> still perfect score
    def forward(img1, img2):
        B, H, W, _ = img1.shape
        disp = np.full((B, H, W), -9.0, np.float32)
        disp[:, :, :6] = 0.0  # padded coords shift <=16; band is wider
        return jnp.asarray(disp)

    res = validate_eth3d(forward, data_root=root)
    assert res["eth3d-epe"] < 1e-5
    assert res["eth3d-d1"] == 0.0


def test_metrics_library(rng):
    gt = rng.uniform(5, 50, (2, 8, 10)).astype(np.float32)
    est = gt + 4.0
    mask = np.ones_like(gt, bool)
    # E=4 > 3px and 4/|gt| > 0.05 only where |gt| < 80 -> all pixels
    assert D1_metric(est, gt, mask) == 1.0
    np.testing.assert_allclose(EPE_metric(est, gt, mask), 4.0, atol=1e-5)
    assert Thres_metric(est, gt, mask, 5.0) == 0.0
    assert Thres_metric(est, gt, mask, 3.0) == 1.0
    # <10% coverage skip (utils/metrics.py:31-32): both frames 1/80 covered
    # -> both skipped -> 0.0
    tiny_mask = np.zeros_like(gt, bool)
    tiny_mask[:, 0, 0] = True
    assert EPE_metric(est, gt, tiny_mask) == 0.0
    # one frame skipped, the other (full coverage, error 4+6=10 on frame 1)
    # aggregates alone — proves the skip drops ONLY the low-coverage frame
    half = tiny_mask.copy()
    half[1] = True
    est2 = est.copy()
    est2[1] += 6.0
    np.testing.assert_allclose(EPE_metric(est2, gt, half), 10.0, atol=1e-5)


def _make_middlebury(tmp_path, rng, const_disp=11.0):
    from dkt_stereo_tpu.data.readers import writePFM

    root = tmp_path / "Middlebury"
    H, W = 48, 80
    for name in ("Adirondack", "Jadeplant"):
        d = root / "MiddEval3" / "trainingH" / name
        os.makedirs(d)
        img = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
        Image.fromarray(img).save(d / "im0.png")
        Image.fromarray(img).save(d / "im1.png")
        writePFM(str(d / "disp0GT.pfm"), np.full((H, W), const_disp, np.float32))
        occ = np.full((H, W), 255, np.uint8)
        occ[:, :8] = 128  # occluded band
        Image.fromarray(occ).save(d / "mask0nocc.png")
    return str(root)


def test_validate_middlebury_oracle(tmp_path, rng):
    from dkt_stereo_tpu.eval.validate import validate_middlebury

    root = _make_middlebury(tmp_path, rng, const_disp=11.0)
    res = validate_middlebury(_oracle(11.0), resolution="H", data_root=root)
    assert res["middleburyH-epe"] < 1e-5
    assert res["middleburyH-d1"] == 0.0
    # 2px threshold: a 1.5px-off oracle scores 0 D1 but epe 1.5
    res2 = validate_middlebury(_oracle(12.5), resolution="H", data_root=root)
    np.testing.assert_allclose(res2["middleburyH-epe"], 1.5, atol=1e-4)
    assert res2["middleburyH-d1"] == 0.0
    res3 = validate_middlebury(_oracle(14.0), resolution="H", data_root=root)
    assert res3["middleburyH-d1"] == 100.0


def _make_booster(tmp_path, rng, const_disp=7.0):
    root = tmp_path / "Booster_dataset" / "quarter" / "train" / "balanced" / "scene0"
    H, W = 40, 64
    os.makedirs(root / "camera_00")
    os.makedirs(root / "camera_02")
    img = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
    Image.fromarray(img).save(root / "camera_00" / "0000.png")
    Image.fromarray(img).save(root / "camera_02" / "0000.png")
    np.save(root / "disp_00.npy", np.full((H, W), const_disp, np.float32))
    return str(tmp_path / "Booster_dataset")


def test_validate_booster_oracle(tmp_path, rng):
    from dkt_stereo_tpu.eval.validate import validate_booster

    root = _make_booster(tmp_path, rng, const_disp=7.0)
    res = validate_booster(_oracle(7.0), resolution="Q", data_root=root)
    assert res["Booster-epe"] < 1e-5
    assert res["Booster-d1"] == 0.0
    res2 = validate_booster(_oracle(10.0), resolution="Q", data_root=root)  # 3px off
    assert res2["Booster-d1"] == 100.0  # >2px threshold


def test_eval_cli_spatial_bands(tmp_path, rng):
    """cli.eval --spatial_bands drives banded_forward_exact end-to-end
    (mesh construction, shard_map trace under cross-band stats, restore,
    validators) and agrees with the unbanded CLI run."""
    import jax
    import jax.random as jrandom

    from dkt_stereo_tpu.cli.eval import main
    from dkt_stereo_tpu.models import get_model
    from dkt_stereo_tpu.train.checkpoint import save_checkpoint

    root = _make_kitti(tmp_path, rng, const_disp=9.0)
    model_cls, cfg_cls, _ = get_model("RAFTStereo")
    cfg = cfg_cls(mixed_precision=False, corr_dtype="float32")
    model = model_cls(cfg, iters=2, test_mode=False)
    params = model.init(jrandom.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)))
    ckpt = save_checkpoint(str(tmp_path / "ck"), params, step=0)

    import json, os

    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps({
        "model": "RAFTStereo", "mixed_precision": False, "corr_dtype": "float32",
    }))
    args = ["--config", str(cfg_path), "--restore_ckpt", ckpt,
            "--valid_iters", "2", "--datasets", "kitti-2015",
            "--data_root", str(tmp_path)]
    plain = main(args)
    banded = main(args + ["--spatial_bands", "2", "--band_halo", "32"])
    np.testing.assert_allclose(
        banded["kitti-2015-epe"], plain["kitti-2015-epe"], rtol=1e-3
    )

def test_eval_cli_spatial_bands_non_raft(tmp_path, rng):
    """--spatial_bands must work for configs WITHOUT a pallas_encoder field
    (everything but RAFTStereo) — regression for a dataclasses.replace
    TypeError that killed the CLI before the banded forward ever ran."""
    import jax.random as jrandom

    from dkt_stereo_tpu.cli.eval import main
    from dkt_stereo_tpu.models import get_model
    from dkt_stereo_tpu.train.checkpoint import save_checkpoint

    _make_kitti(tmp_path, rng, const_disp=9.0)
    model_cls, cfg_cls, _ = get_model("CGI_Stereo")
    cfg = cfg_cls(mixed_precision=False)
    model = model_cls(cfg, test_mode=False)
    params = model.init(
        jrandom.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3))
    )
    ckpt = save_checkpoint(str(tmp_path / "ck"), params, step=0)

    import json

    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps({"model": "CGI_Stereo", "mixed_precision": False}))
    args = ["--config", str(cfg_path), "--restore_ckpt", ckpt,
            "--valid_iters", "2", "--datasets", "kitti-2015",
            "--data_root", str(tmp_path)]
    plain = main(args)
    banded = main(args + ["--spatial_bands", "2", "--band_halo", "32"])
    np.testing.assert_allclose(
        banded["kitti-2015-epe"], plain["kitti-2015-epe"], rtol=1e-3
    )


def test_make_forward_fn_compile_cache(rng):
    """Params enter the jitted forward as an ARGUMENT: swapping weights for
    the same (model, cfg, iters) must reuse the compiled executable (the
    train loop validates repeatedly; baking weights in as constants cost a
    full recompile per validation)."""
    from dkt_stereo_tpu.eval import validate as V

    class FakeModel:
        def __init__(self, cfg, iters=1, test_mode=True):
            self.cfg = cfg

        def apply(self, p, a, b):
            return None, p["w"] * (a.mean(-1) - b.mean(-1))

    V._FWD_CACHE.clear()
    a = jnp.ones((1, 4, 4, 3))
    b = jnp.zeros((1, 4, 4, 3))
    f1 = V.make_forward_fn(FakeModel, cfg=(1,), params={"w": jnp.float32(2.0)})
    f2 = V.make_forward_fn(FakeModel, cfg=(1,), params={"w": jnp.float32(5.0)})
    np.testing.assert_allclose(np.asarray(f1(a, b)), 2.0)
    np.testing.assert_allclose(np.asarray(f2(a, b)), 5.0)  # new weights apply
    assert len(V._FWD_CACHE) == 1  # one executable for both weight sets
    V._FWD_CACHE.clear()


def test_eval_cli_full_train_state_checkpoint(tmp_path, rng):
    """cli.eval must consume cli.train's own Orbax checkpoints (full DKT
    train-state trees) directly, selecting weights via --which — previously
    a typed restore against a bare-variables template crashed."""
    import jax
    import jax.random as jrandom

    from dkt_stereo_tpu.cli.eval import main
    from dkt_stereo_tpu.models import get_model
    from dkt_stereo_tpu.train.checkpoint import save_checkpoint

    import json

    _make_kitti(tmp_path, rng, const_disp=9.0)
    model_cls, cfg_cls, _ = get_model("RAFTStereo")
    cfg = cfg_cls(mixed_precision=False, corr_dtype="float32")
    model = model_cls(cfg, iters=2, test_mode=False)
    variables = model.init(
        jrandom.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3))
    )
    bumped = jax.tree_util.tree_map(lambda x: x + 0.05, variables)
    full = {"step": 3, "params": bumped, "ema_params": variables,
            "teacher_params": bumped, "opt_state": {}}
    ck_full = save_checkpoint(str(tmp_path / "full"), full, step=3)
    ck_bare = save_checkpoint(str(tmp_path / "bare"), variables, step=0)

    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps({
        "model": "RAFTStereo", "mixed_precision": False, "corr_dtype": "float32",
    }))
    args = ["--config", str(cfg_path), "--valid_iters", "2",
            "--datasets", "kitti-2015", "--data_root", str(tmp_path)]
    ema = main(args + ["--restore_ckpt", ck_full, "--which", "ema"])
    bare = main(args + ["--restore_ckpt", ck_bare])
    np.testing.assert_allclose(
        ema["kitti-2015-epe"], bare["kitti-2015-epe"], rtol=1e-6
    )
    student = main(args + ["--restore_ckpt", ck_full])  # default: student
    assert abs(student["kitti-2015-epe"] - bare["kitti-2015-epe"]) > 1e-3
