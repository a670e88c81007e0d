"""Fixture-tree coverage for the dataset classes a textual scan found
untested (SceneFlow/FallingThings/TartanAir, composition via fetch_dataset
and ConcatStereoDataset), the FlyingThings validator, the orbax
save→restore round-trip, and the StepTimer."""

import json
import os

import numpy as np
import pytest

from dkt_stereo_tpu.data import readers


def _png(path, rng, h=40, w=56):
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(rng.integers(0, 255, (h, w, 3)).astype(np.uint8)).save(path)


def _pfm(path, rng, h=40, w=56, lo=1.0, hi=30.0):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    readers.writePFM(path, rng.uniform(lo, hi, (h, w)).astype(np.float32))


@pytest.fixture()
def sceneflow_tree(tmp_path, rng):
    root = tmp_path / "sceneflow"
    things = root / "FlyingThings3D"
    for split in ("TRAIN", "TEST"):
        for scene in ("A/0000", "A/0001"):
            for side in ("left", "right"):
                _png(str(things / "frames_cleanpass" / split / scene / side / "0006.png"), rng)
                _png(str(things / "frames_finalpass" / split / scene / side / "0006.png"), rng)
            _pfm(str(things / "disparity" / split / scene / "left" / "0006.pfm"), rng)
    for side in ("left", "right"):
        _png(str(root / "Monkaa" / "frames_cleanpass" / "scene" / side / "0.png"), rng)
    _pfm(str(root / "Monkaa" / "disparity" / "scene" / "left" / "0.pfm"), rng)
    for side in ("left", "right"):
        _png(str(root / "Driving" / "frames_cleanpass" / "a" / "b" / "c" / side / "0.png"), rng)
    _pfm(str(root / "Driving" / "disparity" / "a" / "b" / "c" / "left" / "0.pfm"), rng)
    return str(root)


def test_sceneflow_dataset(sceneflow_tree):
    from dkt_stereo_tpu.data.datasets import SceneFlowDatasets

    train = SceneFlowDatasets(None, root=sceneflow_tree, dstype="frames_cleanpass")
    # 2 Things TRAIN + 1 Monkaa + 1 Driving
    assert len(train) == 4
    img1, img2, flow, valid = train.get_sample(0)
    assert img1.shape == (40, 56, 3) and img2.shape == (40, 56, 3)
    assert flow.shape == (40, 56) and (flow <= 0).all()  # negative convention
    assert valid.dtype == np.bool_ or valid.max() <= 1.0

    test = SceneFlowDatasets(None, root=sceneflow_tree, dstype="frames_finalpass", things_test=True)
    # with 2 TEST frames the seed-1000 400-image carve-out keeps both
    assert len(test) == 2
    for p in test.disparity_list:
        assert "disparity" in p and p.endswith(".pfm")


def test_validate_things_runs(sceneflow_tree):
    from dkt_stereo_tpu.eval.validate import validate_things

    def forward(x1, x2):
        import jax.numpy as jnp

        return jnp.zeros(x1.shape[:3], jnp.float32)

    out = validate_things(forward, data_root=sceneflow_tree, divide_factor=8)
    assert set(out) == {"things-epe", "things-d1"}
    # zero prediction: epe == |gt| > 1 everywhere in range -> d1 == 100
    assert out["things-epe"] > 0 and out["things-d1"] == pytest.approx(100.0, abs=5.0)


def test_fallingthings_dataset(tmp_path, rng):
    from dkt_stereo_tpu.data.datasets import FallingThings

    root = tmp_path / "FallingThings"
    scene = root / "scene"
    _png(str(scene / "0_left.jpg"), rng)
    _png(str(scene / "0_right.jpg"), rng)
    from PIL import Image

    depth = rng.integers(1000, 30000, (40, 56)).astype(np.uint16)
    Image.fromarray(depth).save(scene / "0_left.depth.png")
    with open(scene / "_camera_settings.json", "w") as f:
        json.dump({"camera_settings": [{"intrinsic_settings": {"fx": 768.2}}]}, f)
    with open(root / "filenames.txt", "w") as f:
        f.write("scene/0_left.jpg\n")

    ds = FallingThings(None, root=str(root))
    assert len(ds) == 1
    img1, img2, flow, valid = ds.get_sample(0)
    np.testing.assert_allclose(-flow, 768.2 * 600.0 / depth, rtol=1e-5)


def test_tartanair_dataset_and_keywords(tmp_path, rng):
    from dkt_stereo_tpu.data.datasets import TartanAir

    root = tmp_path
    entries = [
        "abandonedfactory/Easy/P000/image_left/000000_left.png",
        "seasonsforest_winter/Easy/P000/image_left/000000_left.png",  # excluded
        "hospital/Hard/P001/image_left/000001_left.png",
    ]
    for e in entries:
        _png(str(root / e), rng)
        _png(str(root / e.replace("_left", "_right")), rng)
        dp = e.replace("image_left", "depth_left").replace("left.png", "left_depth.npy")
        os.makedirs(os.path.dirname(root / dp), exist_ok=True)
        np.save(root / dp, rng.uniform(2, 50, (40, 56)).astype(np.float32))
    with open(root / "tartanair_filenames.txt", "w") as f:
        f.write("\n".join(entries))

    ds = TartanAir(None, root=str(root))
    assert len(ds) == 2  # winter Easy filtered out
    ds_kw = TartanAir(None, root=str(root), keywords=("hospital",))
    assert len(ds_kw) == 1
    img1, img2, flow, valid = ds_kw.get_sample(0)
    assert (flow <= 0).all() and valid.all()


def test_fetch_dataset_composition_and_concat(tmp_path, rng):
    from dkt_stereo_tpu.data.datasets import fetch_dataset

    # KITTI-2015 fixture
    k15 = tmp_path / "KITTI" / "KITTI_2015" / "training"
    for i in range(2):
        _png(str(k15 / "image_2" / f"00000{i}_10.png"), rng)
        _png(str(k15 / "image_3" / f"00000{i}_10.png"), rng)
        from PIL import Image

        d = (rng.uniform(1, 60, (40, 56)) * 256).astype(np.uint16)
        os.makedirs(k15 / "disp_occ_0", exist_ok=True)
        Image.fromarray(d).save(k15 / "disp_occ_0" / f"00000{i}_10.png")
    # FallingThings fixture
    ft = tmp_path / "FallingThings" / "scene"
    _png(str(ft / "0_left.jpg"), rng)
    _png(str(ft / "0_right.jpg"), rng)
    from PIL import Image

    Image.fromarray(rng.integers(1000, 30000, (40, 56)).astype(np.uint16)).save(
        ft / "0_left.depth.png"
    )
    with open(ft / "_camera_settings.json", "w") as f:
        json.dump({"camera_settings": [{"intrinsic_settings": {"fx": 700.0}}]}, f)
    with open(tmp_path / "FallingThings" / "filenames.txt", "w") as f:
        f.write("scene/0_left.jpg\n")

    ds = fetch_dataset(
        ["kitti_2015", "falling_things"], image_size=(32, 48), data_root=str(tmp_path)
    )
    # 2 KITTI + 1 FallingThings x5 replication
    assert len(ds) == 2 + 5
    # Concat routes indices to the right part with the right reader
    s = ds.get_sample(6, rng=np.random.default_rng(0))
    assert isinstance(s, dict) and set(s) >= {"img1", "img2", "img1_clean", "flow", "valid"}
    assert s["img1"].shape == (32, 48, 3)


def test_checkpoint_roundtrip_with_opt_state(tmp_path):
    import jax

    from dkt_stereo_tpu.models import get_model
    from dkt_stereo_tpu.train import DKTHyperParams, create_dkt_state
    from dkt_stereo_tpu.train.checkpoint import restore_checkpoint, save_checkpoint

    model_cls, cfg_cls, _ = get_model("RAFTStereo")
    cfg = cfg_cls(mixed_precision=False, context_norm="instance")
    hyper = DKTHyperParams(train_iters=2, teacher_iters=2, num_steps=10)
    state = create_dkt_state(cfg, hyper, jax.random.PRNGKey(0), (1, 32, 64), model_cls=model_cls)
    path = save_checkpoint(str(tmp_path / "ck"), state)
    zeroed = jax.tree_util.tree_map(lambda x: x * 0, state)
    back = restore_checkpoint(path, zeroed)
    for a, b in zip(jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_step_timer_excludes_warmup():
    from dkt_stereo_tpu.train.profiling import StepTimer

    import time

    t = StepTimer(warmup=2)
    # warmup iterations are 25x slower than the timed ones — a timer that
    # wrongly included them would report ~3x fewer steps/s
    for d in (0.05, 0.05, 0.002, 0.002, 0.002):
        with t:
            time.sleep(d)
    assert t.count == 5
    sps = t.steps_per_sec
    # 3 timed iterations at ~2ms each -> ~500 steps/s (sleep() overshoots,
    # so bound loosely from below); including the 50ms warmups would give
    # ~1/(0.104/5) ≈ 48
    assert 100 < sps < 1000, sps


def test_nerfstereo_dataset(tmp_path, rng):
    import cv2

    from dkt_stereo_tpu.data.triplet import NerfStereo

    dp = tmp_path / "ns"
    os.makedirs(dp, exist_ok=True)
    H, W = 40, 64
    names = ["l.png", "c.png", "r.png"]
    for n in names:
        _png(str(dp / n), rng, H, W)
    disp = rng.uniform(1, 30, (H, W)).astype(np.float32)
    cv2.imwrite(str(dp / "d.png"), (disp * 64).astype(np.uint16))
    conf = rng.uniform(0, 1, (H, W)).astype(np.float32)
    cv2.imwrite(str(dp / "conf.png"), (conf * 65536).clip(0, 65535).astype(np.uint16))
    tf = tmp_path / "train.txt"
    tf.write_text("l.png c.png r.png d.png conf.png\n")

    ds = NerfStereo(datapath=str(dp), training_file=str(tf),
                    aug_params={"crop_size": (32, 48)})
    assert len(ds) == 1
    s = ds.get_sample(0, rng=np.random.default_rng(0))
    assert set(s) == {"im1_forward", "im2_forward", "flow", "conf", "im0", "im1", "im2"}
    assert s["im1_forward"].shape == (32, 48, 3)
    assert (s["flow"] <= 0).all()  # negative convention
    assert 0 <= s["conf"].min() and s["conf"].max() <= 1.0 + 1e-6


def test_crop_augmentor(rng):
    from dkt_stereo_tpu.data.augmentor import CropAugmentor

    aug = CropAugmentor((16, 24), rng=np.random.default_rng(1))
    img1 = rng.uniform(0, 255, (40, 64, 3)).astype(np.float32)
    img2 = rng.uniform(0, 255, (40, 64, 3)).astype(np.float32)
    flow = rng.uniform(-30, 0, (40, 64, 2)).astype(np.float32)
    c1, c2, cf = aug(img1, img2, flow)
    assert c1.shape == (16, 24, 3) and c2.shape == (16, 24, 3) and cf.shape == (16, 24, 2)
    # locate the crop offset from row 0, then require the WHOLE crop — and
    # the img2/flow crops — to be the same-aligned source window (misaligned
    # stereo pairs would corrupt training while a row-0-only check passes)
    offs = [
        (y, x)
        for y in range(40)
        for x in range(41)
        if np.array_equal(c1[0], img1[y, x : x + 24])
    ]
    assert offs, "crop row 0 not found in source"
    y0, x0 = offs[0]
    np.testing.assert_array_equal(c1, img1[y0 : y0 + 16, x0 : x0 + 24])
    np.testing.assert_array_equal(c2, img2[y0 : y0 + 16, x0 : x0 + 24])
    np.testing.assert_array_equal(cf, flow[y0 : y0 + 16, x0 : x0 + 24])
