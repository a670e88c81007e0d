"""Data layer: readers (format roundtrips), augmentors, datasets, loader."""

import os

import numpy as np
import pytest
import cv2
from PIL import Image

from dkt_stereo_tpu.data import readers
from dkt_stereo_tpu.data.augmentor import (
    FlowAugmentorRTClean,
    SparseFlowAugmentorRTClean,
    resize_sparse_flow_map,
)
from dkt_stereo_tpu.data.datasets import KITTI, StereoDataset
from dkt_stereo_tpu.data.loader import StereoLoader


def test_pfm_roundtrip(tmp_path, rng):
    arr = rng.standard_normal((7, 9)).astype(np.float32)
    p = str(tmp_path / "x.pfm")
    readers.writePFM(p, arr)
    back = readers.readPFM(p)
    np.testing.assert_allclose(back, arr, atol=1e-6)


def test_kitti_disp_roundtrip(tmp_path, rng):
    disp = (rng.uniform(0, 100, (5, 8)) * 256).astype(np.uint16)
    disp[0, 0] = 0
    p = str(tmp_path / "d.png")
    cv2.imwrite(p, disp)
    d, v = readers.readDispKITTI(p)
    np.testing.assert_allclose(d, disp / 256.0, atol=1e-6)
    assert not v[0, 0] and v[1, 1]


def test_sintel_disp_decoding(tmp_path):
    # disp = R*4 + G/64 + B/16384 (frame_utils.py:158-164)
    os.makedirs(tmp_path / "disparities" / "seq", exist_ok=True)
    os.makedirs(tmp_path / "occlusions" / "seq", exist_ok=True)
    rgb = np.zeros((4, 4, 3), np.uint8)
    rgb[..., 0] = 10  # 40 px disparity
    Image.fromarray(rgb).save(tmp_path / "disparities" / "seq" / "frame_0001.png")
    Image.fromarray(np.zeros((4, 4), np.uint8)).save(
        tmp_path / "occlusions" / "seq" / "frame_0001.png"
    )
    d, v = readers.readDispSintelStereo(str(tmp_path / "disparities" / "seq" / "frame_0001.png"))
    np.testing.assert_allclose(d, 40.0)
    assert v.all()


def _pair(rng, H=120, W=240):
    img1 = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
    img2 = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
    return img1, img2


def test_dense_augmentor_shapes_and_clean_semantics(rng):
    img1, img2 = _pair(rng)
    flow = np.stack([rng.uniform(1, 30, (120, 240)), np.zeros((120, 240))], -1).astype(np.float32)
    aug = FlowAugmentorRTClean(
        crop_size=(64, 128), rng=np.random.default_rng(3), yjitter=True
    )
    i1c, i2c, i1, i2, f = aug(img1, img2, flow)
    assert i1c.shape == (64, 128, 3) and i1.shape == (64, 128, 3)
    assert f.shape == (64, 128, 2)

    # Clean pair must be photometrically untouched. Constant-color sources
    # make this a sharp oracle: every spatial-only transform (resize, crop,
    # flip, y-jitter) maps a constant image to the same constant, while any
    # photometric op (jitter/gamma/eraser) would move pixel values.
    c1 = np.full((120, 240, 3), (37, 99, 201), np.uint8)
    c2 = np.full((120, 240, 3), (64, 150, 30), np.uint8)
    for seed in range(4):
        aug2 = FlowAugmentorRTClean(
            crop_size=(64, 128), rng=np.random.default_rng(seed), yjitter=True
        )
        j1c, j2c, j1, j2, _ = aug2(c1, c2, flow.copy())
        np.testing.assert_array_equal(j1c, np.broadcast_to((37, 99, 201), j1c.shape))
        np.testing.assert_array_equal(j2c, np.broadcast_to((64, 150, 30), j2c.shape))
        # the augmented pair DID get photometric treatment (jitter always runs)
        assert not np.array_equal(j1, j1c)


def test_sparse_augmentor_shapes(rng):
    img1, img2 = _pair(rng)
    flow = np.stack([rng.uniform(1, 30, (120, 240)), np.zeros((120, 240))], -1).astype(np.float32)
    valid = (rng.uniform(size=(120, 240)) > 0.5).astype(np.float32)
    aug = SparseFlowAugmentorRTClean(crop_size=(64, 128), rng=np.random.default_rng(4))
    i1c, i2c, i1, i2, f, v = aug(img1, img2, flow, valid)
    assert i1c.shape == (64, 128, 3)
    assert f.shape == (64, 128, 2) and v.shape == (64, 128)
    assert set(np.unique(v)).issubset({0, 1})


def test_augmentors_crop_larger_than_source(rng):
    """Source smaller than the crop must still yield crop-size outputs.

    The reference degenerates here (sliver crops / empty randint ranges)
    whenever the probabilistic resize branch is skipped; we force the
    min_scale resize instead (documented reference-bug fix).
    """
    img1, img2 = _pair(rng, H=60, W=100)  # smaller than the 64x128 crop
    dflow = np.stack([rng.uniform(1, 30, (60, 100)), np.zeros((60, 100))], -1).astype(np.float32)
    valid = (rng.uniform(size=(60, 100)) > 0.5).astype(np.float32)
    for seed in range(16):  # cover both resize-branch outcomes
        daug = FlowAugmentorRTClean(crop_size=(64, 128), rng=np.random.default_rng(seed))
        out = daug(img1, img2, dflow)
        assert out[0].shape == (64, 128, 3) and out[4].shape == (64, 128, 2)
        saug = SparseFlowAugmentorRTClean(crop_size=(64, 128), rng=np.random.default_rng(seed))
        sout = saug(img1, img2, dflow, valid)
        assert sout[0].shape == (64, 128, 3) and sout[5].shape == (64, 128)


def test_resize_sparse_flow_map_scatter(rng):
    flow = np.zeros((10, 20, 2), np.float32)
    flow[5, 10] = [4.0, 0.0]
    valid = np.zeros((10, 20), np.float32)
    valid[5, 10] = 1
    f2, v2 = resize_sparse_flow_map(flow, valid, fx=2.0, fy=2.0)
    assert f2.shape == (20, 40, 2)
    assert v2[10, 20] == 1 and v2.sum() == 1
    np.testing.assert_allclose(f2[10, 20], [8.0, 0.0])


def _make_kitti_tree(tmp_path, rng, n=4):
    r15 = tmp_path / "KITTI" / "KITTI_2015"
    for sub in ["training/image_2", "training/image_3", "training/disp_occ_0"]:
        os.makedirs(r15 / sub, exist_ok=True)
    H, W = 140, 300
    for i in range(n):
        img = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
        Image.fromarray(img).save(r15 / "training/image_2" / f"{i:06d}_10.png")
        Image.fromarray(img).save(r15 / "training/image_3" / f"{i:06d}_10.png")
        disp = (rng.uniform(1, 60, (H, W)) * 256).astype(np.uint16)
        cv2.imwrite(str(r15 / "training/disp_occ_0" / f"{i:06d}_10.png"), disp)
    return str(tmp_path / "KITTI")


def test_loader_backpressure():
    """Produced-but-unconsumed batches never exceed ``prefetch`` while a slow
    consumer drains (the torch DataLoader bound the loader replaces,
    core/stereo_datasets.py:537-538)."""
    import threading
    import time

    started = [0]
    lock = threading.Lock()

    class CountingDataset:
        def __len__(self):
            return 24

        def get_sample(self, i, rng):
            with lock:
                started[0] += 1  # one sample per batch → batches started
            return {"img1": np.zeros((4, 4, 3), np.float32)}

    ds = CountingDataset()
    prefetch = 2
    loader = StereoLoader(
        ds, batch_size=1, num_workers=6, seed=0, shuffle=False, prefetch=prefetch
    )
    consumed = 0
    max_inflight = 0
    for _ in loader:
        consumed += 1
        time.sleep(0.02)  # slow consumer: give workers time to run ahead
        with lock:
            max_inflight = max(max_inflight, started[0] - consumed)
    assert consumed == 24
    assert max_inflight <= prefetch, max_inflight


def test_kitti_dataset_and_loader(tmp_path, rng):
    root = _make_kitti_tree(tmp_path, rng)
    aug = {"crop_size": (64, 128), "min_scale": -0.2, "max_scale": 0.4,
           "do_flip": False, "yjitter": False}
    ds = KITTI(aug, root=root, split="2015")
    assert len(ds) == 4
    sample = ds.get_sample(0, np.random.default_rng(0))
    assert sample["img1"].shape == (64, 128, 3)
    assert sample["flow"].shape == (64, 128)
    # disparity stored negative (core/stereo_datasets.py:136)
    assert (sample["flow"] * sample["valid"] <= 0).all()
    assert sample["valid"].max() == 1.0

    loader = StereoLoader(ds, batch_size=2, num_workers=2, seed=7)
    batches = list(loader)
    assert len(batches) == 2
    b = batches[0]
    assert b["img1"].shape == (2, 64, 128, 3)
    assert b["img1_clean"].shape == (2, 64, 128, 3)
    assert b["flow"].shape == (2, 64, 128)


def test_loader_host_sharding(tmp_path, rng):
    root = _make_kitti_tree(tmp_path, rng)
    ds = KITTI(None, root=root, split="2015")
    # eval mode (no augmentor): get_sample returns a tuple
    img1, img2, flow, valid = ds.get_sample(0)
    assert img1.ndim == 3 and flow.ndim == 2

    aug = {"crop_size": (64, 128), "min_scale": -0.2, "max_scale": 0.4,
           "do_flip": False, "yjitter": False}
    ds = KITTI(aug, root=root, split="2015")
    full = StereoLoader(ds, batch_size=4, num_workers=1, seed=5, shuffle=True)
    h0 = StereoLoader(ds, batch_size=4, num_workers=1, seed=5, shuffle=True,
                      num_hosts=2, host_id=0)
    h1 = StereoLoader(ds, batch_size=4, num_workers=1, seed=5, shuffle=True,
                      num_hosts=2, host_id=1)
    bf = next(iter(full))
    b0 = next(iter(h0))
    b1 = next(iter(h1))
    assert b0["img1"].shape[0] == 2 and b1["img1"].shape[0] == 2
    assert bf["img1"].shape[0] == 4

    # Disjoint-split property, pinned with an index-probe dataset: each host
    # must serve ITS half of the same seeded global batch order.
    class Probe:
        def __len__(self):
            return 8

        def get_sample(self, i, rng=None):
            return {"x": np.full((2, 2), float(i), np.float32)}

    pf = next(iter(StereoLoader(Probe(), batch_size=4, num_workers=1, seed=5)))
    p0 = next(iter(StereoLoader(Probe(), batch_size=4, num_workers=1, seed=5,
                                num_hosts=2, host_id=0)))
    p1 = next(iter(StereoLoader(Probe(), batch_size=4, num_workers=1, seed=5,
                                num_hosts=2, host_id=1)))
    np.testing.assert_array_equal(p0["x"], pf["x"][:2])
    np.testing.assert_array_equal(p1["x"], pf["x"][2:])
    i0 = {float(v) for v in p0["x"][:, 0, 0]}
    i1_ = {float(v) for v in p1["x"][:, 0, 0]}
    assert not (i0 & i1_), (i0, i1_)  # no sample served twice


def test_dataset_mul_and_add(tmp_path, rng):
    root = _make_kitti_tree(tmp_path, rng)
    ds = KITTI(None, root=root, split="2015")
    assert len(ds * 3) == 12
    assert len(ds + ds) == 8


def test_loader_process_mode(tmp_path, rng):
    root = _make_kitti_tree(tmp_path, rng)
    aug = {"crop_size": (64, 128), "min_scale": -0.2, "max_scale": 0.4,
           "do_flip": False, "yjitter": False}
    ds = KITTI(aug, root=root, split="2015")
    loader = StereoLoader(ds, batch_size=2, num_workers=2, seed=7, use_processes=True)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["img1"].shape == (2, 64, 128, 3)
    loader._pool.shutdown()


def test_sintel_disp_decoding_large_disparity(tmp_path):
    # reference bug fixed: d_r*4 on raw uint8 wraps mod 256 (70*4 -> 24);
    # decode must run in float so 280 px survives
    os.makedirs(tmp_path / "disparities" / "seq", exist_ok=True)
    os.makedirs(tmp_path / "occlusions" / "seq", exist_ok=True)
    rgb = np.zeros((4, 4, 3), np.uint8)
    rgb[..., 0] = 70  # 280 px disparity
    Image.fromarray(rgb).save(tmp_path / "disparities" / "seq" / "frame_0001.png")
    Image.fromarray(np.zeros((4, 4), np.uint8)).save(
        tmp_path / "occlusions" / "seq" / "frame_0001.png"
    )
    d, v = readers.readDispSintelStereo(str(tmp_path / "disparities" / "seq" / "frame_0001.png"))
    np.testing.assert_allclose(d, 280.0)


def test_loader_worker_error_propagates():
    """A worker exception (e.g. a corrupt image) must raise in the consumer,
    not deadlock the in-order loop with a permit held by a dead thread."""

    class ExplodingDataset:
        def __len__(self):
            return 8

        def get_sample(self, i, rng=None):
            if i == 5:
                raise OSError("corrupt image file")
            return {"x": np.zeros((4, 4), np.float32)}

    loader = StereoLoader(ExplodingDataset(), batch_size=2, shuffle=False,
                          num_workers=2, seed=0, prefetch=2)
    with pytest.raises(OSError, match="corrupt image"):
        list(loader)


def test_loader_multihost_ragged_tail_dropped(tmp_path, rng):
    """With num_hosts>1 the final partial global batch cannot shard into
    equal per-host slices — dropped even under drop_last=False (previously:
    IndexError on the later host's empty slice)."""

    class TinyDataset:
        def __len__(self):
            return 10

        def get_sample(self, i, rng=None):
            return {"x": np.full((2, 2), i, np.float32)}

    for host in (0, 1):
        loader = StereoLoader(TinyDataset(), batch_size=8, shuffle=False,
                              num_workers=1, seed=0, drop_last=False,
                              num_hosts=2, host_id=host)
        batches = list(loader)
        assert len(batches) == 1
        assert batches[0]["x"].shape == (4, 2, 2)
    # single host keeps the torch drop_last=False semantics (short tail)
    loader = StereoLoader(TinyDataset(), batch_size=8, shuffle=False,
                          num_workers=1, seed=0, drop_last=False)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[1]["x"].shape == (2, 2, 2)


def test_get_sample_does_not_mutate_shared_augmentor(tmp_path, rng):
    """Loader workers share the dataset object; binding the caller's rng must
    happen on a per-call copy, never on the shared augmentor (thread race)."""
    root = _make_kitti_tree(tmp_path, rng)
    aug = {"crop_size": (64, 128), "min_scale": -0.2, "max_scale": 0.4,
           "do_flip": False, "yjitter": False}
    ds = KITTI(aug, root=root, split="2015")
    shared_rng = ds.augmentor.rng
    caller_rng = np.random.default_rng(42)
    ds.get_sample(0, caller_rng)
    assert ds.augmentor.rng is shared_rng  # untouched

    # determinism: two loaders with the same seed produce identical epochs
    a = list(StereoLoader(ds, batch_size=2, num_workers=4, seed=3))
    b = list(StereoLoader(ds, batch_size=2, num_workers=4, seed=3))
    for x, y in zip(a, b):
        for k in x:
            np.testing.assert_array_equal(x[k], y[k])


def test_dataset_add_concat_and_mixed_aug(tmp_path, rng):
    root = _make_kitti_tree(tmp_path, rng)
    aug_a = {"crop_size": (64, 128), "min_scale": -0.2, "max_scale": 0.4,
             "do_flip": False, "yjitter": False}
    aug_b = {"crop_size": (32, 64), "min_scale": -0.2, "max_scale": 0.4,
             "do_flip": False, "yjitter": False}
    ds_a = KITTI(aug_a, root=root, split="2015")
    ds_b = KITTI(aug_b, root=root, split="2015")

    # differing augmentor configs must NOT merge (other's crop would be lost)
    mixed = ds_a + ds_b
    from dkt_stereo_tpu.data.datasets import ConcatStereoDataset

    assert isinstance(mixed, ConcatStereoDataset)
    assert len(mixed) == 8
    r = np.random.default_rng(0)
    assert mixed.get_sample(1, r)["img1"].shape == (64, 128, 3)
    assert mixed.get_sample(5, r)["img1"].shape == (32, 64, 3)

    # StereoDataset + ConcatStereoDataset composes (previously AttributeError)
    triple = ds_a + mixed
    assert len(triple) == 12
    assert isinstance(triple, ConcatStereoDataset)
    # replication distributes over the parts
    assert len(mixed * 2) == 16

    # identical configs still merge into one flat dataset
    same = ds_a + KITTI(dict(aug_a), root=root, split="2015")
    assert not isinstance(same, ConcatStereoDataset)
    assert len(same) == 8


def test_img_pad_applied(tmp_path, rng):
    """img_pad pads the images (zero, symmetric) but not flow/valid —
    reference core/stereo_datasets.py:125-132 (previously a silent no-op)."""
    root = _make_kitti_tree(tmp_path, rng)
    aug = {"crop_size": (64, 128), "min_scale": -0.2, "max_scale": 0.4,
           "do_flip": False, "yjitter": False, "img_pad": (4, 8)}
    ds = KITTI(aug, root=root, split="2015")
    s = ds.get_sample(0, np.random.default_rng(0))
    assert s["img1"].shape == (72, 144, 3)
    assert s["img2"].shape == (72, 144, 3)
    assert s["img1_clean"].shape == (72, 144, 3)
    assert s["flow"].shape == (64, 128)
    assert s["valid"].shape == (64, 128)
