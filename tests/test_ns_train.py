"""NeRF-Stereo training end-to-end: mixed-collate contract, static-split
loader, loss_func dispatch, and a train-CLI run on a triplet fixture tree
with decreasing ns_loss (the capability the reference carries but never
wires: collate_fn commented out of fetch_dataloader at
core/stereo_datasets.py:537, ns_loss signature incompatible with
tools/ft_dkt.py:227)."""

import json

import cv2
import numpy as np
import pytest

from dkt_stereo_tpu.data.loader import MixedStereoLoader
from dkt_stereo_tpu.data.triplet import NerfStereo, collate_mixed, split_modalities


def _make_ns_tree(root, rng, n_scenes=4, H=96, W=128, disp_px=4.0):
    """Triplet fixture tree following the reference's NerfStereo layout
    (core/stereo_datasets.py:374-401): 8-bit image triplets, 16-bit
    disp (×64) and conf (×65536) PNGs, and a trainingQ.txt file list."""
    base = root / "nerf-stereo"
    ts = base / "training_set"
    lines = []
    for s in range(n_scenes):
        d = ts / f"scene{s}"
        d.mkdir(parents=True)
        yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
        for k, name in enumerate(("im0", "im1", "im2")):
            img = np.stack(
                [
                    (xx / W * 200 + k * 10) % 255,
                    (yy / H * 200 + s * 17) % 255,
                    ((xx + yy) / (H + W) * 200) % 255,
                ],
                axis=-1,
            ).astype(np.uint8)
            cv2.imwrite(str(d / f"{name}.png"), img)
        disp = np.full((H, W), disp_px, np.float32) + rng.uniform(-0.5, 0.5, (H, W))
        conf = np.full((H, W), 0.95, np.float32)
        cv2.imwrite(str(d / "disp.png"), (disp * 64.0).astype(np.uint16))
        cv2.imwrite(str(d / "conf.png"), (conf * 65536.0).clip(0, 65535).astype(np.uint16))
        lines.append(
            f"scene{s}/im0.png scene{s}/im1.png scene{s}/im2.png "
            f"scene{s}/disp.png scene{s}/conf.png"
        )
    (base / "trainingQ.txt").write_text("\n".join(lines) + "\n")
    return base


class _FakeBi:
    """Minimal binocular dataset with StereoDataset's augmented contract."""

    def __init__(self, n, H=32, W=48):
        self.n, self.H, self.W = n, H, W

    def __len__(self):
        return self.n

    def get_sample(self, i, rng=None):
        z = np.full((self.H, self.W, 3), float(i), np.float32)
        return {
            "img1": z, "img2": z + 1, "img1_clean": z, "img2_clean": z + 1,
            "flow": np.full((self.H, self.W), -2.0, np.float32),
            "valid": np.ones((self.H, self.W), np.float32),
        }


class _FakeTri:
    def __init__(self, n, H=32, W=48):
        self.n, self.H, self.W = n, H, W

    def __len__(self):
        return self.n

    def get_sample(self, i, rng=None):
        z = np.full((self.H, self.W, 3), 100.0 + i, np.float32)
        return {
            "im1_forward": z, "im2_forward": z + 1,
            "flow": np.full((self.H, self.W), -3.0, np.float32),
            "conf": np.full((self.H, self.W), 0.9, np.float32),
            "im0": z, "im1": z + 1, "im2": z + 2,
        }


def test_collate_mixed_contract():
    """Pin the reference's collate contract (core/stereo_datasets.py:449-480):
    forward stack = bi rows then tri rows; per-modality sub-dicts."""
    bi = [_FakeBi(4).get_sample(i) for i in range(3)]
    tri = [_FakeTri(4).get_sample(i) for i in range(2)]
    data, n_bi, n_tri = collate_mixed(bi + tri)
    assert (n_bi, n_tri) == (3, 2)
    assert data["im1_forward"].shape == (5, 32, 48, 3)
    # bi rows first, tri rows after — the static order the NS step slices on
    np.testing.assert_allclose(data["im1_forward"][0, 0, 0, 0], 0.0)
    np.testing.assert_allclose(data["im1_forward"][3, 0, 0, 0], 100.0)
    assert set(data["bi"]) == {"flow", "valid"}
    assert set(data["tri"]) == {"flow", "conf", "im0", "im1", "im2"}
    assert data["bi"]["flow"].shape == (3, 32, 48)
    assert data["tri"]["conf"].shape == (2, 32, 48)

    # tri-only batches (pure NS training)
    data, n_bi, n_tri = collate_mixed(tri)
    assert (n_bi, n_tri) == (0, 2)
    assert data["im1_forward"].shape == (2, 32, 48, 3)
    assert data["bi"] == {}


def test_mixed_loader_static_split():
    """Every batch carries the SAME bi/tri composition (jit-compatible
    shapes) — the TPU-native redesign of the torch ragged collate."""
    loader = MixedStereoLoader(
        _FakeBi(12), _FakeTri(6), batch_size=6, num_tri=2, num_workers=2, seed=0
    )
    assert (loader.nb, loader.nt) == (4, 2)
    batches = list(loader)
    assert len(batches) == 3  # min(12//4, 6//2)
    for b in batches:
        assert b["im1_forward"].shape == (6, 32, 48, 3)
        assert b["bi"]["flow"].shape == (4, 32, 48)
        assert b["tri"]["flow"].shape == (2, 32, 48)
        # composition by construction: first nb rows are bi samples (<100)
        assert (b["im1_forward"][:4, 0, 0, 0] < 100).all()
        assert (b["im1_forward"][4:, 0, 0, 0] >= 100).all()

    # proportional default: 12 bi / 6 tri at batch 6 → nt = 2
    auto = MixedStereoLoader(_FakeBi(12), _FakeTri(6), batch_size=6, num_workers=1)
    assert (auto.nb, auto.nt) == (4, 2)
    # per-host divisibility is enforced (static per-host composition)
    with pytest.raises(ValueError, match="divide across"):
        MixedStereoLoader(
            _FakeBi(12), _FakeTri(6), batch_size=4, num_tri=1, num_hosts=2
        )
    # empty-pool splits are rejected
    with pytest.raises(ValueError, match="empty pool"):
        MixedStereoLoader(None, _FakeTri(6), batch_size=4, num_tri=2)


def test_fetch_dataset_nerf_branch(tmp_path, rng):
    """fetch_dataset('nerf_stereo') builds the triplet dataset with the NS
    aug params + thresholds (reference core/stereo_datasets.py:528-533) and
    split_modalities separates mixed compositions."""
    _make_ns_tree(tmp_path, rng)
    from dkt_stereo_tpu.data.datasets import fetch_dataset

    ds = fetch_dataset(
        ["nerf_stereo"], (64, 96), data_root=str(tmp_path), conf_threshold=0.7,
        disp_threshold=400.0,
    )
    assert isinstance(ds, NerfStereo)
    assert ds.conf_threshold == 0.7 and ds.disp_threshold == 400.0
    assert ds.augmentor.min_scale == -0.2 and ds.augmentor.max_scale == 0.5
    assert ds.augmentor.do_flip is True
    s = ds.get_sample(0, np.random.default_rng(0))
    assert s["im1_forward"].shape == (64, 96, 3)
    assert s["flow"].shape == (64, 96) and (s["flow"] <= 0).all()

    bi, tri = split_modalities(ds)
    assert bi is None and tri is ds


def test_loss_func_registry_dispatch():
    """The __losses__ dispatch (meta_arch/__init__.py:15-21,
    tools/ft_dkt.py:117-118): config loss_func selects the loss by name,
    unknown names raise, ns_loss routes to the NS step."""
    import jax.numpy as jnp

    from dkt_stereo_tpu.models import get_model
    from dkt_stereo_tpu.models.registry import make_loss_adapter

    _, cfg_cls, _ = get_model("IGEVStereo")
    cfg = cfg_cls()
    with pytest.raises(KeyError, match="unknown loss_func"):
        make_loss_adapter("IGEVStereo", cfg, "not_a_loss")
    with pytest.raises(ValueError, match="trinocular"):
        make_loss_adapter("RAFTStereo", cfg, "ns_loss")

    # IGEV under the REFERENCE dispatch (configs/igev_stereo/base.json says
    # sequence_loss_raft): init_disp must NOT contribute
    preds = jnp.zeros((2, 1, 8, 8))
    out = {"disp_preds": preds, "init_disp": jnp.full((1, 8, 8), 50.0)}
    gt = jnp.full((1, 8, 8), -1.0)
    valid = jnp.ones((1, 8, 8))
    raft_like = make_loss_adapter("IGEVStereo", cfg, "sequence_loss_raft")
    l_raft, *_ = raft_like(out, gt, valid)
    out2 = dict(out, init_disp=jnp.full((1, 8, 8), -50.0))
    np.testing.assert_allclose(float(l_raft), float(raft_like(out2, gt, valid)[0]))
    # ... while the default (sequence_loss_igev) DOES read init_disp
    igev_loss = make_loss_adapter("IGEVStereo", cfg)
    assert float(igev_loss(out, gt, valid)[0]) != float(igev_loss(out2, gt, valid)[0])


def test_ns_step_multihost_modality_alignment(rng):
    """Regression (round-4 advisor, high): with num_hosts > 1 the GLOBAL
    forward stack assembled by shard_batch is host-block interleaved
    ``[h0: nb_l bi, nt_l tri | h1: nb_l bi, nt_l tri]`` — a naive
    ``preds[:, :nb]`` prefix slice silently scores binocular losses against
    trinocular predictions. The step must re-slice per host block: the
    2-host step on the interleaved layout must match the 1-host step on the
    contiguous layout exactly (same loss, same updated params)."""
    import jax
    import jax.numpy as jnp

    from dkt_stereo_tpu.models.raft_stereo import RAFTStereo, RAFTStereoConfig
    from dkt_stereo_tpu.train import DKTHyperParams
    from dkt_stereo_tpu.train.dkt_step import create_dkt_state
    from dkt_stereo_tpu.train.ns_step import make_ns_train_step

    cfg = RAFTStereoConfig(
        mixed_precision=False, context_norm="instance", corr_levels=2,
        corr_radius=2, n_downsample=2, n_gru_layers=1,
        hidden_dims=(16, 16, 16), corr_dtype="float32",
    )
    hyper = DKTHyperParams(train_iters=2, teacher_iters=2, num_steps=100)
    H, W = 32, 64
    state = create_dkt_state(cfg, hyper, jax.random.PRNGKey(0), (2, H, W))

    # two bi rows (b0, b1) and two tri rows (t0, t1), all distinct
    def img(v):
        return jnp.asarray(rng.uniform(0, 255, (H, W, 3)).astype(np.float32)) + v

    b_im1 = [img(0.0), img(1.0)]
    b_im2 = [img(2.0), img(3.0)]
    t_im1 = [img(4.0), img(5.0)]
    t_im2 = [img(6.0), img(7.0)]
    b_flow = jnp.asarray(-rng.uniform(0, 8, (2, H, W)).astype(np.float32))
    b_valid = jnp.ones((2, H, W), jnp.float32)
    tri = {
        "flow": jnp.asarray(-rng.uniform(0, 8, (2, H, W)).astype(np.float32)),
        "conf": jnp.full((2, H, W), 0.9, jnp.float32),
        "im0": jnp.stack([img(8.0), img(9.0)]),
        "im1": jnp.stack([img(10.0), img(11.0)]),
        "im2": jnp.stack([img(12.0), img(13.0)]),
    }

    # contiguous (single-host) layout: [b0, b1, t0, t1]
    batch_1h = {
        "im1_forward": jnp.stack([b_im1[0], b_im1[1], t_im1[0], t_im1[1]]),
        "im2_forward": jnp.stack([b_im2[0], b_im2[1], t_im2[0], t_im2[1]]),
        "bi": {"flow": b_flow, "valid": b_valid},
        "tri": tri,
    }
    # host-block interleaved (2-host) layout: [b0, t0 | b1, t1]; the
    # per-modality targets concatenate per host block in the same order
    batch_2h = {
        "im1_forward": jnp.stack([b_im1[0], t_im1[0], b_im1[1], t_im1[1]]),
        "im2_forward": jnp.stack([b_im2[0], t_im2[0], b_im2[1], t_im2[1]]),
        "bi": {"flow": b_flow, "valid": b_valid},
        "tri": tri,
    }

    key = jax.random.PRNGKey(7)
    step_1h = make_ns_train_step(cfg, hyper, RAFTStereo, nb=2, nt=2, num_hosts=1)
    step_2h = make_ns_train_step(cfg, hyper, RAFTStereo, nb=2, nt=2, num_hosts=2)
    s1, m1 = step_1h(state, batch_1h, key)
    s2, m2 = step_2h(state, batch_2h, key)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m1["ns_loss"]), float(m2["ns_loss"]), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params["params"]),
        jax.tree_util.tree_leaves(s2.params["params"]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    # teeth: the pre-fix behavior (prefix slice on the interleaved layout)
    # computes a DIFFERENT loss — modality misalignment is observable
    _, m_bad = step_1h(state, batch_2h, key)
    assert abs(float(m_bad["loss"]) - float(m1["loss"])) > 1e-4


def test_ns_train_cli_end_to_end(tmp_path, rng, monkeypatch):
    """Train-CLI run on the triplet fixture tree: loss_func=ns_loss routes to
    the NS step, ns_loss decreases, a checkpoint lands."""
    import dkt_stereo_tpu.utils.logging as L

    # force the JSONL writer so per-step live_loss is machine-readable
    monkeypatch.setattr(L, "make_writer", lambda d: L._JsonlWriter(d))

    _make_ns_tree(tmp_path, rng, n_scenes=8)
    cfg = {
        "model": "RAFTStereo",
        "loss_func": "ns_loss",
        "corr_implementation": "reg",
        "corr_levels": 2,
        "corr_radius": 2,
        "n_downsample": 2,
        "n_gru_layers": 1,
        "hidden_dims": [16, 16, 16],
        "context_norm": "batch",
        "slow_fast_gru": False,
        "mixed_precision": False,
        "corr_dtype": "float32",
    }
    cfg_path = tmp_path / "ns_tiny.json"
    cfg_path.write_text(json.dumps(cfg))
    save_dir = tmp_path / "run"

    from dkt_stereo_tpu.cli.train import parse_args, train

    n_steps = 16
    args = parse_args([
        "--config", str(cfg_path),
        "--train_datasets", "nerf_stereo",
        "--data_root", str(tmp_path),
        "--save_dir", str(save_dir),
        "--batch_size", "8",
        "--image_size", "64", "96",
        "--train_iters", "2",
        "--valid_iters", "2",
        "--num_steps", str(n_steps),
        "--num_workers", "2",
        "--validation_frequency", "10000",
        "--lr", "1e-3",
    ])
    final = train(args)
    assert final  # checkpoint saved

    losses = []
    with open(save_dir / "metrics.jsonl") as f:
        for line in f:
            rec = json.loads(line)
            if rec["tag"] == "live_loss":
                losses.append(rec["value"])
    assert len(losses) >= n_steps
    first, last = np.mean(losses[:4]), np.mean(losses[-4:])
    assert last < first, (first, last)  # ns_loss decreases on the fixture
