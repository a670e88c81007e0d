"""Native host library: PFM codec, CPU corr lookup oracle, replicate pad."""

import numpy as np
import pytest
import jax.numpy as jnp

from dkt_stereo_tpu import native
from dkt_stereo_tpu.data.readers import readPFM, writePFM
from dkt_stereo_tpu.ops import corr_lookup, corr_pyramid, corr_volume


def test_native_available():
    assert native.HAVE_NATIVE, "native library failed to build"


def test_native_pfm_roundtrip(tmp_path, rng):
    arr = rng.standard_normal((17, 23)).astype(np.float32)
    p = str(tmp_path / "x.pfm")
    native.pfm_write_native(p, arr)
    back = native.pfm_read_native(p)
    np.testing.assert_allclose(back, arr, atol=1e-7)
    # cross-compat with the python codec both ways
    np.testing.assert_allclose(readPFM(p), arr, atol=1e-7)
    p2 = str(tmp_path / "y.pfm")
    writePFM(p2, arr)
    np.testing.assert_allclose(native.pfm_read_native(p2), arr, atol=1e-7)


def test_native_corr_lookup_matches_xla(rng):
    B, H, W, D = 1, 6, 32, 16
    f1 = jnp.asarray(rng.standard_normal((B, H, W, D)).astype(np.float32))
    f2 = jnp.asarray(rng.standard_normal((B, H, W, D)).astype(np.float32))
    pyr = corr_pyramid(corr_volume(f1, f2), 4)
    coords = rng.uniform(-2, W + 2, (B, H, W, 1)).astype(np.float32)
    want = np.asarray(corr_lookup(pyr, jnp.asarray(coords), 4))
    got = native.corr_lookup_native([np.asarray(v) for v in pyr], coords, 4)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_native_replicate_pad(rng):
    img = rng.integers(0, 255, (5, 7, 3), dtype=np.uint8)
    got = native.replicate_pad_native(img, 2, 1, 3, 2)
    want = np.pad(img, ((2, 1), (3, 2), (0, 0)), mode="edge")
    np.testing.assert_array_equal(got, want)
