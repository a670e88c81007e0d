"""Confidence toolbox vs the reference numpy implementations."""

import numpy as np
import jax.numpy as jnp

from dkt_stereo_tpu.dkt.confidence import agreement, ssim_gaussian, uniqueness


def ref_uniqueness(disparity):
    """utils/confidence.py:113-127 verbatim math in numpy."""
    disparity = disparity.astype(np.uint8)
    batch, height, width = disparity.shape
    coords = np.stack(
        [
            np.stack(
                [np.arange(b * width * height + y * width, b * width * height + y * width + width) for y in range(height)],
                0,
            )
            for b in range(batch)
        ],
        0,
    ) - disparity
    array = np.reshape(coords, batch * height * width)
    _, index, _, _ = np.unique(array, return_index=True, return_inverse=True, return_counts=True)
    array = array * 0
    array[index] = 1
    return np.reshape(array, (batch, height, width)).astype(np.float32)


def ref_agreement(disparity, r, tau=1):
    disparity = disparity.astype(np.uint8)
    batch, height, width = disparity.shape
    disparity = np.pad(disparity, ((0, 0), (r, r), (r, r)), "constant")
    wind = r * 2 + 1
    neighbors = np.stack(
        [disparity[:, k // wind : k // wind + height, k % wind : k % wind + width] for k in range(wind**2)],
        -1,
    )
    neighbors = np.delete(neighbors, wind**2 // 2, axis=-1)
    template = np.stack([disparity[:, r : r + height, r : r + width]] * (wind**2), -1)
    template = np.delete(template, wind**2 // 2, axis=-1)
    return (np.sum(np.abs(template.astype(np.int32) - neighbors.astype(np.int32)) < tau, axis=-1)).astype(np.float32)


def test_uniqueness_matches_reference(rng):
    disp = rng.integers(0, 30, (2, 12, 20)).astype(np.float32)
    ours = np.asarray(uniqueness(jnp.asarray(disp)))
    theirs = ref_uniqueness(disp)
    np.testing.assert_array_equal(ours, theirs)


def test_agreement_matches_reference(rng):
    disp = rng.integers(0, 30, (1, 10, 14)).astype(np.float32)
    ours = np.asarray(agreement(jnp.asarray(disp), r=2, tau=1))
    theirs = ref_agreement(disp, r=2, tau=1)
    np.testing.assert_array_equal(ours, theirs)


def test_ssim_gaussian_identity():
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, 20, 20, 3)).astype(np.float32))
    s = np.asarray(ssim_gaussian(x, x))
    # SSIM(x, x) == 1 away from zero-padded borders
    assert s[:, 6:-6, 6:-6].min() > 0.999
