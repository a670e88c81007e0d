"""PTrans: self-supervised patch transform (core/utils/augmentor.py:724-832).

Samples N disparity-matched left/right patch pairs (nearest-neighbor warp)
and produces ``num_view`` augmented views per patch via a SimCLR-style
pipeline (RandomResizedCrop, h-flip, color jitter p=0.8, grayscale p=0.2,
gaussian blur p=0.1, solarization p=0.1). Consumed by GWCNet's ptrans
contrastive projection head (meta_arch/gwcnet/gwc_main.py:174-181, 290-300).

Host-side numpy/PIL; returns NHWC float arrays:
  left_patches, right_patches: (N, P, P, 3)
  augp1, augp2:                (N, V, P', P', 3)
"""

from __future__ import annotations

import numpy as np
from PIL import Image, ImageFilter, ImageOps

from dkt_stereo_tpu.data.photometric import ColorJitter


def _random_resized_crop(img: Image.Image, out_size: int, rng, scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3)):
    W, H = img.size
    area = H * W
    for _ in range(10):
        target_area = area * rng.uniform(*scale)
        log_ratio = (np.log(ratio[0]), np.log(ratio[1]))
        aspect = np.exp(rng.uniform(*log_ratio))
        w = int(round(np.sqrt(target_area * aspect)))
        h = int(round(np.sqrt(target_area / aspect)))
        if 0 < w <= W and 0 < h <= H:
            x0 = int(rng.integers(0, W - w + 1))
            y0 = int(rng.integers(0, H - h + 1))
            return img.resize((out_size, out_size), Image.BILINEAR, box=(x0, y0, x0 + w, y0 + h))
    return img.resize((out_size, out_size), Image.BILINEAR)


class PTrans:
    def __init__(self, num_patch=32, patch_r=32, num_view=4, cropscale=64,
                 rng: np.random.Generator | None = None):
        self.num_patch = num_patch
        self.patch_r = patch_r
        self.num_view = num_view
        self.cropscale = cropscale
        self.jitter = ColorJitter(0.4, 0.4, 0.4, 0.2)
        self.rng = rng or np.random.default_rng()

    def _view_transform(self, arr: np.ndarray) -> np.ndarray:
        rng = self.rng
        img = Image.fromarray(arr)
        img = _random_resized_crop(img, self.cropscale, rng)
        if rng.random() < 0.5:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
        if rng.random() < 0.8:
            img = self.jitter(img, rng)
        if rng.random() < 0.2:
            img = img.convert("L").convert("RGB")
        if rng.random() < 0.1:
            img = img.filter(ImageFilter.GaussianBlur(rng.random() * 1.9 + 0.1))
        if rng.random() < 0.1:
            img = ImageOps.solarize(img)
        return np.array(img, dtype=np.uint8)

    def __call__(self, img1: np.ndarray, img2: np.ndarray, disp: np.ndarray):
        """img1/img2: (H,W,3) uint8; disp: (H,W) positive disparity."""
        rng = self.rng
        H, W = disp.shape
        r = self.patch_r
        P = 2 * r + 1
        N = self.num_patch

        ys = rng.integers(P // 2 + 1, H - 1 - P // 2, N)
        xs = rng.integers(P // 2 + 1, W - 1 - P // 2, N)

        def extract(img, cy, cx):
            out = np.zeros((P, P, 3), img.dtype)
            y0, y1 = cy - r, cy + r + 1
            x0, x1 = cx - r, cx + r + 1
            sy0, sx0 = max(0, y0), max(0, x0)
            sy1, sx1 = min(H, y1), min(W, x1)
            out[sy0 - y0 : sy1 - y0, sx0 - x0 : sx1 - x0] = img[sy0:sy1, sx0:sx1]
            return out

        left_patches, right_patches, augp1, augp2 = [], [], [], []
        for cy, cx in zip(ys, xs):
            d = int(round(float(disp[cy, cx])))
            cx2 = int(np.clip(cx - d, 0, W - 1))
            p1 = extract(img1, int(cy), int(cx))
            p2 = extract(img2, int(cy), cx2)
            left_patches.append(p1)
            right_patches.append(p2)
            v1 = [self._view_transform(p1) for _ in range(self.num_view)]
            v2 = [self._view_transform(p2) for _ in range(self.num_view)]
            augp1.append(np.stack(v1))
            augp2.append(np.stack(v2))

        return (
            np.stack(left_patches).astype(np.float32),
            np.stack(right_patches).astype(np.float32),
            np.stack(augp1).astype(np.float32),
            np.stack(augp2).astype(np.float32),
        )
