"""Photometric augmentation primitives (host-side, PIL/numpy).

The reference composes torchvision ``ColorJitter(brightness=.4, contrast=.4,
saturation=<range>, hue=0.5/3.14)`` + ``AdjustGamma`` over PIL images
(core/utils/augmentor.py:561, :853; AdjustGamma at :48-59). torchvision's PIL
backend is ImageEnhance + uint8 HSV hue-roll; we reproduce those exact
operations here without the torchvision dependency (absent in this image).
"""

from __future__ import annotations

import numpy as np
from PIL import Image, ImageEnhance


def _rand_factor(rng, bound_or_range):
    """torchvision ColorJitter factor sampling: scalar b → U[max(0,1−b), 1+b];
    explicit [lo, hi] range used as-is."""
    if bound_or_range is None:
        return None
    if np.isscalar(bound_or_range):
        lo, hi = max(0.0, 1.0 - bound_or_range), 1.0 + bound_or_range
    else:
        lo, hi = bound_or_range
    return float(rng.uniform(lo, hi))


def adjust_hue_pil(img: Image.Image, hue_factor: float) -> Image.Image:
    """torchvision F_pil.adjust_hue: uint8 H-channel roll by hue_factor·255."""
    if img.mode in ("L", "1", "I", "F"):
        return img
    h, s, v = img.convert("HSV").split()
    np_h = np.array(h, dtype=np.uint8)
    # torchvision adds np.uint8(hue_factor*255) with wraparound; numpy 2.x
    # forbids negative uint8 casts, so replicate the C-style truncate+wrap
    shift = int(hue_factor * 255) % 256
    np_h = ((np_h.astype(np.int16) + shift) % 256).astype(np.uint8)
    h = Image.fromarray(np_h, "L")
    return Image.merge("HSV", (h, s, v)).convert(img.mode)


def adjust_gamma_np(arr: np.ndarray, gamma: float, gain: float = 1.0) -> np.ndarray:
    """torchvision adjust_gamma on uint8: 255·gain·(x/255)^gamma, clipped."""
    out = 255.0 * gain * np.power(arr.astype(np.float32) / 255.0, gamma)
    return np.clip(out, 0, 255).astype(np.uint8)


class ColorJitter:
    """Reimplementation of torchvision ColorJitter (PIL backend) with an
    explicit numpy Generator: random order of brightness / contrast /
    saturation / hue, each applied with a freshly sampled factor."""

    def __init__(self, brightness=0.0, contrast=0.0, saturation=0.0, hue=0.0):
        self.brightness = brightness
        self.contrast = contrast
        self.saturation = saturation
        self.hue = hue

    def __call__(self, img: Image.Image, rng: np.random.Generator) -> Image.Image:
        order = rng.permutation(4)
        for idx in order:
            if idx == 0 and self.brightness:
                img = ImageEnhance.Brightness(img).enhance(_rand_factor(rng, self.brightness))
            elif idx == 1 and self.contrast:
                img = ImageEnhance.Contrast(img).enhance(_rand_factor(rng, self.contrast))
            elif idx == 2 and self.saturation:
                img = ImageEnhance.Color(img).enhance(_rand_factor(rng, self.saturation))
            elif idx == 3 and self.hue:
                h = self.hue if np.isscalar(self.hue) else max(abs(self.hue[0]), abs(self.hue[1]))
                img = adjust_hue_pil(img, float(rng.uniform(-h, h)))
        return img


class AdjustGamma:
    """core/utils/augmentor.py:48-59: per-call uniform gamma and gain."""

    def __init__(self, gamma_min=1.0, gamma_max=1.0, gain_min=1.0, gain_max=1.0):
        self.gamma_min, self.gamma_max = gamma_min, gamma_max
        self.gain_min, self.gain_max = gain_min, gain_max

    def __call__(self, img: Image.Image, rng: np.random.Generator) -> Image.Image:
        gain = float(rng.uniform(self.gain_min, self.gain_max))
        gamma = float(rng.uniform(self.gamma_min, self.gamma_max))
        if gamma == 1.0 and gain == 1.0:
            return img
        return Image.fromarray(adjust_gamma_np(np.array(img), gamma, gain))


class PhotoAug:
    """ColorJitter ∘ AdjustGamma pipeline over uint8 arrays."""

    def __init__(self, brightness, contrast, saturation, hue, gamma=(1, 1, 1, 1)):
        self.jitter = ColorJitter(brightness, contrast, saturation, hue)
        self.gamma = AdjustGamma(*gamma)

    def __call__(self, arr: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        img = Image.fromarray(arr)
        img = self.jitter(img, rng)
        img = self.gamma(img, rng)
        return np.array(img, dtype=np.uint8)
