"""Synthetic Booster quarter-res tree for driving the ft_booster recipe."""
import os
import numpy as np
from PIL import Image

root = "/tmp/vfx/data/Booster_dataset/quarter/train/balanced"
rng = np.random.default_rng(7)
H, W = 160, 224
for s in range(3):
    scene = os.path.join(root, f"scene{s}")
    for cam in ("camera_00", "camera_02"):
        os.makedirs(os.path.join(scene, cam), exist_ok=True)
    # shift-correlated pair so a stereo net has signal
    base = rng.uniform(0, 255, (H, W + 16, 3)).astype(np.uint8)
    Image.fromarray(base[:, 8:-8]).save(os.path.join(scene, "camera_00", "0000.png"))
    Image.fromarray(base[:, :-16]).save(os.path.join(scene, "camera_02", "0000.png"))
    disp = rng.uniform(2.0, 12.0, (H, W)).astype(np.float32)
    np.save(os.path.join(scene, "disp_00.npy"), disp)
print("booster fixture at", root)
