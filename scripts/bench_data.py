"""Host data-pipeline throughput benchmark (SURVEY.md §7 "hard parts":
cv2/PIL augmentation at batch 8×(320,720) ×3 image copies must keep a pod
fed). Builds a synthetic KITTI tree, then measures StereoLoader samples/s at
the reference's training configuration.

Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np


def main():
    sys.path.insert(0, ".")
    import cv2
    from PIL import Image

    from dkt_stereo_tpu.data.datasets import KITTI
    from dkt_stereo_tpu.data.loader import StereoLoader

    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp(prefix="bench_data_")
    r15 = os.path.join(tmp, "KITTI", "KITTI_2015")
    for sub in ["training/image_2", "training/image_3", "training/disp_occ_0"]:
        os.makedirs(os.path.join(r15, sub), exist_ok=True)
    H, W = 376, 1242  # KITTI native
    for i in range(8):
        img = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
        Image.fromarray(img).save(f"{r15}/training/image_2/{i:06d}_10.png")
        Image.fromarray(img).save(f"{r15}/training/image_3/{i:06d}_10.png")
        disp = (rng.uniform(1, 80, (H, W)) * 256).astype(np.uint16)
        cv2.imwrite(f"{r15}/training/disp_occ_0/{i:06d}_10.png", disp)

    aug = {"crop_size": (320, 720), "min_scale": -0.2, "max_scale": 0.4,
           "do_flip": False, "yjitter": True}
    ds = KITTI(aug, root=os.path.join(tmp, "KITTI"), split="2015") * 40  # 320 samples
    for use_processes in (False, True):
        loader = StereoLoader(ds, batch_size=8, num_workers=8, seed=0,
                              use_processes=use_processes)
        n = 0
        t0 = time.perf_counter()
        for batch in loader:
            n += batch["img1"].shape[0]
        dt = time.perf_counter() - t0
        print(json.dumps({
            "metric": "data_pipeline_throughput",
            "mode": "processes" if use_processes else "threads",
            "samples_per_sec": round(n / dt, 2),
            "batches_per_sec": round(n / 8 / dt, 2),
            "crop": [320, 720],
            "workers": 8,
        }))


if __name__ == "__main__":
    main()
