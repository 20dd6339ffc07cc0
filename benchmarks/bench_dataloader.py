"""Host data-loader benchmark: native C++ batch decode vs PIL.

  python benchmarks/bench_dataloader.py [n_images]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from benchmarks.common import emit


def main(n: int = 256, size: int = 224) -> None:
    from PIL import Image

    d = tempfile.mkdtemp(prefix="sgg_bench_jpeg_")
    r = np.random.RandomState(0)
    paths = []
    for i in range(32):  # 32 distinct images, cycled to n
        img = r.randint(0, 256, (480, 640, 3), dtype=np.uint8)
        p = os.path.join(d, f"{i}.jpg")
        Image.fromarray(img).save(p, quality=90)
        paths.append(p)
    paths = [paths[i % 32] for i in range(n)]

    t0 = time.perf_counter()
    pil = np.stack([
        np.asarray(Image.open(p).convert("RGB").resize((size, size), Image.BILINEAR))
        for p in paths
    ])
    t_pil = time.perf_counter() - t0

    from sgg import native

    native.decode_batch(paths[:2], size)  # build/warm
    t0 = time.perf_counter()
    nat = native.decode_batch(paths, size)
    t_nat = time.perf_counter() - t0

    assert nat.shape == pil.shape
    emit("native_jpeg_decode_images_per_sec", n / t_nat, "images/sec",
         pil_images_per_sec=round(n / t_pil, 1),
         speedup=round(t_pil / t_nat, 2))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
