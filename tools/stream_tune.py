"""Tune detect_stream knobs (lookahead, workers, readback_batch) on the
real chip for the RGB-D serving config. Run: python tools/stream_tune.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from partsbaseddetector_tpu import PartsBasedDetector
from partsbaseddetector_tpu.models.model import make_person_like_model

IMSIZE = (480, 640)


def main():
    rng = np.random.RandomState(0)
    im = (rng.rand(*IMSIZE, 3) * 255).astype(np.float32)
    model = make_person_like_model()
    model.thresh = -1e9
    det = PartsBasedDetector(model, max_detections=16, buckets_per_octave=2)
    depth = (1.0 + rng.rand(*IMSIZE)).astype(np.float32)
    im8 = np.clip(im, 0, 255).astype(np.uint8)
    det.detect(im8, depth)  # warm

    n = 20
    frames = [
        (np.clip(im + float(i), 0, 255).astype(np.uint8), depth + 0.01 * i)
        for i in range(n)
    ]
    grid = [
        dict(lookahead=2, workers=1, readback_batch=2),  # current bench
        dict(lookahead=2, workers=1, readback_batch=4),
        dict(lookahead=2, workers=2, readback_batch=4),
        dict(lookahead=2, workers=2, readback_batch=2),
        dict(lookahead=4, workers=2, readback_batch=2),
        dict(lookahead=2, workers=1, readback_batch=8),
        dict(lookahead=2, workers=3, readback_batch=2),
    ]
    for cfg in grid:
        # warm one untimed pass so thread pools etc. are steady before
        # the timed pass (matches bench.py's warm-up discipline)
        for _ in det.detect_stream(frames, **cfg):
            pass
        t0 = time.perf_counter()
        cnt = 0
        for cands in det.detect_stream(frames, **cfg):
            cnt += len(cands)
        dt = (time.perf_counter() - t0) / n
        print(
            f"{cfg} -> {1.0/dt:6.2f} img/s ({dt*1e3:6.2f} ms/frame, "
            f"{cnt} cands)"
        )


if __name__ == "__main__":
    main()
