"""Probe the streaming serving path (BASELINE config 5 shape).

Measures, per frame, the dispatch-pipeline cost of: resident-input
dispatch (lower bound), fresh f32 frames, fresh uint8 frames, and the
full detect_stream RGB-D loop. Documents the tunneled-backend cost
model: each execute that references a not-yet-shipped host buffer pays
the wire transfer on the execute path (~75 MB/s effective), so the
wire format (uint8 vs f32) is a first-order serving knob.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

from partsbaseddetector_tpu.detector import PartsBasedDetector, _upload
from partsbaseddetector_tpu.models.model import make_person_like_model

IMSIZE = (480, 640)
N = 10


def main():
    rng = np.random.RandomState(0)
    im = (rng.rand(*IMSIZE, 3) * 255).astype(np.float32)
    im8 = np.clip(im, 0, 255).astype(np.uint8)
    depth = (1.0 + rng.rand(*IMSIZE)).astype(np.float32)
    person = make_person_like_model()
    person.thresh = -1e9
    det = PartsBasedDetector(person, max_detections=16,
                             buckets_per_octave=2)
    t0 = time.perf_counter()
    det.detect(im8, depth)
    print(f"warm uint8 program: {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    det.detect(im, depth)
    print(f"warm f32 program:   {time.perf_counter()-t0:.1f}s")

    fn = det.detect_fn(IMSIZE)
    imd = _upload(im, det.dtype)
    _ = jax.device_get([fn(imd) for _ in range(3)])  # absorb first-burst

    frames_f = [np.ascontiguousarray(im + float(i)) for i in range(N)]
    frames_8 = [np.clip(im + float(i), 0, 255).astype(np.uint8)
                for i in range(N)]

    t0 = time.perf_counter()
    _ = jax.device_get([fn(imd) for _ in range(N)])
    print(f"resident input:   {(time.perf_counter()-t0)/N*1e3:6.1f} ms/frame")

    for label, frames in (("fresh f32", frames_f), ("fresh uint8", frames_8)):
        for rep in range(2):
            t0 = time.perf_counter()
            outs = [fn(_upload(f, det.dtype)) for f in frames]
            _ = jax.device_get(outs)
            sec = (time.perf_counter() - t0) / N
            print(f"{label} rep{rep}:  {sec*1e3:6.1f} ms/frame "
                  f"({1/sec:.1f} img/s)")

    for label, frames in (
        ("stream f32+depth", [(f, depth + 0.01 * i)
                              for i, f in enumerate(frames_f)]),
        ("stream uint8+depth", [(f, depth + 0.01 * i)
                                for i, f in enumerate(frames_8)]),
    ):
        for workers, rb in ((0, 1), (1, 1), (1, 2), (1, 4)):
            for rep in range(2):
                t0 = time.perf_counter()
                n = sum(len(c) for c in det.detect_stream(
                    frames, lookahead=2, workers=workers,
                    readback_batch=rb))
                sec = (time.perf_counter() - t0) / N
                print(f"{label} w{workers} rb{rb} rep{rep}: "
                      f"{sec*1e3:6.1f} ms/frame ({1/sec:.1f} img/s), "
                      f"{n} cands")


if __name__ == "__main__":
    main()
