"""Probe BASELINE config 4: async single-image dispatch vs fused vmap.

Measures, on the real chip with warm compile cache:
  a) 64 async dispatches of the single-image program, one sync
  b) fused vmap microbatches (PBD_PROBE_MICRO, comma list)
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import numpy as np

from partsbaseddetector_tpu.detector import PartsBasedDetector
from partsbaseddetector_tpu.models.model import make_person_like_model

IMSIZE = (480, 640)
NIMG = 64


def main():
    rng = np.random.RandomState(0)
    im = (rng.rand(*IMSIZE, 3) * 255).astype(np.float32)
    person = make_person_like_model()
    person.thresh = 100.0
    det = PartsBasedDetector(person, max_detections=64,
                             buckets_per_octave=2)

    fn1 = det.detect_fn(IMSIZE)
    imd = jax.device_put(jax.numpy.asarray(im, det.dtype))
    out = fn1(imd)
    jax.block_until_ready(out)
    _ = np.asarray(out[1])
    t0 = time.perf_counter()
    outs = [fn1(imd) for _ in range(NIMG)]
    for o in outs:
        _ = np.asarray(o[1])
    sec = (time.perf_counter() - t0) / NIMG
    print(f"async single-image x{NIMG}, serial reads: {sec*1e3:.2f} ms/img "
          f"({1/sec:.1f} img/s)")

    # pipelined readback: one device_get starts every leaf's copy
    # before waiting, so the per-output tunnel RTT overlaps
    t0 = time.perf_counter()
    outs = [fn1(imd) for _ in range(NIMG)]
    res = jax.device_get([o[1] for o in outs])
    sec = (time.perf_counter() - t0) / NIMG
    assert len(res) == NIMG
    print(f"async single-image x{NIMG}, pipelined read: {sec*1e3:.2f} ms/img "
          f"({1/sec:.1f} img/s)")

    # full-output pipelined readback (what a serving API must return)
    t0 = time.perf_counter()
    outs = [fn1(imd) for _ in range(NIMG)]
    res = jax.device_get(outs)
    sec = (time.perf_counter() - t0) / NIMG
    print(f"async single-image x{NIMG}, full pipelined read: "
          f"{sec*1e3:.2f} ms/img ({1/sec:.1f} img/s)")

    micros = [int(x) for x in
              os.environ.get("PBD_PROBE_MICRO", "8").split(",") if x]
    for micro in micros:
        bfn = det.detect_batch_fn(IMSIZE, micro)
        batch = jax.device_put(
            np.stack([im] * micro)
            + rng.rand(micro, 1, 1, 1).astype(np.float32))
        t0 = time.perf_counter()
        out = bfn(batch)
        jax.block_until_ready(out)
        print(f"  micro={micro}: compile+first {time.perf_counter()-t0:.1f}s")
        _ = np.asarray(out[1])
        t0 = time.perf_counter()
        outs = [bfn(batch) for _ in range(NIMG // micro)]
        for o in outs:
            _ = np.asarray(o[1])
        sec_b = (time.perf_counter() - t0) / NIMG
        print(f"fused vmap micro={micro}, serial reads: "
              f"{sec_b*1e3:.2f} ms/img ({1/sec_b:.1f} img/s)")
        t0 = time.perf_counter()
        outs = [bfn(batch) for _ in range(NIMG // micro)]
        _ = jax.device_get(outs)
        sec_b = (time.perf_counter() - t0) / NIMG
        print(f"fused vmap micro={micro}, full pipelined read: "
              f"{sec_b*1e3:.2f} ms/img ({1/sec_b:.1f} img/s)")


if __name__ == "__main__":
    main()
