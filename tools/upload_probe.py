"""Probe the tunneled H2D upload path (the serving bottleneck).

BENCH_r04 config 2 measured 53.5 ms of async copies against an 18 ms
program: fresh-frame serving is wire-bound, not chip-bound. Questions
this probe answers on the real tunnel:

  1. What is the effective serial device_put bandwidth for a VGA uint8
     frame, and does it ramp across successive transfers (TCP
     slow-start / connection warm-up would explain the r04 RGB-D
     run_rates climbing 6.2 -> 10.1 -> 18.2 across identical passes)?
  2. Do CONCURRENT device_puts from multiple host threads multiply
     effective bandwidth (parallel streams through the tunnel), or is
     the transfer path serialized device-side?
  3. Does uploading the RGB frame and the depth map as one fused
     device_put call (list arg) beat two calls?

Usage: python tools/upload_probe.py  (needs the TPU; run alone)
"""

import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import numpy as np


def main():
    rng = np.random.RandomState(0)
    frames = [
        (rng.rand(480, 640, 3) * 255).astype(np.uint8) for _ in range(48)
    ]
    depths = [
        (rng.rand(480, 640) * 4000).astype(np.uint16) for _ in range(48)
    ]
    mb = frames[0].nbytes / 1e6

    # 1. serial puts, watch for ramp
    print(f"frame = {mb:.2f} MB uint8")
    for rep in range(3):
        times = []
        for f in frames[:16]:
            t0 = time.perf_counter()
            x = jax.device_put(f)
            jax.block_until_ready(x)
            times.append(time.perf_counter() - t0)
        bw = [mb / t for t in times]
        print(
            f"serial pass {rep}: per-put ms "
            f"{[round(t * 1e3, 1) for t in times[:8]]} "
            f"bw MB/s min/med/max = {min(bw):.1f}/"
            f"{float(np.median(bw)):.1f}/{max(bw):.1f}"
        )

    # 2. threaded puts
    for workers in (2, 4, 8):
        pool = ThreadPoolExecutor(max_workers=workers)
        t0 = time.perf_counter()
        xs = list(pool.map(jax.device_put, frames[:16]))
        for x in xs:
            jax.block_until_ready(x)
        dt = time.perf_counter() - t0
        pool.shutdown()
        print(
            f"threaded x{workers}: 16 frames in {dt * 1e3:.0f} ms = "
            f"{16 * mb / dt:.1f} MB/s aggregate"
        )

    # 3. fused rgb+depth put vs two puts
    t0 = time.perf_counter()
    for f, d in zip(frames[:8], depths[:8]):
        a = jax.device_put(f)
        b = jax.device_put(d)
        jax.block_until_ready((a, b))
    two = (time.perf_counter() - t0) / 8
    t0 = time.perf_counter()
    for f, d in zip(frames[8:16], depths[8:16]):
        ab = jax.device_put((f, d))
        jax.block_until_ready(ab)
    one = (time.perf_counter() - t0) / 8
    print(
        f"rgb+depth: two puts {two * 1e3:.1f} ms, fused put "
        f"{one * 1e3:.1f} ms"
    )

    # 4. does an async put overlap a running program? time N dispatches
    # with interleaved fresh puts vs resident input
    from partsbaseddetector_tpu import PartsBasedDetector
    from partsbaseddetector_tpu.models.model import make_person_like_model

    person = make_person_like_model()
    person.thresh = 100.0
    det = PartsBasedDetector(person, buckets_per_octave=2, max_detections=256)
    fn = det.detect_fn((480, 640))
    imd = jax.device_put(frames[0])
    out = fn(imd)
    jax.block_until_ready(out)
    _ = np.asarray(out[1])
    n = 16
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(imd)
    _ = np.asarray(out[1])
    resident = (time.perf_counter() - t0) / n
    t0 = time.perf_counter()
    for f in frames[:n]:
        out = fn(jax.device_put(f))
    _ = np.asarray(out[1])
    fresh = (time.perf_counter() - t0) / n
    # prefetch: a worker thread uploads frame i+1 while i computes
    pool = ThreadPoolExecutor(max_workers=2)
    futs = [pool.submit(jax.device_put, f) for f in frames[:n]]
    t0 = time.perf_counter()
    for fu in futs:
        out = fn(fu.result())
    _ = np.asarray(out[1])
    prefetch_all = (time.perf_counter() - t0) / n
    pool.shutdown()
    print(
        f"detect: resident {resident * 1e3:.1f} ms, fresh-serial "
        f"{fresh * 1e3:.1f} ms, pre-uploaded {prefetch_all * 1e3:.1f} ms"
    )


if __name__ == "__main__":
    main()
