"""Profile BASELINE config 5 (RGB-D rescoring): where does the
per-frame wall clock go? Stages: device detect, readback, candidate
assembly, depth-consistency filter (host medians)."""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

from partsbaseddetector_tpu.detector import PartsBasedDetector
from partsbaseddetector_tpu.depth import filter_candidates_by_depth
from partsbaseddetector_tpu.models.model import make_person_like_model

IMSIZE = (480, 640)


def main():
    rng = np.random.RandomState(0)
    im = (rng.rand(*IMSIZE, 3) * 255).astype(np.float32)
    depth = (1.0 + rng.rand(*IMSIZE)).astype(np.float32)
    person = make_person_like_model()
    person.thresh = -1e9
    det = PartsBasedDetector(person, max_detections=16,
                             buckets_per_octave=2)

    t0 = time.perf_counter()
    cands = det.detect(im, depth)
    print(f"warm detect+filter: {time.perf_counter()-t0:.1f}s, "
          f"{len(cands)} cands")

    fn = det.detect_fn(IMSIZE)
    imd = jax.device_put(jax.numpy.asarray(im, det.dtype))
    out = fn(imd)
    jax.block_until_ready(out)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(imd)
    _ = np.asarray(out[1])
    t_dev = (time.perf_counter() - t0) / iters
    print(f"device detect: {t_dev*1e3:.1f} ms")

    t0 = time.perf_counter()
    for _ in range(iters):
        host = jax.device_get(fn(imd))
    t_get = (time.perf_counter() - t0) / iters - t_dev
    print(f"readback (pipelined, extra over compute): {t_get*1e3:.1f} ms")

    from partsbaseddetector_tpu.types import DetectionResult
    nbc = [c.nparts for c in det._packed.components]
    boxes, scores, comps, valid, mix = host
    t0 = time.perf_counter()
    for _ in range(iters):
        res = DetectionResult(boxes=boxes, scores=scores, components=comps,
                              valid=valid, nparts_by_component=nbc,
                              mixtures=mix)
        cands = res.to_candidates()
    t_asm = (time.perf_counter() - t0) / iters
    print(f"candidate assembly: {t_asm*1e3:.1f} ms ({len(cands)} cands)")

    t0 = time.perf_counter()
    for _ in range(iters):
        kept = filter_candidates_by_depth(det._packed, cands, depth)
    t_filt = (time.perf_counter() - t0) / iters
    print(f"depth filter: {t_filt*1e3:.1f} ms ({len(kept)} kept)")

    # box-size census for the median cost model
    areas = []
    for c in cands:
        for p in range(c.parts.shape[0]):
            x1, y1, x2, y2 = c.parts[p]
            areas.append(max(0, x2 - x1) * max(0, y2 - y1))
    areas = np.array(areas)
    print(f"part-box area px: median {np.median(areas):.0f}, "
          f"p90 {np.percentile(areas, 90):.0f}, max {areas.max():.0f}, "
          f"total {areas.sum():.0f}, n={len(areas)}")


if __name__ == "__main__":
    main()
