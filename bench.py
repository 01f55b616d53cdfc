"""Benchmarks: one JSON line per BASELINE.md config (headline last).

Configs (BASELINE.md "Benchmark configs"):
  1 face single-image, 2 person26 single-image (HEADLINE, printed
  last), 3 Fourier-engine parity + timing, 4 64-image fused batched
  throughput, 5 RGB-D depth-consistency rescoring.

Baseline semantics (the reference publishes no numbers — BASELINE.md):
  - person26/face/rgbd compare against this repo's native C++ CPU
    serving path (im2row+SGEMM conv, OpenMP, envelope DTs — the closest
    stand-in for the reference's OpenMP pipeline) measured on THIS host.
    CAVEAT: this host has nproc=1; on a typical 16-core workstation the
    CPU path would be ~10-16x faster, so quote the single-core nature
    with the ratio. Extra field `vs_xla_cpu_1t` keeps the round-1
    comparison (same XLA pipeline on one CPU thread).
  - fourier's vs_baseline is the spatial engine's rate (engine A/B).
  - batch64's vs_baseline is the single-image rate (batching gain).

CPU measurements are cached in .bench_cpu_baseline.json (slow).
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
CACHE = os.path.join(HERE, ".bench_cpu_baseline.json")
IMSIZE = (480, 640)


def _cache():
    if os.path.exists(CACHE):
        with open(CACHE) as fh:
            return json.load(fh)
    return {}


def _cache_put(key, value):
    c = _cache()
    c[key] = value
    with open(CACHE, "w") as fh:
        json.dump(c, fh)


def time_fn(fn, im, iters):
    """Amortized throughput timing: dispatch `iters` detections, sync
    once via a real host read (block_until_ready can return early on
    tunneled backends)."""
    import jax

    im = jax.device_put(im)
    out = fn(im)
    jax.block_until_ready(out)
    _ = np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(im)
    _ = np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / iters


def native_cpu_baseline(key, model, im):
    """Seconds/image of the native C++ CPU serving path (cached)."""
    c = _cache()
    if key in c:
        return c[key]
    try:
        from partsbaseddetector_tpu.cpu_detector import CPUPartsBasedDetector

        det = CPUPartsBasedDetector(model)
        t0 = time.perf_counter()
        det.detect(im)
        sec = time.perf_counter() - t0
        _cache_put(key, sec)
        return sec
    except Exception:
        return None


def emit(config, metric, value, unit, vs_baseline, **extra):
    line = {
        "metric": metric,
        "value": round(value, 3),
        "unit": unit,
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else 1.0,
        "config": config,
    }
    line.update(extra)
    print(json.dumps(line), flush=True)


def main():
    import jax

    from partsbaseddetector_tpu import PartsBasedDetector
    from partsbaseddetector_tpu.models.model import (
        make_face_like_model,
        make_person_like_model,
    )

    rng = np.random.RandomState(0)
    im = (rng.rand(*IMSIZE, 3) * 255).astype(np.float32)

    person = make_person_like_model()
    person.thresh = 100.0
    face = make_face_like_model()
    face.thresh = 100.0

    kw = dict(max_detections=256, buckets_per_octave=2)

    # ---- config 1: face single-image ------------------------------------
    det_f = PartsBasedDetector(face, **kw)
    sec_f = time_fn(det_f.detect_fn(IMSIZE), im, 10)
    cpu_f = native_cpu_baseline("face_native_cpu_sec", face, im)
    emit(
        1,
        "face VGA single-image detect throughput (1 chip)",
        1.0 / sec_f,
        "images/sec",
        (cpu_f / sec_f) if cpu_f else None,
        baseline="native C++ CPU serving path, THIS host (nproc=1, single-core)",
    )

    # ---- build the headline person detector (shared by 2/3/4/5) ---------
    det_p = PartsBasedDetector(person, **kw)
    fn_p = det_p.detect_fn(IMSIZE)
    sec_p = time_fn(fn_p, im, 20)

    # ---- config 3: Fourier engine parity + timing ------------------------
    det_ff = PartsBasedDetector(person, conv_engine="fourier", **kw)
    fn_ff = det_ff.detect_fn(IMSIZE)
    sec_ff = time_fn(fn_ff, im, 10)
    out_sp = fn_p(im)
    out_ff = fn_ff(im)
    dscore = float(
        np.max(np.abs(np.asarray(out_sp[1]) - np.asarray(out_ff[1])))
    )
    emit(
        3,
        "person26 VGA Fourier-engine detect throughput (1 chip)",
        1.0 / sec_ff,
        "images/sec",
        sec_p / sec_ff,
        baseline="spatial engine rate (engine A/B)",
        parity_max_abs_score_delta=round(dscore, 6),
    )

    # ---- config 4: 64-image fused batched throughput ---------------------
    micro = int(os.environ.get("PBD_BENCH_MICROBATCH", "8"))
    bfn = det_p.detect_batch_fn(IMSIZE, micro)
    batch = jax.device_put(
        np.stack([im] * micro)
        + rng.rand(micro, 1, 1, 1).astype(np.float32)
    )
    out = bfn(batch)
    jax.block_until_ready(out)
    _ = np.asarray(out[1])
    nimg = 64
    t0 = time.perf_counter()
    outs = [bfn(batch) for _ in range(nimg // micro)]
    for o in outs:
        _ = np.asarray(o[1])
    sec_b = (time.perf_counter() - t0) / nimg
    emit(
        4,
        "person26 VGA 64-image fused-batch throughput (1 chip)",
        1.0 / sec_b,
        "images/sec",
        sec_p / sec_b,
        baseline="single-image rate (batching gain)",
        microbatch=micro,
    )

    # ---- config 5: RGB-D depth-consistency rescoring ---------------------
    person_rgbd = make_person_like_model()
    person_rgbd.thresh = -1e9  # keep candidates so depth filtering runs
    det_d = PartsBasedDetector(person_rgbd, max_detections=16,
                               buckets_per_octave=2)
    depth = (1.0 + rng.rand(*IMSIZE)).astype(np.float32)
    det_d.detect(im, depth)  # warm (shares compiled shape cache)
    t0 = time.perf_counter()
    iters_d = 5
    for _ in range(iters_d):
        cands = det_d.detect(im, depth)
    sec_d = (time.perf_counter() - t0) / iters_d
    cpu_p = native_cpu_baseline("person_native_cpu_sec", person, im)
    emit(
        5,
        "person26 VGA RGB-D detect+depth-rescore throughput (1 chip)",
        1.0 / sec_d,
        "images/sec",
        (cpu_p / sec_d) if cpu_p else None,
        baseline="native C++ CPU serving path (RGB-only), THIS host (single-core)",
        candidates=len(cands),
    )

    # ---- config 2 (HEADLINE, last): person26 single-image ----------------
    # per-stage breakdown: two cheap prefix programs; DP+backtrack is the
    # remainder (XLA fuses per-program, so deltas are approximate)
    from partsbaseddetector_tpu.ops.conv import filter_responses
    from partsbaseddetector_tpu.ops.pyramid import (
        build_pyramid_features,
        mask_responses,
        response_valid_extents,
    )
    from partsbaseddetector_tpu.pipeline import make_plan

    packed = det_p._packed
    plan = make_plan(packed, IMSIZE, det_p.buckets_per_octave)

    def hog_only(x):
        return build_pyramid_features(x.astype(np.float32), plan, packed.spec)

    def conv_prefix(x):
        feats = hog_only(x)
        import jax.numpy as jnp

        filt = jnp.asarray(packed.filters, np.float32)
        out = []
        for b, bucket in enumerate(plan.buckets):
            vh, vw = response_valid_extents(
                plan, bucket, packed.filter_sizes, packed.spec.border
            )
            out.append(
                mask_responses(filter_responses(feats[b], filt), vh, vw,
                               -np.inf)
            )
        return out

    sec_hog = time_fn(jax.jit(hog_only), im, 10)
    sec_conv = time_fn(jax.jit(conv_prefix), im, 10)

    # XLA's own FLOP estimate for the full program -> achieved FLOP/s
    flops = None
    try:
        ca = fn_p.lower(im).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) or None
    except Exception:
        pass

    xla_cpu_1t = _cache().get("cpu_sec_per_image")
    extra = dict(
        baseline="native C++ CPU serving path, THIS host (nproc=1, single-core)",
        caveat=(
            "single-core host: on a ~16-core box the CPU baseline would "
            "be ~10-16x faster, shrinking vs_baseline accordingly"
        ),
        stage_ms=dict(
            hog_pyramid=round(sec_hog * 1e3, 2),
            conv=round(max(sec_conv - sec_hog, 0.0) * 1e3, 2),
            dp_backtrack=round(max(sec_p - sec_conv, 0.0) * 1e3, 2),
        ),
        latency_ms=round(sec_p * 1e3, 2),
    )
    if xla_cpu_1t:
        extra["vs_xla_cpu_1t"] = round(xla_cpu_1t / sec_p, 2)
    if flops:
        extra["achieved_gflops"] = round(flops / sec_p / 1e9, 1)
        extra["device"] = jax.devices()[0].device_kind
    emit(
        2,
        "person26 VGA single-image detect throughput (1 chip)",
        1.0 / sec_p,
        "images/sec",
        (cpu_p / sec_p) if cpu_p else None,
        **extra,
    )


if __name__ == "__main__":
    main()
