"""Per-op TPU time attribution via jax.profiler.ProfileData.

Traces a callable from tools/profile_hog-style prefixes (or the full
detect) and prints the top-K XLA ops by total device time, aggregated
by op-name prefix. Usage:
  python tools/trace_ops.py <target> [topk]
targets: full_loop | full_hybrid | full_detect | dp_notables
"""
import os, sys, time, glob, collections

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def trace_and_rank(fn, im, iters=10, topk=40):
    out = fn(im)
    jax.block_until_ready(out)
    _ = np.asarray(jax.tree.leaves(out)[0])
    tmpdir = "/tmp/jaxtrace"
    os.system(f"rm -rf {tmpdir}")
    jax.profiler.start_trace(tmpdir)
    for _ in range(iters):
        out = fn(im)
    _ = np.asarray(jax.tree.leaves(out)[0])
    jax.profiler.stop_trace()

    from jax.profiler import ProfileData
    paths = glob.glob(f"{tmpdir}/**/*.xplane.pb", recursive=True)
    assert paths, "no xplane written"
    pd = ProfileData.from_file(paths[0])
    tot = collections.Counter()
    cnt = collections.Counter()
    device_total = 0.0
    for plane in pd.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        for line in plane.lines:
            for ev in line.events:
                dur = ev.duration_ns
                name = ev.name
                tot[name] += dur
                cnt[name] += 1
                device_total += dur
    print(f"device total: {device_total/1e6/iters:.2f} ms/iter over {iters} iters")
    for name, ns in tot.most_common(topk):
        print(f"{ns/1e6/iters:9.3f} ms  x{cnt[name]//iters:<4d} {name[:110]}")


def main():
    target = sys.argv[1] if len(sys.argv) > 1 else "full_detect"
    topk = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    from partsbaseddetector_tpu import PartsBasedDetector
    from partsbaseddetector_tpu.models.model import make_person_like_model, pack_model
    from partsbaseddetector_tpu.ops.pyramid import (
        build_plan, build_pyramid_features, build_pyramid_features_hybrid)
    from partsbaseddetector_tpu.pipeline import make_plan, root_scores

    model = make_person_like_model(); model.thresh = 100.0
    det = PartsBasedDetector(model, max_detections=256, buckets_per_octave=2)
    packed = det._packed
    plan = make_plan(packed, (480, 640), 2)
    spec = packed.spec

    if target == "full_loop":
        fn = jax.jit(lambda im: build_pyramid_features(im.astype(jnp.float32), plan, spec))
    elif target == "full_hybrid":
        fn = jax.jit(lambda im: build_pyramid_features_hybrid(im.astype(jnp.float32), plan, spec))
    elif target == "dp_notables":
        fn = jax.jit(lambda im: [s.rootv for s in root_scores(im.astype(jnp.float32), packed, plan, with_tables=False)])
    else:
        fn = det.detect_fn((480, 640))

    im = jax.device_put((np.random.RandomState(0).rand(480, 640, 3) * 255).astype(np.float32))
    trace_and_rank(fn, im, topk=topk)


if __name__ == "__main__":
    main()
