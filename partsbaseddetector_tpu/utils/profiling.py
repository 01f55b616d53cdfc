"""Observability: stage timing, device profiling, numeric guards.

The reference has no systematic tracing (ad-hoc cv::getTickCount prints,
SURVEY.md §5). This module provides the TPU-native equivalents:

  - Timer/stage_times: wall-clock harness with block_until_ready + a
    forced host read (tunneled backends can return from
    block_until_ready early);
  - trace(): context manager around jax.profiler for device traces
    viewable in TensorBoard/XProf;
  - checked(): wraps a jittable function with jax.experimental.checkify
    NaN/OOB guards for debugging numeric issues in the pipeline;
  - validate_image(): input validation for the public detect API.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, List, Optional

import jax
import numpy as np


class Timer:
    """Accumulating wall-clock timer with named stages."""

    def __init__(self):
        self.times: Dict[str, List[float]] = {}

    @contextlib.contextmanager
    def stage(self, name: str, result=None):
        t0 = time.perf_counter()
        yield
        if result is not None:
            jax.block_until_ready(result)
        self.times.setdefault(name, []).append(time.perf_counter() - t0)

    def record(self, name: str, seconds: float) -> None:
        self.times.setdefault(name, []).append(seconds)

    def summary(self) -> Dict[str, float]:
        return {k: float(np.median(v)) for k, v in self.times.items()}

    def report(self) -> str:
        return "\n".join(
            f"{k}: {v * 1000:.2f} ms" for k, v in self.summary().items()
        )


def time_jitted(fn: Callable, *args, iters: int = 5) -> float:
    """Median steady-state latency of a jitted function, forcing a real
    host read of the first output leaf."""
    out = fn(*args)
    jax.block_until_ready(out)
    leaves = jax.tree.leaves(out)
    _ = np.asarray(leaves[0])
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = np.asarray(jax.tree.leaves(out)[0])
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


@contextlib.contextmanager
def trace(logdir: str = "/tmp/pbd_trace"):
    """Capture a device profile (open with TensorBoard's profile tab)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def checked(fn: Callable):
    """Wrap fn with checkify NaN/division guards; returns a function
    raising on the first numeric error instead of propagating NaNs."""
    from jax.experimental import checkify

    cfn = checkify.checkify(
        fn, errors=checkify.float_checks | checkify.index_checks
    )

    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        err.throw()
        return out

    return wrapper


def validate_image(im: np.ndarray, min_side: Optional[int] = None) -> np.ndarray:
    """Public-API input validation (the reference demo exits on bad
    input, src/demo.cpp:90-99)."""
    im = np.asarray(im)
    if im.ndim == 2:
        im = np.repeat(im[:, :, None], 3, axis=2)
    if im.ndim != 3 or im.shape[2] not in (1, 3):
        raise ValueError(f"expected (H, W, 3) image, got shape {im.shape}")
    if im.shape[2] == 1:
        im = np.repeat(im, 3, axis=2)
    # integer/bool frames are always finite; floats are checked in
    # their own dtype (a float64 copy of every VGA frame costs ~7 MB of
    # churn in the serving loop for nothing); anything else (complex,
    # object, ...) is rejected outright — the old float64 cast raised
    # for those, and silently dropping imaginary parts would be worse
    if np.issubdtype(im.dtype, np.floating):
        if not np.isfinite(im).all():
            raise ValueError("image contains NaN/Inf")
    elif not (
        np.issubdtype(im.dtype, np.integer) or im.dtype == np.bool_
    ):
        raise ValueError(f"unsupported image dtype: {im.dtype}")
    if min_side and min(im.shape[:2]) < min_side:
        raise ValueError(
            f"image side {min(im.shape[:2])} below minimum {min_side}"
        )
    return im


def device_op_breakdown(fn, *args, iters: int = 5, tmpdir: str = "/tmp/pbd_optrace"):
    """Trace `fn(*args)` and attribute device time by op family.

    Returns {family: ms_per_iter} from the XLA device timeline —
    in-program numbers, unlike wall-clock timing of prefix programs,
    which on a tunneled backend mostly measures dispatch RTT. Async
    copy windows overlap compute, so families need not sum to the
    program wall time. Returns {} when profiling is unavailable.
    """
    import collections
    import glob
    import os
    import shutil

    import jax

    try:
        out = fn(*args)
        jax.block_until_ready(out)
        _ = np.asarray(jax.tree.leaves(out)[0])
        shutil.rmtree(tmpdir, ignore_errors=True)
        jax.profiler.start_trace(tmpdir)
        for _ in range(iters):
            out = fn(*args)
        _ = np.asarray(jax.tree.leaves(out)[0])
        jax.profiler.stop_trace()
        from jax.profiler import ProfileData

        paths = glob.glob(os.path.join(tmpdir, "**/*.xplane.pb"), recursive=True)
        if not paths:
            return {}
        pd = ProfileData.from_file(paths[0])
        tot = collections.Counter()
        for plane in pd.planes:
            if "TPU" not in plane.name and "/device" not in plane.name.lower():
                continue
            for line in plane.lines:
                for ev in line.events:
                    name = ev.name
                    if name.startswith("jit_"):
                        tot["program_total"] += ev.duration_ns
                        continue
                    if "_dt1d" in name or "sublane" in name:
                        fam = "dt_kernels"
                    elif (
                        "convolution" in name
                        or "filter_responses_pallas" in name
                        or "conv_kernel" in name
                    ):
                        fam = "conv"
                    elif "copy" in name or "slice-start" in name:
                        fam = "async_copies_overlapped"
                    elif "fusion" in name or "dot" in name:
                        fam = "fused_elementwise_hog_dp"
                    else:
                        fam = "other"
                    tot[fam] += ev.duration_ns
        return {k: round(v / 1e6 / iters, 2) for k, v in tot.most_common()}
    except Exception:
        return {}
