"""Device-side depth-consistency filtering (ops/depth_device.py).

The host implementation in depth.py (exact nth_element medians,
src/SearchSpacePruning.cpp:73-95 + include/Math.hpp:62-72 semantics) is
the reference; the device path must equal it exactly for part boxes
within the sample budget (every pixel gathered once) and on
constant-depth regions for any box size (where the strided grid is
trivially exact too).
"""

import numpy as np
import pytest

from partsbaseddetector_tpu import PartsBasedDetector, make_synthetic_model
from partsbaseddetector_tpu.depth import _median_depth, filter_candidates_by_depth
from partsbaseddetector_tpu.ops.depth_device import box_depth_medians


def test_box_medians_exact_within_budget():
    rng = np.random.RandomState(0)
    depth = rng.rand(120, 160).astype(np.float32) * 5.0
    depth[10:20, 30:50] = np.nan  # finite-filter path
    depth[40:45, :10] = 0.0
    boxes = []
    for _ in range(64):
        x1 = rng.randint(-5, 150)
        y1 = rng.randint(-5, 110)
        w = rng.randint(0, 47)
        h = rng.randint(0, 47)
        boxes.append([x1, y1, x1 + w, y1 + h])
    boxes = np.asarray(boxes, dtype=np.float64)
    got = np.asarray(box_depth_medians(depth, boxes.astype(np.float32)))
    want = np.array([_median_depth(depth, b) for b in boxes])
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_box_medians_constant_region_any_size():
    depth = np.full((200, 260), 3.25, dtype=np.float32)
    boxes = np.asarray(
        [[0, 0, 259, 199], [10, 10, 150, 180], [-20, -20, 500, 500]],
        dtype=np.float32,
    )
    got = np.asarray(box_depth_medians(depth, boxes))
    np.testing.assert_array_equal(got, np.full(3, 3.25, np.float32))


def test_box_medians_empty_box_is_zero():
    depth = np.ones((50, 50), dtype=np.float32)
    boxes = np.asarray(
        [[60, 60, 70, 70], [10, 10, 9, 20], [-30, 5, -2, 9]], np.float32
    )
    got = np.asarray(box_depth_medians(depth, boxes))
    np.testing.assert_array_equal(got, np.zeros(3, np.float32))


def _single_scale_fixture(seed=21):
    """interval=1 on a 64x72 image: one scale, part boxes 31 px —
    within the exact-median budget."""
    model = make_synthetic_model(
        nparts=4, nmix=2, fsize=(4, 4), sbin=8, interval=1, thresh=-16.0,
        seed=seed,
    )
    rng = np.random.RandomState(seed + 1)
    im = (rng.rand(64, 72, 3) * 255).astype(np.float32)
    # structured depth so the filter actually rejects some candidates
    depth = np.full(im.shape[:2], 1.0, dtype=np.float32)
    depth[:, 36:] = 9.0
    depth[20:40, :20] = 4.0
    return model, im, depth


def test_device_filter_matches_host_filter():
    model, im, depth = _single_scale_fixture()
    det_h = PartsBasedDetector(model, max_detections=64)
    det_d = PartsBasedDetector(model, max_detections=64,
                               device_depth_filter=True)
    want = det_h.detect(im, depth)  # host medians + host filter
    got = det_d.detect(im, depth)  # device keep mask
    plain = det_h.detect(im)
    assert len(plain) > len(want) > 0, "fixture must reject some candidates"
    assert len(got) == len(want)
    for a, b in zip(got, want):
        assert a.score == b.score and a.component == b.component
        np.testing.assert_array_equal(a.parts, b.parts)


def test_uint16_mm_depth_matches_float_meters():
    """Kinect-native uint16 millimeter frames (the wire format; the
    reference demo divides by 1000, src/demo.cpp:95-99) must behave
    exactly like the equivalent float-meter map on both the device and
    host filter paths (fixture depths are whole millimeters, so the
    mm -> m conversion is exact in f32)."""
    model, im, depth = _single_scale_fixture(seed=25)
    mm = np.round(depth * 1000).astype(np.uint16)

    det_d = PartsBasedDetector(model, max_detections=64,
                               device_depth_filter=True)
    det_h = PartsBasedDetector(model, max_detections=64)
    for det in (det_d, det_h):
        a = det.detect(im, depth)
        b = det.detect(im, mm)
        assert len(a) == len(b) > 0
        for x, y in zip(a, b):
            assert x.score == y.score
            np.testing.assert_array_equal(x.parts, y.parts)


def test_device_filter_streaming_matches_sync():
    model, im, depth = _single_scale_fixture(seed=23)
    det = PartsBasedDetector(model, max_detections=64,
                             device_depth_filter=True)
    frames = [
        (np.clip(im + i, 0, 255).astype(np.float32), depth + 0.05 * i)
        for i in range(5)
    ]
    wants = [det.detect(rgb, d) for rgb, d in frames]
    gots = list(det.detect_stream(frames, lookahead=2, workers=1))
    assert len(gots) == len(wants)
    for got, want in zip(gots, wants):
        assert len(got) == len(want)
        for a, b in zip(got, want):
            assert a.score == b.score
            np.testing.assert_array_equal(a.parts, b.parts)


def test_streaming_mixed_depth_and_plain_frames():
    """A stream interleaving (rgb, depth) pairs with bare rgb frames
    must match per-frame sync detects: gated (6-leaf) and plain
    (5-leaf) outputs cannot share a packed chunk, so the append path
    flushes on arity change (regression: round-5 review found the
    chunk's keep-mask arity was derived from its first frame only)."""
    model, im, depth = _single_scale_fixture(seed=31)
    det = PartsBasedDetector(model, max_detections=64,
                             device_depth_filter=True)
    frames = []
    for i in range(6):
        rgb = np.clip(im + i, 0, 255).astype(np.float32)
        frames.append((rgb, depth + 0.05 * i) if i % 2 == 0 else rgb)
    wants = [
        det.detect(*(f if isinstance(f, tuple) else (f,)))
        for f in frames
    ]
    gots = list(
        det.detect_stream(frames, lookahead=4, workers=1, readback_batch=3)
    )
    assert len(gots) == len(wants)
    for got, want in zip(gots, wants):
        assert len(got) == len(want)
        for a, b in zip(got, want):
            assert a.score == b.score
            np.testing.assert_array_equal(a.parts, b.parts)


def test_device_filter_streaming_bench_shape_uint_wire():
    """The bench config-5 serving shape: uint8 frames + uint16-mm
    depth, readback_batch=2 (packed chunks of 2 incl. the keep mask,
    with a tail chunk of 1), two readback workers — results must match
    the synchronous uint-wire detect exactly."""
    model, im, depth = _single_scale_fixture(seed=29)
    det = PartsBasedDetector(model, max_detections=64,
                             device_depth_filter=True)
    frames = [
        (
            np.clip(im + i, 0, 255).astype(np.uint8),
            ((depth + 0.05 * i) * 1000.0).astype(np.uint16),
        )
        for i in range(5)
    ]
    wants = [det.detect(rgb, d) for rgb, d in frames]
    gots = list(
        det.detect_stream(frames, lookahead=4, workers=2, readback_batch=2)
    )
    assert len(gots) == len(wants)
    for got, want in zip(gots, wants):
        assert len(got) == len(want) > 0
        for a, b in zip(got, want):
            assert a.score == b.score
            np.testing.assert_array_equal(a.parts, b.parts)
