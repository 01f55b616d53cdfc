"""End-to-end detector parity vs the NumPy reference pipeline."""

import numpy as np
import pytest

from partsbaseddetector_tpu import PartsBasedDetector, make_synthetic_model
from partsbaseddetector_tpu.ops.reference_pipeline import detect_reference


def _calibrate_threshold(model, im, keep=12):
    """Set model.thresh so the image yields ~keep detections (synthetic
    models have no trained threshold)."""
    probe = detect_reference(im, model, thresh=-1e9)
    scores = sorted((d["score"] for d in probe), reverse=True)
    model.thresh = float(scores[min(keep, len(scores)) - 1]) - 1e-6
    return model


def _run_parity(model, im, engine="spatial", atol=2e-3):
    want = detect_reference(im, model)
    det = PartsBasedDetector(model, max_detections=512, conv_engine=engine)
    got = det.detect(im)

    assert len(got) == len(want), (
        f"candidate count mismatch: got {len(got)}, want {len(want)}"
    )
    for g, w in zip(got, want):
        assert abs(g.score - w["score"]) < atol, (g.score, w["score"])
        np.testing.assert_allclose(
            g.parts, w["boxes"], rtol=1e-4, atol=5e-2
        )
        assert g.component == w["component"]
        # "identical part argmaxes" bar: per-part appearance-mixture
        # indices (the Ik backtrack) must match the loop reference
        # exactly, not just the boxes they induce
        np.testing.assert_array_equal(g.mixtures, w["mixtures"])
    return got


@pytest.mark.slow
def test_detect_matches_reference_small():
    model = make_synthetic_model(
        nparts=4, nmix=2, fsize=(4, 4), sbin=8, interval=3, thresh=2.0, seed=10
    )
    rng = np.random.RandomState(0)
    im = (rng.rand(170, 190, 3) * 255).astype(np.float32)
    _calibrate_threshold(model, im)
    got = _run_parity(model, im)
    assert len(got) > 0, "test should exercise at least one detection"


@pytest.mark.slow
def test_detect_matches_reference_tree_topology():
    """Deeper tree + 3 mixtures + non-square filters."""
    model = make_synthetic_model(
        nparts=6, nmix=3, fsize=(5, 4), sbin=8, interval=2, thresh=4.0, seed=11
    )
    rng = np.random.RandomState(1)
    im = (rng.rand(160, 200, 3) * 255).astype(np.float32)
    _calibrate_threshold(model, im)
    _run_parity(model, im)


@pytest.mark.slow
def test_detect_multicomponent():
    model = make_synthetic_model(
        nparts=3, nmix=2, fsize=(4, 4), sbin=8, interval=2, thresh=2.0,
        ncomponents=2, seed=12,
    )
    rng = np.random.RandomState(2)
    im = (rng.rand(150, 150, 3) * 255).astype(np.float32)
    _calibrate_threshold(model, im)
    _run_parity(model, im)


@pytest.mark.slow
def test_fourier_engine_parity():
    """BASELINE config 3: FFT responses must reproduce spatial detections."""
    model = make_synthetic_model(
        nparts=4, nmix=2, fsize=(4, 4), sbin=8, interval=3, thresh=2.0, seed=10
    )
    rng = np.random.RandomState(0)
    im = (rng.rand(170, 190, 3) * 255).astype(np.float32)
    _calibrate_threshold(model, im)
    _run_parity(model, im, engine="fourier", atol=5e-3)


def test_detect_no_candidates_above_threshold():
    model = make_synthetic_model(
        nparts=3, nmix=1, fsize=(4, 4), sbin=8, interval=2, thresh=1e6, seed=13
    )
    rng = np.random.RandomState(3)
    im = (rng.rand(140, 140, 3) * 255).astype(np.float32)
    det = PartsBasedDetector(model)
    assert det.detect(im) == []


def test_detect_batch_matches_single():
    model = make_synthetic_model(
        nparts=3, nmix=1, fsize=(4, 4), sbin=8, interval=2, thresh=-2.0, seed=70
    )
    rng = np.random.RandomState(0)
    ims = [(rng.rand(90, 100, 3) * 255).astype(np.float32) for _ in range(3)]
    det = PartsBasedDetector(model, max_detections=32)
    batch = det.detect_batch(ims)
    for im, got in zip(ims, batch):
        single = det.detect(im)
        assert len(got) == len(single)
        for a, b in zip(got, single):
            assert abs(a.score - b.score) < 1e-6


def test_detect_many_matches_single():
    """detect_many in both dispatch modes: microbatch=1 (async
    single-image programs + one pipelined readback — the measured-
    fastest serving default, tools/batch64_probe.py) and microbatch=2
    (fused vmap with request-list padding)."""
    model = make_synthetic_model(
        nparts=3, nmix=1, fsize=(4, 4), sbin=8, interval=2, thresh=-2.0, seed=70
    )
    rng = np.random.RandomState(0)
    ims = [(rng.rand(90, 100, 3) * 255).astype(np.float32) for _ in range(3)]
    det = PartsBasedDetector(model, max_detections=32)
    singles = [det.detect(im) for im in ims]
    for micro in (1, 2):  # 3 images, micro=2 exercises the pad path
        got = det.detect_many(ims, microbatch=micro)
        assert len(got) == len(ims)
        for g, s in zip(got, singles):
            assert len(g) == len(s)
            for a, b in zip(g, s):
                assert abs(a.score - b.score) < 1e-6
                np.testing.assert_allclose(a.parts, b.parts, atol=1e-4)
    assert det.detect_many([]) == []


def test_detect_many_pipelined_packed_matches_single():
    """The tunneled-backend serving path: uploader-thread prefetch,
    on-device output packing (one wire transfer per 8 frames), and
    top-K readback truncation — results must match the synchronous
    detect() exactly (packing bitcasts are lossless; top-K preserves
    score order)."""
    model = make_synthetic_model(
        nparts=3, nmix=1, fsize=(4, 4), sbin=8, interval=2, thresh=-2.0,
        seed=70,
    )
    rng = np.random.RandomState(0)
    ims = [
        (rng.rand(90, 100, 3) * 255).astype(np.float32)
        for _ in range(10)  # exercises a full pack of 8 + a tail of 2
    ]
    det = PartsBasedDetector(model, max_detections=32)
    singles = [det.detect(im) for im in ims]
    got = det.detect_many(ims, prefetch=4)
    for g, s in zip(got, singles):
        assert len(g) == len(s)
        for a, b in zip(g, s):
            assert abs(a.score - b.score) < 1e-6
            np.testing.assert_allclose(a.parts, b.parts, atol=1e-4)
            assert a.component == b.component
            assert list(a.mixtures) == list(b.mixtures)
    # top-K truncation: prefix of the full candidate list
    got_top = det.detect_many(ims, readback_top=4, prefetch=2)
    for g, s in zip(got_top, singles):
        assert len(g) == min(4, len(s))
        for a, b in zip(g, s[:4]):
            assert abs(a.score - b.score) < 1e-6
    # top beyond the candidate budget = full readback, not a desync
    got_over = det.detect_many(ims[:3], readback_top=10_000, prefetch=2)
    for g, s in zip(got_over, singles):
        assert len(g) == len(s)
        assert abs(g[0].score - s[0].score) < 1e-6
    with pytest.raises(ValueError):
        det.detect_many(ims[:2], readback_top=0)
    with pytest.raises(ValueError):
        det.detect_many(ims[:2], microbatch=2, readback_top=4)


def test_detect_many_readback_top_with_device_nms():
    """Device NMS suppresses rows IN PLACE (valid=False interleaved in
    score order), so top-K truncation must partition valid rows first
    or it would drop valid candidates ranked below suppressed ones
    (round-5 review finding). The truncated list must be a prefix of
    detect()'s post-NMS candidates."""
    model = make_synthetic_model(
        nparts=3, nmix=1, fsize=(4, 4), sbin=8, interval=2, thresh=-5.0,
        seed=70,
    )
    rng = np.random.RandomState(1)
    ims = [(rng.rand(90, 100, 3) * 255).astype(np.float32) for _ in range(3)]
    det = PartsBasedDetector(model, max_detections=64, nms_overlap=0.3)
    singles = [det.detect(im) for im in ims]
    assert any(len(s) > 2 for s in singles)
    got = det.detect_many(ims, readback_top=2, prefetch=2)
    for g, s in zip(got, singles):
        assert len(g) == min(2, len(s))
        for a, b in zip(g, s[:2]):
            assert abs(a.score - b.score) < 1e-6
            np.testing.assert_allclose(a.parts, b.parts, atol=1e-4)


def test_detect_uint8_matches_float32():
    """uint8 frames ship over the wire as uint8 and are cast to the
    compute dtype on device — detections must be value-identical to
    feeding the same pixels as float32 (the cast is exact)."""
    model = make_synthetic_model(
        nparts=3, nmix=2, fsize=(4, 4), sbin=8, interval=2, thresh=-2.0, seed=42
    )
    rng = np.random.RandomState(7)
    im8 = (rng.rand(100, 110, 3) * 255).astype(np.uint8)
    det = PartsBasedDetector(model, max_detections=32)
    got8 = det.detect(im8)
    gotf = det.detect(im8.astype(np.float32))
    assert len(got8) == len(gotf) > 0
    for a, b in zip(got8, gotf):
        assert a.score == b.score
        np.testing.assert_array_equal(a.parts, b.parts)
    # streaming path accepts uint8 frames too
    streamed = list(det.detect_stream([im8, im8]))
    assert len(streamed) == 2 and len(streamed[0]) == len(got8)


def test_validate_image_rejects_bad_dtypes():
    from partsbaseddetector_tpu.utils.profiling import validate_image

    import pytest

    ok = validate_image(np.zeros((60, 60, 3), np.uint8))
    assert ok.dtype == np.uint8
    with pytest.raises(ValueError, match="dtype"):
        validate_image(np.zeros((60, 60, 3), np.complex128))
    with pytest.raises(ValueError, match="NaN"):
        validate_image(np.full((60, 60, 3), np.nan, np.float32))


def test_detect_stream_lookahead_zero_synchronous():
    """lookahead=0 with the default readback_batch=1 must be honored
    exactly (fully synchronous — at most one program in flight)."""
    model = make_synthetic_model(
        nparts=3, nmix=1, fsize=(4, 4), sbin=8, interval=2, thresh=-2.0, seed=70
    )
    rng = np.random.RandomState(0)
    ims = [(rng.rand(90, 100, 3) * 255).astype(np.float32) for _ in range(3)]
    det = PartsBasedDetector(model, max_detections=32)
    singles = [det.detect(im) for im in ims]
    got = list(det.detect_stream(ims, lookahead=0, workers=0))
    assert len(got) == len(ims)
    for g, s in zip(got, singles):
        assert [c.score for c in g] == [c.score for c in s]


@pytest.mark.slow
def test_detect_pallas_interpret_mode(monkeypatch):
    """Run the FULL pipeline through the Pallas DT kernels in
    interpreter mode on CPU — end-to-end coverage of the exact kernels
    the TPU executes."""
    monkeypatch.setenv("PBD_DT_IMPL", "interpret")
    model = make_synthetic_model(
        nparts=3, nmix=2, fsize=(3, 3), sbin=8, interval=2, thresh=1.0, seed=71
    )
    rng = np.random.RandomState(1)
    im = (rng.rand(90, 90, 3) * 255).astype(np.float32)
    want = detect_reference(im, model, thresh=-1e9)
    model.thresh = sorted((d["score"] for d in want), reverse=True)[
        min(8, len(want)) - 1
    ] - 1e-6
    want = [d for d in want if d["score"] >= model.thresh]
    det = PartsBasedDetector(model, max_detections=32)
    got = det.detect(im)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert abs(g.score - w["score"]) < 2e-3
        np.testing.assert_allclose(g.parts, w["boxes"], atol=5e-2)


@pytest.mark.slow
@pytest.mark.parametrize("shape", [(83, 131), (150, 97), (96, 96)])
def test_detect_odd_image_sizes(shape):
    """Rounding chains (cround) and bucket padding must hold up on
    awkward sizes."""
    model = make_synthetic_model(
        nparts=3, nmix=1, fsize=(3, 3), sbin=4, interval=3, thresh=2.0, seed=72
    )
    rng = np.random.RandomState(0)
    im = (rng.rand(*shape, 3) * 255).astype(np.float32)
    _calibrate_threshold(model, im, keep=6)
    _run_parity(model, im)


@pytest.mark.slow
def test_detect_scale_offset_parts_fast_path():
    """anchor ds=1 parts in the packed TPU pipeline: child reads the
    octave-finer bucket; parity against the reference pipeline."""
    model = make_synthetic_model(
        nparts=3, nmix=2, fsize=(3, 3), sbin=8, interval=2, thresh=0.0, seed=73
    )
    for p in (1, 2):
        for d in model.defid[0][p]:
            model.anchors[d][2] = 1 if p == 1 else 0
    rng = np.random.RandomState(2)
    im = (rng.rand(150, 160, 3) * 255).astype(np.float32)
    _calibrate_threshold(model, im, keep=8)
    got = _run_parity(model, im)
    assert len(got) > 0


def test_detect_bf16_mode_runs():
    """bf16 compute mode: reduced precision is allowed to change scores
    slightly but the pipeline must run and find the same top detection
    region."""
    import jax.numpy as jnp

    model = make_synthetic_model(
        nparts=3, nmix=1, fsize=(4, 4), sbin=8, interval=2, thresh=-2.0, seed=74
    )
    rng = np.random.RandomState(3)
    im = (rng.rand(100, 100, 3) * 255).astype(np.float32)
    f32 = PartsBasedDetector(model, max_detections=16).detect(im)
    bf16 = PartsBasedDetector(
        model, max_detections=16, dtype=jnp.bfloat16
    ).detect(im)
    assert len(bf16) > 0
    assert abs(bf16[0].score - f32[0].score) < 0.2


@pytest.mark.slow
def test_detect_mixed_filter_sizes():
    """Per-part filter sizes differ (as in real trained models): the
    shared padded conv grid + per-(scale,filter) valid extents must stay
    exact."""
    model = make_synthetic_model(
        nparts=4, nmix=2, sbin=8, interval=2, thresh=0.0, seed=75,
        fsizes=[(6, 5), (3, 3), (4, 6), (5, 4)],
    )
    model.maxsize = (6, 6)
    rng = np.random.RandomState(4)
    im = (rng.rand(150, 170, 3) * 255).astype(np.float32)
    _calibrate_threshold(model, im, keep=10)
    got = _run_parity(model, im)
    assert len(got) > 0


def test_detect_components_with_different_part_counts():
    """Cross-component part-dim padding in the dense outputs."""
    from partsbaseddetector_tpu.train.builder import merge_models

    a = make_synthetic_model(
        nparts=2, nmix=1, fsize=(3, 3), sbin=8, interval=2, thresh=0.0, seed=76
    )
    b = make_synthetic_model(
        nparts=4, nmix=1, fsize=(3, 3), sbin=8, interval=2, thresh=0.0, seed=77
    )
    model = merge_models([a, b])
    rng = np.random.RandomState(5)
    im = (rng.rand(120, 120, 3) * 255).astype(np.float32)
    _calibrate_threshold(model, im, keep=10)
    got = _run_parity(model, im)
    comps = {c.component for c in got}
    assert comps == {0, 1} or len(comps) >= 1


def test_detect_cpp_border_mode():
    """BASELINE configs 1-2 run via the C++ demo path: 'same'-size
    responses with one-padded occlusion borders, one-cell box offset.
    The packed TPU pipeline must match the same-conv reference."""
    model = make_synthetic_model(
        nparts=4, nmix=2, sbin=8, interval=2, thresh=0.0, seed=78,
        fsizes=[(4, 4), (3, 5), (5, 3), (4, 4)],
    )
    rng = np.random.RandomState(6)
    im = (rng.rand(140, 150, 3) * 255).astype(np.float32)
    probe = detect_reference(im, model, thresh=-1e9, border_mode="cpp")
    model.thresh = sorted((d["score"] for d in probe), reverse=True)[9] - 1e-6
    want = [d for d in probe if d["score"] >= model.thresh]
    det = PartsBasedDetector(model, max_detections=64, border_mode="cpp")
    got = det.detect(im)
    assert len(got) == len(want), (len(got), len(want))
    for g, w in zip(got, want):
        assert abs(g.score - w["score"]) < 2e-3, (g.score, w["score"])
        np.testing.assert_allclose(g.parts, w["boxes"], atol=5e-2)


@pytest.mark.slow
def test_detect_half_octave_buckets():
    """buckets_per_octave=2 must be numerically identical to the
    default octave buckets (incl. octave-offset parts)."""
    model = make_synthetic_model(
        nparts=3, nmix=2, fsize=(3, 3), sbin=8, interval=2, thresh=0.0, seed=79
    )
    for d in model.defid[0][1]:
        model.anchors[d][2] = 1  # part 1 one octave down
    rng = np.random.RandomState(7)
    im = (rng.rand(150, 160, 3) * 255).astype(np.float32)
    _calibrate_threshold(model, im, keep=8)
    base = PartsBasedDetector(model, max_detections=64).detect(im)
    half = PartsBasedDetector(
        model, max_detections=64, buckets_per_octave=2
    ).detect(im)
    assert len(base) == len(half)
    for a, b in zip(base, half):
        assert abs(a.score - b.score) < 1e-5
        np.testing.assert_allclose(a.parts, b.parts, atol=1e-4)


@pytest.mark.slow
def test_detect_pallas_interpret_window_path(monkeypatch):
    """e2e through the ADAPTIVE WINDOW DT kernel (grids > 64 cells take
    the windowed path; the bucket-padded lanes exercise out_valid
    don't-care masking)."""
    monkeypatch.setenv("PBD_DT_IMPL", "interpret")
    monkeypatch.setenv("PBD_DT_WINDOW", "1")
    model = make_synthetic_model(
        nparts=3, nmix=2, fsize=(3, 3), sbin=4, interval=2, thresh=1.0,
        seed=73
    )
    rng = np.random.RandomState(2)
    im = (rng.rand(310, 290, 3) * 255).astype(np.float32)
    want = detect_reference(im, model, thresh=-1e9)
    model.thresh = sorted((d["score"] for d in want), reverse=True)[
        min(8, len(want)) - 1
    ] - 1e-6
    want = [d for d in want if d["score"] >= model.thresh]
    det = PartsBasedDetector(model, max_detections=32)
    got = det.detect(im)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert abs(g.score - w["score"]) < 2e-3
        np.testing.assert_allclose(g.parts, w["boxes"], atol=5e-2)


def test_scan_schedule_matches_unrolled(monkeypatch):
    """PBD_DP_SCHEDULE=scan (the fast-compile profile) must reproduce
    the unrolled schedule's detections on the golden fixture."""
    model, g = None, None
    import numpy as np

    fx = np.load("tests/fixtures/golden_detections.npz")
    from partsbaseddetector_tpu import load_model

    model = load_model("tests/fixtures/golden_model.npz")
    monkeypatch.setenv("PBD_DP_SCHEDULE", "scan")
    det = PartsBasedDetector(model, max_detections=64)
    got = det.detect(fx["image"])
    assert len(got) == len(fx["scores"])
    np.testing.assert_allclose(
        [c.score for c in got], fx["scores"], rtol=0, atol=2e-3
    )
    np.testing.assert_allclose(
        np.stack([np.asarray(c.parts) for c in got]), fx["boxes"], atol=5e-2
    )


def test_scan_schedule_dp_bit_identical():
    """Raw DP outputs (root scores, pointers, tables) of the scan and
    unrolled schedules on identical responses."""
    import os

    import jax.numpy as jnp

    from partsbaseddetector_tpu.models.model import pack_model
    from partsbaseddetector_tpu.ops import dp

    model = make_synthetic_model(
        nparts=5, nmix=2, fsize=(3, 3), sbin=8, interval=2, thresh=0.0,
        seed=11,
    )
    packed = pack_model(model)
    comp = packed.components[0]
    rng = np.random.RandomState(0)
    resp = rng.randn(2, 13, 15, packed.filters.shape[0]).astype(np.float32)
    resp[:, 11:, :, :3] = -np.inf  # masked region
    resp = jnp.asarray(resp)
    old = os.environ.get("PBD_DP_SCHEDULE")
    try:
        os.environ["PBD_DP_SCHEDULE"] = "unrolled"
        rv_u, ri_u, tb_u = dp.tree_min_sum(resp, comp)
        os.environ["PBD_DP_SCHEDULE"] = "scan"
        rv_s, ri_s, tb_s = dp.tree_min_sum(resp, comp)
    finally:
        if old is None:
            os.environ.pop("PBD_DP_SCHEDULE", None)
        else:
            os.environ["PBD_DP_SCHEDULE"] = old
    rv_u, rv_s = np.asarray(rv_u), np.asarray(rv_s)
    finite = np.isfinite(rv_u)
    # scan sanitizes -inf padding to float-min; finite scores match to
    # ulp and the finite/dead partition is identical
    assert np.array_equal(finite, np.asarray(rv_s) > -1e37)
    np.testing.assert_allclose(rv_u[finite], rv_s[finite], rtol=1e-6)
    assert np.array_equal(np.asarray(ri_u)[finite], np.asarray(ri_s)[finite])
    for p in tb_u:
        a, b = np.asarray(tb_u[p]), np.asarray(tb_s[p])
        assert a.shape == b.shape
