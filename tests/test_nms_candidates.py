"""NMS variants, Candidate utilities, masks, visualization."""

import numpy as np

from partsbaseddetector_tpu.ops.nms import (
    part_nms,
    part_nms_device,
    pixel_nms,
    pixel_nms_device,
)
from partsbaseddetector_tpu.types import Candidate
from partsbaseddetector_tpu.visualize import Visualize


def _cand(x, y, size=20, score=1.0, nparts=2):
    parts = np.array(
        [[x + i * 2, y + i * 2, x + size + i * 2, y + size + i * 2]
         for i in range(nparts)],
        dtype=np.float64,
    )
    conf = np.zeros(nparts)
    conf[0] = score
    return Candidate(parts, conf, 0)


def test_paint_nms_keeps_nonoverlapping():
    cands = [
        _cand(10, 10, score=3.0),
        _cand(12, 12, score=2.0),  # overlaps the first heavily
        _cand(100, 100, score=1.0),
    ]
    kept = Candidate.non_maxima_suppression((200, 200), cands, overlap=0.2)
    assert len(kept) == 2
    assert kept[0].score == 3.0 and kept[1].score == 1.0


def test_candidate_mask_labels():
    cands = [_cand(10, 10, score=2.0), _cand(100, 100, score=1.0)]
    mask = Candidate.mask((200, 200), cands)
    assert mask[20, 20] == 1
    assert mask[110, 110] == 2
    assert mask[180, 180] == 0


def test_part_nms_matches_greedy_semantics():
    rng = np.random.RandomState(0)
    n = 30
    boxes = np.zeros((n, 3, 4))
    for i in range(n):
        x, y = rng.rand(2) * 100
        for p in range(3):
            boxes[i, p] = [x + p * 3, y + p * 3, x + 15 + p * 3, y + 15 + p * 3]
    scores = rng.rand(n)
    keep = part_nms(boxes, scores, overlap=0.4)
    # kept set is sorted by descending score
    assert np.all(np.diff(scores[keep]) <= 1e-12)
    # no kept pair overlaps more than the threshold on every part
    for a in range(len(keep)):
        for b in range(a + 1, len(keep)):
            i, j = keep[a], keep[b]
            over = []
            for p in range(3):
                xx1 = max(boxes[i, p, 0], boxes[j, p, 0])
                yy1 = max(boxes[i, p, 1], boxes[j, p, 1])
                xx2 = min(boxes[i, p, 2], boxes[j, p, 2])
                yy2 = min(boxes[i, p, 3], boxes[j, p, 3])
                w, h = max(xx2 - xx1 + 1, 0), max(yy2 - yy1 + 1, 0)
                area = (boxes[i, p, 2] - boxes[i, p, 0] + 1) * (
                    boxes[i, p, 3] - boxes[i, p, 1] + 1
                )
                over.append(w * h / area)
            assert max(over) <= 0.4 + 1e-9


def test_part_nms_device_matches_host():
    rng = np.random.RandomState(1)
    n = 24
    boxes = np.zeros((n, 2, 4), dtype=np.float32)
    for i in range(n):
        x, y = rng.rand(2) * 80
        for p in range(2):
            boxes[i, p] = [x + p, y + p, x + 12 + p, y + 12 + p]
    scores = np.sort(rng.rand(n).astype(np.float32))[::-1]  # pre-sorted desc
    valid = np.ones(n, dtype=bool)
    keep_host = part_nms(boxes, scores, overlap=0.3)
    keep_dev = np.asarray(part_nms_device(boxes, scores, valid, overlap=0.3))
    np.testing.assert_array_equal(np.sort(keep_host), np.flatnonzero(keep_dev))


def test_pixel_nms_variants_agree():
    rng = np.random.RandomState(2)
    src = rng.rand(40, 50).astype(np.float32)
    want = pixel_nms(src, sz=3) == 255
    got = np.asarray(pixel_nms_device(src, sz=3))
    np.testing.assert_array_equal(got, want)


def test_visualize_draws_boxes():
    im = np.zeros((60, 80, 3), dtype=np.uint8)
    cand = _cand(10, 10, size=15, score=1.5, nparts=3)
    out = Visualize("t").candidates(im, [cand])
    assert out.shape == im.shape
    assert out.sum() > 0  # something was drawn
    assert im.sum() == 0  # input untouched


def test_bounding_boxes():
    cand = _cand(10, 20, size=10, nparts=4)
    bb = cand.bounding_box()
    assert bb[0] == 10 and bb[1] == 20
    assert bb[2] == 10 + 10 + 6 and bb[3] == 20 + 10 + 6
    bbn = cand.bounding_box_norm()
    assert bbn[2] >= bbn[0] and bbn[3] >= bbn[1]


def test_detector_on_device_nms():
    import numpy as np
    from partsbaseddetector_tpu import PartsBasedDetector, make_synthetic_model
    from partsbaseddetector_tpu.ops.nms import part_nms

    model = make_synthetic_model(
        nparts=3, nmix=1, fsize=(4, 4), sbin=8, interval=2, thresh=-3.0, seed=50
    )
    rng = np.random.RandomState(0)
    im = (rng.rand(100, 110, 3) * 255).astype(np.float32)

    plain = PartsBasedDetector(model, max_detections=64)
    raw = plain.detect(im)
    assert len(raw) > 3
    nmsd = PartsBasedDetector(model, max_detections=64, nms_overlap=0.4)
    kept = nmsd.detect(im)

    boxes = np.stack([c.parts for c in raw])
    scores = np.array([c.score for c in raw])
    want_idx = part_nms(boxes, scores, overlap=0.4)
    assert len(kept) == len(want_idx)
    for c, wi in zip(kept, sorted(want_idx)):
        assert abs(c.score - raw[int(wi)].score) < 1e-6
