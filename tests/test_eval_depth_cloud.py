"""Evaluation metrics, depth pathway, point-cloud post-processing."""

import numpy as np

from partsbaseddetector_tpu.cloud import (
    cluster_objects,
    depth_to_cloud,
    estimate_poses,
    euclidean_clusters,
    remove_planes,
)
from partsbaseddetector_tpu.depth import (
    Rect3,
    StereoCameraModel,
    bounding_box_3d,
    depth_consistency_score,
    filter_candidates_by_depth,
)
from partsbaseddetector_tpu.eval.metrics import (
    boxes_to_keypoints,
    eval_apk,
    eval_pck,
    voc_ap,
)
from partsbaseddetector_tpu.models import make_synthetic_model, pack_model
from partsbaseddetector_tpu.types import Candidate


# --- eval ---


def test_pck_perfect_and_off():
    gt = np.zeros((4, 3, 2))
    gt[:, :, 0] = [[0, 50, 100]] * 4
    gt[:, :, 1] = [[0, 50, 100]] * 4
    acc = eval_pck(gt.copy(), gt, thresh=0.1)
    np.testing.assert_allclose(acc, 1.0)
    pred = gt.copy()
    pred[:, 1] += 50  # part 1 off by half the extent
    acc = eval_pck(pred, gt, thresh=0.1)
    np.testing.assert_allclose(acc, [1.0, 0.0, 1.0])


def test_voc_ap_perfect():
    assert voc_ap(np.array([0.5, 1.0]), np.array([1.0, 1.0])) == 1.0


def test_apk_rewards_correct_confident_detections():
    gt = [np.zeros((1, 2, 2)) + [[10, 10], [30, 30]]]
    good = np.array([[[10, 10], [30, 30]]], dtype=float)
    bad = good + 100
    aps_good = eval_apk([good], [np.array([0.9])], gt, thresh=1.0)
    aps_bad = eval_apk([bad], [np.array([0.9])], gt, thresh=1.0)
    assert np.all(aps_good == 1.0)
    assert np.all(aps_bad == 0.0)


def test_boxes_to_keypoints():
    boxes = np.array([[[0, 0, 10, 20]]], dtype=float)
    kp = boxes_to_keypoints(boxes)
    np.testing.assert_allclose(kp, [[[5, 10]]])


# --- depth ---


def _two_part_candidate(depth_ok=True):
    parts = np.array([[10, 10, 20, 20], [25, 10, 35, 20]], dtype=np.float64)
    return Candidate(parts, np.array([1.0, 0.0]), 0)


def _packed_two_parts():
    m = make_synthetic_model(nparts=2, nmix=1, fsize=(3, 3), seed=0)
    # anchor of part 1 relative to root
    m.anchors[m.defid[0][1][0]][:2] = [2, 0]
    return pack_model(m)


def test_filter_candidates_by_depth():
    packed = _packed_two_parts()
    depth = np.ones((50, 50), dtype=np.float32)
    cand = _two_part_candidate()
    kept = filter_candidates_by_depth(packed, [cand], depth, zfactor=0.5)
    assert len(kept) == 1  # consistent depths pass
    depth2 = depth.copy()
    depth2[:, 22:] = 50.0  # child part far behind parent
    kept = filter_candidates_by_depth(packed, [cand], depth2, zfactor=0.5)
    assert len(kept) == 0
    assert depth_consistency_score(packed, cand, depth2) > depth_consistency_score(
        packed, cand, depth
    )


def test_median_depth_upper_middle():
    """The reference median is the element at index n/2 via nth_element
    (include/Math.hpp:62-72) — the UPPER middle for even counts, never
    an average of the two middle values."""
    from partsbaseddetector_tpu.depth import _median_depth

    depth = np.array([[1.0, 2.0], [3.0, 10.0]], dtype=np.float32)
    # 4 finite values sorted [1, 2, 3, 10] -> index 2 -> 3.0 (np.median
    # would give 2.5)
    assert _median_depth(depth, (0, 0, 2, 2)) == 3.0
    # odd count: the plain middle element
    depth3 = np.array([[5.0, 1.0, 9.0]], dtype=np.float32)
    assert _median_depth(depth3, (0, 0, 3, 1)) == 5.0
    # NaN treated as missing (intended behavior; the reference feeds
    # NaNs straight into nth_element) -> [1, 2, 3], middle = 2
    depth_nan = depth.copy()
    depth_nan[1, 1] = np.nan
    assert _median_depth(depth_nan, (0, 0, 2, 2)) == 2.0


def test_bounding_box_3d():
    depth = np.full((60, 60), 2.0, dtype=np.float32)
    cand = _two_part_candidate()
    box = bounding_box_3d((60, 60), depth, cand)
    assert isinstance(box, Rect3)
    assert abs(box.z - 2.0) < 0.1
    assert box.depth < 0.2  # flat depth -> thin box
    bb = cand.bounding_box()
    assert box.x == bb[0] and box.y == bb[1]


def test_rect3_ops():
    a = Rect3(0, 0, 0, 2, 2, 2)
    b = Rect3(1, 1, 1, 2, 2, 2)
    inter = a.intersection(b)
    assert inter.volume() == 1.0
    hull = a.convex_hull(b)
    assert hull.volume() == 27.0
    assert a.contains((0.5, 0.5, 0.5))
    assert not a.contains((3, 0, 0))


# --- cloud ---


def test_euclidean_clusters_two_blobs():
    rng = np.random.RandomState(0)
    a = rng.randn(40, 3) * 0.002
    b = rng.randn(25, 3) * 0.002 + 1.0
    cloud = np.concatenate([a, b])
    clusters = euclidean_clusters(cloud, tolerance=0.05)
    assert len(clusters) == 2
    assert len(clusters[0]) == 40 and len(clusters[1]) == 25


def test_cluster_objects_and_poses():
    rng = np.random.RandomState(1)
    obj = rng.randn(100, 3) * 0.003 + [0.5, 0.5, 2.0]
    noise = rng.rand(50, 3) * 4 - 2
    cloud = np.concatenate([obj, noise])
    box = Rect3(0.4, 0.4, 1.9, 0.2, 0.2, 0.2)
    clusters, centroids = cluster_objects(cloud, [box])
    assert len(clusters[0]) >= 90
    np.testing.assert_allclose(centroids[0], [0.5, 0.5, 2.0], atol=0.05)
    poses = estimate_poses(centroids, [obj[:10]])
    assert poses[0].shape == (4, 4)
    np.testing.assert_allclose(poses[0][:3, 3], centroids[0])
    # rotation is orthonormal
    r = poses[0][:3, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-8)


def test_remove_planes():
    rng = np.random.RandomState(2)
    xs, ys = rng.rand(2, 2000) * 2
    plane = np.stack([xs, ys, np.zeros(2000)], axis=1)
    obj = rng.randn(100, 3) * 0.01 + [1, 1, 0.5]
    cloud = np.concatenate([plane, obj])
    left = remove_planes(cloud, distance_threshold=0.02, min_inliers=500)
    assert len(left) < 300
    assert np.abs(left[:, 2] - 0.5).min() < 0.1


def test_depth_to_cloud_roundtrip():
    cam = StereoCameraModel(fx=100, fy=100, cx=20, cy=15)
    depth = np.full((30, 40), 2.0)
    cloud = depth_to_cloud(depth, cam)
    assert cloud.shape == (1200, 3)
    np.testing.assert_allclose(cloud[:, 2], 2.0)
    # center pixel maps to (0, 0, z)
    center = cloud[15 * 40 + 20]
    np.testing.assert_allclose(center, [0, 0, 2.0], atol=1e-9)


def test_plausible_depth_mask():
    from partsbaseddetector_tpu.depth import plausible_depth_mask

    depth = np.full((60, 80), 2.0, dtype=np.float32)
    depth[:, 40:] = 8.0  # implausibly far half
    # fx * X / scale = 100 * 0.4 / 20 = 2.0 expected depth
    mask = plausible_depth_mask(
        depth, (30, 40), scale=20.0, object_width_m=0.4, fx=100.0, tolerance=0.5
    )
    assert mask.shape == (30, 40)
    assert mask[:, :20].all()
    assert not mask[:, 20:].any()
