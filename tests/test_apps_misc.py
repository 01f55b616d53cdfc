"""Config pipeline, model transfer, visualization, annotation utils,
profiling — the application/auxiliary surface."""

import json
import os

import numpy as np
import pytest

from partsbaseddetector_tpu import make_synthetic_model, save_model
from partsbaseddetector_tpu.apps.pipeline import build_from_file, parse_config
from partsbaseddetector_tpu.models.transfer import face_to_pose
from partsbaseddetector_tpu.train.annotate import (
    get_negative_data,
    get_positive_data,
    load_annotations,
    map_rotate_points,
    save_annotations,
)
from partsbaseddetector_tpu.types import Candidate
from partsbaseddetector_tpu.utils.profiling import Timer, time_jitted, validate_image
from partsbaseddetector_tpu.visualize_model import (
    hog_picture,
    show_boxes,
    show_part_clusters,
    show_skeleton,
    visualize_model,
)


# --- config pipeline (the reference's only CI tests were config smoke
# tests, test/CMakeLists.txt:1-10 — mirrored here) ---


def _write_config(tmp_path, model_path):
    cfg = f"""
source1:
  type: ImageSource
  module: partsbaseddetector_tpu

sink1:
  type: Publisher
  module: partsbaseddetector_tpu

pipeline1:
  type: PartsBasedDetector
  module: partsbaseddetector_tpu
  inputs: [source1]
  outputs: [sink1]
  parameters:
    visualize: true
    max_overlap: 0.15
    model_file: "{model_path}"
    camera: {{fx: 100.0, fy: 100.0, cx: 40.0, cy: 40.0}}
"""
    path = str(tmp_path / "config.by_parts")
    with open(path, "w") as fh:
        fh.write(cfg)
    return path


def test_config_parse_and_pipeline_constructs(tmp_path):
    model = make_synthetic_model(
        nparts=3, nmix=1, fsize=(3, 3), sbin=8, interval=2, thresh=0.0, seed=30
    )
    mpath = str(tmp_path / "m.npz")
    save_model(model, mpath)
    cpath = _write_config(tmp_path, mpath)

    cfg = parse_config(cpath)
    assert cfg.model_file == mpath
    assert cfg.visualize and abs(cfg.max_overlap - 0.15) < 1e-9

    stream = build_from_file(cpath)
    rng = np.random.RandomState(0)
    result = stream.process((rng.rand(80, 80, 3) * 255).astype(np.float32))
    assert result.candidates is not None


@pytest.mark.parametrize("name", ["config_person", "config_face"])
def test_shipped_example_configs_parse(name):
    """Both shipped .by_parts examples (mirroring the reference's
    conf/config_person.by_parts and conf/config_face.by_parts) parse
    into a full PipelineConfig."""
    path = os.path.join(
        os.path.dirname(__file__), "..", "examples", "conf", f"{name}.by_parts"
    )
    cfg = parse_config(path)
    assert cfg.model_file.endswith(".npz")
    assert cfg.visualize
    assert 0.0 < cfg.max_overlap < 1.0


def test_config_rejects_missing_pipeline(tmp_path):
    path = str(tmp_path / "bad.by_parts")
    with open(path, "w") as fh:
        fh.write("source1:\n  type: RosKinect\n")
    with pytest.raises(ValueError):
        parse_config(path)


# --- model transfer ---


def test_face_to_pose_transfer():
    rng = np.random.RandomState(1)
    face = dict(
        sbin=8,
        maxsize=(4, 4),
        thresh=-0.5,
        filters=[rng.randn(4, 4, 32).astype(np.float32) * 0.1 for _ in range(4)],
        defs=[
            dict(w=np.array([0.3]), anchor=np.zeros(3)),  # comp 0 bias
            dict(w=np.array([0.01, 0, 0.02, 0]), anchor=np.array([2, 1, 0])),
            dict(w=np.array([0.4]), anchor=np.zeros(3)),  # comp 1 bias
            dict(w=np.array([0.03, 0, 0.01, 0]), anchor=np.array([1, 3, 0])),
        ],
        components=[
            [
                dict(filterid=0, defid=0, parent=-1),
                dict(filterid=1, defid=1, parent=0),
            ],
            [
                dict(filterid=2, defid=2, parent=-1),
                dict(filterid=3, defid=3, parent=0),
            ],
        ],
    )
    model = face_to_pose(face)
    assert model.ncomponents == 2
    assert model.nparts(0) == 2
    np.testing.assert_allclose(
        model.biases[model.biasid[0][0][0, 0]], 0.3, atol=1e-6
    )
    np.testing.assert_allclose(
        model.biases[model.biasid[1][0][0, 0]], 0.4, atol=1e-6
    )
    # pairwise biases are the shared zero dummy
    assert model.biases[model.biasid[0][1][0, 0]] == 0.0
    # usable end to end
    from partsbaseddetector_tpu import PartsBasedDetector

    det = PartsBasedDetector(model, max_detections=8)
    det.detect((np.random.RandomState(2).rand(80, 80, 3) * 255).astype(np.float32))


# --- annotation / dataset utils ---


def test_dataset_scanning(tmp_path):
    from PIL import Image

    imdir = tmp_path / "imgs"
    os.makedirs(imdir)
    ann = {}
    for i in range(6):
        name = f"im{i}.png"
        Image.fromarray(
            (np.random.RandomState(i).rand(20, 20, 3) * 255).astype(np.uint8)
        ).save(imdir / name)
        ann[name] = [[5 + i, 6], [10, 12]]
    ann_path = str(tmp_path / "ann.json")
    with open(ann_path, "w") as fh:
        json.dump(ann, fh)

    train, test = get_positive_data(str(imdir), ann_path, split=0.5, seed=0)
    assert len(train) == 3 and len(test) == 3
    assert train[0]["points"].shape == (2, 2)
    negs = get_negative_data(str(imdir), limit=4)
    assert len(negs) == 4

    save_annotations(str(tmp_path / "ann2.json"), {"a.png": np.ones((2, 2))})
    loaded = load_annotations(str(tmp_path / "ann2.json"))
    np.testing.assert_allclose(loaded["a.png"], 1.0)


def test_map_rotate_points():
    pts = np.array([[10.0, 5.0]])
    out = map_rotate_points(pts, (11, 21), 180.0)
    np.testing.assert_allclose(out, [[10.0, 5.0]], atol=1e-9)
    out90 = map_rotate_points(np.array([[20.0, 5.0]]), (11, 41), 90.0)
    assert out90.shape == (1, 2)


# --- visualization ---


def test_model_visualization():
    model = make_synthetic_model(nparts=4, nmix=2, fsize=(4, 4), seed=31)
    img = visualize_model(model)
    assert img.ndim == 2 and img.size > 0 and img.max() > 0
    glyph = hog_picture(model.filters[0])
    assert glyph.shape == (80, 80)

    cand = Candidate(
        np.array([[5, 5, 20, 20], [22, 8, 35, 21], [8, 25, 21, 38]], dtype=float),
        np.array([1.0, 0, 0]),
    )
    im = np.zeros((60, 60, 3), dtype=np.uint8)
    assert show_boxes(im, cand).sum() > 0
    assert show_skeleton(im, cand, np.array([0, 0, 1])).sum() > 0

    deffeat = [np.random.RandomState(3).randn(20, 2) for _ in range(2)]
    idx = [np.zeros(20, dtype=int), (np.arange(20) % 2)]
    assert show_part_clusters(deffeat, idx).sum() > 0


# --- profiling / validation ---


def test_timer_and_validate():
    t = Timer()
    with t.stage("a"):
        pass
    assert "a" in t.summary()
    import jax.numpy as jnp
    import jax

    f = jax.jit(lambda x: x * 2)
    dt = time_jitted(f, jnp.ones(8), iters=2)
    assert dt >= 0

    im = validate_image(np.zeros((20, 20)))
    assert im.shape == (20, 20, 3)
    with pytest.raises(ValueError):
        validate_image(np.full((10, 10, 3), np.nan))
    with pytest.raises(ValueError):
        validate_image(np.zeros((4, 4, 3)), min_side=10)


def test_approximate_time_synchronizer():
    from partsbaseddetector_tpu.apps.sync import ApproximateTimeSynchronizer

    matched = []
    sync = ApproximateTimeSynchronizer(
        ["rgb", "depth"], lambda r, d: matched.append((r, d)), slop=0.05
    )
    assert not sync.push("rgb", 1.00, "r1")
    assert not sync.push("rgb", 1.50, "r2")
    # depth close to r1 -> no (pivot is the later head)... close to r2 matches
    assert sync.push("depth", 1.52, "d2")
    assert matched == [("r2", "d2")]
    # out-of-slop messages don't match
    assert not sync.push("rgb", 2.0, "r3")
    assert not sync.push("depth", 2.3, "d3")
    # within slop later
    assert sync.push("rgb", 2.28, "r4")
    assert matched[-1] == ("r4", "d3")


def test_demo_cli_end_to_end(tmp_path, capsys):
    from PIL import Image

    from partsbaseddetector_tpu.apps.demo import main as demo_main
    from partsbaseddetector_tpu.apps.model_transfer import main as mt_main

    model = make_synthetic_model(
        nparts=3, nmix=1, fsize=(3, 3), sbin=8, interval=2, thresh=-3.0, seed=33
    )
    mpath = str(tmp_path / "m.npz")
    save_model(model, mpath)
    rng = np.random.RandomState(0)
    img = (rng.rand(90, 90, 3) * 255).astype(np.uint8)
    ipath = str(tmp_path / "im.png")
    Image.fromarray(img).save(ipath)
    out = str(tmp_path / "out.png")

    rc = demo_main([mpath, ipath, "--out", out, "--nms", "0.3",
                    "--max-detections", "16"])
    assert rc == 0
    assert os.path.exists(out)
    assert "candidates" in capsys.readouterr().out

    # model transfer CLI round-trips formats
    xpath = str(tmp_path / "m.xml")
    assert mt_main([mpath, xpath]) == 0
    npath = str(tmp_path / "m2.npz")
    assert mt_main([xpath, npath]) == 0
    matpath = str(tmp_path / "m.mat")
    assert mt_main([npath, matpath]) == 0


def test_messages_surface():
    """apps/messages builders (the ros/Messages.cpp surface): stable
    hash colors, cube markers, and the working messageFrustum analog
    (an empty stub at Messages.cpp:132-134; here it emits the 12
    frustum edges through the pinhole intrinsics)."""
    import numpy as np

    from partsbaseddetector_tpu.apps.messages import (
        hash_string_to_color,
        message_bounding_boxes,
        message_frustum,
    )
    from partsbaseddetector_tpu.depth import Rect3

    c1 = hash_string_to_color("person")
    assert c1 == hash_string_to_color("person") and len(c1) == 4
    assert c1 != hash_string_to_color("face")

    box = Rect3(0.0, 0.0, 1.0, 0.5, 0.5, 0.5)
    mk = message_bounding_boxes([box], object_name="person")
    assert len(mk) == 1

    fr = message_frustum(
        fx=525.0, fy=525.0, cx=320.0, cy=240.0,
        width=640, height=480, near=0.4, far=3.0,
    )
    assert fr["type"] == "marker_line_list"
    assert len(fr["points"]) == 12  # 4 near + 4 far + 4 connecting
    pts = np.asarray(fr["points"])  # (12, 6) segment endpoints
    assert pts.shape == (12, 6)
    zs = np.concatenate([pts[:, 2], pts[:, 5]])
    assert set(np.round(zs, 6)) == {0.4, 3.0}
    # far corners are the near corners scaled by far/near (pinhole)
    near_tl = pts[0, :3]
    far_tl = pts[4, :3]
    np.testing.assert_allclose(far_tl, near_tl * (3.0 / 0.4), rtol=1e-6)
