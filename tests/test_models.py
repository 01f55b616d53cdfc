"""Model layer: canonical round-trips, format loaders, packing."""

import numpy as np
import pytest

from partsbaseddetector_tpu.models import (
    FileStorageModel,
    MatlabIOModel,
    load_model,
    make_synthetic_model,
    pack_model,
    save_model,
)


def _assert_models_equal(a, b, strict_bias_values=True):
    assert a.interval == b.interval
    assert a.sbin == b.sbin
    assert np.isclose(a.thresh, b.thresh)
    assert len(a.filters) == len(b.filters)
    for fa, fb in zip(a.filters, b.filters):
        np.testing.assert_allclose(fa, fb, rtol=1e-6, atol=1e-6)
    for da, db in zip(a.defs, b.defs):
        np.testing.assert_allclose(da, db, rtol=1e-6, atol=1e-6)
    for aa, ab in zip(a.anchors, b.anchors):
        np.testing.assert_array_equal(aa[:2], ab[:2])
    assert a.ncomponents == b.ncomponents
    for c in range(a.ncomponents):
        np.testing.assert_array_equal(a.parentid[c], b.parentid[c])
        for p in range(a.nparts(c)):
            np.testing.assert_array_equal(a.filterid[c][p], b.filterid[c][p])
            np.testing.assert_array_equal(a.defid[c][p], b.defid[c][p])
            # bias index tables may be re-laid out; compare the values
            va = a.biases[a.biasid[c][p]]
            vb = b.biases[b.biasid[c][p]]
            np.testing.assert_allclose(va, vb, rtol=1e-6, atol=1e-6)


def test_npz_roundtrip(tmp_path):
    m = make_synthetic_model(nparts=5, nmix=3, ncomponents=2, seed=1)
    path = str(tmp_path / "m.npz")
    save_model(m, path)
    m2 = load_model(path)
    _assert_models_equal(m, m2)
    assert m2.name == m.name


def test_filestorage_xml_roundtrip(tmp_path):
    m = make_synthetic_model(nparts=4, nmix=2, seed=2)
    path = str(tmp_path / "m.xml")
    FileStorageModel.write(m, path)
    m2 = FileStorageModel.read(path)
    _assert_models_equal(m, m2)


def test_filestorage_xml_readable_by_opencv(tmp_path):
    cv2 = pytest.importorskip("cv2")
    m = make_synthetic_model(nparts=3, nmix=2, seed=3)
    path = str(tmp_path / "m.xml")
    FileStorageModel.write(m, path)
    fs = cv2.FileStorage(path, cv2.FILE_STORAGE_READ)
    assert int(fs.getNode("interval").real()) == m.interval
    assert int(fs.getNode("sbin").real()) == m.sbin
    filtersw = fs.getNode("filtersw")
    assert filtersw.size() == len(m.filters)
    f0 = filtersw.at(0).mat()
    fh, fw, fl = m.filters[0].shape
    np.testing.assert_allclose(
        f0, m.filters[0].reshape(fh, fw * fl), rtol=1e-6, atol=1e-7
    )
    comp = fs.getNode("indexers").getNode("component-0")
    part1 = comp.getNode("part-1")
    assert int(part1.getNode("parentid").real()) == int(m.parentid[0][1])
    fs.release()


def test_filestorage_read_opencv_written_yaml(tmp_path):
    """Cross-validate the YAML reader against a cv2-written file."""
    cv2 = pytest.importorskip("cv2")
    m = make_synthetic_model(nparts=3, nmix=2, seed=4)
    xml_path = str(tmp_path / "m.xml")
    FileStorageModel.write(m, xml_path)
    # convert XML -> YAML with OpenCV itself
    fs_in = cv2.FileStorage(xml_path, cv2.FILE_STORAGE_READ)
    yml_path = str(tmp_path / "m.yml")
    fs_out = cv2.FileStorage(yml_path, cv2.FILE_STORAGE_WRITE)
    fs_out.write("name", m.name)
    for key in ("interval", "sbin", "norient", "flen"):
        fs_out.write(key, int(fs_in.getNode(key).real()))
    fs_out.write("thresh", float(fs_in.getNode("thresh").real()))
    fs_out.startWriteStruct("filtersw", cv2.FILE_NODE_SEQ)
    for i in range(fs_in.getNode("filtersw").size()):
        fs_out.write("", fs_in.getNode("filtersw").at(i).mat())
    fs_out.endWriteStruct()
    for key in ("biasw", "anchors"):
        node = fs_in.getNode(key)
        vals = [node.at(i).real() for i in range(node.size())]
        fs_out.startWriteStruct(key, cv2.FILE_NODE_SEQ)
        for v in vals:
            fs_out.write("", float(v) if key == "biasw" else int(v))
        fs_out.endWriteStruct()
    fs_out.startWriteStruct("defs", cv2.FILE_NODE_SEQ)
    dnode = fs_in.getNode("defs")
    for i in range(dnode.size()):
        sub = dnode.at(i)
        fs_out.startWriteStruct("", cv2.FILE_NODE_SEQ)
        for j in range(sub.size()):
            fs_out.write("", float(sub.at(j).real()))
        fs_out.endWriteStruct()
    fs_out.endWriteStruct()
    fs_out.startWriteStruct("indexers", cv2.FILE_NODE_MAP)
    comp = fs_in.getNode("indexers").getNode("component-0")
    fs_out.startWriteStruct("component-0", cv2.FILE_NODE_MAP)
    for p in range(comp.size()):
        pn = comp.getNode(f"part-{p}")
        fs_out.startWriteStruct(f"part-{p}", cv2.FILE_NODE_MAP)
        fs_out.write("parentid", int(pn.getNode("parentid").real()))
        for key in ("filterid", "biasid", "defid"):
            node = pn.getNode(key)
            fs_out.startWriteStruct(key, cv2.FILE_NODE_SEQ)
            for i in range(node.size()):
                fs_out.write("", int(node.at(i).real()))
            fs_out.endWriteStruct()
        fs_out.endWriteStruct()
    fs_out.endWriteStruct()
    fs_out.endWriteStruct()
    fs_out.release()
    fs_in.release()

    m2 = FileStorageModel.read(yml_path)
    _assert_models_equal(m, m2)


def test_matlab_roundtrip(tmp_path):
    m = make_synthetic_model(nparts=5, nmix=3, seed=5)
    path = str(tmp_path / "m.mat")
    MatlabIOModel.write(m, path)
    m2 = MatlabIOModel.read(path)
    _assert_models_equal(m, m2)
    assert m2.maxsize == m.maxsize


def test_pack_model_shapes():
    m = make_synthetic_model(nparts=6, nmix=3, fsize=(5, 4), seed=6)
    pm = pack_model(m)
    comp = pm.components[0]
    assert pm.filters.shape == (len(m.filters), 5, 4, 32)
    assert comp.filterid.shape == (6, 3)
    assert comp.bias.shape == (6, 3, 3)
    assert np.isfinite(comp.root_bias[:3]).all()
    # bias[l, k] pulled from the dense tables
    tbl = m.biases[m.biasid[0][2]]
    np.testing.assert_allclose(comp.bias[2, : tbl.shape[0], : tbl.shape[1]], tbl)
    # shifts equal 0-based anchors when ds=0 (no virtual padding)
    d0 = m.defid[0][3][0]
    assert comp.shift_x[3, 0] == m.anchors[d0][0]
    assert comp.shift_y[3, 0] == m.anchors[d0][1]


def test_pack_scale_offsets():
    m = make_synthetic_model(nparts=3, nmix=1, seed=7)
    m.anchors[m.defid[0][1][0]][2] = 1  # part 1: ds = 1 (parent = root)
    pm = pack_model(m)
    comp = pm.components[0]
    assert comp.step[1] == 2
    # ds accumulates down the tree
    par2 = int(comp.parentid[2])
    expect2 = (1 if par2 == 1 else 0) + int(
        m.anchors[m.defid[0][2][0]][2]
    )
    assert comp.ds_total[1] == 1
    assert comp.ds_total[2] == expect2
    assert comp.max_ds >= 1
    # virtual padding enters the DT grid origin: shift = anchor - (step-1)*pad
    pady, padx = m.pad()
    d0 = m.defid[0][1][0]
    assert comp.shift_x[1, 0] == m.anchors[d0][0] - (2 - 1) * padx


def test_readers_reject_malformed_files(tmp_path):
    """Format readers fail cleanly on malformed inputs."""
    from partsbaseddetector_tpu.models import FileStorageModel, load_model

    bad_xml = tmp_path / "bad.xml"
    bad_xml.write_text("<opencv_storage><name>x</name></opencv_storage>")
    with pytest.raises((KeyError, TypeError, ValueError, AttributeError)):
        FileStorageModel.read(str(bad_xml))

    not_xml = tmp_path / "garbage.xml"
    not_xml.write_text("this is not xml at all {{{")
    with pytest.raises(Exception):
        FileStorageModel.read(str(not_xml))

    bad_npz = tmp_path / "bad.npz"
    np.savez(str(bad_npz), unrelated=np.zeros(3))
    with pytest.raises(Exception):
        load_model(str(bad_npz))

    truncated = tmp_path / "trunc.npz"
    truncated.write_bytes(b"PK\x03\x04 definitely not a full zip")
    with pytest.raises(Exception):
        load_model(str(truncated))


def test_model_validate_catches_bad_topology():
    m = make_synthetic_model(nparts=3, nmix=1, seed=8)
    m.parentid[0] = np.array([0, 2, 1], dtype=np.int32)  # child before parent
    with pytest.raises(AssertionError):
        m.validate()
