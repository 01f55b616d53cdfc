"""Adversarial-input robustness for the model readers.

The reference's FileStorageModel tolerates some malformed shapes (e.g.
scalar defid, src/FileStorageModel.cpp:148-152) and crashes on others.
Contract here: on ANY malformed input the readers either succeed with a
structurally valid Model or raise a clean Python exception — never
segfault, hang, or silently return garbage.
"""

import os
import zlib

import numpy as np
import pytest

from partsbaseddetector_tpu import make_synthetic_model
from partsbaseddetector_tpu.models.filestorage import FileStorageModel
from partsbaseddetector_tpu.models.matlabio import MatlabIOModel

CLEAN = (ValueError, KeyError, TypeError, IndexError, AttributeError,
         EOFError, OSError, NotImplementedError, ZeroDivisionError)


def _valid_xml(tmp_path) -> str:
    model = make_synthetic_model(
        nparts=3, nmix=2, fsize=(3, 3), sbin=8, interval=2, thresh=0.0, seed=5
    )
    path = str(tmp_path / "m.xml")
    FileStorageModel.write(model, path)
    return path


def _assert_clean(read, path):
    try:
        m = read(path)
    except CLEAN:
        return
    except Exception as e:  # noqa: BLE001 — anything else is a bug
        pytest.fail(f"non-clean exception type {type(e).__name__}: {e}")
    # parsed "successfully": basic structural invariants must hold
    assert m.ncomponents >= 1
    assert len(m.filters) >= 1


def test_xml_roundtrip_is_the_happy_path(tmp_path):
    path = _valid_xml(tmp_path)
    m = FileStorageModel.read(path)
    assert m.ncomponents == 1 and len(m.filters) == 6


@pytest.mark.parametrize("frac", [0.1, 0.3, 0.5, 0.9])
def test_xml_truncation(tmp_path, frac):
    path = _valid_xml(tmp_path)
    data = open(path, "rb").read()
    bad = str(tmp_path / f"trunc_{frac}.xml")
    with open(bad, "wb") as fh:
        fh.write(data[: int(len(data) * frac)])
    _assert_clean(FileStorageModel.read, bad)


def test_xml_empty_file(tmp_path):
    bad = str(tmp_path / "empty.xml")
    open(bad, "w").close()
    _assert_clean(FileStorageModel.read, bad)


def test_xml_binary_junk(tmp_path):
    bad = str(tmp_path / "junk.xml")
    with open(bad, "wb") as fh:
        fh.write(zlib.compress(b"not xml at all" * 100))
    _assert_clean(FileStorageModel.read, bad)


def test_xml_wrong_root_tags(tmp_path):
    bad = str(tmp_path / "wrong.xml")
    with open(bad, "w") as fh:
        fh.write("<?xml version='1.0'?><opencv_storage><foo>1</foo>"
                 "</opencv_storage>")
    _assert_clean(FileStorageModel.read, bad)


def test_xml_non_numeric_fields(tmp_path):
    path = _valid_xml(tmp_path)
    text = open(path).read().replace(
        "<interval>", "<interval>oops ", 1
    )
    bad = str(tmp_path / "nonnum.xml")
    with open(bad, "w") as fh:
        fh.write(text)
    _assert_clean(FileStorageModel.read, bad)


def test_xml_field_deleted(tmp_path):
    """Drop whole top-level sections one at a time."""
    path = _valid_xml(tmp_path)
    text = open(path).read()
    for field in ("biasw", "defs", "anchors", "filtersw", "thresh"):
        start = text.find(f"<{field}>")
        end = text.find(f"</{field}>")
        if start < 0 or end < 0:
            continue
        mutated = text[:start] + text[end + len(field) + 3 :]
        bad = str(tmp_path / f"no_{field}.xml")
        with open(bad, "w") as fh:
            fh.write(mutated)
        _assert_clean(FileStorageModel.read, bad)


def test_xml_random_byte_flips(tmp_path):
    rng = np.random.RandomState(0)
    path = _valid_xml(tmp_path)
    data = bytearray(open(path, "rb").read())
    for trial in range(8):
        mutated = bytearray(data)
        for _ in range(8):
            mutated[rng.randint(len(mutated))] = rng.randint(256)
        bad = str(tmp_path / f"flip{trial}.xml")
        with open(bad, "wb") as fh:
            fh.write(bytes(mutated))
        _assert_clean(FileStorageModel.read, bad)


# --- MatlabIO ---------------------------------------------------------------


def _valid_mat(tmp_path) -> str:
    pytest.importorskip("scipy")
    model = make_synthetic_model(
        nparts=3, nmix=2, fsize=(3, 3), sbin=8, interval=2, thresh=0.0, seed=6
    )
    path = str(tmp_path / "m.mat")
    MatlabIOModel.write(model, path)
    return path


def test_mat_roundtrip_is_the_happy_path(tmp_path):
    path = _valid_mat(tmp_path)
    m = MatlabIOModel.read(path)
    assert m.ncomponents == 1


@pytest.mark.parametrize("frac", [0.05, 0.4, 0.8])
def test_mat_truncation(tmp_path, frac):
    path = _valid_mat(tmp_path)
    data = open(path, "rb").read()
    bad = str(tmp_path / f"trunc_{frac}.mat")
    with open(bad, "wb") as fh:
        fh.write(data[: int(len(data) * frac)])
    _assert_clean(MatlabIOModel.read, bad)


def test_mat_wrong_magic(tmp_path):
    path = _valid_mat(tmp_path)
    data = bytearray(open(path, "rb").read())
    data[:8] = b"NOTAMAT!"
    bad = str(tmp_path / "magic.mat")
    with open(bad, "wb") as fh:
        fh.write(bytes(data))
    _assert_clean(MatlabIOModel.read, bad)


def test_mat_missing_model_var(tmp_path):
    pytest.importorskip("scipy")
    import scipy.io as sio

    bad = str(tmp_path / "nomodel.mat")
    sio.savemat(bad, {"something_else": np.zeros(3)})
    _assert_clean(MatlabIOModel.read, bad)


def test_mat_random_byte_flips(tmp_path):
    rng = np.random.RandomState(1)
    path = _valid_mat(tmp_path)
    data = bytearray(open(path, "rb").read())
    for trial in range(6):
        mutated = bytearray(data)
        for _ in range(12):
            mutated[rng.randint(64, len(mutated))] = rng.randint(256)
        bad = str(tmp_path / f"flip{trial}.mat")
        with open(bad, "wb") as fh:
            fh.write(bytes(mutated))
        _assert_clean(MatlabIOModel.read, bad)
