"""Native IO library tests (skipped when libtfrecord_io.so isn't built)."""

import os
import subprocess

import numpy as np
import pytest

NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
SO_PATH = os.path.join(NATIVE_DIR, "libtfrecord_io.so")


@pytest.fixture(scope="module", autouse=True)
def build_native():
    if not os.path.exists(SO_PATH):
        try:
            subprocess.run(["sh", os.path.join(NATIVE_DIR, "build.sh")], check=True)
        except Exception:
            pytest.skip("native toolchain unavailable")
    # tfrecord.py resolves the library once at import time; if the module was
    # imported (by an earlier test file) before the .so was built, refresh the
    # cached handle so these tests exercise the native path.
    from tf_eager_object_detection_tpu.data import tfrecord as T

    if T._NATIVE is None:
        T._NATIVE = T._load_native()
        if T._NATIVE is None:
            pytest.skip("native library failed to load")
    yield


def test_native_crc32c_matches_python():
    from tf_eager_object_detection_tpu.data import tfrecord as T

    lib = T._load_native()
    assert lib is not None
    rng = np.random.RandomState(0)
    for n in (0, 1, 7, 8, 9, 64, 1000, 65537):
        data = rng.bytes(n)
        # reference value via google_crc32c (or the python table fallback)
        want = T._crc32c(data)
        assert lib.crc32c(data, n) == want
        want_masked = (((want >> 15) | (want << 17)) + 0xA282EAD8) & 0xFFFFFFFF
        assert lib.masked_crc32c(data, n) == want_masked


def test_native_index_roundtrip(tmp_path):
    from tf_eager_object_detection_tpu.data.tfrecord import (
        TFRecordWriter,
        index_tfrecords,
        read_tfrecords,
    )

    path = str(tmp_path / "x.tfrecords")
    payloads = [b"a", b"hello" * 100, b"", b"\x00" * 1000]
    with TFRecordWriter(path) as w:
        for p in payloads:
            w.write(p)
    idx = index_tfrecords(path, check_crc=True)
    assert len(idx) == len(payloads)
    with open(path, "rb") as f:
        blob = f.read()
    for (off, length), want in zip(idx, payloads):
        assert blob[off : off + length] == want
    # agrees with the sequential reader
    assert list(read_tfrecords(path)) == payloads


def test_native_index_detects_corruption(tmp_path):
    from tf_eager_object_detection_tpu.data.tfrecord import (
        TFRecordWriter,
        index_tfrecords,
    )

    path = str(tmp_path / "bad.tfrecords")
    with TFRecordWriter(path) as w:
        w.write(b"payload")
    data = bytearray(open(path, "rb").read())
    data[14] ^= 0xFF  # flip a payload byte
    open(path, "wb").write(bytes(data))
    with pytest.raises(IOError):
        index_tfrecords(path, check_crc=True)


def test_python_fallback_index_checks_crc(tmp_path, monkeypatch):
    """The pure-python indexer must honor check_crc too (the native library
    may not be built on a fresh machine)."""
    from tf_eager_object_detection_tpu.data import tfrecord as T

    path = str(tmp_path / "bad2.tfrecords")
    with T.TFRecordWriter(path) as w:
        w.write(b"payload")
        w.write(b"second")
    monkeypatch.setattr(T, "_NATIVE", None)
    idx = T.index_tfrecords(path, check_crc=True)
    assert len(idx) == 2

    data = bytearray(open(path, "rb").read())
    data[14] ^= 0xFF
    open(path, "wb").write(bytes(data))
    with pytest.raises(IOError):
        T.index_tfrecords(path, check_crc=True)
    # without check_crc, indexing still walks the framing
    assert len(T.index_tfrecords(path, check_crc=False)) == 2


def test_python_fallback_index_truncated_file(tmp_path, monkeypatch):
    """EOF inside a record must raise IOError, not struct.error."""
    from tf_eager_object_detection_tpu.data import tfrecord as T

    path = str(tmp_path / "trunc.tfrecords")
    with T.TFRecordWriter(path) as w:
        w.write(b"payload-bytes")
    data = open(path, "rb").read()
    open(path, "wb").write(data[:-6])  # cut into the data/crc tail
    monkeypatch.setattr(T, "_NATIVE", None)
    with pytest.raises(IOError, match="truncated|corrupt"):
        T.index_tfrecords(path, check_crc=True)
