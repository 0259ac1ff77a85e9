"""Standalone TFRecord + tf.train.Example codec (no TensorFlow dependency).

Preserves the reference's on-disk dataset format (tfrecords written by
`scripts/generate_pascal_tf_records.py` / parsed by
`object_detection/dataset/pascal_tf_dataset_generator.py:9-33`) while keeping
this framework TF-free: the TFRecord framing and the protobuf wire format of
`tf.train.Example` are implemented directly.

TFRecord framing per record:
    uint64 little-endian length
    uint32 masked crc32c(length bytes)
    byte data[length]
    uint32 masked crc32c(data)
with mask(crc) = ((crc >> 15) | (crc << 17)) + 0xa282ead8 (mod 2^32).

Example proto wire layout (field numbers from tensorflow/core/example):
    Example { Features features = 1 }
    Features { map<string, Feature> feature = 1 }
    Feature  { oneof: BytesList = 1, FloatList = 2, Int64List = 3 }
    BytesList{ repeated bytes value = 1 }
    FloatList{ repeated float value = 1 [packed] }
    Int64List{ repeated int64 value = 1 [packed] }
"""

from __future__ import annotations

import ctypes
import os
import struct
from typing import Dict, Iterator, List, Union


def _load_native():
    """Native IO library (native/tfrecord_io.cc): crc32c + record indexing."""
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    path = os.path.join(here, "native", "libtfrecord_io.so")
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.crc32c.restype = ctypes.c_uint32
        lib.crc32c.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
        lib.masked_crc32c.restype = ctypes.c_uint32
        lib.masked_crc32c.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
        lib.tfrecord_index.restype = ctypes.c_int64
        lib.tfrecord_index.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_int64,
            ctypes.c_int,
        ]
        return lib
    except OSError:
        return None


_NATIVE = _load_native()

try:  # baked into the image; pure-python fallback below
    import google_crc32c

    def _crc32c(data: bytes) -> int:
        return google_crc32c.value(data)

except ImportError:  # pragma: no cover
    _CRC_TABLE = []

    def _crc32c(data: bytes) -> int:
        if not _CRC_TABLE:
            for i in range(256):
                c = i
                for _ in range(8):
                    c = (c >> 1) ^ 0x82F63B78 if c & 1 else c >> 1
                _CRC_TABLE.append(c)
        crc = 0xFFFFFFFF
        for b in data:
            crc = _CRC_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
        return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    if _NATIVE is not None:
        return _NATIVE.masked_crc32c(data, len(data))
    crc = _crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def index_tfrecords(path: str, check_crc: bool = False):
    """[(payload_offset, length)] for a tfrecord file.

    Uses the native indexer when built (one C pass, no per-record python);
    falls back to walking the framing in python.
    """
    if _NATIVE is not None:
        n = _NATIVE.tfrecord_index(path.encode(), None, None, 0, 1 if check_crc else 0)
        if n < 0:
            raise IOError(f"corrupt tfrecord in {path}")
        offsets = (ctypes.c_uint64 * n)()
        lengths = (ctypes.c_uint64 * n)()
        n2 = _NATIVE.tfrecord_index(
            path.encode(), offsets, lengths, n, 1 if check_crc else 0
        )
        if n2 != n:
            raise IOError(f"tfrecord changed while indexing: {path}")
        return list(zip(offsets, lengths))
    out = []
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if len(header) < 8:
                return out
            (length,) = struct.unpack("<Q", header)
            hcrc_bytes = f.read(4)
            out.append((f.tell(), length))
            if check_crc:
                data = f.read(length)
                dcrc_bytes = f.read(4)
                if len(hcrc_bytes) < 4 or len(data) < length or len(dcrc_bytes) < 4:
                    raise IOError(f"truncated tfrecord in {path}")
                (hcrc,) = struct.unpack("<I", hcrc_bytes)
                (dcrc,) = struct.unpack("<I", dcrc_bytes)
                if _masked_crc(header) != hcrc or _masked_crc(data) != dcrc:
                    raise IOError(f"corrupt tfrecord in {path}")
            else:
                f.seek(length + 4, 1)


# ----------------------------------------------------------- record framing
class TFRecordWriter:
    def __init__(self, path: str):
        self._f = open(path, "wb")

    def write(self, data: bytes):
        header = struct.pack("<Q", len(data))
        self._f.write(header)
        self._f.write(struct.pack("<I", _masked_crc(header)))
        self._f.write(data)
        self._f.write(struct.pack("<I", _masked_crc(data)))

    def close(self):
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


def read_tfrecords(path: str, check_crc: bool = False) -> Iterator[bytes]:
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if len(header) < 8:
                return
            (length,) = struct.unpack("<Q", header)
            (hcrc,) = struct.unpack("<I", f.read(4))
            data = f.read(length)
            (dcrc,) = struct.unpack("<I", f.read(4))
            if check_crc and (
                _masked_crc(header) != hcrc or _masked_crc(data) != dcrc
            ):
                raise IOError(f"corrupt tfrecord in {path}")
            yield data


# ------------------------------------------------------------ proto varint
def _write_varint(out: bytearray, v: int):
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_varint(buf: bytes, pos: int):
    shift = 0
    result = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _tag(field: int, wire: int) -> int:
    return (field << 3) | wire


# ------------------------------------------------------- Example encoding
FeatureValue = Union[List[bytes], List[float], List[int]]


def _encode_feature(value: FeatureValue, kind: str) -> bytes:
    inner = bytearray()
    if kind == "bytes":
        for v in value:
            _write_varint(inner, _tag(1, 2))
            _write_varint(inner, len(v))
            inner += v
        field = 1
    elif kind == "float":
        packed = struct.pack(f"<{len(value)}f", *value)
        _write_varint(inner, _tag(1, 2))
        _write_varint(inner, len(packed))
        inner += packed
        field = 2
    elif kind == "int64":
        packed = bytearray()
        for v in value:
            _write_varint(packed, v & 0xFFFFFFFFFFFFFFFF)
        _write_varint(inner, _tag(1, 2))
        _write_varint(inner, len(packed))
        inner += packed
        field = 3
    else:
        raise ValueError(kind)
    out = bytearray()
    _write_varint(out, _tag(field, 2))
    _write_varint(out, len(inner))
    out += inner
    return bytes(out)


def encode_example(features: Dict[str, tuple]) -> bytes:
    """features: name -> (kind, list) with kind in {bytes, float, int64}."""
    fmap = bytearray()
    for name, (kind, value) in features.items():
        key = name.encode()
        fvalue = _encode_feature(value, kind)
        entry = bytearray()
        _write_varint(entry, _tag(1, 2))
        _write_varint(entry, len(key))
        entry += key
        _write_varint(entry, _tag(2, 2))
        _write_varint(entry, len(fvalue))
        entry += fvalue
        _write_varint(fmap, _tag(1, 2))
        _write_varint(fmap, len(entry))
        fmap += entry
    out = bytearray()
    _write_varint(out, _tag(1, 2))
    _write_varint(out, len(fmap))
    out += fmap
    return bytes(out)


def _skip_field(buf: bytes, pos: int, wire: int) -> int:
    if wire == 0:
        _, pos = _read_varint(buf, pos)
    elif wire == 2:
        n, pos = _read_varint(buf, pos)
        pos += n
    elif wire == 5:
        pos += 4
    elif wire == 1:
        pos += 8
    else:
        raise ValueError(f"bad wire type {wire}")
    return pos


def _decode_feature(buf: bytes) -> tuple:
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        n, pos = _read_varint(buf, pos)
        body = buf[pos : pos + n]
        pos += n
        if field == 1:  # BytesList
            out, p = [], 0
            while p < len(body):
                t, p = _read_varint(body, p)
                ln, p = _read_varint(body, p)
                out.append(body[p : p + ln])
                p += ln
            return "bytes", out
        if field == 2:  # FloatList
            out, p = [], 0
            while p < len(body):
                t, p = _read_varint(body, p)
                if (t & 7) == 2:  # packed
                    ln, p = _read_varint(body, p)
                    out.extend(struct.unpack(f"<{ln // 4}f", body[p : p + ln]))
                    p += ln
                else:  # unpacked fixed32
                    out.append(struct.unpack("<f", body[p : p + 4])[0])
                    p += 4
            return "float", out
        if field == 3:  # Int64List
            out, p = [], 0
            while p < len(body):
                t, p = _read_varint(body, p)
                if (t & 7) == 2:
                    ln, p = _read_varint(body, p)
                    end = p + ln
                    while p < end:
                        v, p = _read_varint(body, p)
                        if v >= 1 << 63:
                            v -= 1 << 64
                        out.append(v)
                else:
                    v, p = _read_varint(body, p)
                    out.append(v)
            return "int64", out
    return "bytes", []


def decode_example(buf: bytes) -> Dict[str, tuple]:
    """bytes -> {name: (kind, list)}."""
    out: Dict[str, tuple] = {}
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if field != 1 or wire != 2:
            pos = _skip_field(buf, pos, wire)
            continue
        n, pos = _read_varint(buf, pos)
        fmap = buf[pos : pos + n]
        pos += n
        p = 0
        while p < len(fmap):
            t, p = _read_varint(fmap, p)
            if t != _tag(1, 2):
                p = _skip_field(fmap, p, t & 7)
                continue
            ln, p = _read_varint(fmap, p)
            entry = fmap[p : p + ln]
            p += ln
            ep = 0
            name = None
            feat = None
            while ep < len(entry):
                et, ep = _read_varint(entry, ep)
                eln, ep = _read_varint(entry, ep)
                body = entry[ep : ep + eln]
                ep += eln
                if (et >> 3) == 1:
                    name = body.decode()
                else:
                    feat = _decode_feature(body)
            if name is not None and feat is not None:
                out[name] = feat
    return out
