"""W4: TFRecord sink — pure-Python TFRecord/Example encoder.

The reference uses tensorflow's TFRecordWriter
(/root/reference/img2dataset/writer.py:138-243).  TensorFlow is not
available here, but both the TFRecord framing and the Example protobuf
wire format are small public specs, so this is a real (not stubbed)
implementation:

  TFRecord framing: uint64 length | masked crc32c(length) | payload |
  masked crc32c(payload)   (TensorFlow docs, tf.data.TFRecordDataset)

  Example proto: Example{ features:1 } -> Features{ feature:1 map } ->
  Feature{ bytes_list:1 | float_list:2 | int64_list:3 }
"""

from __future__ import annotations

import struct

# --- crc32c (Castagnoli), table-driven, public polynomial 0x82F63B78 ---
_CRC_TABLE = []
for _n in range(256):
    _c = _n
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _CRC_TABLE.append(_c)


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = _CRC_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# --- minimal protobuf wire encoding -----------------------------------


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _len_delimited(field_no: int, payload: bytes) -> bytes:
    return _varint((field_no << 3) | 2) + _varint(len(payload)) + payload


def _feature_bytes(values: list[bytes]) -> bytes:
    inner = b"".join(_len_delimited(1, v) for v in values)
    return _len_delimited(1, inner)  # Feature.bytes_list = 1


def _feature_floats(values: list[float]) -> bytes:
    packed = struct.pack(f"<{len(values)}f", *values)
    inner = _varint((1 << 3) | 2) + _varint(len(packed)) + packed
    return _len_delimited(2, inner)  # Feature.float_list = 2


def _feature_int64s(values: list[int]) -> bytes:
    packed = b"".join(_varint(v & 0xFFFFFFFFFFFFFFFF) for v in values)
    inner = _varint((1 << 3) | 2) + _varint(len(packed)) + packed
    return _len_delimited(3, inner)  # Feature.int64_list = 3


def encode_example(features: dict[str, object]) -> bytes:
    """Encode a {name: value} dict as a tf.train.Example, typing values
    the way the reference does (writer.py:205-243): bytes/str ->
    bytes_list, int -> int64_list, float -> float_list, lists elementwise."""
    feats = bytearray()
    for name, value in sorted(features.items()):
        if value is None:
            continue
        if isinstance(value, bytes):
            f = _feature_bytes([value])
        elif isinstance(value, str):
            f = _feature_bytes([value.encode("utf-8")])
        elif isinstance(value, bool):
            f = _feature_int64s([int(value)])
        elif isinstance(value, int):
            f = _feature_int64s([value])
        elif isinstance(value, float):
            f = _feature_floats([value])
        elif isinstance(value, (list, tuple)) and value:
            if isinstance(value[0], (int, bool)):
                f = _feature_int64s([int(v) for v in value])
            elif isinstance(value[0], float):
                f = _feature_floats([float(v) for v in value])
            else:
                f = _feature_bytes(
                    [v if isinstance(v, bytes) else str(v).encode() for v in value]
                )
        else:
            f = _feature_bytes([str(value).encode("utf-8")])
        # Map entry message: field 1 = key (string), field 2 = value
        # (the serialized Feature message).  The Feature must be wrapped
        # as field 2, not spliced raw into the entry.
        entry = _len_delimited(1, name.encode("utf-8")) + _len_delimited(2, f)
        feats += _len_delimited(1, entry)  # Features.feature map entry
    features_msg = bytes(feats)
    example = _len_delimited(1, features_msg)  # Example.features = 1
    return example


def write_tfrecord(path_or_file, examples: list[dict[str, object]]) -> None:
    """Write TFRecord-framed Examples to a path or writable binary file."""

    def _write(fh) -> None:
        for ex in examples:
            payload = encode_example(ex)
            length = struct.pack("<Q", len(payload))
            fh.write(length)
            fh.write(struct.pack("<I", _masked_crc(length)))
            fh.write(payload)
            fh.write(struct.pack("<I", _masked_crc(payload)))

    if isinstance(path_or_file, str):
        with open(path_or_file, "wb") as fh:
            _write(fh)
    else:
        _write(path_or_file)
