"""Protobuf wire-format primitives (pure Python + vectorized numpy variants).

Reimplements, from the public protobuf wire spec, exactly the subset the
Geobuf codec needs: varints, zigzag sint64, length-delimited fields, packed
repeated scalars, little-endian doubles.  Mirrors the behavior of protozero
as used by the reference (`/root/reference/src/geobuf/geobuf.cpp`):

- packed fields with zero elements are not written at all (protozero
  ``add_packed_*`` early-returns on an empty range);
- ``add_int64`` writes the two's-complement 64-bit varint (10 bytes for
  negative values), NOT zigzag (`src/geobuf/geobuf.cpp:393`);
- ``sint64`` is zigzag varint (`src/geobuf/geobuf.cpp:481,505,527,816`).

The numpy variants (``varint_encode_array`` / ``varint_decode_stream``) are
the vectorized hot path used by the batch codec in ``codec_batch.py``.
"""

from __future__ import annotations

import struct

import numpy as np

WIRE_VARINT = 0
WIRE_FIXED64 = 1
WIRE_LEN = 2

_U64 = (1 << 64) - 1


# ---------------------------------------------------------------------------
# scalar writers (bytearray sink)
# ---------------------------------------------------------------------------

def write_varint(buf: bytearray, n: int) -> None:
    """Append unsigned varint (n must be in [0, 2^64))."""
    if n < 0:
        raise ValueError("varint must be non-negative")
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            return


def write_key(buf: bytearray, tag: int, wire_type: int) -> None:
    write_varint(buf, (tag << 3) | wire_type)


def write_tag_varint(buf: bytearray, tag: int, n: int) -> None:
    write_key(buf, tag, WIRE_VARINT)
    write_varint(buf, n)


def write_tag_int64(buf: bytearray, tag: int, n: int) -> None:
    """Plain (non-zigzag) int64: negative -> two's complement 10-byte varint."""
    write_key(buf, tag, WIRE_VARINT)
    write_varint(buf, n & _U64)


def write_tag_bool(buf: bytearray, tag: int, v: bool) -> None:
    write_tag_varint(buf, tag, 1 if v else 0)


def write_tag_double(buf: bytearray, tag: int, x: float) -> None:
    write_key(buf, tag, WIRE_FIXED64)
    buf += struct.pack("<d", x)


def write_tag_bytes(buf: bytearray, tag: int, payload: bytes) -> None:
    write_key(buf, tag, WIRE_LEN)
    write_varint(buf, len(payload))
    buf += payload


def write_tag_string(buf: bytearray, tag: int, s: str) -> None:
    write_tag_bytes(buf, tag, s.encode("utf-8"))


def zigzag(n: int) -> int:
    """sint64 zigzag encode (64-bit)."""
    return ((n << 1) ^ (n >> 63)) & _U64


def unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def write_packed_uint32(buf: bytearray, tag: int, values) -> None:
    """Packed uint32; skipped entirely when empty (protozero semantics)."""
    values = list(values)
    if not values:
        return
    payload = bytearray()
    for v in values:
        write_varint(payload, v)
    write_tag_bytes(buf, tag, bytes(payload))


def write_packed_sint64(buf: bytearray, tag: int, values) -> None:
    """Packed zigzag sint64; skipped entirely when empty."""
    values = list(values)
    if not values:
        return
    payload = bytearray()
    for v in values:
        write_varint(payload, zigzag(v))
    write_tag_bytes(buf, tag, bytes(payload))


# ---------------------------------------------------------------------------
# scalar reader
# ---------------------------------------------------------------------------

class PbfReader:
    """Minimal field-at-a-time reader over a bytes slice."""

    __slots__ = ("data", "pos", "end", "tag", "wire")

    def __init__(self, data: bytes, start: int = 0, end: int | None = None):
        self.data = data
        self.pos = start
        self.end = len(data) if end is None else end
        self.tag = 0
        self.wire = 0

    def next(self) -> bool:
        if self.pos >= self.end:
            return False
        key = self.read_varint()
        self.tag = key >> 3
        self.wire = key & 7
        return True

    def read_varint(self) -> int:
        data, pos = self.data, self.pos
        result = 0
        shift = 0
        try:
            while True:
                b = data[pos]
                pos += 1
                result |= (b & 0x7F) << shift
                if not b & 0x80:
                    break
                shift += 7
                if shift > 70:
                    raise ValueError("malformed varint")
        except IndexError:
            raise ValueError("truncated varint") from None
        if pos > self.end:
            raise ValueError("varint overruns message boundary")
        self.pos = pos
        return result & _U64

    def read_int64(self) -> int:
        u = self.read_varint()
        return u - (1 << 64) if u >= (1 << 63) else u

    def read_sint64(self) -> int:
        return unzigzag(self.read_varint())

    def read_double(self) -> float:
        if self.pos + 8 > self.end:
            raise ValueError("truncated double")
        x = struct.unpack_from("<d", self.data, self.pos)[0]
        self.pos += 8
        return x

    def read_bytes(self) -> bytes:
        n = self.read_varint()
        if self.pos + n > self.end:
            raise ValueError("truncated length-delimited field")
        out = self.data[self.pos:self.pos + n]
        self.pos += n
        return out

    def read_string(self) -> str:
        return self.read_bytes().decode("utf-8")

    def enter_message(self) -> "PbfReader":
        n = self.read_varint()
        if self.pos + n > self.end:
            raise ValueError("truncated embedded message")
        sub = PbfReader(self.data, self.pos, self.pos + n)
        self.pos += n
        return sub

    def read_packed_uint32(self) -> list[int]:
        sub = self.enter_message()
        out = []
        while sub.pos < sub.end:
            out.append(sub.read_varint())
        return out

    def read_packed_sint64(self) -> list[int]:
        sub = self.enter_message()
        out = []
        while sub.pos < sub.end:
            out.append(unzigzag(sub.read_varint()))
        return out

    def skip(self) -> None:
        if self.wire == WIRE_VARINT:
            self.read_varint()
        elif self.wire == WIRE_FIXED64:
            if self.pos + 8 > self.end:
                raise ValueError("truncated fixed64 field")
            self.pos += 8
        elif self.wire == WIRE_LEN:
            n = self.read_varint()
            if self.pos + n > self.end:
                raise ValueError("truncated length-delimited field")
            self.pos += n
        else:
            raise ValueError(f"unsupported wire type {self.wire}")


# ---------------------------------------------------------------------------
# vectorized varint codec (numpy) — hot path for the batch point codec
# ---------------------------------------------------------------------------

_VARINT_THRESHOLDS = np.array([1 << (7 * k) for k in range(1, 10)],
                              dtype=np.uint64)


def varint_nbytes(values: np.ndarray) -> np.ndarray:
    """Byte length of the varint encoding of each uint64 value."""
    v = values.astype(np.uint64, copy=False)
    # searchsorted over [2^7, 2^14, ...): values < 2^7 -> 1 byte, etc.
    return (np.searchsorted(_VARINT_THRESHOLDS, v, side="right") + 1).astype(
        np.int64)


def varint_encode_array(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized varint encoding.

    Returns ``(stream, nbytes)`` where ``stream`` is a flat uint8 array of the
    concatenated varints and ``nbytes[i]`` is the byte length of value i.
    """
    v = values.astype(np.uint64, copy=False)
    n = len(v)
    if n == 0:
        return np.empty(0, dtype=np.uint8), np.empty(0, dtype=np.int64)
    nb = varint_nbytes(v)
    maxb = int(nb.max())
    # matrix (n, maxb) of septets, little-endian groups
    shifts = (np.arange(maxb, dtype=np.uint64) * np.uint64(7))
    septets = (v[:, None] >> shifts[None, :]) & np.uint64(0x7F)
    septets = septets.astype(np.uint8)
    cols = np.arange(maxb)
    used = cols[None, :] < nb[:, None]
    not_last = cols[None, :] < (nb[:, None] - 1)
    septets[not_last] |= 0x80
    return septets[used], nb


def varint_decode_stream(stream: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized decode of a concatenated varint stream.

    Returns ``(values, starts)``: uint64 values and the byte offset at which
    each begins.  The stream must contain only whole varints.
    """
    data = stream.astype(np.uint8, copy=False)
    if len(data) == 0:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
    is_end = (data & 0x80) == 0
    ends = np.flatnonzero(is_end)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    # position of each byte within its varint
    idx = np.arange(len(data), dtype=np.int64)
    group = np.searchsorted(ends, idx, side="left")
    offset = idx - starts[group]
    contrib = (data.astype(np.uint64) & np.uint64(0x7F)) << (
        offset.astype(np.uint64) * np.uint64(7))
    values = np.zeros(len(ends), dtype=np.uint64)
    np.add.at(values, group, contrib)
    return values, starts.astype(np.int64)


def zigzag_np(n: np.ndarray) -> np.ndarray:
    """Vectorized zigzag encode of int64 -> uint64."""
    n = n.astype(np.int64, copy=False)
    return ((n << 1) ^ (n >> 63)).astype(np.uint64)


def unzigzag_np(u: np.ndarray) -> np.ndarray:
    """Vectorized zigzag decode of uint64 -> int64."""
    u = u.astype(np.uint64, copy=False)
    return ((u >> np.uint64(1)).astype(np.int64)
            ^ -(u & np.uint64(1)).astype(np.int64))
