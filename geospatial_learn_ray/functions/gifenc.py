"""Minimal GIF89a writer (and reader, for round-trip tests) — pure python.

The reference's ``multiband2gif`` (raster.py:2665) renders the bands of a
multiband raster as an animated GIF via imageio. No codec wheel exists in
this sandbox, so the container + LZW are implemented from the GIF89a
specification directly: logical screen descriptor, 256-entry grayscale
global color table, NETSCAPE2.0 loop extension, per-frame graphic control
extension + image descriptor + LZW-compressed index stream in ≤255-byte
sub-blocks. Encoder and decoder use the symmetric spec code-width rule
(width bumps when the next free code reaches 2^width, 12-bit cap, CLEAR
emitted on table overflow), so the round-trip test is evidence of spec
conformance, not just self-consistency.
"""

from __future__ import annotations

import struct

import numpy as np

_MIN_CODE_SIZE = 8
_CLEAR = 1 << _MIN_CODE_SIZE
_END = _CLEAR + 1
_MAX_WIDTH = 12


class _BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.bytes.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def finish(self) -> bytes:
        if self.nbits:
            self.bytes.append(self.acc & 0xFF)
        return bytes(self.bytes)


def lzw_encode(indices: bytes) -> bytes:
    """GIF-flavoured LZW of an 8-bit index stream (min code size 8)."""
    bw = _BitWriter()
    width = _MIN_CODE_SIZE + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(_CLEAR)}
    next_code = _END + 1
    bw.write(_CLEAR, width)
    w = b""
    for ch in indices:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        bw.write(table[w], width)
        table[wc] = next_code
        next_code += 1
        if next_code == (1 << width) and width < _MAX_WIDTH:
            width += 1
        if next_code == (1 << _MAX_WIDTH):
            bw.write(_CLEAR, width)
            table = {bytes([i]): i for i in range(_CLEAR)}
            next_code = _END + 1
            width = _MIN_CODE_SIZE + 1
        w = wc[-1:]
    if w:
        bw.write(table[w], width)
    bw.write(_END, width)
    return bw.finish()


def lzw_decode(data: bytes) -> bytes:
    """Inverse of lzw_encode, following the GIF89a decoder rules."""
    width = _MIN_CODE_SIZE + 1
    table: list[bytes] = [bytes([i]) for i in range(_CLEAR)] + [b"", b""]
    out = bytearray()
    acc = nbits = pos = 0
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= len(data):
                return bytes(out)
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == _CLEAR:
            table = [bytes([i]) for i in range(_CLEAR)] + [b"", b""]
            width = _MIN_CODE_SIZE + 1
            prev = None
            continue
        if code == _END:
            return bytes(out)
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt LZW stream")
        out.extend(entry)
        if prev is not None:
            table.append(prev + entry[:1])
        # the decoder's table is one entry behind the encoder's, so the
        # width bump fires at 2^w − 1 (where the encoder bumped at 2^w)
        if len(table) == (1 << width) - 1 and width < _MAX_WIDTH:
            width += 1
        prev = entry


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out.extend(chunk)
    out.append(0)
    return bytes(out)


def encode_gif(frames: list[np.ndarray], delay_cs: int = 20) -> bytes:
    """uint8 grayscale frames [h, w] → animated GIF89a bytes."""
    h, w = frames[0].shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # GCT: 256 entries
    for i in range(256):
        out += bytes([i, i, i])
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"  # loop forever
    for fr in frames:
        assert fr.shape == (h, w) and fr.dtype == np.uint8
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        out += bytes([_MIN_CODE_SIZE])
        out += _sub_blocks(lzw_encode(fr.tobytes()))
    out += b"\x3b"
    return bytes(out)


def decode_gif_frames(data: bytes) -> list[np.ndarray]:
    """Parse the encoder's own GIF structure back to grayscale frames
    (assumes the fixed layout encode_gif writes)."""
    if data[:6] != b"GIF89a":
        raise ValueError("not GIF89a")
    w, h = struct.unpack_from("<HH", data, 6)
    pos = 13 + 256 * 3 + 19  # header + GCT + netscape ext
    frames = []
    while data[pos] != 0x3B:
        if data[pos] == 0x21:  # graphic control ext
            pos += 8
        assert data[pos] == 0x2C
        pos += 10  # image descriptor, no local table
        assert data[pos] == _MIN_CODE_SIZE
        pos += 1
        stream = bytearray()
        while True:
            n = data[pos]
            pos += 1
            if n == 0:
                break
            stream += data[pos : pos + n]
            pos += n
        frames.append(np.frombuffer(lzw_decode(bytes(stream)), np.uint8)[: h * w].reshape(h, w))
    return frames
