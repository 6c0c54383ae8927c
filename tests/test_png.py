"""functions/pngcodec.py — the real PNG codec (stdlib zlib)."""
import struct
import zlib

import numpy as np
import pytest

from geospatial_learn_ray.functions import pngcodec


@pytest.mark.parametrize("shape,dtype", [
    ((13, 7), np.uint8), ((8, 9, 3), np.uint8), ((5, 6, 4), np.uint8),
    ((7, 5, 2), np.uint8), ((6, 4), np.uint16), ((4, 3, 3), np.uint16)])
def test_roundtrip_bit_exact(shape, dtype):
    rng = np.random.default_rng(5)
    a = rng.integers(0, np.iinfo(dtype).max, size=shape, endpoint=True).astype(dtype)
    b = pngcodec.decode_png(pngcodec.encode_png(a))
    assert b.dtype == dtype and b.shape == shape
    assert np.array_equal(a, b)


def _ref_filter(img: np.ndarray, f: int, bpp: int) -> bytes:
    """Apply PNG filter f to every scanline (reference forward filter)."""
    h, stride = img.shape
    out = bytearray()
    for y in range(h):
        out.append(f)
        for i in range(stride):
            x = int(img[y, i])
            left = int(img[y, i - bpp]) if i >= bpp else 0
            up = int(img[y - 1, i]) if y else 0
            ul = int(img[y - 1, i - bpp]) if (y and i >= bpp) else 0
            if f == 0:
                v = x
            elif f == 1:
                v = x - left
            elif f == 2:
                v = x - up
            elif f == 3:
                v = x - ((left + up) >> 1)
            else:
                v = x - pngcodec._paeth(left, up, ul)
            out.append(v % 256)
    return bytes(out)


@pytest.mark.parametrize("f", [0, 1, 2, 3, 4])
def test_decode_every_filter_type(f):
    # hand-build a file whose scanlines use filter f; decode must recover
    rng = np.random.default_rng(f + 11)
    h, w, ch = 6, 5, 3
    img = rng.integers(0, 255, size=(h, w * ch), endpoint=True).astype(np.uint8)
    scan = _ref_filter(img, f, ch)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (pngcodec._SIG + pngcodec._chunk(b"IHDR", ihdr)
            + pngcodec._chunk(b"IDAT", zlib.compress(scan))
            + pngcodec._chunk(b"IEND", b""))
    out = pngcodec.decode_png(data)
    assert np.array_equal(out, img.reshape(h, w, ch))


def test_corrupt_crc_fails_loud():
    a = np.zeros((4, 4), np.uint8)
    data = bytearray(pngcodec.encode_png(a))
    data[40] ^= 0xFF  # flip a byte inside a chunk body
    with pytest.raises(ValueError):
        pngcodec.decode_png(bytes(data))
