import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from geospatial_learn_ray.functions.hashing import fnv1a64, hash_family, rolling_hashes, splitmix64


def ref_fnv1a64(data: bytes) -> int:
    h = 0xCBF29CE484222325
    for c in data:
        h = ((h ^ c) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def test_fnv_matches_scalar_reference():
    strs = ["", "a", "hello world", "https://site-1.example/src0/1", "x" * 300]
    got = fnv1a64(pa.array(strs))
    assert got.tolist() == [ref_fnv1a64(s.encode()) for s in strs]


def test_fnv_salt_appends():
    got = fnv1a64(pa.array(["u1", "u2"]), salt=b"#lat")
    assert got.tolist() == [ref_fnv1a64(b"u1#lat"), ref_fnv1a64(b"u2#lat")]


@settings(max_examples=50, deadline=None)
@given(st.lists(st.text(max_size=64), min_size=1, max_size=20))
def test_fnv_property_matches_reference(strs):
    got = fnv1a64(pa.array(strs, pa.string()))
    assert got.tolist() == [ref_fnv1a64(s.encode("utf-8")) for s in strs]


def test_fnv_binary_input():
    got = fnv1a64(pa.array([b"\x00\x01", b""], pa.binary()))
    assert got.tolist() == [ref_fnv1a64(b"\x00\x01"), ref_fnv1a64(b"")]


def test_splitmix_disperses():
    x = np.arange(10000, dtype=np.uint64)
    y = splitmix64(x)
    assert len(np.unique(y)) == 10000
    bits = np.unpackbits(y.view(np.uint8)).mean()
    assert 0.45 < bits < 0.55


def test_hash_family_independent_columns():
    base = splitmix64(np.arange(100, dtype=np.uint64))
    fam = hash_family(base, 8)
    assert fam.shape == (100, 8)
    assert len({tuple(fam[:, j]) for j in range(8)}) == 8


def test_rolling_hashes_window_identity():
    H, valid = rolling_hashes(pa.array(["abcdef", "xxabcdzz"]), window=4)
    # shared 4-gram "abcd" hashes equal across rows
    assert H[0, 0] == H[1, 2]
    assert valid[0].sum() == 3 and valid[1].sum() == 5


def test_rolling_hashes_short_rows():
    H, valid = rolling_hashes(pa.array(["ab", ""]), window=4)
    assert valid.sum() == 0
