"""sources/warc.py — real CommonCrawl-convention WARC(.gz) round-trip."""
import gzip

import numpy as np
import pandas as pd
import pytest
import ray.data

from geospatial_learn_ray.sources import warc


def _pages(n=20):
    return pd.DataFrame({
        "url": [f"https://h{i % 3}.example/p/{i}" for i in range(n)],
        "warc_ts": pd.to_datetime(np.arange(n) * 37, unit="s")
        .to_numpy().astype("datetime64[us]"),
        "html": [f"<html>doc {i} body</html>".encode() for i in range(n)]})


def test_record_roundtrip_single():
    rec = warc.record_bytes("https://a.example/x", 1234567000000, b"hello")
    (url, ts, body), = warc.parse_warc_stream(rec)
    assert url == "https://a.example/x"
    assert ts == 1234567000000
    assert body == b"hello"


def test_member_per_record_concatenation_parses():
    blob = (warc.record_bytes("u1", 0, b"a" * 100)
            + warc.record_bytes("u2", 37_000_000, b"bb"))
    recs = warc.parse_warc_stream(blob)
    assert [r[0] for r in recs] == ["u1", "u2"]
    assert recs[0][2] == b"a" * 100 and recs[1][2] == b"bb"
    # each record is its own gzip member: decompressing only the first
    # member's bytes still yields record 1 (the cdx seek model)
    first = warc.record_bytes("u1", 0, b"a" * 100)
    assert warc.parse_warc_stream(first)[0][2] == b"a" * 100


def test_shard_roundtrip_distributed(tmp_path):
    df = _pages(30)
    out = str(tmp_path / "warc")
    man = warc.write_warc_shards(
        ray.data.from_pandas(df).repartition(4), out).to_pandas()
    assert man["n_records"].sum() == 30
    back = warc.read_warc_shards(out).to_pandas()
    assert len(back) == 30
    merged = back.sort_values("url").reset_index(drop=True)
    exp = df.sort_values("url").reset_index(drop=True)
    assert (merged["url"] == exp["url"]).all()
    assert (merged["warc_ts"].to_numpy("datetime64[us]")
            == exp["warc_ts"].to_numpy("datetime64[us]")).all()
    assert all(a == b for a, b in zip(merged["payload"], exp["html"]))


def test_truncated_record_fails_loud():
    rec = warc.record_bytes("u", 0, b"payload")
    raw = gzip.decompress(rec)[:-6]  # drop the trailer
    with pytest.raises(ValueError):
        warc.parse_warc_stream(gzip.compress(raw))
