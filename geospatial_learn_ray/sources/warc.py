"""WARC web-archive source/sink — the CommonCrawl interchange format.

Web-scale text pipelines start from WARC: gzip streams where EACH
record is its own gzip member (so byte-range indexes can seek straight
to a record — the cdx index model), each record a WARC/1.0 header block
+ Content-Length-framed payload. stdlib ``gzip``/``zlib`` cover the
codec completely, so unlike the image/AV seams this source is REAL:
files written here are readable by standard WARC tooling and vice
versa (for the subset: WARC-Type response, no HTTP-header block).

Scale shape: egress writes one ``.warc.gz`` shard per input block
(resumable, partitioned — the crawl-dump layout); ingest is one task
per shard streaming records out of the member-concatenated gzip. No
whole-corpus materialization anywhere.
"""
from __future__ import annotations

import gzip
import io
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

_EPOCH = np.datetime64("1970-01-01T00:00:00", "s")


def _warc_date(ts_us: int) -> str:
    s = np.datetime64(int(ts_us), "us").astype("datetime64[s]")
    return str(s) + "Z"


def record_bytes(url: str, ts_us: int, payload: bytes) -> bytes:
    """One WARC/1.0 response record, individually gzip-compressed (the
    CommonCrawl member-per-record convention)."""
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {_warc_date(ts_us)}\r\n"
        f"Content-Length: {len(payload)}\r\n"
        "\r\n").encode("ascii")
    return gzip.compress(head + payload + b"\r\n\r\n", compresslevel=6)


def parse_warc_stream(blob: bytes) -> list[tuple[str, int, bytes]]:
    """Concatenated-member .warc.gz bytes → [(url, ts_us, payload)]."""
    raw = gzip.GzipFile(fileobj=io.BytesIO(blob)).read()
    out = []
    pos = 0
    n = len(raw)
    while pos < n:
        end = raw.index(b"\r\n\r\n", pos)
        headers = raw[pos:end].decode("ascii").split("\r\n")
        if headers[0] != "WARC/1.0":
            raise ValueError(f"bad WARC version line: {headers[0]!r}")
        h = dict(line.split(": ", 1) for line in headers[1:] if line)
        length = int(h["Content-Length"])
        body = raw[end + 4:end + 4 + length]
        if raw[end + 4 + length:end + 8 + length] != b"\r\n\r\n":
            raise ValueError("missing record trailer")
        ts = (np.datetime64(h["WARC-Date"].rstrip("Z"), "us")
              .astype(np.int64))
        out.append((h["WARC-Target-URI"], int(ts), body))
        pos = end + 8 + length
    return out


def write_warc_shards(pages: ray.data.Dataset, out_dir: str,
                      url_col: str = "url", ts_col: str = "warc_ts",
                      payload_col: str = "html") -> ray.data.Dataset:
    """Egress: one ``shard-<k>.warc.gz`` per input block (deterministic
    shard id = fnv of the block's first url, so reruns overwrite rather
    than duplicate). Returns a manifest Dataset (shard, n_records,
    nbytes)."""
    from ..functions.hashing import fnv1a64

    os.makedirs(out_dir, exist_ok=True)

    def write_block(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({"shard": pd.Series([], dtype=object),
                                 "n_records": pd.Series([], dtype=np.int64),
                                 "nbytes": pd.Series([], dtype=np.int64)})
        urls = b[url_col].to_numpy(object)
        tss = b[ts_col].to_numpy("datetime64[us]").astype(np.int64)
        payloads = b[payload_col].to_numpy(object)
        shard = int(fnv1a64(urls[:1])[0])  # 64-bit: no shard-name collisions
        path = os.path.join(out_dir, f"shard-{shard:016x}.warc.gz")
        buf = b"".join(record_bytes(u, int(t), p)
                       for u, t, p in zip(urls, tss, payloads))
        tmp = path + ".part"
        with open(tmp, "wb") as f:
            f.write(buf)
        os.replace(tmp, path)
        return pd.DataFrame({"shard": [f"shard-{shard:016x}.warc.gz"],
                             "n_records": [np.int64(len(b))],
                             "nbytes": [np.int64(len(buf))]})

    return pages.map_batches(write_block, batch_format="pandas",
                             batch_size=None)


def read_warc_shards(in_dir: str) -> ray.data.Dataset:
    """Ingest: one task per shard file → (url, warc_ts, payload)."""
    names = sorted(n for n in os.listdir(in_dir) if n.endswith(".warc.gz"))

    def read_one(b: pd.DataFrame) -> pa.Table:
        urls: list[str] = []
        tss: list[int] = []
        payloads: list[bytes] = []
        for name in b["name"]:
            with open(os.path.join(in_dir, name), "rb") as f:
                for url, ts, body in parse_warc_stream(f.read()):
                    urls.append(url)
                    tss.append(ts)
                    payloads.append(body)
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(np.asarray(tss, np.int64),
                                pa.timestamp("us")),
            "payload": pa.array(payloads, pa.binary()),
        })

    return ray.data.from_items([{"name": n} for n in names]).map_batches(
        read_one, batch_format="pandas")
