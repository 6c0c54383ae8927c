"""The pages table — Common-Crawl-style web pages (BASELINE.json input_hint):

    (url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string)

Derived deterministically from ``documents.parquet`` (FIXTURES.md §1) in a
vectorized ``map_batches`` so the same rows appear at any scale factor, on
any worker, on any retry:

    url     = f"https://site-{doc_id % 1000}.example/{source}/{doc_id}"
    warc_ts = 2024-01-01T00:00:00 + doc_id * 37 seconds
    html    = b"<html><head><title>d{doc_id}</title></head>"
              b"<body><p>{text}</p></body></html>"
    text    = documents.text (the byte-identity golden for extraction)
    lang    = documents.lang

Duplicate fixture (for keep-latest dedup): every url with doc_id % 50 == 0
appears twice, the duplicate with warc_ts + 1 hour (keep-latest must win).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..functions import _bs

EPOCH = pd.Timestamp("2024-01-01T00:00:00")


PAGE_COLS = ("url", "warc_ts", "html", "text", "lang")
# which base-table columns each generated page column derives from — the
# projection pushed into the parquet read (VERDICT r4 nit #1: the read
# should never load base columns the caller's projection can't reach;
# doc_id always rides along for the dup-replica rule)
_BASE_NEEDS = {"url": ("doc_id", "source"), "warc_ts": ("doc_id",),
               "html": ("doc_id", "text"), "text": ("text",),
               "lang": ("lang",)}


def _base_columns(out_cols) -> list[str]:
    need = {"doc_id"}
    for c in out_cols:
        need.update(_BASE_NEEDS[c])
    return [c for c in ("doc_id", "text", "lang", "source") if c in need]


def _docs_to_pages(batch: pa.Table, with_dups: bool, repeat: int = 1,
                   rep_offset: int = 0, out_cols=PAGE_COLS) -> pa.Table:
    if repeat > 1:
        # bench-scale expansion: R deterministic replicas per document with
        # distinct urls (suffix ``?r=k``) — text/lang identical, ts offset by
        # k ms. Correctness queries always use repeat=1.
        batch = pa.concat_tables([batch] * repeat)
        rep = np.repeat(np.arange(rep_offset, rep_offset + repeat), len(batch) // repeat)
    doc_id = batch["doc_id"].to_numpy()
    ts = EPOCH.value // 1000 + doc_id * 37_000_000  # microseconds
    cols: dict = {}
    if "url" in out_cols:
        source = batch["source"].to_pandas()
        url = ("https://site-" + pd.Series(doc_id % 1000).astype(str) + ".example/" + source.reset_index(drop=True) + "/" + pd.Series(doc_id).astype(str))
        if repeat > 1:
            url = url + "?r=" + pd.Series(rep).astype(str)
        cols["url"] = pa.array(url, pa.string())
    if repeat > 1:
        ts = ts + rep * 1000
    if "warc_ts" in out_cols:
        cols["warc_ts"] = pa.array(ts, pa.timestamp("us"))
    if "html" in out_cols:
        text = batch["text"].to_pandas()
        html = ("<html><head><title>d" + pd.Series(doc_id).astype(str) + "</title></head><body><p>" + text.reset_index(drop=True) + "</p></body></html>")
        cols["html"] = pa.array(html.str.encode("utf-8"), pa.binary())
    if "text" in out_cols:
        cols["text"] = batch["text"]
    if "lang" in out_cols:
        cols["lang"] = batch["lang"]
    out = pa.table({c: cols[c] for c in PAGE_COLS if c in cols})
    if with_dups:
        dup_mask = doc_id % 50 == 0
        if dup_mask.any():
            dup = out.filter(pa.array(dup_mask))
            if "warc_ts" in out_cols:
                bumped = pa.array(ts[dup_mask] + 3_600_000_000, pa.timestamp("us"))
                dup = dup.set_column(out.column_names.index("warc_ts"),
                                     "warc_ts", bumped)
            out = pa.concat_tables([out, dup])
    return out


def read_pages(sf_dir: str, with_dups: bool = False, columns: list[str] | None = None,
               repeat: int = 1) -> ray.data.Dataset:
    """documents.parquet → streaming pages Dataset. ``columns`` prunes the
    output projection AND pushes the implied base-column set into the
    parquet read itself (a urls-only caller reads doc_id+source, never
    text or the unused n_chars column). ``repeat`` is the bench-scale
    replica factor (distinct urls per replica; default 1 for correctness
    runs)."""
    out_cols = tuple(columns) if columns else PAGE_COLS
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=_base_columns(out_cols))
    if repeat > 1:
        # spread the (expanded) generation work across ~2 blocks per core so
        # no stage is parallelism-capped by the tiny base table's block count
        import os

        import ray as _ray

        blocks = os.environ.get("GRAFT_GEN_BLOCKS")
        if blocks:
            n_blocks = int(blocks)
        else:
            # ~1 block per core: enough parallelism without the B² shuffle
            # fragments of the downstream sort (measured: 64+ blocks is 3-5x
            # slower than 32 on this pipeline at 32 cpus)
            cpus = int(_ray.cluster_resources().get("CPU", 8)) if _ray.is_initialized() else 8
            n_blocks = max(16, cpus)
        ds = ds.repartition(n_blocks)
    if repeat > 1:
        # generator UDF: emit the R replicas in chunks of ≤64 so one input
        # block never materializes a replica×rows monolith in the UDF
        chunk = min(repeat, 64)

        def expand(b: pa.Table):
            off = 0
            while off < repeat:
                step = min(chunk, repeat - off)
                yield _docs_to_pages(b, with_dups, step, rep_offset=off,
                                     out_cols=out_cols)
                off += step

        ds = ds.map_batches(expand, batch_format="pyarrow", batch_size=_bs())
    else:
        ds = ds.map_batches(
            lambda b: _docs_to_pages(b, with_dups, repeat, out_cols=out_cols),
            batch_format="pyarrow", batch_size=_bs())
    if columns:
        ds = ds.select_columns(columns)
    return ds


def pages_sql(with_dups: bool = False, cols: str = "url, warc_ts, text, lang") -> str:
    """DuckDB CTE producing the identical pages table from the ``documents``
    view (used by oracle_sql entries so pages-based queries get STRONG
    value-hash checks). ``html`` is intentionally not restated in SQL."""
    base = (
        "SELECT 'https://site-' || (doc_id % 1000) || '.example/' || source || '/' || doc_id AS url, "
        "TIMESTAMP '2024-01-01 00:00:00' + to_microseconds(doc_id * 37000000) AS warc_ts, "
        "text, lang FROM documents"
    )
    if with_dups:
        dup = (
            "SELECT 'https://site-' || (doc_id % 1000) || '.example/' || source || '/' || doc_id AS url, "
            "TIMESTAMP '2024-01-01 00:00:00' + to_microseconds(doc_id * 37000000 + 3600000000) AS warc_ts, "
            "text, lang FROM documents WHERE doc_id % 50 = 0"
        )
        return f"pages AS ({base} UNION ALL {dup})"
    return f"pages AS ({base})"

def read_messy_urls(sf_dir: str) -> ray.data.Dataset:
    """Canonicalization fixture: the pages URL decorated with one of 8
    deterministic normalization hazards by doc_id % 8 (uppercase
    scheme/host, default port, trailing slash, fragment, tracking params,
    index.html, a combo). The canonical form of every variant is the base
    URL except v5, which keeps its non-tracking param. The synthetic URLs
    are otherwise clean, so — like embeddings.with_planted_dups — an
    honest canonicalizer over the raw table would be a no-op."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "source"])

    def mess(b: pa.Table) -> pa.Table:
        doc_id = b["doc_id"].to_numpy()
        source = b["source"].to_pandas().reset_index(drop=True)
        k = pd.Series(doc_id % 1000).astype(str)
        i = pd.Series(doc_id).astype(str)
        base = "https://site-" + k + ".example/" + source + "/" + i
        upper = "HTTPS://SITE-" + k + ".EXAMPLE/" + source + "/" + i
        port = "https://site-" + k + ".example:443/" + source + "/" + i
        combo = ("HTTPS://site-" + k + ".EXAMPLE:443/" + source + "/" + i
                 + "/?utm_campaign=x#frag")
        v = doc_id % 8
        url = np.select(
            [v == 1, v == 2, v == 3, v == 4, v == 5, v == 6, v == 7],
            [upper, port, base + "/", base + "#sec",
             base + "?utm_source=feed&ref=1", base + "/index.html", combo],
            default=base)
        return pa.table({"doc_id": b["doc_id"],
                         "url": pa.array(url, pa.string())})

    return ds.map_batches(mess, batch_format="pyarrow")

def read_pii_docs(sf_dir: str) -> ray.data.Dataset:
    """PII-redaction fixture: documents.text decorated with deterministic
    PII snippets by doc_id % 5 (1=email, 2=phone, 3=IPv4, 4=all three,
    0=clean). Mirrors read_messy_urls: the synthetic corpus contains no
    PII, so an honest redactor over the raw table would be a no-op; the
    decoration makes the operator observable and SQL-twinnable (the oracle
    rebuilds the identical decoration with string concatenation)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def mess(b: pa.Table) -> pa.Table:
        doc_id = b["doc_id"].to_numpy()
        text = b["text"].to_pandas().reset_index(drop=True)
        i = pd.Series(doc_id).astype(str)
        email = (text + " contact user" + i + "@mail"
                 + pd.Series(doc_id % 50).astype(str) + ".example now")
        phone = (text + " call +1-555-"
                 + pd.Series(doc_id % 10000).astype(str).str.zfill(4)
                 + " today")
        ip = (text + " from 10." + pd.Series(doc_id % 256).astype(str)
              + "." + pd.Series((doc_id // 7) % 256).astype(str)
              + "." + pd.Series((doc_id // 11) % 256).astype(str) + " logged")
        combo = (text + " mail u" + i + "@h"
                 + pd.Series(doc_id % 9).astype(str) + ".example or +1-555-"
                 + pd.Series(doc_id % 10000).astype(str).str.zfill(4)
                 + " ip 192.168." + pd.Series(doc_id % 256).astype(str)
                 + "." + pd.Series((doc_id // 3) % 256).astype(str))
        v = doc_id % 5
        out = np.select([v == 1, v == 2, v == 3, v == 4],
                        [email, phone, ip, combo], default=text)
        return pa.table({"doc_id": b["doc_id"],
                         "text": pa.array(out, pa.string())})

    return ds.map_batches(mess, batch_format="pyarrow")


def jsonl_roundtrip(sf_dir: str, scratch: str | None = None) -> ray.data.Dataset:
    """documents → JSONL sink → JSONL source (the §2.1 format-conversion
    path, batch_translate's shape for line-delimited JSON): values must
    survive the codec bit-exactly — the strict oracle compares the
    round-tripped table against the base parquet. Ints and strings are
    exact in JSON; floats are omitted from the projection (JSON float
    text round-trips via repr, but dtype fidelity across readers is the
    reader's choice — the CSV twin carries the numeric case)."""
    from ..state.scratch import scratch_dir

    out = scratch_dir("graft_jsonl_", scratch)
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang", "source", "text"])
    ds.write_json(out)
    return ray.data.read_json(out)


def csv_roundtrip(sf_dir: str, scratch: str | None = None) -> ray.data.Dataset:
    """lineitem projection → CSV sink → CSV source: integer and exact
    cent-scaled numeric columns survive text round-trip losslessly (the
    floats are written as exact integers first — CSV float text is the
    classic silent-corruption path this projection sidesteps)."""
    import pyarrow as pa

    from ..state.scratch import scratch_dir

    out = scratch_dir("graft_csv_", scratch)
    from ..functions.rounding import round_half_away

    def prep(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "l_orderkey": b["l_orderkey"],
            "l_linenumber": pc.cast(b["l_linenumber"], pa.int64()),
            "l_returnflag": b["l_returnflag"],
            "qty": pc.cast(b["l_quantity"], pa.int64()),
            "price_cents": pa.array(round_half_away(
                np.asarray(b["l_extendedprice"].to_numpy(zero_copy_only=False))
                * 100.0, 0).astype(np.int64)),
        })

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_returnflag",
                 "l_quantity", "l_extendedprice"])
    ds.map_batches(prep, batch_format="pyarrow").write_csv(out)
    return ray.data.read_csv(out)
