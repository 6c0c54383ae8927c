"""Text stages over the pages/documents tables — actor pools with compiled
state (regexes / marker lists built once per actor, SURVEY.md §2.3), batch
bodies vectorized in functions/textproc.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..functions import _bs, textproc
from ..functions.rounding import round_half_away


class TextExtractor:
    """HTML→text actor (regexes compiled once per actor in textproc module
    import; per-batch loop is per-document regex work — irreducible).
    Output keeps ``url`` + extracted ``text`` (byte-identity contract)."""

    def __init__(self, keep_cols: tuple[str, ...] = ("url",)):
        self.keep_cols = list(keep_cols)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = textproc.extract_text_series(batch["html"])
        out = batch.select(self.keep_cols)
        return out.append_column("text", pa.array(texts, pa.string()))


def extract_stage(ds: ray.data.Dataset, keep_cols=("url",), batch_size: int | None = None) -> ray.data.Dataset:
    """pages(html) → (keep_cols, text). Drops the wide ``html`` binary column
    immediately after extraction so downstream shuffles move narrow rows
    (SURVEY.md §7 'Wide binary rows').

    STATELESS task pool, not an actor pool: the only "state" is
    module-level compiled regexes, which every worker process has after
    import — a task pool elastically uses all cores immediately, while a
    (1, N) actor pool ramps up slowly and serializes the hot stage. Actor
    pools are reserved for genuinely loaded state (model artifacts, polygon
    indexes — see stages/scorer.py, stages/pip_join.py)."""
    cols = list(keep_cols)

    def fn(batch: pa.Table) -> pa.Table:
        texts = textproc.extract_text_series(batch["html"])
        out = batch.select(cols)
        return out.append_column("text", pa.array(texts, pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size or _bs())


def token_count_stage(ds: ray.data.Dataset, id_col: str = "doc_id") -> ray.data.Dataset:
    def fn(b: pd.DataFrame) -> pd.DataFrame:
        out = textproc.token_counts(b["text"])
        out.insert(0, id_col, b[id_col].to_numpy())
        return out

    return ds.map_batches(fn, batch_format="pandas")


def quality_stage(ds: ray.data.Dataset, id_col: str = "doc_id", round_to: int = 4) -> ray.data.Dataset:
    def fn(b: pd.DataFrame) -> pd.DataFrame:
        out = textproc.quality_scores(b["text"])
        for c in ("punct_ratio", "stop_ratio", "mean_tok_len", "quality"):
            out[c] = round_half_away(out[c], round_to)
        out.insert(0, id_col, b[id_col].to_numpy())
        return out

    return ds.map_batches(fn, batch_format="pandas")


def lang_id_stage(ds: ray.data.Dataset, id_col: str = "doc_id") -> ray.data.Dataset:
    def fn(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({id_col: b[id_col].to_numpy(), "lang_pred": textproc.lang_id(b["text"]).to_numpy()})

    return ds.map_batches(fn, batch_format="pandas")


def fingerprint_stage(ds: ray.data.Dataset, id_col: str = "doc_id") -> ray.data.Dataset:
    """Winnowing rolling-hash fingerprints (doc_fingerprint operator)."""

    def fn(b: pa.Table) -> pa.Table:
        fp, cnt = textproc.winnow_fingerprints(b["text"])
        return pa.table({id_col: b[id_col], "fingerprint": pa.array(fp), "n_fingerprints": pa.array(cnt)})

    return ds.map_batches(fn, batch_format="pyarrow")

def repetition_stage(ds: ray.data.Dataset, id_col: str = "doc_id") -> ray.data.Dataset:
    """Gopher repetition quality filters (Rae et al. 2021 §A1.1) per doc —
    see functions/textproc.repetition_scores."""
    def fn(b: pd.DataFrame) -> pd.DataFrame:
        out = textproc.repetition_scores(b["text"])
        out.insert(0, id_col, b[id_col].to_numpy())
        return out

    return ds.map_batches(fn, batch_format="pandas")

def decontaminate_stage(ds: ray.data.Dataset, id_col: str = "doc_id",
                        eval_mod: int = 100, n: int = 8) -> ray.data.Dataset:
    """Benchmark decontamination (the GPT-3 appx-C / Gopher n-gram overlap
    check): flag training documents sharing any word ``n``-gram with the
    held-out eval split (here the deterministic ``doc_id % eval_mod == 0``
    slice — id-hash style, reproducible at any cluster size).

    The eval side is SMALL by construction, so its distinct-gram set is
    collected once and broadcast via ``ray.put`` (the map-side broadcast
    join pattern — no shuffle); training batches probe it with a
    vectorized ``Series.isin``. Output per training doc: distinct n-gram
    count, overlapping-gram count, contaminated flag (ints)."""
    import ray as _ray

    eval_ds = ds.filter(lambda r: r[id_col] % eval_mod == 0)

    def eval_grams(b: pd.DataFrame) -> pd.DataFrame:
        f = textproc.word_ngrams_frame(b["text"].reset_index(drop=True), n)
        return pd.DataFrame({"gram": f["gram"].drop_duplicates()})

    ev = set()
    for batch in eval_ds.map_batches(eval_grams, batch_format="pandas").iter_batches(batch_format="pandas"):
        ev.update(batch["gram"])
    ref = _ray.put(frozenset(ev))

    class Probe:
        def __init__(self, r):
            self.ev = _ray.get(r) if isinstance(r, _ray.ObjectRef) else r

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            train = b[b[id_col] % eval_mod != 0].reset_index(drop=True)
            f = textproc.word_ngrams_frame(train["text"], n).drop_duplicates()
            hit = f["gram"].isin(self.ev)
            ng = f.groupby("row").size()
            nc = f[hit].groupby("row").size()
            idx = np.arange(len(train))
            ngv = ng.reindex(idx).fillna(0).astype(np.int64)
            ncv = nc.reindex(idx).fillna(0).astype(np.int64)
            return pd.DataFrame({
                id_col: train[id_col].to_numpy(),
                "n_grams": ngv.to_numpy(),
                "n_contaminated": ncv.to_numpy(),
                "contaminated": (ncv > 0).astype(np.int64).to_numpy(),
            })

    return ds.map_batches(Probe, fn_constructor_args=(ref,), batch_format="pandas", concurrency=(1, 8))

def stratified_sample_stage(ds: ray.data.Dataset, rates: dict[str, float],
                            stratum_col: str = "lang", id_col: str = "doc_id",
                            default_rate: float = 1.0, denom: int = 1_000_000) -> ray.data.Dataset:
    """Deterministic stratified sampling (training-data mixing weights):
    keep a row iff splitmix64(id) % denom < rate[stratum]·denom — the
    id-hash draw is reproducible at any cluster size / block structure
    (unlike seeded RNG, CLAUDE.md) and restates exactly in SQL. Integer
    thresholds are fixed once per stratum, so there are no float-compare
    edges."""
    from ..functions.hashing import splitmix64

    thr = {k: int(round(r * denom)) for k, r in rates.items()}
    dthr = int(round(default_rate * denom))

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        draw = splitmix64(b[id_col].to_numpy().astype(np.uint64)) % np.uint64(denom)
        cut = b[stratum_col].map(thr).fillna(dthr).astype(np.int64).to_numpy()
        return b[draw.astype(np.int64) < cut]

    return ds.map_batches(fn, batch_format="pandas")


def tfidf_top_terms(docs: ray.data.Dataset, id_col: str = "doc_id",
                    text_col: str = "text", k: int = 5,
                    num_buckets: int = 64) -> ray.data.Dataset:
    """Per-document top-k TF-IDF terms — the classic doc-term weighting
    (Spärck Jones 1972) as a fully distributed plan (LLM-pipeline
    extension; the reference's nearest analogue is the per-class feature
    ranking in learning.py:1073).

    Scale shape: the vocabulary is UNBOUNDED at corpus scale, so document
    frequency is NOT a broadcast dict — each block explodes to distinct
    (doc, token, tf) rows (Arrow split + one vectorized groupby), ONE
    bucketed exchange on the token hash co-locates every row of a token,
    and the combiner attaches df with a groupby-transform (df = row count:
    a (doc, token) pair is emitted exactly once since a document never
    spans blocks). The per-doc top-k then rides ``grouped_topk``'s
    partial-per-block selection, so no exchange ever moves more than
    O(distinct doc-term pairs) and the driver sees nothing.

    Oracle parity: tfidf = tf · ln(N/df) over exact integer tf/df/N, the
    product snapped to float32 (CLAUDE.md round-3 transcendental recipe —
    a 1-ulp f64 ln disagreement dies at the f32 boundary, and ordering
    uses the snapped value + token tiebreak on BOTH sides)."""
    import pyarrow.compute as pc

    from ..functions.hashing import fnv1a64, splitmix64
    from .agg import grouped_topk
    from .exchange import bucket_exchange

    n_docs = float(docs.count())

    def explode_tf(b: pa.Table) -> pd.DataFrame:
        t = b[text_col]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        wl = pc.split_pattern(t, " ")
        off = np.asarray(wl.offsets, np.int64)
        d = pd.DataFrame({
            id_col: np.repeat(b[id_col].to_numpy(), off[1:] - off[:-1]),
            "tok": wl.values.to_pandas().to_numpy(object),
        })
        d = d[d["tok"].str.len() > 0]
        g = d.groupby([id_col, "tok"], sort=False).size().reset_index(name="tf")
        g["tf"] = g["tf"].astype(np.int64)
        old = np.seterr(over="ignore")
        try:
            g["_part"] = (splitmix64(fnv1a64(g["tok"].to_numpy(object)))
                          % np.uint64(num_buckets)).astype(np.int32)
        finally:
            np.seterr(**old)
        return g

    def attach_df(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_part"]).copy()
        g["df"] = g.groupby("tok", sort=False)["tf"].transform("size").astype(np.int64)
        return g

    with_df = bucket_exchange(
        docs.select_columns([id_col, text_col]).map_batches(
            explode_tf, batch_format="pyarrow"),
        attach_df)

    def score(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        tf = b["tf"].to_numpy(np.float64)
        df_ = b["df"].to_numpy(np.float64)
        b["tfidf"] = (tf * np.log(n_docs / df_)).astype(np.float32).astype(np.float64)
        return b

    return grouped_topk(with_df.map_batches(score, batch_format="pandas"),
                        id_col, "tfidf", k, tiebreak="tok")


def lm_perplexity_scores(docs: ray.data.Dataset, id_col: str = "doc_id",
                         text_col: str = "text", scale: int = 1024,
                         num_buckets: int = 64) -> ray.data.Dataset:
    """Bigram-LM quality scoring (the CCNet/KenLM perplexity-filter shape,
    Wenzek et al. 2020): train bigram counts over the corpus itself and
    score every document by its average negative log-likelihood
    avg_nll = −(1/n)·Σ ln C(w1,w2)/C(w1·) — low = fluent/typical, high =
    noise. LLM-pipeline extension; no reference analogue.

    Scale shape: the model is NEVER a broadcast dict (corpus-scale bigram
    vocabularies are unbounded). Per batch, bigrams pre-aggregate to
    distinct (doc, w1, bigram, cnt) rows; exchange 1 co-locates by hash(w1)
    and attaches the context count C(w1·) with one groupby-transform SUM;
    exchange 2 co-locates by hash(bigram) and attaches C(w1,w2) the same
    way (counts are exact: a document never spans blocks, and cnt rides
    the rows). The per-doc reduction then moves two ints per (doc, block).

    Oracle parity: per-bigram nll is quantized to integer
    q = floor((ln C1 − ln C12)·scale + 0.5) (CLAUDE.md: never SUM
    full-mantissa irrationals — integer sums are order-exact at any
    scale); sum_q and n_bigrams are exact ints, avg_nll is ONE identical
    f64 division + round both sides. Documents with < 2 tokens have no
    bigrams and drop out (filter semantics)."""
    import pyarrow.compute as pc

    from ..functions.hashing import fnv1a64, splitmix64
    from ..functions.rounding import round_half_away
    from .agg import _add_part
    from .exchange import bucket_exchange

    def _bucket(vals: np.ndarray) -> np.ndarray:
        old = np.seterr(over="ignore")
        try:
            return (splitmix64(fnv1a64(vals)) % np.uint64(num_buckets)).astype(np.int32)
        finally:
            np.seterr(**old)

    def explode(b: pa.Table) -> pd.DataFrame:
        t = b[text_col]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        wl = pc.split_pattern(t, " ")
        off = np.asarray(wl.offsets, np.int64)
        lens = off[1:] - off[:-1]
        row_ids = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        if len(row_ids) < 2:
            return pd.DataFrame({id_col: pd.Series([], dtype=np.int64),
                                 "w1": pd.Series([], dtype=object),
                                 "bg": pd.Series([], dtype=object),
                                 "cnt": pd.Series([], dtype=np.int64),
                                 "_part": pd.Series([], dtype=np.int32)})
        keep = row_ids[:-1] == row_ids[1:]
        ka = pa.array(keep)
        vals = wl.values
        w1 = vals.slice(0, len(vals) - 1).filter(ka)
        w2 = vals.slice(1).filter(ka)
        bg = pc.binary_join_element_wise(w1, w2, " ")
        d = pd.DataFrame({
            id_col: b[id_col].to_numpy()[row_ids[:-1][keep]],
            "w1": w1.to_pandas().to_numpy(object),
            "bg": bg.to_pandas().to_numpy(object),
        })
        g = d.groupby([id_col, "w1", "bg"], sort=False).size().reset_index(name="cnt")
        g["cnt"] = g["cnt"].astype(np.int64)
        g["_part"] = _bucket(g["w1"].to_numpy(object))
        return g

    def attach_c1(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_part"]).copy()
        g["c1"] = g.groupby("w1", sort=False)["cnt"].transform("sum").astype(np.int64)
        g = g.drop(columns=["w1"])
        g["_part"] = _bucket(g["bg"].to_numpy(object))
        return g

    def attach_c12_and_q(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_part"]).copy()
        c12 = g.groupby("bg", sort=False)["cnt"].transform("sum").to_numpy(np.float64)
        c1 = g["c1"].to_numpy(np.float64)
        q = np.floor((np.log(c1) - np.log(c12)) * np.float64(scale) + 0.5).astype(np.int64)
        out = pd.DataFrame({id_col: g[id_col].to_numpy(),
                            "nb": g["cnt"].to_numpy(np.int64),
                            "sq": q * g["cnt"].to_numpy(np.int64)})
        # pre-reduce per doc before the final exchange
        r = out.groupby(id_col, sort=False).sum().reset_index()
        return _add_part(r, [id_col], num_buckets)

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        r = g.groupby(id_col, sort=False)[["nb", "sq"]].sum().reset_index()
        nb = r["nb"].to_numpy(np.int64)
        sq = r["sq"].to_numpy(np.int64)
        return pd.DataFrame({
            id_col: r[id_col].to_numpy(),
            "n_bigrams": nb, "sum_q": sq,
            "avg_nll": round_half_away(sq / (np.float64(scale) * nb), 6),
        })

    ex1 = bucket_exchange(
        docs.select_columns([id_col, text_col]).map_batches(explode, batch_format="pyarrow"),
        attach_c1)
    ex2 = bucket_exchange(ex1, attach_c12_and_q)
    return bucket_exchange(ex2, finalize, small_partials=True)


def dup_span_scores(docs: ray.data.Dataset, id_col: str = "doc_id",
                    text_col: str = "text",
                    num_buckets: int = 64) -> ray.data.Dataset:
    """Inter-document duplicated-SPAN detection — the bounded stand-in for
    suffix-array substring dedup (Lee et al. 2022 "Deduplicating Training
    Data Makes Language Models Better"): a winnowed span hash shared by
    ≥ 2 documents marks ~window chars of text copied between them, with
    the winnowing guarantee bounding the miss rate. Output per doc:
    n_spans (distinct selected spans), n_dup_spans (of those, shared with
    another doc), dup_frac — the filter column a pipeline thresholds on.

    Scale shape (the tfidf/df pattern): distinct (doc, span) rows explode
    per batch (vectorized winnowing, no Python loop over rows), ONE
    bucketed exchange on the span hash attaches the span's distinct-doc
    count (all rows of a span co-locate; rows are already distinct per
    doc, so df = transform('size')), and the per-doc reduction moves two
    ints per (doc, block). The span universe is unbounded — never a
    broadcast set. Docs shorter than the winnowing window have no spans
    and drop out (filter semantics)."""
    from ..functions.hashing import splitmix64
    from ..functions.rounding import round_half_away
    from .agg import _add_part
    from .exchange import bucket_exchange

    def explode(b: pa.Table) -> pd.DataFrame:
        rr, mm = textproc.winnow_selected(b[text_col])
        d = pd.DataFrame({id_col: b[id_col].to_numpy()[rr],
                          "sp": mm.view(np.int64)})
        d = d.drop_duplicates()
        old = np.seterr(over="ignore")
        try:
            d["_part"] = (splitmix64(d["sp"].to_numpy().view(np.uint64))
                          % np.uint64(num_buckets)).astype(np.int32)
        finally:
            np.seterr(**old)
        return d

    def attach_df(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_part"]).copy()
        g["df"] = g.groupby("sp", sort=False)["sp"].transform("size").astype(np.int64)
        out = pd.DataFrame({id_col: g[id_col].to_numpy(),
                            "ns": np.ones(len(g), np.int64),
                            "nd": (g["df"].to_numpy() >= 2).astype(np.int64)})
        r = out.groupby(id_col, sort=False).sum().reset_index()
        return _add_part(r, [id_col], num_buckets)

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        r = g.groupby(id_col, sort=False)[["ns", "nd"]].sum().reset_index()
        ns = r["ns"].to_numpy(np.int64)
        nd = r["nd"].to_numpy(np.int64)
        return pd.DataFrame({
            id_col: r[id_col].to_numpy(),
            "n_spans": ns, "n_dup_spans": nd,
            "dup_frac": round_half_away(nd / ns.astype(np.float64), 6),
        })

    ex1 = bucket_exchange(
        docs.select_columns([id_col, text_col]).map_batches(explode, batch_format="pyarrow"),
        attach_df)
    return bucket_exchange(ex1, finalize, small_partials=True)


def host_stats(pages: ray.data.Dataset, url_col: str = "url",
               lang_col: str = "lang", num_buckets: int = 64) -> ray.data.Dataset:
    """Per-host corpus statistics — the per-domain curation aggregate every
    Common-Crawl pipeline runs first (domain allow/deny lists, per-host
    caps). Host = the authority part of the url (vectorized regex).

    Scale shape: per batch, rows pre-aggregate to distinct (host, lang,
    n_rows) partials — the exchange moves ≤ #hosts × #langs × #blocks
    small rows, never one per page; one bucketed exchange on the host
    co-locates a host's partials and the combiner emits (host, n_pages,
    n_langs). Zipf-hot hosts cost #blocks partial rows, not their page
    count."""
    from ..functions.hashing import fnv1a64, splitmix64
    from .exchange import bucket_exchange

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        host = b[url_col].str.extract(r"^[a-z]+://([^/]+)/", expand=False).fillna("")
        g = (pd.DataFrame({"host": host, "lang": b[lang_col].to_numpy()})
             .groupby(["host", "lang"], sort=False).size().reset_index(name="n"))
        g["n"] = g["n"].astype(np.int64)
        old = np.seterr(over="ignore")
        try:
            g["_part"] = (splitmix64(fnv1a64(g["host"].to_numpy(object)))
                          % np.uint64(num_buckets)).astype(np.int32)
        finally:
            np.seterr(**old)
        return g

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        r = g.groupby("host", sort=False).agg(
            n_pages=("n", "sum"), n_langs=("lang", "nunique")).reset_index()
        r["n_pages"] = r["n_pages"].astype(np.int64)
        r["n_langs"] = r["n_langs"].astype(np.int64)
        return r

    return bucket_exchange(pages.map_batches(partial, batch_format="pandas"),
                           combine, small_partials=True)


def inverted_index(docs: ray.data.Dataset, id_col: str = "doc_id",
                   text_col: str = "text", max_postings: int = 64,
                   num_buckets: int = 64) -> ray.data.Dataset:
    """Distributed inverted-index build (term → capped posting list) — the
    web-search index shape over the corpus (LLM-pipeline extension; the
    reference's nearest analogue is the per-class frequency ranking in
    learning.py:1073).

    Scale shape: each block explodes to DISTINCT (term, doc) rows
    (vectorized Arrow split, same tokenizer as tfidf_top_terms), ONE
    bucketed exchange on the term hash co-locates a term's postings, and
    the stored list is CAPPED at ``max_postings`` ascending doc_ids while
    ``df`` stays EXACT (no silent caps: n_stored < df marks truncation) —
    a stopword's full posting list is O(corpus) and must never become one
    row. The string payload is pc.binary_join over list offsets — no
    per-term Python in the join itself."""
    import pyarrow.compute as pc

    from ..functions.hashing import fnv1a64, splitmix64
    from .exchange import bucket_exchange

    def explode(b: pa.Table) -> pd.DataFrame:
        t = b[text_col]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        wl = pc.split_pattern(t, " ")
        off = np.asarray(wl.offsets, np.int64)
        d = pd.DataFrame({
            id_col: np.repeat(b[id_col].to_numpy(), off[1:] - off[:-1]),
            "term": wl.values.to_pandas().to_numpy(object),
        })
        d = d[d["term"].str.len() > 0].drop_duplicates([id_col, "term"])
        old = np.seterr(over="ignore")
        try:
            d["_part"] = (splitmix64(fnv1a64(d["term"].to_numpy(object)))
                          % np.uint64(num_buckets)).astype(np.int32)
        finally:
            np.seterr(**old)
        return d

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # groups by REAL term keys internally (exchange fn contract: the
        # hash path may deliver several whole buckets per block)
        g = g.sort_values(["term", id_col], kind="mergesort")
        df_ = g.groupby("term", sort=False)[id_col].transform("size").to_numpy(np.int64)
        rank = g.groupby("term", sort=False).cumcount().to_numpy()
        first = rank == 0
        head = g[rank < max_postings]
        cnt = head.groupby("term", sort=False).size().to_numpy(np.int64) \
            if len(head) else np.zeros(0, np.int64)
        offs = pa.array(np.concatenate([[0], np.cumsum(cnt)]).astype(np.int32))
        ids_s = pc.cast(pa.array(head[id_col].to_numpy(np.int64)), pa.string())
        postings = pc.binary_join(pa.ListArray.from_arrays(offs, ids_s), ",")
        return pd.DataFrame({
            "term": g["term"].to_numpy(object)[first],
            "df": df_[first],
            "n_stored": cnt,
            "postings": postings.to_pandas().to_numpy(object),
        })

    parted = docs.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pyarrow")
    return bucket_exchange(parted, per_bucket)


def _hashed_ngram_feats(b: pa.Table, text_col: str, n_features: int):
    """Shared DSIR featurizer: hashed unigram + bigram features per doc.

    Returns ``(row_ids, h)`` — one entry per feature INSTANCE (with
    multiplicity), ``h`` in ``[0, n_features)``. Tokens are split on a
    single space and empties dropped; bigrams join consecutive tokens of
    the FILTERED sequence (the SQL twin builds the identical lists with
    list_filter + generate_series). Fully vectorized off the Arrow list
    offsets — no per-row Python."""
    import pyarrow.compute as pc

    from ..functions.hashing import fnv1a64, splitmix64

    t = b[text_col]
    if isinstance(t, pa.ChunkedArray):
        t = t.combine_chunks()
    wl = pc.split_pattern(t, " ")
    off = np.asarray(wl.offsets, np.int64)
    lens = off[1:] - off[:-1]
    row_ids = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    toks = wl.values
    mask = pc.not_equal(toks, "")
    mnp = mask.to_numpy(zero_copy_only=False)
    row_f = row_ids[mnp]
    toks_f = toks.filter(mask)
    uni = toks_f.to_pandas().to_numpy(object)
    if len(row_f) >= 2:
        keep = row_f[:-1] == row_f[1:]
        ka = pa.array(keep)
        w1 = toks_f.slice(0, len(toks_f) - 1).filter(ka)
        w2 = toks_f.slice(1).filter(ka)
        bg = pc.binary_join_element_wise(w1, w2, " ").to_pandas().to_numpy(object)
        rows_bg = row_f[:-1][keep]
        feats = np.concatenate([uni, bg])
        rows = np.concatenate([row_f, rows_bg])
    else:
        feats, rows = uni, row_f
    if len(feats) == 0:
        return rows.astype(np.int64), np.zeros(0, np.int64)
    old = np.seterr(over="ignore")
    try:
        h = (splitmix64(fnv1a64(feats)) % np.uint64(n_features)).astype(np.int64)
    finally:
        np.seterr(**old)
    return rows, h


def dsir_weights(docs: ray.data.Dataset, id_col: str = "doc_id",
                 text_col: str = "text", lang_col: str = "lang",
                 target_lang: str = "en", n_features: int = 4096,
                 scale: int = 1024, num_buckets: int = 64) -> ray.data.Dataset:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document by
    the hashed-n-gram log-likelihood ratio between a target corpus (here
    ``lang == target_lang``) and the raw corpus, so downstream sampling
    can up-weight target-like documents. LLM-pipeline extension; the
    reference's nearest analogue is the class-prior feature ranking in
    learning.py:1073.

    Scale shape: the feature table is BOUNDED at ``n_features`` buckets by
    construction (hashing trick), so the model is the one legitimately
    broadcastable artifact in the family. Pass 1 streams the corpus once:
    per-block dense bincounts (≤ n_features rows each) ride ONE bucketed
    exchange to exact (t_cnt, r_cnt) totals; the driver pulls ≤ n_features
    rows (a COUNTED bound — 4096 rows, not O(data)), derives the quantized
    per-feature log-ratio and ``ray.put``s one int64[n_features] array
    (32 KB). Pass 2 streams the corpus again and scores each doc with one
    gather + groupby-sum per batch. No O(dataset) driver pull anywhere.

    Oracle parity: λ_f = ((ln(t_f+1) − ln(r_f+1)) − ln(T+B)) + ln(R+B) —
    every ln arg is an exact integer (ln bit-matches DuckDB on exact ints,
    CLAUDE.md), the chain is textually mirrored in SQL, and λ is quantized
    to q = floor(λ·scale + 0.5) so the per-doc SUM is order-exact integer
    arithmetic at any scale. avg_w is ONE identical division + ROUND."""

    def feat_counts(b: pa.Table) -> pd.DataFrame:
        rows, h = _hashed_ngram_feats(b, text_col, n_features)
        if len(h) == 0:
            return pd.DataFrame({"h": pd.Series([], dtype=np.int64),
                                 "t_cnt": pd.Series([], dtype=np.int64),
                                 "r_cnt": pd.Series([], dtype=np.int64),
                                 "_part": pd.Series([], dtype=np.int32)})
        is_t = (b[lang_col].to_numpy(zero_copy_only=False) == target_lang)[rows]
        r_cnt = np.bincount(h, minlength=n_features)
        t_cnt = np.bincount(h[is_t], minlength=n_features)
        idx = np.nonzero(r_cnt)[0]
        return pd.DataFrame({"h": idx.astype(np.int64),
                             "t_cnt": t_cnt[idx].astype(np.int64),
                             "r_cnt": r_cnt[idx].astype(np.int64),
                             "_part": (idx % num_buckets).astype(np.int32)})

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_part"])
        return g.groupby("h", sort=False, as_index=False)[["t_cnt", "r_cnt"]].sum()

    from .exchange import bucket_exchange

    model = bucket_exchange(
        docs.select_columns([id_col, text_col, lang_col]).map_batches(
            feat_counts, batch_format="pyarrow"),
        combine).to_pandas()  # ≤ n_features rows — counted bound
    tt = int(model["t_cnt"].sum())
    rr = int(model["r_cnt"].sum())
    t1 = model["t_cnt"].to_numpy(np.float64) + 1.0
    r1 = model["r_cnt"].to_numpy(np.float64) + 1.0
    ln_tb = np.log(np.float64(tt + n_features))
    ln_rb = np.log(np.float64(rr + n_features))
    lam = ((np.log(t1) - np.log(r1)) - ln_tb) + ln_rb
    qv = np.floor(lam * np.float64(scale) + 0.5).astype(np.int64)
    qarr = np.zeros(n_features, np.int64)
    qarr[model["h"].to_numpy(np.int64)] = qv
    qref = ray.put(qarr)

    def score(b: pa.Table) -> pd.DataFrame:
        q = ray.get(qref)
        rows, h = _hashed_ngram_feats(b, text_col, n_features)
        if len(h) == 0:
            return pd.DataFrame({id_col: pd.Series([], dtype=np.int64),
                                 "n_feats": pd.Series([], dtype=np.int64),
                                 "sum_q": pd.Series([], dtype=np.int64),
                                 "avg_w": pd.Series([], dtype=np.float64)})
        d = pd.DataFrame({id_col: b[id_col].to_numpy()[rows], "q": q[h]})
        r = d.groupby(id_col, sort=False).agg(
            n_feats=("q", "size"), sum_q=("q", "sum")).reset_index()
        nf = r["n_feats"].to_numpy(np.int64)
        sq = r["sum_q"].to_numpy(np.int64)
        r["avg_w"] = round_half_away(sq / (np.float64(scale) * nf), 6)
        return r

    return docs.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow")


def chunk_documents(docs: ray.data.Dataset, id_col: str = "doc_id",
                    text_col: str = "text", chunk_tokens: int = 32,
                    overlap: int = 8) -> ray.data.Dataset:
    """Context-window chunking (the RAG / pretraining-sequence shape):
    split every document into ``chunk_tokens``-token windows advancing by
    ``chunk_tokens - overlap``, the final window shrinking at the end.
    LLM-pipeline extension; the reference's nearest analogue is the
    raster tiler (tile_rasters raster.py:396 — same fixed-window-with-
    overlap decomposition, over token axes instead of pixels).

    Purely map-side (no shuffle): each batch rebuilds the overlapping
    windows with ONE values.take(gather) + contiguous-offset
    ``binary_join`` — the paragraph-explode idiom extended to overlap,
    where the shared token values are gathered per window because Arrow
    list offsets must stay monotone. No per-row Python."""
    import pyarrow.compute as pc

    stride = chunk_tokens - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than chunk_tokens")

    def explode(b: pa.Table) -> pa.Table:
        t = b[text_col]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        wl = pc.split_pattern(t, " ")
        off = np.asarray(wl.offsets, np.int64)
        lens = off[1:] - off[:-1]
        nch = (lens + stride - 1) // stride
        tot = int(nch.sum())
        if tot == 0:
            return pa.table({id_col: pa.array([], b[id_col].type),
                             "chunk_id": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64()),
                             "chunk_text": pa.array([], pa.string())})
        starts = np.concatenate([[0], np.cumsum(nch)[:-1]])
        row = np.repeat(np.arange(len(lens), dtype=np.int64), nch)
        k = np.arange(tot, dtype=np.int64) - np.repeat(starts, nch)
        cstart = k * stride
        cnt = np.minimum(cstart + chunk_tokens, lens[row]) - cstart
        abs_start = off[:-1][row] + cstart
        csum = np.concatenate([[0], np.cumsum(cnt)[:-1]])
        gidx = np.repeat(abs_start, cnt) + (
            np.arange(int(cnt.sum()), dtype=np.int64) - np.repeat(csum, cnt))
        vals = wl.values.take(pa.array(gidx))
        new_off = np.concatenate([[0], np.cumsum(cnt)]).astype(np.int64)
        chunks = pc.binary_join(
            pa.LargeListArray.from_arrays(new_off, vals), " ")
        return pa.table({id_col: b[id_col].take(pa.array(row)),
                         "chunk_id": pa.array(k),
                         "n_tokens": pa.array(cnt.astype(np.int64)),
                         "chunk_text": pc.cast(chunks, pa.string())})

    return docs.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pyarrow")


def host_cap_sample(pages: ray.data.Dataset, k: int = 3,
                    url_col: str = "url") -> ray.data.Dataset:
    """Per-host document cap (the crawl-pipeline "at most K pages per
    host" policy): survivors are the K urls with the SMALLEST
    splitmix64(fnv(url)) draw per host — an id-hash order, so the
    surviving set is identical at any cluster size / block structure
    (CLAUDE.md: seeded RNG is neither) and restates exactly in SQL as a
    signed-BIGINT ORDER BY. Rides grouped_topk's partial per-block
    selection: a Zipf-hot host ships ≤ k rows per block, never its full
    page list."""
    from ..functions.hashing import fnv1a64, splitmix64
    from .agg import grouped_topk

    def prep(b: pa.Table) -> pd.DataFrame:
        urls = b[url_col].to_pandas()
        host = urls.str.extract(r"site-(\d+)\.example", expand=False).astype(np.int64)
        old = np.seterr(over="ignore")
        try:
            draw = splitmix64(fnv1a64(urls.to_numpy(object))).view(np.int64)
        finally:
            np.seterr(**old)
        return pd.DataFrame({url_col: urls, "host": host, "draw": draw})

    return grouped_topk(
        pages.select_columns([url_col]).map_batches(prep, batch_format="pyarrow"),
        "host", "draw", k, tiebreak=url_col, descending=False)


def bpe_train_merges(docs: ray.data.Dataset, text_col: str = "text",
                     n_merges: int = 4, num_buckets: int = 64) -> ray.data.Dataset:
    """Distributed BPE tokenizer training — the first ``n_merges`` merge
    rules (Sennrich et al. 2016), learned over the corpus word
    distribution. LLM-pipeline extension; no reference analogue. The
    end-of-word marker is omitted (documented simplification — merges are
    within-word only, the distributed shape is identical).

    Scale shape: the corpus reduces ONCE to the distinct-word vocabulary
    with exact counts (one bucketed exchange — vocab ≪ corpus), which then
    explodes to (word, cnt, pos, sym) rows that stay word-contiguous
    inside their block for every round (map_batches preserves blocks, a
    merge only deletes rows). Each round: per-block pair-count partials →
    one exchange → per-bucket best → a driver pull of ≤ num_buckets rows
    (counted bound) picks the global argmax (count desc, pair asc — a
    TOTAL order, so the learned merges are layout-independent), the tiny
    winning pair broadcasts in the closure, and the greedy left-to-right
    apply is the vectorized run-parity trick (consecutive overlapping
    matches keep even offsets — exactly SQL's gaps-and-islands, so the
    unrolled-CTE oracle is bit-exact).

    Returns (step, lhs, rhs, pair_cnt) — the learned merge table."""
    merges, _ = _bpe_train(docs, text_col, n_merges, num_buckets)
    return ray.data.from_pandas(pd.DataFrame(
        merges, columns=["step", "lhs", "rhs", "pair_cnt"]))


def _bpe_train(docs: ray.data.Dataset, text_col: str, n_merges: int,
               num_buckets: int):
    """Shared BPE training loop (see bpe_train_merges): returns the merge
    list and the FINAL merged vocab dataset (word, cnt, pos, sym)."""
    import pyarrow.compute as pc

    from ..functions.hashing import fnv1a64, splitmix64
    from .exchange import bucket_exchange

    def word_counts(b: pa.Table) -> pd.DataFrame:
        t = b[text_col]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        wl = pc.split_pattern(t, " ")
        d = pd.DataFrame({"word": wl.values.to_pandas().to_numpy(object)})
        d = d[d["word"].str.len() > 0]
        g = d.groupby("word", sort=False).size().reset_index(name="cnt")
        g["cnt"] = g["cnt"].astype(np.int64)
        old = np.seterr(over="ignore")
        try:
            g["_part"] = (splitmix64(fnv1a64(g["word"].to_numpy(object)))
                          % np.uint64(num_buckets)).astype(np.int32)
        finally:
            np.seterr(**old)
        return g

    def combine_wc(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_part"])
        return g.groupby("word", sort=False, as_index=False)["cnt"].sum()

    def explode_chars(b: pd.DataFrame) -> pd.DataFrame:
        w = b["word"].to_numpy(object)
        cnt = b["cnt"].to_numpy(np.int64)
        lens = np.fromiter((len(x) for x in w), np.int64, len(w))
        tot = int(lens.sum())
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        pos = np.arange(tot, dtype=np.int64) - np.repeat(starts, lens) + 1
        # one C-level pass: join words, then slice to a char array
        joined = "".join(w)
        syms = np.frombuffer(joined.encode("latin-1"), np.uint8)
        syms = np.char.decode(syms.view("S1"), "latin-1").astype(object)
        return pd.DataFrame({"word": np.repeat(w, lens), "cnt": np.repeat(cnt, lens),
                             "pos": pos, "sym": syms})

    vocab = bucket_exchange(
        docs.select_columns([text_col]).map_batches(word_counts, batch_format="pyarrow"),
        combine_wc).map_batches(explode_chars, batch_format="pandas").materialize()

    def pair_partials(b: pd.DataFrame) -> pd.DataFrame:
        w = b["word"].to_numpy(object)
        sym = b["sym"].to_numpy(object)
        cnt = b["cnt"].to_numpy(np.int64)
        if len(w) < 2:
            return pd.DataFrame({"pair": pd.Series([], dtype=object),
                                 "c": pd.Series([], dtype=np.int64),
                                 "_part": pd.Series([], dtype=np.int32)})
        adj = w[:-1] == w[1:]
        pair = sym[:-1][adj] + " " + sym[1:][adj]
        g = pd.DataFrame({"pair": pair, "c": cnt[:-1][adj]}) \
            .groupby("pair", sort=False, as_index=False)["c"].sum()
        old = np.seterr(over="ignore")
        try:
            g["_part"] = (splitmix64(fnv1a64(g["pair"].to_numpy(object)))
                          % np.uint64(num_buckets)).astype(np.int32)
        finally:
            np.seterr(**old)
        return g

    def bucket_best(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_part"])
        s = g.groupby("pair", sort=False, as_index=False)["c"].sum()
        s = s.sort_values(["c", "pair"], ascending=[False, True], kind="mergesort")
        return s.head(1)

    merges = []
    for step in range(1, n_merges + 1):
        best = bucket_exchange(
            vocab.map_batches(pair_partials, batch_format="pandas"),
            bucket_best).to_pandas()  # ≤ num_buckets rows — counted bound
        best = best.sort_values(["c", "pair"], ascending=[False, True],
                                kind="mergesort").head(1)
        if len(best) == 0:
            break
        a, bb = best["pair"].iloc[0].split(" ")
        merges.append({"step": np.int64(step), "lhs": a, "rhs": bb,
                       "pair_cnt": np.int64(best["c"].iloc[0])})

        def apply(b: pd.DataFrame, a=a, bb=bb) -> pd.DataFrame:
            w = b["word"].to_numpy(object)
            sym = b["sym"].to_numpy(object).copy()
            if len(w) < 2:
                return b
            m = (w[:-1] == w[1:]) & (sym[:-1] == a) & (sym[1:] == bb)
            mi = np.flatnonzero(m)
            if len(mi) == 0:
                return b
            run_brk = np.flatnonzero(np.concatenate([[True], np.diff(mi) != 1]))
            run_start = np.repeat(mi[run_brk],
                                  np.diff(np.append(run_brk, len(mi))))
            kept = mi[((mi - run_start) % 2) == 0]
            sym[kept] = a + bb
            drop = np.zeros(len(w), bool)
            drop[kept + 1] = True
            out = b.loc[~drop].copy()
            out["sym"] = sym[~drop]
            return out

        vocab = vocab.map_batches(apply, batch_format="pandas").materialize()

    return merges, vocab


def bpe_token_counts(docs: ray.data.Dataset, id_col: str = "doc_id",
                     text_col: str = "text", n_merges: int = 4,
                     num_buckets: int = 64) -> ray.data.Dataset:
    """BPE ENCODE over the corpus with the merges learned by _bpe_train:
    per document, the word count and the token count after the first
    ``n_merges`` merges — the sizing pass every pretraining-data budget
    needs (tokens per doc under the target tokenizer).

    Scale shape: encoding never re-runs the merge machinery per document —
    a word's token count is a property of the WORD, so the final merged
    vocab reduces to (word, n_tok) and joins the per-doc distinct word
    counts through the union-tag bucketed exchange on hash(word) (the
    _bucketed_hash_join shape — the vocab is NOT broadcast: distinct words
    are unbounded at corpus scale). A second exchange on doc_id sums the
    per-doc partials."""
    from ..functions.hashing import fnv1a64, splitmix64
    from .agg import _add_part
    from .exchange import bucket_exchange

    _, vocab = _bpe_train(docs, text_col, n_merges, num_buckets)

    def _wpart(words: np.ndarray) -> np.ndarray:
        old = np.seterr(over="ignore")
        try:
            return (splitmix64(fnv1a64(words)) % np.uint64(num_buckets)).astype(np.int32)
        finally:
            np.seterr(**old)

    def vocab_tok(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("word", sort=False).size().reset_index(name="n_tok")
        # word-contiguous within a block, so per-block size IS the total
        return pd.DataFrame({"word": g["word"].to_numpy(object),
                             "n_tok": g["n_tok"].to_numpy(np.int64),
                             "k": np.int64(0), id_col: np.int64(0),
                             "t": np.int8(1),
                             "_jb": _wpart(g["word"].to_numpy(object))})

    def doc_words(b: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc
        t = b[text_col]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        wl = pc.split_pattern(t, " ")
        off = np.asarray(wl.offsets, np.int64)
        d = pd.DataFrame({
            id_col: np.repeat(b[id_col].to_numpy(), off[1:] - off[:-1]),
            "word": wl.values.to_pandas().to_numpy(object),
        })
        d = d[d["word"].str.len() > 0]
        g = d.groupby([id_col, "word"], sort=False).size().reset_index(name="k")
        return pd.DataFrame({"word": g["word"].to_numpy(object),
                             "n_tok": np.int64(0),
                             "k": g["k"].to_numpy(np.int64),
                             id_col: g[id_col].to_numpy(np.int64),
                             "t": np.int8(0),
                             "_jb": _wpart(g["word"].to_numpy(object))})

    def join_words(g: pd.DataFrame) -> pd.DataFrame:
        d = g[g["t"] == 0]
        v = g[g["t"] == 1][["word", "n_tok"]]
        m = d[[id_col, "word", "k"]].merge(v, on="word", how="inner")
        m["n_bpe_tokens"] = m["k"].to_numpy(np.int64) * m["n_tok"].to_numpy(np.int64)
        r = m.groupby(id_col, sort=False, as_index=False).agg(
            n_words=("k", "sum"), n_bpe_tokens=("n_bpe_tokens", "sum"))
        return _add_part(r, [id_col], num_buckets)

    def per_doc(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_part"])
        r = g.groupby(id_col, sort=False, as_index=False)[
            ["n_words", "n_bpe_tokens"]].sum()
        r["n_words"] = r["n_words"].astype(np.int64)
        r["n_bpe_tokens"] = r["n_bpe_tokens"].astype(np.int64)
        return r

    u = docs.select_columns([id_col, text_col]).map_batches(
        doc_words, batch_format="pyarrow").union(
        vocab.map_batches(vocab_tok, batch_format="pandas"))
    joined = bucket_exchange(u, join_words, key="_jb")
    return bucket_exchange(joined, per_doc, small_partials=True)


def quality_percentile_by_lang(docs: ray.data.Dataset, id_col: str = "doc_id",
                               text_col: str = "text", lang_col: str = "lang",
                               num_buckets: int = 64) -> ray.data.Dataset:
    """Per-language quality-percentile calibration (the CCNet bucketing
    step, Wenzek et al. 2020: a score is only meaningful relative to its
    language's distribution). pct_rank = (rank_min − 1)/(N_lang − 1), SQL
    RANK semantics (min of ties).

    Scale shape: the quality score is quantized to 4 decimals
    (round_half_away — bijective with the int key qk), so ranks come from
    the per-(lang, qk) VALUE HISTOGRAM, never a per-row sort: one exchange
    keyed by lang builds cumulative counts over the (small) distinct-value
    histogram, and the union-tag bucketed join attaches (rank, N) back to
    the doc rows — no global sort, no driver pull, the only per-lang
    payload is the histogram."""
    from ..functions.hashing import fnv1a64, splitmix64
    from .exchange import bucket_exchange

    def _sbkt(strs: np.ndarray) -> np.ndarray:
        old = np.seterr(over="ignore")
        try:
            return (splitmix64(fnv1a64(strs)) % np.uint64(num_buckets)).astype(np.int32)
        finally:
            np.seterr(**old)

    def score(b: pd.DataFrame) -> pd.DataFrame:
        q = textproc.quality_scores(b[text_col])["quality"].to_numpy(np.float64)
        qual = round_half_away(q, 4)
        qk = round_half_away(qual * 10000.0, 0).astype(np.int64)
        return pd.DataFrame({id_col: b[id_col].to_numpy(),
                             lang_col: b[lang_col].to_numpy(object),
                             "quality": qual, "qk": qk})

    scored = docs.select_columns([id_col, text_col, lang_col]).map_batches(
        score, batch_format="pandas")

    def hist_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby([lang_col, "qk"], sort=False).size().reset_index(name="cnt")
        g["cnt"] = g["cnt"].astype(np.int64)
        g["_part"] = _sbkt(g[lang_col].to_numpy(object))
        return g

    def hist_ranks(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_part"])
        h = g.groupby([lang_col, "qk"], sort=False, as_index=False)["cnt"].sum()
        h = h.sort_values([lang_col, "qk"], kind="mergesort")
        h["nl"] = h.groupby(lang_col, sort=False)["cnt"].transform("sum").astype(np.int64)
        before = h.groupby(lang_col, sort=False)["cnt"].cumsum() - h["cnt"]
        h["rk"] = (before + 1).astype(np.int64)
        return h[[lang_col, "qk", "rk", "nl"]]

    hist = bucket_exchange(
        scored.map_batches(hist_partial, batch_format="pandas"), hist_ranks)

    def tag_docs(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["rk"] = np.int64(0)
        b["nl"] = np.int64(0)
        b["t"] = np.int8(0)
        key = (b[lang_col].astype(str) + ":" + b["qk"].astype(str)).to_numpy(object)
        b["_jb"] = _sbkt(key)
        return b

    def tag_hist(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b[id_col] = np.int64(0)
        b["quality"] = np.float64(0.0)
        b["t"] = np.int8(1)
        key = (b[lang_col].astype(str) + ":" + b["qk"].astype(str)).to_numpy(object)
        b["_jb"] = _sbkt(key)
        return b[[id_col, lang_col, "quality", "qk", "rk", "nl", "t", "_jb"]]

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        d = g[g["t"] == 0]
        h = g[g["t"] == 1][[lang_col, "qk", "rk", "nl"]]
        m = d[[id_col, lang_col, "quality", "qk"]].merge(h, on=[lang_col, "qk"], how="inner")
        rk = m["rk"].to_numpy(np.int64)
        nl = m["nl"].to_numpy(np.int64)
        pct = np.where(nl > 1, (rk - 1) / np.maximum(nl - 1, 1).astype(np.float64), 0.0)
        return pd.DataFrame({id_col: m[id_col].to_numpy(np.int64),
                             lang_col: m[lang_col].to_numpy(object),
                             "quality": m["quality"].to_numpy(np.float64),
                             "pct_rank": round_half_away(pct, 6)})

    u = scored.map_batches(tag_docs, batch_format="pandas").union(
        hist.map_batches(tag_hist, batch_format="pandas"))
    return bucket_exchange(u, attach, key="_jb")


def bm25_topk(docs: ray.data.Dataset, queries: dict[int, list[str]],
              id_col: str = "doc_id", text_col: str = "text", k: int = 10,
              k1: float = 1.2, b: float = 0.75,
              num_buckets: int = 64) -> ray.data.Dataset:
    """BM25 top-k retrieval (Robertson & Walker 1994; the Lucene
    positive-IDF variant) over the corpus for a small fixed query set —
    the retrieval op a training-data pipeline needs for hard-negative
    mining and retrieval-based decontamination. LLM-pipeline extension;
    the reference's nearest analogue is the global feature-ranking sort
    (learning.py:1073).

    Scale shape: the query-term set is tiny BY DEFINITION (it is the
    user's input), so it broadcasts; the corpus streams. Pass 1 is a
    scalar aggregate (N, Σdl → avgdl). Pass 2 explodes each block to
    (doc, tok, tf, dl) rows FILTERED to query terms (posting-list
    pruning at the map — only matching rows ever leave a block), one
    bucketed exchange on hash(tok) attaches exact df, a second on
    hash(doc) sums per-(query, doc) scores, and ``grouped_topk`` keeps
    k per query (its map-side pre-selection means the final exchange
    moves ≤ k · #blocks rows). The driver never sees row data.

    Oracle parity: idf and the term score are one f64 chain with the
    exact parenthesization restated in SQL (constants CAST AS DOUBLE —
    CLAUDE.md float-literal trap), snapped to f32 per term; per-doc
    sums of ≤ |query| f32-valued terms are order-exact, so ranking on
    the exact score + doc_id tiebreak is deterministic both sides."""
    import pyarrow.compute as pc

    from ..functions.hashing import fnv1a64, splitmix64
    from .agg import grouped_topk
    from .exchange import bucket_exchange

    term_to_qids: dict[str, list[int]] = {}
    for qid, terms in queries.items():
        for t in terms:
            term_to_qids.setdefault(t, []).append(qid)
    qt = pd.DataFrame(
        {"tok": np.array([t for t, qs in term_to_qids.items() for _ in qs], object),
         "query_id": np.array([q for qs in term_to_qids.values() for q in qs], np.int64)})
    term_set = frozenset(term_to_qids)

    n_docs = float(docs.count())

    def len_partial(t: pa.Table) -> pd.DataFrame:
        wl = pc.split_pattern(t[text_col].combine_chunks()
                              if isinstance(t[text_col], pa.ChunkedArray) else t[text_col], " ")
        ne = int(pc.sum(pc.greater(pc.utf8_length(wl.values), 0)).as_py() or 0)
        return pd.DataFrame({"tot": [np.int64(ne)]})

    total_len = docs.select_columns([text_col]).map_batches(
        len_partial, batch_format="pyarrow").sum("tot")
    avgdl = float(total_len) / n_docs

    def explode(t: pa.Table) -> pd.DataFrame:
        col = t[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        wl = pc.split_pattern(col, " ")
        off = np.asarray(wl.offsets, np.int64)
        counts = off[1:] - off[:-1]
        seg = np.repeat(np.arange(len(counts)), counts)
        toks = wl.values.to_pandas().to_numpy(object)
        ne = np.asarray(pc.greater(pc.utf8_length(wl.values), 0))
        dl = np.bincount(seg[ne], minlength=len(counts)).astype(np.int64)
        d = pd.DataFrame({id_col: np.repeat(t[id_col].to_numpy(), counts)[ne],
                          "tok": toks[ne], "_dl": dl[seg[ne]]})
        d = d[d["tok"].isin(term_set)]
        if not len(d):
            return pd.DataFrame({id_col: pd.Series([], dtype=np.int64),
                                 "tok": pd.Series([], dtype=object),
                                 "tf": pd.Series([], dtype=np.int64),
                                 "dl": pd.Series([], dtype=np.int64),
                                 "_part": pd.Series([], dtype=np.int32)})
        g = d.groupby([id_col, "tok"], sort=False).agg(
            tf=("tok", "size"), dl=("_dl", "first")).reset_index()
        g["tf"] = g["tf"].astype(np.int64)
        old = np.seterr(over="ignore")
        try:
            g["_part"] = (splitmix64(fnv1a64(g["tok"].to_numpy(object)))
                          % np.uint64(num_buckets)).astype(np.int32)
        finally:
            np.seterr(**old)
        return g

    def attach_df_and_score(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_part"]).copy()
        g["df"] = g.groupby("tok", sort=False)["tok"].transform("size").astype(np.int64)
        tf = g["tf"].to_numpy(np.float64)
        df_ = g["df"].to_numpy(np.float64)
        dl = g["dl"].to_numpy(np.float64)
        idf = np.log(((n_docs - df_) + 0.5) / (df_ + 0.5) + 1.0)
        s = (idf * (tf * (k1 + 1.0))
             / (tf + k1 * ((1.0 - b) + b * (dl / avgdl))))
        g["s"] = s.astype(np.float32).astype(np.float64)
        m = g[[id_col, "tok", "s"]].merge(qt, on="tok", how="inner")
        old = np.seterr(over="ignore")
        try:
            m["_part"] = (splitmix64(m[id_col].to_numpy(np.int64).view(np.uint64))
                          % np.uint64(num_buckets)).astype(np.int32)
        finally:
            np.seterr(**old)
        return m[["query_id", id_col, "s", "_part"]]

    scored = bucket_exchange(
        docs.select_columns([id_col, text_col]).map_batches(
            explode, batch_format="pyarrow"),
        attach_df_and_score)

    def sum_per_doc(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_part"])
        out = g.groupby(["query_id", id_col], sort=False)["s"].sum().reset_index(name="score")
        out["query_id"] = out["query_id"].astype(np.int64)
        return out

    sums = bucket_exchange(scored, sum_per_doc)
    return grouped_topk(sums, "query_id", "score", k, tiebreak=id_col)


def lang_temperature_weights(docs: ray.data.Dataset, id_col: str = "doc_id",
                             lang_col: str = "lang", rep_scale: int = 1000,
                             group_bound: int = 100_000,
                             num_buckets: int = 64) -> ray.data.Dataset:
    """Temperature-based multilingual resampling (the XLM-R α-sampling
    shape, Conneau et al. 2020, at α = 1/2): per-language corpus shares
    p_l are reweighted to q_l ∝ √p_l, each document carries the resample
    weight w_l = q_l / p_l, and a deterministic id-hash draw converts the
    fractional part of w_l · rep_scale/1000-per-mille into an integer
    repetition count — low-resource languages up-sampled, high-resource
    down-weighted, reproducible at any block structure (the id-hash
    sampling pattern, never data-dependent RNG). LLM-pipeline extension;
    no reference analogue.

    Scale shape: one partial-counts exchange reduces to ≤ #languages rows
    (a COUNTED bound — raises above ``group_bound`` like
    ``embedding_drift_by_label``); the per-language weight table
    broadcasts in a closure and the corpus streams through one map.

    Oracle parity: α = 1/2 on purpose — √ is correctly rounded IEEE both
    sides (POWER(p, 0.3) is a libm call with no cross-engine guarantee).
    Each √share snaps to f32 so the ≤ #languages denominator sum is
    order-exact; w is then one identical f64 chain, and the extra-rep
    draw compares splitmix64(doc_id) against floor(frac · 2^64) — an
    exact integer threshold both sides."""
    from ..functions.hashing import splitmix64
    from .agg import _add_part
    from .exchange import bucket_exchange

    def partial(b: pa.Table) -> pd.DataFrame:
        g = (pd.Series(b[lang_col].to_pandas().to_numpy(object))
             .value_counts().rename_axis(lang_col).reset_index(name="n"))
        g["n"] = g["n"].astype(np.int64)
        return g

    parted = docs.select_columns([lang_col]).map_batches(
        partial, batch_format="pyarrow").map_batches(
        lambda b: _add_part(b, [lang_col]), batch_format="pandas")

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(lang_col, sort=False)["n"].sum().reset_index()

    counts = bucket_exchange(parted, combine, small_partials=True).materialize()
    n_groups = counts.count()
    if n_groups > group_bound:
        raise ValueError(
            f"lang_temperature_weights: {n_groups} languages exceeds the "
            f"driver-pull bound ({group_bound}) — not a language column?")
    tbl = counts.to_pandas().sort_values(lang_col).reset_index(drop=True)
    n_total = float(tbl["n"].sum())
    sl = np.sqrt(tbl["n"].to_numpy(np.int64) / n_total).astype(np.float32).astype(np.float64)
    denom = sl.sum()  # exact: ≤ #languages f32-valued f64 terms
    w = (sl / denom) / (tbl["n"].to_numpy(np.int64) / n_total)
    base = np.floor(w * float(rep_scale))
    frac = w * float(rep_scale) - base
    thr = np.floor(frac * 2.0 ** 64)
    lang_order = {l: i for i, l in enumerate(tbl[lang_col])}
    w_arr = np.asarray(w, np.float64)
    base_arr = base.astype(np.int64)
    thr_arr = np.minimum(thr, 2.0 ** 64 - 2 ** 11).astype(np.uint64)  # frac<1 ⇒ no clamp in practice

    from ..functions.rounding import round_half_away

    def assign(b: pa.Table) -> pd.DataFrame:
        langs = b[lang_col].to_pandas().to_numpy(object)
        ids = b[id_col].to_numpy()
        li = pd.Series(langs).map(lang_order).to_numpy(np.int64)
        h = splitmix64(ids.astype(np.uint64))
        extra = (h < thr_arr[li]).astype(np.int64)
        return pd.DataFrame({id_col: ids, lang_col: langs,
                             "w": round_half_away(w_arr[li], 6),
                             "reps": base_arr[li] + extra})

    return docs.select_columns([id_col, lang_col]).map_batches(
        assign, batch_format="pyarrow")


def _byte_entropy(col) -> tuple[np.ndarray, np.ndarray]:
    """(byte length, byte entropy in nats) per row of an Arrow string
    column — counts straight off the value buffer (frombuffer + one
    bincount, no per-row Python), each term −(c/n)·ln(c/n) snapped to f32
    so the ≤256-term per-row sum is order-exact."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_large_string(col.type):
        offsets = np.frombuffer(col.buffers()[1], np.int64)[col.offset: col.offset + len(col) + 1]
    else:
        offsets = np.frombuffer(col.buffers()[1], np.int32)[col.offset: col.offset + len(col) + 1]
    data = (np.frombuffer(col.buffers()[2], np.uint8)
            if col.buffers()[2] is not None else np.zeros(0, np.uint8))
    lens = (offsets[1:] - offsets[:-1]).astype(np.int64)
    nrows = len(lens)
    seg = np.repeat(np.arange(nrows, dtype=np.int64), lens)
    # string value buffers are contiguous: row i occupies
    # data[offsets[i]:offsets[i+1]], rows adjacent
    flat = data[offsets[0] if nrows else 0: offsets[-1] if nrows else 0]
    key = seg * np.int64(256) + flat.astype(np.int64)
    cnt = np.bincount(key, minlength=nrows * 256).reshape(nrows, 256)
    rows, bts = np.nonzero(cnt)
    c = cnt[rows, bts].astype(np.float64)
    n = lens[rows].astype(np.float64)
    p = c / n
    t = (-(p * np.log(p))).astype(np.float32).astype(np.float64)
    ent = np.zeros(nrows, np.float64)
    np.add.at(ent, rows, t)  # ≤256 f32-valued terms per row → order-exact
    return lens, ent


def char_entropy(docs: ray.data.Dataset, id_col: str = "doc_id",
                 text_col: str = "text") -> ray.data.Dataset:
    """Per-document byte-entropy quality signal H = −Σ p_b ln p_b over the
    byte histogram — the cheap "is this text or noise" filter (RefinedWeb-
    style heuristics; uniform-noise docs score near ln 256, natural text
    much lower). LLM-pipeline extension; no reference analogue. The corpus
    fixture is pure ASCII, so byte == character entropy (asserted by the
    SQL twin's char split).

    Embarrassingly parallel — no shuffle: per-(doc, byte) counts come
    straight off the Arrow value buffer (frombuffer + one bincount on the
    combined (row, byte) key — the MediaDecoder idiom, no per-row Python),
    each term −(c/n)·ln(c/n) snaps to f32 so the ≤ 256-term per-doc sum
    is order-exact, then one round. Zero-length docs have no bytes and
    drop out (filter semantics)."""
    from ..functions.rounding import round_half_away

    def fn(b: pa.Table) -> pd.DataFrame:
        lens, ent = _byte_entropy(b[text_col])
        keep = lens > 0
        ids = b[id_col].to_numpy()
        return pd.DataFrame({id_col: ids[keep],
                             "n_chars": lens[keep],
                             "entropy": round_half_away(ent[keep], 6)})

    return docs.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow")


ROBOTS_RULES: tuple[tuple[str, str], ...] = (
    ("site-7.example", "/"),      # whole host blocked
    ("*", "/src3/"),              # path prefix on every host
    ("site-13.example", "/src1"),  # bare prefix: matches /src1, /src10..19
)


def robots_blocklist(pages: ray.data.Dataset, url_col: str = "url",
                     rules: tuple[tuple[str, str], ...] = ROBOTS_RULES
                     ) -> ray.data.Dataset:
    """Robots-style URL blocklist: ordered (host | '*', path-prefix) rules,
    first match wins, blocked urls emitted with the matching rule id — the
    crawl-policy filter every web corpus applies before processing
    (reference analogue: the sqlfilter/filter_shp predicate family).

    Map-only, no shuffle: the rule list is tiny BY DEFINITION (it is
    operator input) and evaluates as one vectorized startswith per rule
    with a first-match running mask — never a per-row Python loop."""

    def fn(b: pa.Table) -> pd.DataFrame:
        urls = b[url_col].to_pandas()
        m = urls.str.extract(r"^https?://([^/]+)(/.*)?$")
        host = m[0].fillna("").to_numpy(object)
        path = m[1].fillna("/").to_numpy(object)
        rule_id = np.full(len(urls), -1, np.int64)
        unassigned = np.ones(len(urls), bool)
        hs = pd.Series(host)
        ps = pd.Series(path)
        for i, (h, p) in enumerate(rules):
            hit = (ps.str.startswith(p).to_numpy()
                   & (np.full(len(urls), True) if h == "*"
                      else (hs == h).to_numpy()))
            take = hit & unassigned
            rule_id[take] = i
            unassigned &= ~hit
        keep = rule_id >= 0
        return pd.DataFrame({url_col: urls.to_numpy(object)[keep],
                             "rule_id": rule_id[keep]})

    return pages.select_columns([url_col]).map_batches(fn, batch_format="pyarrow")


def corpus_vocab_stats(docs: ray.data.Dataset, text_col: str = "text",
                       num_buckets: int = 64) -> ray.data.Dataset:
    """Corpus-level vocabulary statistics — total tokens, distinct
    unigrams/bigrams, type-token ratio: the Heaps-law growth numbers a
    corpus dashboard tracks per snapshot (vocabulary explosion signals
    boilerplate or encoding rot). LLM-pipeline extension.

    Scale shape: per block, tokens/bigrams reduce to DISTINCT partials
    (+ one exact token-count row); one token-hash exchange dedups each
    term globally and each bucket emits ONE count row, so the driver sees
    ≤ num_buckets rows — a COUNT(DISTINCT) over an unbounded vocabulary
    with no vocabulary table ever broadcast or pulled."""
    import pyarrow.compute as pc

    from ..functions.hashing import fnv1a64, splitmix64
    from .exchange import bucket_exchange

    def partial(b: pa.Table) -> pd.DataFrame:
        col = b[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        wl = pc.split_pattern(col, " ")
        off = np.asarray(wl.offsets, np.int64)
        counts = off[1:] - off[:-1]
        toks = wl.values.to_pandas().to_numpy(object)
        ne = np.asarray(pc.greater(pc.utf8_length(wl.values), 0))
        seg = np.repeat(np.arange(len(counts)), counts)
        n_tok = int(ne.sum())
        uni = pd.unique(toks[ne])
        # bigrams within a doc: adjacent non-empty token positions
        same_doc = seg[1:] == seg[:-1]
        ok = same_doc & ne[1:] & ne[:-1]
        bi = pd.unique(pd.Series(toks[:-1][ok]).str.cat(
            pd.Series(toks[1:][ok]), sep=" ").to_numpy(object)) \
            if ok.any() else np.array([], object)
        old = np.seterr(over="ignore")
        try:
            d = pd.DataFrame({
                "term": np.concatenate([uni, bi]),
                "is_bi": np.concatenate([np.zeros(len(uni), np.int8),
                                         np.ones(len(bi), np.int8)]),
                "n_tok": np.int64(0),
            })
            d["_part"] = (splitmix64(fnv1a64(d["term"].to_numpy(object)))
                          % np.uint64(num_buckets)).astype(np.int32)
        finally:
            np.seterr(**old)
        cnt = pd.DataFrame({"term": ["\x00count"], "is_bi": np.int8(2),
                            "n_tok": np.int64(n_tok), "_part": np.int32(0)})
        return pd.concat([d, cnt], ignore_index=True)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        toks = g[g["is_bi"] == 0]["term"].nunique()
        bis = g[g["is_bi"] == 1]["term"].nunique()
        ntok = int(g[g["is_bi"] == 2]["n_tok"].sum())
        return pd.DataFrame({"n_types": [np.int64(toks)],
                             "n_bigram_types": [np.int64(bis)],
                             "n_tokens": [np.int64(ntok)]})

    parts = bucket_exchange(
        docs.select_columns([text_col]).map_batches(partial, batch_format="pyarrow"),
        per_bucket).to_pandas()  # ≤ num_buckets rows — bounded by design
    n_types = int(parts["n_types"].sum())
    n_tokens = int(parts["n_tokens"].sum())
    from ..functions.rounding import round_half_away
    return ray.data.from_pandas(pd.DataFrame({
        "n_tokens": [np.int64(n_tokens)],
        "n_types": [np.int64(n_types)],
        "n_bigram_types": [np.int64(parts["n_bigram_types"].sum())],
        "ttr": round_half_away(np.array([n_types / n_tokens], np.float64), 6),
    }))


QUALITY_BLEND_RULES = {"min_chars": 150, "min_quality": 0.55,
                       "max_dup2": 0.05, "min_entropy": 2.75}


def quality_blend(docs: ray.data.Dataset, id_col: str = "doc_id",
                  text_col: str = "text",
                  rules: dict | None = None) -> ray.data.Dataset:
    """Multi-signal document verdict (the FineWeb/RefinedWeb filter
    composition): length, heuristic quality score, Gopher duplicate-bigram
    fraction and byte entropy combine into a keep flag plus a per-rule
    failure bitmask — one fused, fully map-side stage (every signal is
    per-document; no shuffle, the corpus streams once). LLM-pipeline
    extension; reference analogue: the stat dispatch + sqlfilter family.

    Thresholds compare the ROUNDED signals — exactly the values whose
    bit-parity the standalone signal twins (quality_scores,
    repetition_scores, char_entropy) already prove, so the SQL threshold
    comparisons agree bit-for-bit."""
    from ..functions.rounding import round_half_away

    r = dict(QUALITY_BLEND_RULES, **(rules or {}))

    def fn(b: pa.Table) -> pd.DataFrame:
        texts = b[text_col].to_pandas()
        qual = round_half_away(
            textproc.quality_scores(texts)["quality"].to_numpy(np.float64), 4)
        dup2 = textproc.repetition_scores(texts)["dup_2gram_frac"].to_numpy(np.float64)
        lens, ent_raw = _byte_entropy(b[text_col])
        ent = round_half_away(ent_raw, 6)
        # rules compare the ROUNDED signals — exactly the values whose
        # bit-parity the standalone signal twins already prove, so the
        # threshold comparisons agree bit-for-bit
        fail = ((lens < r["min_chars"]).astype(np.int64)
                | ((qual < r["min_quality"]).astype(np.int64) << 1)
                | ((dup2 > r["max_dup2"]).astype(np.int64) << 2)
                | ((ent < r["min_entropy"]).astype(np.int64) << 3))
        return pd.DataFrame({
            id_col: b[id_col].to_numpy(),
            "n_chars": lens,
            "quality": qual,
            "dup_2gram_frac": dup2,
            "entropy": ent,
            "fail_mask": fail,
            "keep": (fail == 0).astype(np.int64),
        })

    return docs.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow")


def pmi_bigrams(docs: ray.data.Dataset, text_col: str = "text",
                min_count: int = 5, k: int = 50,
                num_buckets: int = 64) -> ray.data.Dataset:
    """Corpus-level top-k PMI collocations (Church & Hanks 1990):
    pmi(a,b) = ln( p(ab) / (p(a)·p(b)) ) over adjacent-token bigrams,
    keeping bigrams with corpus count ≥ ``min_count``.

    Fully distributed: per-block PRE-AGGREGATED unigram/bigram partial
    counts (one vectorized groupby per block — the map-side combiner
    pattern), one bucketed exchange each for the global sums, then the
    two unigram lookups attach through the dedup-style half-row union
    exchange (`_pair_payload_join` shape, string keys): bigram rows
    explode into two halves keyed on their member token, union with the
    unigram-count rows, co-locate by token hash, merge per bucket, re-key
    on the pair and zip — the vocabulary is UNBOUNDED so neither side is
    ever a broadcast dict. Corpus totals N1/N2 are two scalar `ds.sum`
    tree-aggregates (driver holds two numbers, nothing else).

    Oracle parity: counts are exact integers; the single pmi float is
    ln(((cab·N1/N2) · (N1/ca)) / cb) with every operand an exact
    int→f64 cast and the SAME association in SQL, snapped to f32
    (round-3 transcendental recipe); ranking uses the snapped value with
    a (w1, w2) tiebreak on both sides."""
    import pyarrow.compute as pc

    from ..functions.hashing import fnv1a64, splitmix64
    from .exchange import bucket_exchange

    def _doc_tokens(b: pa.Table):
        t = b[text_col]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        wl = pc.split_pattern(t, " ")
        vals = wl.values.to_pandas().to_numpy(object)
        off = np.asarray(wl.offsets, np.int64)
        doc = np.repeat(np.arange(len(off) - 1), off[1:] - off[:-1])
        keep = np.char.str_len(vals.astype(str)) > 0
        return vals[keep], doc[keep]

    def totals(b: pa.Table) -> pd.DataFrame:
        vals, doc = _doc_tokens(b)
        n2 = int((doc[1:] == doc[:-1]).sum()) if len(doc) > 1 else 0
        return pd.DataFrame({"n1": [len(vals)], "n2": [n2]})

    tsum = docs.select_columns([text_col]).map_batches(
        totals, batch_format="pyarrow").sum(["n1", "n2"])
    n1f = np.float64(tsum["sum(n1)"])
    n2f = np.float64(tsum["sum(n2)"])

    old = np.seterr(over="ignore")
    try:
        def _tok_part(tok: np.ndarray) -> np.ndarray:
            return (splitmix64(fnv1a64(tok.astype(object)))
                    % np.uint64(num_buckets)).astype(np.int32)

        def uni_part(b: pa.Table) -> pd.DataFrame:
            vals, _ = _doc_tokens(b)
            g = (pd.DataFrame({"tok": vals}).groupby("tok", sort=False)
                 .size().reset_index(name="c"))
            g["c"] = g["c"].astype(np.int64)
            g["_part"] = _tok_part(g["tok"].to_numpy())
            return g

        def big_part(b: pa.Table) -> pd.DataFrame:
            vals, doc = _doc_tokens(b)
            if len(vals) < 2:
                return pd.DataFrame({"w1": pd.Series([], dtype=object),
                                     "w2": pd.Series([], dtype=object),
                                     "cab": pd.Series([], dtype=np.int64),
                                     "_part": pd.Series([], dtype=np.int32)})
            adj = doc[1:] == doc[:-1]
            g = (pd.DataFrame({"w1": vals[:-1][adj], "w2": vals[1:][adj]})
                 .groupby(["w1", "w2"], sort=False).size()
                 .reset_index(name="cab"))
            g["cab"] = g["cab"].astype(np.int64)
            pair = (g["w1"] + " " + g["w2"]).to_numpy(object)
            g["_part"] = _tok_part(pair)
            return g

        def uni_combine(g: pd.DataFrame) -> pd.DataFrame:
            out = (g.groupby("tok", sort=False, as_index=False)["c"].sum())
            out["c"] = out["c"].astype(np.int64)
            return out

        def big_combine(g: pd.DataFrame) -> pd.DataFrame:
            out = g.groupby(["w1", "w2"], sort=False, as_index=False)["cab"].sum()
            out["cab"] = out["cab"].astype(np.int64)
            return out[out["cab"] >= min_count]

        dsel = docs.select_columns([text_col])
        ucnt = bucket_exchange(
            dsel.map_batches(uni_part, batch_format="pyarrow"), uni_combine)
        bcnt = bucket_exchange(
            dsel.map_batches(big_part, batch_format="pyarrow"), big_combine)

        def halves(b: pd.DataFrame) -> pd.DataFrame:
            n = len(b)
            w1 = b["w1"].to_numpy(object)
            w2 = b["w2"].to_numpy(object)
            d = pd.DataFrame({
                "jtok": np.concatenate([w1, w2]),
                "w1": np.concatenate([w1, w1]),
                "w2": np.concatenate([w2, w2]),
                "cab": np.concatenate([b["cab"].to_numpy(np.int64)] * 2),
                "side": np.concatenate([np.zeros(n, np.int8),
                                        np.ones(n, np.int8)]),
                "t": np.zeros(2 * n, np.int8),
                "c": np.zeros(2 * n, np.int64),
            })
            d["_part"] = _tok_part(d["jtok"].to_numpy())
            return d

        def look(b: pd.DataFrame) -> pd.DataFrame:
            n = len(b)
            empt = np.empty(n, object)
            empt.fill("")
            d = pd.DataFrame({
                "jtok": b["tok"].to_numpy(object),
                "w1": empt, "w2": empt,
                "cab": np.zeros(n, np.int64),
                "side": np.full(n, -1, np.int8),
                "t": np.ones(n, np.int8),
                "c": b["c"].to_numpy(np.int64),
            })
            d["_part"] = _tok_part(d["jtok"].to_numpy())
            return d

        def attach(g: pd.DataFrame) -> pd.DataFrame:
            h = g[g["t"] == 0].drop(columns=["c", "t", "_part"])
            lk = g.loc[g["t"] == 1, ["jtok", "c"]]
            m = h.merge(lk, on="jtok", how="inner").drop(columns=["jtok"])
            pair = (m["w1"] + " " + m["w2"]).to_numpy(object)
            m["_part"] = _tok_part(pair)
            return m

        def zips(g: pd.DataFrame) -> pd.DataFrame:
            a = g.loc[g["side"] == 0, ["w1", "w2", "cab", "c"]].rename(
                columns={"c": "ca"})
            bb = g.loc[g["side"] == 1, ["w1", "w2", "c"]].rename(
                columns={"c": "cb"})
            m = a.merge(bb, on=["w1", "w2"], how="inner")
            cab = m["cab"].to_numpy(np.float64)
            ca = m["ca"].to_numpy(np.float64)
            cb = m["cb"].to_numpy(np.float64)
            pmi = np.log((cab * n1f / n2f) * (n1f / ca) / cb)
            return pd.DataFrame({
                "w1": m["w1"].to_numpy(object),
                "w2": m["w2"].to_numpy(object),
                "pair_count": m["cab"].to_numpy(np.int64),
                "c_w1": m["ca"].to_numpy(np.int64),
                "c_w2": m["cb"].to_numpy(np.int64),
                "pmi": pmi.astype(np.float32).astype(np.float64),
            })

        joined = bucket_exchange(
            bcnt.map_batches(halves, batch_format="pandas")
            .union(ucnt.map_batches(look, batch_format="pandas")),
            attach)
        scored = bucket_exchange(joined, zips)
    finally:
        np.seterr(**old)

    return scored.sort(["pmi", "w1", "w2"],
                       descending=[True, False, False]).limit(k)


def crawl_frontier(pages: ray.data.Dataset, url_col: str = "url",
                   num_buckets: int = 64) -> ray.data.Dataset:
    """Crawl-frontier politeness scheduling: every page gets a fetch slot
    within its host queue — pages are ranked per host by a deterministic
    id-hash priority draw (cluster-size reproducible, CLAUDE.md RNG
    rule), and page ``i`` of a host is scheduled at
    ``(i-1) × delay_ms(host)`` where the per-host crawl delay is
    ``500 + splitmix64(host) % 1000`` ms — the "be polite, one fetch per
    delay per host" frontier shape (Heydon & Najork's Mercator).

    Scale shape: one O(dataset) bucketed exchange on hash(host) (narrow
    url/host/draw rows, wide columns never ship); the combiner ranks each
    host with ONE vectorized sort + cumcount over the co-located block.
    Rank-within-host is inherently a per-host sequential structure, so a
    Zipf-hot host cannot be salted — but its rows are a sorted scan, not
    a Python loop, and hosts spread across ``num_buckets`` buckets."""
    from ..functions.hashing import fnv1a64, splitmix64

    def prep(b: pa.Table) -> pd.DataFrame:
        urls = b[url_col].to_pandas()
        host = urls.str.extract(r"site-(\d+)\.example", expand=False).astype(np.int64)
        old = np.seterr(over="ignore")
        try:
            draw = splitmix64(fnv1a64(urls.to_numpy(object))).view(np.int64)
            part = (splitmix64(host.to_numpy(np.uint64))
                    % np.uint64(num_buckets)).astype(np.int32)
            delay = (np.int64(500)
                     + (splitmix64(host.to_numpy(np.uint64))
                        % np.uint64(1000)).astype(np.int64))
        finally:
            np.seterr(**old)
        return pd.DataFrame({url_col: urls, "host": host, "draw": draw,
                             "delay_ms": delay, "_part": part})

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_part"]).sort_values(
            ["host", "draw", url_col], kind="mergesort")
        rn = g.groupby("host", sort=False).cumcount().to_numpy(np.int64) + 1
        g = g.copy()
        g["rn"] = rn
        g["sched_ms"] = (rn - 1) * g["delay_ms"].to_numpy(np.int64)
        return g.reset_index(drop=True)

    from .exchange import bucket_exchange

    return bucket_exchange(
        pages.select_columns([url_col]).map_batches(prep, batch_format="pyarrow"),
        rank)


def mi_lang_quality(docs: ray.data.Dataset, text_col: str = "text",
                    lang_col: str = "lang") -> ray.data.Dataset:
    """Mutual information between language and quality bucket — the
    corpus-curation diagnostic ("does quality filtering skew the language
    mix?", the DSIR/CCNet audit companion). Quality is the repo's exact
    4-decimal linear score; bucket = min(qk // 2000, 4) on its integer
    key (pure integer, no float boundary risk). Per-(lang, bucket) MI
    term = (n/N)·ln((n/n_lang)/(n_bucket/N)) — every division is one
    correctly-rounded op on exact integer operands and numpy log ==
    DuckDB ln bit-for-bit on this box (tfidf precedent), final value
    snapped to f32. Ratios-of-ratios keep magnitudes O(1), so no product
    ever approaches 2⁵³ at any corpus size.

    Scale shape: per-block partial counts (≤ #langs×5 rows each) → ONE
    single-bucket exchange sums and finalizes the ≤25-cell table — the
    only global state is that tiny contingency table."""
    from .exchange import bucket_exchange

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        q = textproc.quality_scores(b[text_col])["quality"].to_numpy(np.float64)
        qk = round_half_away(
            round_half_away(q, 4) * 10000.0, 0).astype(np.int64)
        bucket = np.minimum(qk // 2000, 4)
        g = pd.DataFrame({"lang": b[lang_col].to_numpy(object),
                          "bucket": bucket}) \
            .groupby(["lang", "bucket"], sort=False).size() \
            .reset_index(name="n")
        g["n"] = g["n"].astype(np.int64)
        g["_part"] = np.int32(0)
        return g

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        c = g.drop(columns=["_part"]) \
            .groupby(["lang", "bucket"], as_index=False)["n"].sum()
        c["n"] = c["n"].astype(np.int64)
        n_total = np.int64(c["n"].sum())
        c["n_lang"] = c.groupby("lang")["n"].transform("sum").astype(np.int64)
        c["n_bucket"] = c.groupby("bucket")["n"].transform("sum") \
            .astype(np.int64)
        c["n_total"] = n_total
        nf = c["n"].to_numpy(np.float64)
        term = (nf / np.float64(n_total)) * np.log(
            (nf / c["n_lang"].to_numpy(np.float64))
            / (c["n_bucket"].to_numpy(np.float64) / np.float64(n_total)))
        c["mi_term"] = term.astype(np.float32)
        return c

    return bucket_exchange(
        docs.select_columns([text_col, lang_col]).map_batches(
            partial, batch_format="pandas"),
        combine, small_partials=True)


def kn_perplexity_scores(docs: ray.data.Dataset, id_col: str = "doc_id",
                         text_col: str = "text", discount: float = 0.75,
                         scale: int = 1024,
                         num_buckets: int = 64) -> ray.data.Dataset:
    """Interpolated Kneser-Ney bigram scoring (Kneser-Ney 1995; the
    smoothing KenLM ships and CCNet's filter perplexity uses — the
    richer sibling of `lm_perplexity_scores`'s MLE chain):

        P(w2|w1) = (C(w1w2) − D)/C(w1·)
                 + D·N1+(w1·)/C(w1·) · N1+(·w2)/N1+(··)

    with D = 0.75 (exact dyadic). Scoring corpus = training corpus, so
    C(w1w2) ≥ 1 > D and the max(·,0) never binds. All five model
    quantities are EXACT integers; P is one identical f64 chain both
    sides and the per-bigram −ln P is quantized to integer 1/``scale``
    nats (lm_perplexity recipe — never SUM raw logs).

    Scale shape: the model is never a broadcast dict. Exchange 1
    (hash(w1)) attaches C(w1·) and the distinct-continuation count
    N1+(w1·) with two groupby-transforms; the distinct-bigram total
    N1+(··) is a bounded driver pull (Σ nf1 over distinct w1 — ≤ 1 row
    per bucket); exchange 2 (hash(w2)) attaches N1+(·w2) and C(w1w2)
    and quantizes; the per-doc reduction moves two ints per (doc,
    block)."""
    import pyarrow.compute as pc

    from ..functions.hashing import fnv1a64, splitmix64
    from ..functions.rounding import round_half_away
    from .agg import _add_part
    from .exchange import bucket_exchange

    def _bucket(vals: np.ndarray) -> np.ndarray:
        old = np.seterr(over="ignore")
        try:
            return (splitmix64(fnv1a64(vals))
                    % np.uint64(num_buckets)).astype(np.int32)
        finally:
            np.seterr(**old)

    def explode(b: pa.Table) -> pd.DataFrame:
        t = b[text_col]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        wl = pc.split_pattern(t, " ")
        off = np.asarray(wl.offsets, np.int64)
        lens = off[1:] - off[:-1]
        row_ids = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        if len(row_ids) < 2:
            return pd.DataFrame({id_col: pd.Series([], dtype=np.int64),
                                 "w1": pd.Series([], dtype=object),
                                 "w2": pd.Series([], dtype=object),
                                 "cnt": pd.Series([], dtype=np.int64),
                                 "_part": pd.Series([], dtype=np.int32)})
        keep = row_ids[:-1] == row_ids[1:]
        ka = pa.array(keep)
        vals = wl.values
        w1 = vals.slice(0, len(vals) - 1).filter(ka)
        w2 = vals.slice(1).filter(ka)
        d = pd.DataFrame({
            id_col: b[id_col].to_numpy()[row_ids[:-1][keep]],
            "w1": w1.to_pandas().to_numpy(object),
            "w2": w2.to_pandas().to_numpy(object),
        })
        g = d.groupby([id_col, "w1", "w2"], sort=False).size() \
            .reset_index(name="cnt")
        g["cnt"] = g["cnt"].astype(np.int64)
        g["_part"] = _bucket(g["w1"].to_numpy(object))
        return g

    def attach_ctx(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_part"]).copy()
        gb = g.groupby("w1", sort=False)
        g["c1"] = gb["cnt"].transform("sum").astype(np.int64)
        g["nf1"] = gb["w2"].transform("nunique").astype(np.int64)
        g["_part"] = _bucket(g["w2"].to_numpy(object))
        return g

    ex1 = bucket_exchange(
        docs.select_columns([id_col, text_col])
            .map_batches(explode, batch_format="pyarrow"),
        attach_ctx).materialize()

    # bounded pull: N1+(··) = Σ nf1 over distinct w1 (1 partial row/block)
    def b_partial(b: pd.DataFrame) -> pd.DataFrame:
        d = b.drop_duplicates("w1")
        return pd.DataFrame({"bt": [np.int64(d["nf1"].sum())]})

    bt = int(ex1.map_batches(b_partial, batch_format="pandas")
             .to_pandas()["bt"].sum())
    btf = np.float64(bt)
    dq = np.float64(discount)

    def attach_rest(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_part"]).copy()
        g["nb2"] = g.groupby("w2", sort=False)["w1"] \
            .transform("nunique").astype(np.int64)
        c12 = g.groupby(["w1", "w2"], sort=False)["cnt"] \
            .transform("sum").to_numpy(np.float64)
        c1 = g["c1"].to_numpy(np.float64)
        nf1 = g["nf1"].to_numpy(np.float64)
        nb2 = g["nb2"].to_numpy(np.float64)
        p = (c12 - dq) / c1 + dq * nf1 / c1 * (nb2 / btf)
        q = np.floor((-np.log(p)) * np.float64(scale) + 0.5).astype(np.int64)
        out = pd.DataFrame({id_col: g[id_col].to_numpy(),
                            "nb": g["cnt"].to_numpy(np.int64),
                            "sq": q * g["cnt"].to_numpy(np.int64)})
        r = out.groupby(id_col, sort=False).sum().reset_index()
        return _add_part(r, [id_col], num_buckets)

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        r = g.groupby(id_col, sort=False)[["nb", "sq"]].sum().reset_index()
        nb = r["nb"].to_numpy(np.int64)
        sq = r["sq"].to_numpy(np.int64)
        return pd.DataFrame({
            id_col: r[id_col].to_numpy(),
            "n_bigrams": nb, "sum_q": sq,
            "kn_nll": round_half_away(sq / (np.float64(scale) * nb), 6),
        })

    ex2 = bucket_exchange(ex1, attach_rest)
    return bucket_exchange(ex2, finalize, small_partials=True)


def naive_bayes_lang(docs: ray.data.Dataset, id_col: str = "doc_id",
                     text_col: str = "text", lang_col: str = "lang",
                     n_features: int = 4096, scale: int = 1024,
                     num_buckets: int = 64) -> ray.data.Dataset:
    """Multinomial naive-Bayes language classifier over hashed uni+bigram
    features (the hashing-trick NB of Weinberger et al. 2009), trained on
    the corpus's own ``lang`` labels and scored resubstitution-style —
    the classification sibling of the reference's per-class prob surface
    (learning.py:1073 class priors; prob_pixel_bloc classify.py).

    Model: P(h|l) = (C(l,h)+1) / (C(l)+V) with V = ``n_features`` and
    P(l) = N_l/N over ALL docs (empty-text docs keep their prior row).
    Every log is quantized to an integer q = floor(ln(p)·scale + 0.5)
    BEFORE any summation (lm_perplexity recipe), so per-doc scores are
    exact integer sums at any block structure:

        score(d,l) = pq_l + q0_l·nt_d + Σ_occ (q_{l,h} − q0_l)

    where q0_l is the unseen-pair log and the Σ runs only over (l,h)
    pairs present in the model. argmax breaks ties on ascending lang —
    both sides. ln args are single divisions of exact integers (ln
    bit-matches DuckDB on identical f64 inputs — CLAUDE.md).

    Scale shape: the model is bounded at V×L rows by construction (one
    bucketed exchange, counted driver pull ≤ V·L), priors are ≤ L rows
    per block; the broadcast is one (L,V) int64 matrix via ray.put.
    Scoring streams the corpus once, vectorized gather + groupby-sum."""
    from .exchange import bucket_exchange

    def feat_counts(b: pa.Table) -> pd.DataFrame:
        rows, h = _hashed_ngram_feats(b, text_col, n_features)
        if len(h) == 0:
            return pd.DataFrame({"lang": pd.Series([], dtype=object),
                                 "h": pd.Series([], dtype=np.int64),
                                 "c": pd.Series([], dtype=np.int64),
                                 "_part": pd.Series([], dtype=np.int32)})
        d = pd.DataFrame({
            "lang": b[lang_col].to_numpy(zero_copy_only=False)[rows],
            "h": h.astype(np.int64)})
        g = d.groupby(["lang", "h"], sort=False).size().reset_index(name="c")
        g["c"] = g["c"].astype(np.int64)
        g["_part"] = (g["h"].to_numpy(np.int64)
                      % num_buckets).astype(np.int32)
        return g

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop(columns=["_part"]).groupby(
            ["lang", "h"], sort=False, as_index=False)["c"].sum()

    model = bucket_exchange(
        docs.select_columns([text_col, lang_col]).map_batches(
            feat_counts, batch_format="pyarrow"),
        combine).to_pandas()  # counted bound: ≤ n_features × L rows

    def pri_partial(b: pa.Table) -> pd.DataFrame:
        d = pd.DataFrame(
            {"lang": b[lang_col].to_numpy(zero_copy_only=False)})
        g = d.groupby("lang", sort=False).size().reset_index(name="nd")
        g["nd"] = g["nd"].astype(np.int64)
        return g

    pri = docs.select_columns([lang_col]).map_batches(
        pri_partial, batch_format="pyarrow").to_pandas() \
        .groupby("lang", as_index=False)["nd"].sum()  # ≤ L rows per block
    langs = np.sort(pri["lang"].to_numpy(object))
    L = len(langs)
    lidx = {l: i for i, l in enumerate(langs)}
    nd = np.zeros(L, np.int64)
    nd[[lidx[l] for l in pri["lang"]]] = pri["nd"].to_numpy(np.int64)
    ndt = np.float64(nd.sum())
    cl = np.zeros(L, np.int64)
    mg = model.groupby("lang", as_index=False)["c"].sum()
    cl[[lidx[l] for l in mg["lang"]]] = mg["c"].to_numpy(np.int64)
    denom = (cl + np.int64(n_features)).astype(np.float64)
    q0 = np.floor(np.log(np.float64(1.0) / denom)
                  * np.float64(scale) + 0.5).astype(np.int64)
    pq = np.floor(np.log(nd.astype(np.float64) / ndt)
                  * np.float64(scale) + 0.5).astype(np.int64)
    qmat = np.tile(q0[:, None], (1, n_features))
    li = np.asarray([lidx[l] for l in model["lang"]], np.int64)
    hv = model["h"].to_numpy(np.int64)
    cv = model["c"].to_numpy(np.float64)
    qmat[li, hv] = np.floor(
        np.log((cv + 1.0) / denom[li]) * np.float64(scale) + 0.5
    ).astype(np.int64)
    bref = ray.put((qmat, q0, pq, langs))

    def score(b: pa.Table) -> pd.DataFrame:
        qm, q0v, pqv, lg = ray.get(bref)
        rows, h = _hashed_ngram_feats(b, text_col, n_features)
        n = b.num_rows
        acc = np.tile(pqv, (n, 1)).astype(np.int64)  # (n, L)
        nt = np.zeros(n, np.int64)
        if len(h):
            np.add.at(nt, rows, 1)
            per = qm[:, h].T  # (n_occ, L)
            occ = pd.DataFrame(per)
            occ["_r"] = rows
            summed = occ.groupby("_r", sort=False).sum()
            acc[summed.index.to_numpy(np.int64)] += \
                summed.to_numpy(np.int64)
        # docs with zero features keep score = prior only
        pred_i = np.argmax(acc, axis=1)  # ties → lowest index = asc lang
        out = pd.DataFrame({
            id_col: b[id_col].to_numpy(),
            "true_lang": b[lang_col].to_numpy(zero_copy_only=False),
            "pred_lang": lg[pred_i],
            "score_q": acc[np.arange(n), pred_i].astype(np.int64),
            "n_feats": nt})
        return out

    return docs.select_columns([id_col, text_col, lang_col]).map_batches(
        score, batch_format="pyarrow")


def classification_report(preds: ray.data.Dataset,
                          true_col: str = "true_lang",
                          pred_col: str = "pred_lang") -> ray.data.Dataset:
    """Per-class confusion metrics over a (true, pred) prediction table:
    tp / n_true / n_pred plus precision, recall and F1 — each restated
    as ONE division of exact integers (F1 = 2·tp/(n_pred + n_true), the
    harmonic-mean identity), so there is no multi-op float chain to
    drift. Classes with zero predictions get precision 0.0 by
    convention (sklearn's zero_division=0).

    Scale shape: per-block (true, pred) count partials — the confusion
    table is bounded at L² rows by construction — then one single-bucket
    exchange finalizes."""
    from ..functions.rounding import round_half_away
    from .exchange import bucket_exchange

    def partial(b: pa.Table) -> pd.DataFrame:
        d = pd.DataFrame({
            "t": b[true_col].to_numpy(zero_copy_only=False),
            "p": b[pred_col].to_numpy(zero_copy_only=False)})
        g = d.groupby(["t", "p"], sort=False).size().reset_index(name="c")
        g["c"] = g["c"].astype(np.int64)
        g["_part"] = np.zeros(len(g), np.int32)  # bounded L² rows total
        return g

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        ct = g.drop(columns=["_part"]).groupby(
            ["t", "p"], as_index=False)["c"].sum()
        langs = np.sort(np.unique(ct["t"].to_numpy(object)))
        n_true = ct.groupby("t")["c"].sum()
        n_pred = ct.groupby("p")["c"].sum()
        diag = ct[ct["t"] == ct["p"]].set_index("t")["c"]
        tp = np.asarray([int(diag.get(l, 0)) for l in langs], np.int64)
        nt = np.asarray([int(n_true.get(l, 0)) for l in langs], np.int64)
        npd = np.asarray([int(n_pred.get(l, 0)) for l in langs], np.int64)
        prec = np.where(npd > 0, tp / np.maximum(npd, 1).astype(np.float64),
                        0.0)
        rec = tp / nt.astype(np.float64)
        f1 = (2 * tp) / (npd + nt).astype(np.float64)
        return pd.DataFrame({
            "lang": langs, "n_true": nt, "n_pred": npd, "tp": tp,
            "prec_r": round_half_away(prec, 6),
            "rec_r": round_half_away(rec, 6),
            "f1_r": round_half_away(f1, 6)})

    return bucket_exchange(
        preds.select_columns([true_col, pred_col]).map_batches(
            partial, batch_format="pyarrow"),
        finalize, small_partials=True)


def cohens_kappa(preds: ray.data.Dataset,
                 true_col: str = "true_lang",
                 pred_col: str = "pred_lang") -> ray.data.Dataset:
    """Cohen's kappa inter-rater agreement (Cohen 1960) between the true
    and predicted labels, restated as ONE division of exact integers:

        κ = (N·Σ_l tp_l − Σ_l n_true_l·n_pred_l)
            / (N² − Σ_l n_true_l·n_pred_l)

    (the po/pe form multiplied through by N²). One row out:
    (n_docs, agree, pe_num, kappa_r).

    Scale shape: the classification_report partials (bounded L² rows),
    single-bucket finalize."""
    from ..functions.rounding import round_half_away
    from .exchange import bucket_exchange

    def partial(b: pa.Table) -> pd.DataFrame:
        d = pd.DataFrame({
            "t": b[true_col].to_numpy(zero_copy_only=False),
            "p": b[pred_col].to_numpy(zero_copy_only=False)})
        g = d.groupby(["t", "p"], sort=False).size().reset_index(name="c")
        g["c"] = g["c"].astype(np.int64)
        g["_part"] = np.zeros(len(g), np.int32)
        return g

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        ct = g.drop(columns=["_part"]).groupby(
            ["t", "p"], as_index=False)["c"].sum()
        n = int(ct["c"].sum())
        agree = int(ct.loc[ct["t"] == ct["p"], "c"].sum())
        nt = ct.groupby("t")["c"].sum()
        npd = ct.groupby("p")["c"].sum()
        pe_num = int(sum(int(nt.get(l, 0)) * int(npd.get(l, 0))
                         for l in nt.index.union(npd.index)))
        den = n * n - pe_num
        k = (np.float64(n * agree - pe_num) / np.float64(den)) \
            if den else 0.0
        return pd.DataFrame({
            "n_docs": pd.Series([n], dtype=np.int64),
            "agree": pd.Series([agree], dtype=np.int64),
            "pe_num": pd.Series([pe_num], dtype=np.int64),
            "kappa_r": pd.Series([round_half_away(float(k), 6)],
                                 dtype=np.float64)})

    return bucket_exchange(
        preds.select_columns([true_col, pred_col]).map_batches(
            partial, batch_format="pyarrow"),
        finalize, small_partials=True)


def readability_docs(docs: ray.data.Dataset, id_col: str = "doc_id",
                     text_col: str = "text") -> ray.data.Dataset:
    """Flesch-Kincaid grade-level readability per document (Kincaid et
    al. 1975) — the classic quality-filter feature next to
    quality_scores/char_entropy (LLM-pipeline extension; reference
    analogue is the scalar text-metric family, SURVEY §2.8). Heuristic
    counts, identical regex both sides: words = ``\\S+`` runs,
    sentences = ``[.!?]+`` runs (clamped >= 1), syllables = vowel-group
    runs ``[aeiouyAEIOUY]+`` over the whole text (tokens without a
    vowel contribute 0 — documented simplification of the per-word
    max(1,.) convention). grade = 0.39 W/S + 11.8 V/W − 15.59 is
    computed as ONE division of exact int64 products
    (39·W·W' + 1180·V·S' − 1559·W'·S') / (100·W'·S') with
    W' = max(W,1), S' = max(S,1), so the f64 value is bit-identical to
    the SQL twin's CAST/CAST divide and the final ROUND can never
    tie-split. Map-only, vectorized str.count — no shuffle."""
    from ..functions.rounding import round_half_away

    def fn(b: pa.Table) -> pd.DataFrame:
        t = b[text_col].to_pandas()
        W = t.str.count(r"\S+").to_numpy(np.int64)
        S = t.str.count(r"[.!?]+").to_numpy(np.int64)
        V = t.str.count(r"[aeiouyAEIOUY]+").to_numpy(np.int64)
        Wc = np.maximum(W, 1)
        Sc = np.maximum(S, 1)
        num = 39 * W * Wc + 1180 * V * Sc - 1559 * Wc * Sc
        den = 100 * Wc * Sc
        grade = num.astype(np.float64) / den.astype(np.float64)
        return pd.DataFrame({id_col: b[id_col].to_numpy(),
                             "n_words": W, "n_sents": S, "n_syll": V,
                             "fk_grade_r": round_half_away(grade, 4)})

    return docs.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow")


def _lq1024(n: np.ndarray) -> np.ndarray:
    """Exact-integer log2 approximation on a 1/1024 grid: msb index plus
    the linear interpolation between consecutive powers of two —
    lq(n) = 1024*(b-1) + (n - 2^(b-1))*1024 // 2^(b-1), b = bit_length.
    Pure int64 (n < 2^53), identical to the SQL twin's powers-table
    form; no transcendental ever touches the oracle."""
    n = n.astype(np.int64)
    # bit_length exactly, via binary-search shifts (no float path):
    bl = np.zeros(len(n), np.int64)
    m = n.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        step = m >= (np.int64(1) << shift)
        bl += np.where(step, shift, 0)
        m = np.where(step, m >> shift, m)
    bl += 1  # bit_length of n >= 1
    p = np.int64(1) << (bl - 1)
    return 1024 * (bl - 1) + (n - p) * 1024 // p


def zipf_fit_docs(docs: ray.data.Dataset, k: int = 100,
                  text_col: str = "text",
                  num_buckets: int = 64) -> ray.data.Dataset:
    """Zipf's-law fit of the corpus token frequency spectrum: top-``k``
    tokens by count (ties to lexicographically smaller), each mapped to
    the EXACT integer 1/1024-grid log2 (_lq1024 — msb + linear
    interpolation, no transcendental), and the least-squares slope of
    lq(cnt) on lq(rank) computed from exact integer sums with ONE f64
    division (raw, unrounded — bit-identical both sides, the gbm gain_f
    pattern). Slope ~ -1024/1024 = -1 for Zipfian text; emitted as a
    constant column beside the per-rank rows.

    Scale shape: per-block token-count partials, one token-hash
    bucketed exchange, per-bucket top-k candidate selection (a global
    top-k is a subset of the union of per-bucket top-ks since buckets
    partition tokens), driver merge of <= num_buckets*k candidate
    rows."""
    import pyarrow.compute as pc

    from ..functions.hashing import fnv1a64, splitmix64
    from .exchange import bucket_exchange

    def explode(b: pa.Table) -> pd.DataFrame:
        t = b[text_col]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        wl = pc.split_pattern(t, " ")
        d = pd.DataFrame({"tok": wl.values.to_pandas().to_numpy(object)})
        d = d[d["tok"].str.len() > 0]
        g = d.groupby("tok", sort=False).size().reset_index(name="c")
        g["c"] = g["c"].astype(np.int64)
        old = np.seterr(over="ignore")
        try:
            g["_part"] = (splitmix64(fnv1a64(g["tok"].to_numpy(object)))
                          % np.uint64(num_buckets)).astype(np.int32)
        finally:
            np.seterr(**old)
        return g

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        t = g.drop(columns=["_part"]).groupby(
            "tok", as_index=False)["c"].sum()
        t["c"] = t["c"].astype(np.int64)
        return t.sort_values(["c", "tok"], ascending=[False, True],
                             kind="mergesort").head(k)

    cand = bucket_exchange(
        docs.select_columns([text_col]).map_batches(
            explode, batch_format="pyarrow"),
        bucket_topk).to_pandas()
    top = cand.sort_values(["c", "tok"], ascending=[False, True],
                           kind="mergesort").head(k).reset_index(drop=True)
    ranks = np.arange(1, len(top) + 1, dtype=np.int64)
    cnts = top["c"].to_numpy(np.int64)
    x = _lq1024(ranks)
    y = _lq1024(cnts)
    n = len(top)
    sx, sy = int(x.sum()), int(y.sum())
    sxy = int((x * y).sum())
    sxx = int((x * x).sum())
    num = n * sxy - sx * sy
    den = n * sxx - sx * sx
    assert abs(num) < 2 ** 62 and 0 < den < 2 ** 62
    slope = float(num) / float(den)
    return ray.data.from_pandas(pd.DataFrame({
        "rank": ranks, "token": top["tok"].to_numpy(object),
        "cnt": cnts, "lq_rank": x, "lq_cnt": y,
        "slope_f": np.full(n, slope, np.float64)}))


def g2_collocations(docs: ray.data.Dataset, text_col: str = "text",
                    min_count: int = 5, k: int = 50,
                    num_buckets: int = 64) -> ray.data.Dataset:
    """Top-k log-likelihood-ratio collocations (Dunning 1993) over
    adjacent-token bigrams — the statistically sound sibling of
    pmi_bigrams (PMI over-ranks rare pairs; G² doesn't). The 2×2 table
    per bigram (a, b) uses positional margins: R = #bigrams with first
    token a, C = #bigrams with second token b, N = total bigrams.

    Exact-integer scoring (no transcendental near the oracle):
    ``score_q = Σ_ij O_ij · (lq1024(O_ij·N) − lq1024(R_i·C_j))`` — the
    1/1024-grid integer log2 (`_lq1024`), so score_q ∝ G²·1024/(2·ln 2)
    and is an exact int64 both sides (operands ≤ N² < 2^53). Ranking by
    (score_q DESC, w1, w2) can never tie-split.

    Scale shape: per-block pre-aggregated bigram partials; exchange 1
    buckets on hash(w1) — the combiner both sums global pair counts AND
    computes the first-position margin with one vectorized transform
    (every bigram of a given w1 co-locates, so the margin is final);
    exchange 2 does the same on hash(w2); the min_count filter applies
    AFTER margins (margins must count all bigrams). Driver sees only the
    global top-k."""
    import pyarrow.compute as pc

    from ..functions.hashing import fnv1a64, splitmix64
    from .exchange import bucket_exchange

    def _tok_part(tok: np.ndarray) -> np.ndarray:
        old = np.seterr(over="ignore")
        try:
            return (splitmix64(fnv1a64(tok.astype(object)))
                    % np.uint64(num_buckets)).astype(np.int32)
        finally:
            np.seterr(**old)

    def big_part(b: pa.Table) -> pd.DataFrame:
        t = b[text_col]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        wl = pc.split_pattern(t, " ")
        vals = wl.values.to_pandas().to_numpy(object)
        off = np.asarray(wl.offsets, np.int64)
        doc = np.repeat(np.arange(len(off) - 1), off[1:] - off[:-1])
        keep = np.char.str_len(vals.astype(str)) > 0
        vals, doc = vals[keep], doc[keep]
        if len(vals) < 2:
            return pd.DataFrame({"w1": pd.Series([], dtype=object),
                                 "w2": pd.Series([], dtype=object),
                                 "cab": pd.Series([], dtype=np.int64),
                                 "_part": pd.Series([], dtype=np.int32)})
        adj = doc[1:] == doc[:-1]
        g = (pd.DataFrame({"w1": vals[:-1][adj], "w2": vals[1:][adj]})
             .groupby(["w1", "w2"], sort=False).size().reset_index(name="cab"))
        g["cab"] = g["cab"].astype(np.int64)
        g["_part"] = _tok_part(g["w1"].to_numpy())
        return g

    def margin_r(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.drop(columns=["_part"])
             .groupby(["w1", "w2"], sort=False, as_index=False)["cab"].sum())
        g["cab"] = g["cab"].astype(np.int64)
        g["r"] = g.groupby("w1", sort=False)["cab"].transform("sum") \
            .to_numpy(np.int64)
        g["_part"] = _tok_part(g["w2"].to_numpy())
        return g

    def margin_c(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_part"]).copy()
        g["c"] = g.groupby("w2", sort=False)["cab"].transform("sum") \
            .to_numpy(np.int64)
        return g

    parted = docs.select_columns([text_col]).map_batches(
        big_part, batch_format="pyarrow")
    withc = bucket_exchange(bucket_exchange(parted, margin_r), margin_c) \
        .materialize()
    n = int(withc.sum("cab"))

    def score(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["cab"].to_numpy(np.int64) >= min_count]
        cab = b["cab"].to_numpy(np.int64)
        r = b["r"].to_numpy(np.int64)
        c = b["c"].to_numpy(np.int64)
        o = [cab, r - cab, c - cab, np.int64(n) - r - c + cab]
        e = [r * c, r * (n - c), (n - r) * c, (n - r) * (n - c)]
        sq = np.zeros(len(b), np.int64)
        for oi, ei in zip(o, e):
            ok = (oi > 0) & (ei > 0)
            term = np.zeros(len(b), np.int64)
            if ok.any():
                term[ok] = oi[ok] * (_lq1024(oi[ok] * np.int64(n))
                                     - _lq1024(ei[ok]))
            sq += term
        return pd.DataFrame({
            "w1": b["w1"].to_numpy(object), "w2": b["w2"].to_numpy(object),
            "pair_count": cab, "r_w1": r, "c_w2": c, "score_q": sq})

    return withc.map_batches(score, batch_format="pandas").sort(
        ["score_q", "w1", "w2"], descending=[True, False, False]).limit(k)


def rake_keywords(docs: ray.data.Dataset, text_col: str = "text",
                  k: int = 50, min_count: int = 2,
                  num_buckets: int = 64) -> ray.data.Dataset:
    """RAKE keyword extraction (Rose, Engel, Cramer & Cowley 2010) over
    the corpus: candidate phrases are maximal runs of non-stopword
    tokens (the shared ``functions.textproc.STOPWORDS`` delimiter set),
    word score = deg/freq with deg(w) = Σ over occurrences of the
    containing phrase's length, and phrase score = Σ word scores. The
    ratio is kept exact-integer as ``wscore_q = deg·1024 // freq``
    (floor division both sides — no float ratio ever forms), so the
    phrase score is an exact int64 sum and (score_q DESC, phrase) top-k
    can't tie-split.

    Scale shape: phrase/word partials pre-aggregate per block; one
    word-keyed exchange finalizes word scores; phrase rows explode into
    per-position word halves that union-tag join the word scores in a
    second exchange (unbounded vocabulary — never a broadcast dict);
    a third phrase-keyed exchange sums. Driver sees the top-k only."""
    import pyarrow.compute as pc

    from ..functions.hashing import fnv1a64, splitmix64
    from ..functions.textproc import STOPWORDS
    from .exchange import bucket_exchange

    stop = frozenset(STOPWORDS)

    def _tok_part(tok: np.ndarray) -> np.ndarray:
        old = np.seterr(over="ignore")
        try:
            return (splitmix64(fnv1a64(tok.astype(object)))
                    % np.uint64(num_buckets)).astype(np.int32)
        finally:
            np.seterr(**old)

    def _runs(b: pa.Table) -> pd.DataFrame:
        """(word, run_id, run_len, phrase) rows for every candidate-run
        position in the block — one vectorized pass, no per-doc loop."""
        t = b[text_col]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        wl = pc.split_pattern(t, " ")
        vals = wl.values.to_pandas().to_numpy(object)
        off = np.asarray(wl.offsets, np.int64)
        doc = np.repeat(np.arange(len(off) - 1), off[1:] - off[:-1])
        keep = np.char.str_len(vals.astype(str)) > 0
        vals, doc = vals[keep], doc[keep]
        is_stop = np.isin(vals, list(stop))
        new_doc = np.concatenate([[True], doc[1:] != doc[:-1]])
        run = np.cumsum(is_stop | new_doc)
        d = pd.DataFrame({"w": vals, "run": run})[~is_stop]
        if d.empty:
            return pd.DataFrame({"w": pd.Series([], dtype=object),
                                 "run": pd.Series([], dtype=np.int64),
                                 "rlen": pd.Series([], dtype=np.int64),
                                 "phrase": pd.Series([], dtype=object)})
        d["rlen"] = d.groupby("run", sort=False)["w"].transform("size") \
            .to_numpy(np.int64)
        d["phrase"] = d.groupby("run", sort=False)["w"] \
            .transform(lambda s: " ".join(s)).to_numpy(object)
        return d

    def word_part(b: pa.Table) -> pd.DataFrame:
        d = _runs(b)
        g = d.groupby("w", sort=False, as_index=False).agg(
            deg=("rlen", "sum"), freq=("rlen", "size"))
        g["deg"] = g["deg"].astype(np.int64)
        g["freq"] = g["freq"].astype(np.int64)
        g["_part"] = _tok_part(g["w"].to_numpy())
        return g

    def word_combine(g: pd.DataFrame) -> pd.DataFrame:
        o = g.drop(columns=["_part"]).groupby("w", sort=False,
                                              as_index=False).sum()
        o["deg"] = o["deg"].astype(np.int64)
        o["freq"] = o["freq"].astype(np.int64)
        o["wscore_q"] = (o["deg"] * np.int64(1024)) // o["freq"]
        return o

    wscore = bucket_exchange(
        docs.select_columns([text_col]).map_batches(
            word_part, batch_format="pyarrow"), word_combine)

    def phrase_part(b: pa.Table) -> pd.DataFrame:
        d = _runs(b)
        ph = d.drop_duplicates("run")
        g = ph.groupby("phrase", sort=False).size().reset_index(name="cnt")
        g["cnt"] = g["cnt"].astype(np.int64)
        g["_part"] = _tok_part(g["phrase"].to_numpy())
        return g

    pcnt = bucket_exchange(
        docs.select_columns([text_col]).map_batches(
            phrase_part, batch_format="pyarrow"),
        lambda g: g.drop(columns=["_part"]).groupby(
            "phrase", sort=False, as_index=False)["cnt"].sum()
        .astype({"cnt": np.int64}))

    def halves(b: pd.DataFrame) -> pd.DataFrame:
        ws = b["phrase"].str.split(" ")
        lens = ws.str.len().to_numpy(np.int64)
        d = pd.DataFrame({
            "jk": np.concatenate(ws.to_numpy(object)) if len(b) else
            np.array([], object),
            "phrase": np.repeat(b["phrase"].to_numpy(object), lens),
            "cnt": np.repeat(b["cnt"].to_numpy(np.int64), lens),
            "sq": np.zeros(int(lens.sum()), np.int64),
            "t": np.zeros(int(lens.sum()), np.int8)})
        d["_part"] = _tok_part(d["jk"].to_numpy())
        return d

    def look(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        empt = np.empty(n, object)
        empt.fill("")
        d = pd.DataFrame({
            "jk": b["w"].to_numpy(object), "phrase": empt,
            "cnt": np.zeros(n, np.int64),
            "sq": b["wscore_q"].to_numpy(np.int64),
            "t": np.ones(n, np.int8)})
        d["_part"] = _tok_part(d["jk"].to_numpy())
        return d

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        h = g[g["t"] == 0].drop(columns=["sq", "t", "_part"])
        lk = g.loc[g["t"] == 1, ["jk", "sq"]]
        m = h.merge(lk, on="jk", how="inner").drop(columns=["jk"])
        m["_part"] = _tok_part(m["phrase"].to_numpy())
        return m

    def total(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_part"])
        o = g.groupby("phrase", sort=False, as_index=False).agg(
            n_words=("sq", "size"), cnt=("cnt", "max"),
            score_q=("sq", "sum"))
        for c in ("n_words", "cnt", "score_q"):
            o[c] = o[c].astype(np.int64)
        return o[o["cnt"] >= min_count]

    joined = bucket_exchange(
        pcnt.map_batches(halves, batch_format="pandas").union(
            wscore.map_batches(look, batch_format="pandas")), attach)
    scored = bucket_exchange(joined, total)
    return scored.sort(["score_q", "phrase"],
                       descending=[True, False]).limit(k)


def sorted_neighborhood_docs(docs: ray.data.Dataset, window: int = 3,
                             key_len: int = 32, gram_len: int = 64,
                             num_buckets: int = 64) -> ray.data.Dataset:
    """Sorted-neighborhood blocking for near-duplicate candidate pairs
    (Hernández & Stolfo 1995, the merge/purge windowing every
    entity-resolution pipeline runs before expensive pairwise scoring) —
    the blocked variant that scales: records are hash-partitioned by a
    BLOCKING key (lang here; at corpus scale a key with ≥ cluster-width
    cardinality), sorted inside each block by a cheap sort key (the first
    ``key_len`` text chars, doc_id tiebreak), and only rank-gap ≤
    ``window`` neighbors are paired. Windows never cross blocks, so one
    bucketed exchange does the whole op — no global rank, no all-to-all.
    Pair score = number of DISTINCT char 3-grams of the first
    ``gram_len`` chars shared by both sides, computed as one fully
    vectorized (pairs × 62 × 62) byte-matrix compare per block — exact
    integers, trivially restated as DuckDB list_intersect."""
    from .exchange import bucket_exchange
    from ..functions.hashing import fnv1a64

    def part(b: pd.DataFrame) -> pd.DataFrame:
        old = np.seterr(over="ignore")
        try:
            h = fnv1a64(b["lang"].astype(str).to_numpy(object))
        finally:
            np.seterr(**old)
        return pd.DataFrame({
            "doc_id": b["doc_id"].to_numpy(np.int64),
            "lang": b["lang"].astype(str),
            "skey": b["text"].str.slice(0, key_len),
            "t64": b["text"].str.slice(0, gram_len),
            "_part": (h % np.uint64(num_buckets)).astype(np.int32)})

    def _tri(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
        """(codes, distinct-first-occurrence mask) — padded byte matrix."""
        n = len(texts)
        lens = texts.str.len().to_numpy(np.int64)
        pad = texts.str.pad(gram_len, side="right", fillchar="\x00")
        m = np.frombuffer("".join(pad).encode("ascii"),
                          np.uint8).reshape(n, gram_len).astype(np.int64)
        k = gram_len - 2
        codes = (m[:, :k] << 16) + (m[:, 1:k + 1] << 8) + m[:, 2:k + 2]
        valid = np.arange(k)[None, :] < np.maximum(lens - 2, 0)[:, None]
        codes = np.where(valid, codes, -1)
        eq = codes[:, :, None] == codes[:, None, :]
        dup = (eq & np.tril(np.ones((k, k), bool), -1)[None]).any(axis=2)
        return codes, valid & ~dup

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for _, fr in g.groupby("lang", sort=False):
            fr = fr.sort_values(["skey", "doc_id"],
                                kind="mergesort").reset_index(drop=True)
            n = len(fr)
            if n < 2:
                continue
            codes, dist = _tri(fr["t64"])
            ids = fr["doc_id"].to_numpy(np.int64)
            ai, bi = [], []
            for d in range(1, window + 1):
                ai.append(np.arange(0, max(n - d, 0)))
                bi.append(np.arange(d, n))
            ai = np.concatenate(ai)
            bi = np.concatenate(bi)
            ta, tb = codes[ai], codes[bi]
            shared = ((ta[:, :, None] == tb[:, None, :]).any(axis=2)
                      & dist[ai]).sum(axis=1)
            frames.append(pd.DataFrame({
                "lang": fr["lang"].iloc[0], "id_a": ids[ai],
                "id_b": ids[bi], "gap": (bi - ai).astype(np.int64),
                "n_shared": shared.astype(np.int64)}))
        if not frames:
            return pd.DataFrame({"lang": pd.Series([], dtype=object),
                                 "id_a": pd.Series([], dtype=np.int64),
                                 "id_b": pd.Series([], dtype=np.int64),
                                 "gap": pd.Series([], dtype=np.int64),
                                 "n_shared": pd.Series([], dtype=np.int64)})
        return pd.concat(frames, ignore_index=True)

    return bucket_exchange(docs.map_batches(part, batch_format="pandas"),
                           pairs)


def rrf_fusion_docs(docs: ray.data.Dataset, embeddings: ray.data.Dataset,
                    queries: dict[int, list[str]] | None = None,
                    k_lists: int = 10, k_out: int = 10,
                    rrf_c: int = 60) -> ray.data.Dataset:
    """Hybrid-retrieval reciprocal-rank fusion (Cormack, Clarke &
    Büttcher 2009): fuse the BM25 lexical top-k and the embedding-cosine
    top-k per query with the INTEGER RRF surrogate
    score = Σ_lists floor(2^20 / (c + rank)) — exact both sides, no
    float ever near the oracle. Fusion query q pairs BM25_QUERIES[q]
    with the stock ANN query vector vec_id = 50·q (the % 50 == 0 probe
    fixture both retrieval oracles already use). Both input rankings
    are the existing distributed stages; the fusion itself touches only
    |Q|·k ranked rows — bounded by the query set BY DEFINITION, the one
    driver pull that never scales with the corpus. Ids absent from a
    list carry rank −1 in the output."""
    from .knn import ann_bruteforce_topk

    if queries is None:
        from ..pipelines.querydefs import BM25_QUERIES
        queries = BM25_QUERIES

    bm = bm25_topk(docs, queries, k=k_lists).to_pandas()

    # stream-filter the probe vectors (fixture rows — tiny) map-side;
    # only |Q| rows reach the driver. ann_bruteforce_topk then broadcasts
    # Q and scans the embeddings corpus once, partial top-k per block.
    nq = len(queries)

    def pick_probes(t: pa.Table) -> pa.Table:
        vid = t["vec_id"].to_numpy()
        return t.filter(pa.array((vid % 50 == 0) & (vid // 50 < nq)))

    qt = pa.concat_tables(list(
        embeddings.map_batches(pick_probes, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")))
    order = np.argsort(qt["vec_id"].to_numpy())
    Q = np.stack([np.asarray(v, np.float64)
                  for v in qt["embedding"].to_pylist()])[order]
    co = ann_bruteforce_topk(embeddings, Q,
                             qt["vec_id"].to_numpy()[order], k=k_lists)

    bm = bm.rename(columns={"doc_id": "id", "rn": "r"})
    bm["src"] = 0
    co = co.rename(columns={"neighbor_id": "id", "rank": "r"}).copy()
    co["query_id"] = (co["query_id"].to_numpy(np.int64) // 50)
    co["src"] = 1
    u = pd.concat([bm[["query_id", "id", "r", "src"]],
                   co[["query_id", "id", "r", "src"]]], ignore_index=True)
    u["pts"] = (np.int64(1) << 20) // (rrf_c + u["r"].to_numpy(np.int64))
    g = u.groupby(["query_id", "id"], sort=False)["pts"].sum() \
        .reset_index(name="rrf_q")
    for src, col in ((0, "bm25_rank"), (1, "cos_rank")):
        m = u[u["src"] == src].set_index(["query_id", "id"])["r"]
        g[col] = m.reindex(pd.MultiIndex.from_frame(
            g[["query_id", "id"]])).fillna(-1).to_numpy(np.int64)
    g = g.sort_values(["query_id", "rrf_q", "id"],
                      ascending=[True, False, True], kind="mergesort")
    g["rn"] = g.groupby("query_id", sort=False).cumcount() + 1
    g = g[g["rn"] <= k_out]
    out = g[["query_id", "id", "rrf_q", "bm25_rank", "cos_rank",
             "rn"]].reset_index(drop=True)
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return ray.data.from_pandas(out)


_TR_Q = 20
_TR_BASE = (15 * (1 << _TR_Q)) // 100          # floor(0.15 · 2^20)


def _tr_bkt(toks: np.ndarray, num_buckets: int) -> np.ndarray:
    from ..functions.hashing import fnv1a64, splitmix64

    old = np.seterr(over="ignore")
    try:
        return (splitmix64(fnv1a64(toks.astype(object)))
                % np.uint64(num_buckets)).astype(np.int32)
    finally:
        np.seterr(**old)


def _textrank_local(e: pd.DataFrame, iters: int) -> pd.DataFrame:
    """Dense driver iteration on the counted-bound directed edge list
    (s, d, w, wt) — bit-identical to the distributed rounds (all ops are
    order-free integer sums and floor divisions)."""
    toks = np.unique(np.concatenate([e["s"].to_numpy(object),
                                     e["d"].to_numpy(object)]))
    idx = {t: i for i, t in enumerate(toks)}
    si = np.array([idx[t] for t in e["s"]], np.int64)
    di = np.array([idx[t] for t in e["d"]], np.int64)
    w = e["w"].to_numpy(np.int64)
    wt = e["wt"].to_numpy(np.int64)
    r = np.full(len(toks), np.int64(1) << _TR_Q, np.int64)
    for _ in range(iters):
        contrib = (w * r[si]) // wt
        acc = np.zeros(len(toks), np.int64)
        np.add.at(acc, di, contrib)
        r = _TR_BASE + (17 * acc) // 20
    return pd.DataFrame({"token": toks, "score_q": r})


def textrank_keywords_docs(docs: ray.data.Dataset, iters: int = 4,
                           k: int = 50, text_col: str = "text",
                           num_buckets: int = 64,
                           local_bound: int = 2_000_000) -> ray.data.Dataset:
    """TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank over
    the corpus word co-occurrence graph (adjacent-token edges, a ≠ b,
    undirected with co-occurrence-count weights), run as the INTEGER
    fixed-point recurrence r ← ⌊0.15·2^20⌋ + ⌊17·Σ_j ⌊w_ji·r_j / W_j⌋ / 20⌋
    for ``iters`` rounds (d = 0.85 = 17/20 exactly; no float anywhere),
    then the global top-``k`` tokens by (score DESC, token).

    Scale shape mirrors graph.pagerank_hosts: the tokenizer emits
    PRE-AGGREGATED per-block pair partials, one exchange sums undirected
    weights, a second (keyed on the source token hash) attaches each
    directed edge's out-weight W_j as a per-bucket transform. Under the
    counted ``local_bound`` the rounds run dense on the driver
    (bit-parity-tested against the distributed plan); above it each
    round is the tagged-union bucketed join + one destination-keyed
    exchange — contributions pre-summed per destination inside the
    bucket, so round traffic is O(distinct tokens per block), not
    O(edges)."""
    import pyarrow.compute as pc

    from .exchange import bucket_exchange

    def pair_partials(b: pa.Table) -> pd.DataFrame:
        t = b[text_col]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        wl = pc.split_pattern(t, " ")
        vals = wl.values.to_pandas().to_numpy(object)
        off = np.asarray(wl.offsets, np.int64)
        doc = np.repeat(np.arange(len(off) - 1), off[1:] - off[:-1])
        keep = np.char.str_len(vals.astype(str)) > 0
        vals, doc = vals[keep], doc[keep]
        adj = doc[:-1] == doc[1:]
        a, b2 = vals[:-1][adj], vals[1:][adj]
        ne = a != b2
        a, b2 = a[ne], b2[ne]
        lo = np.where(a < b2, a, b2)
        hi = np.where(a < b2, b2, a)
        d = pd.DataFrame({"u": lo, "v": hi}).groupby(
            ["u", "v"], sort=False).size().reset_index(name="w")
        d["w"] = d["w"].astype(np.int64)
        d["_part"] = _tr_bkt((d["u"].astype(str) + "\x00"
                              + d["v"].astype(str)).to_numpy(object),
                             num_buckets)
        return d

    def sum_und(g: pd.DataFrame) -> pd.DataFrame:
        u = g.drop(columns=["_part"]).groupby(
            ["u", "v"], sort=False, as_index=False)["w"].sum()
        both = pd.concat([
            u.rename(columns={"u": "s", "v": "d"}),
            u.rename(columns={"u": "d", "v": "s"})], ignore_index=True)
        both["_part"] = _tr_bkt(both["s"].to_numpy(object), num_buckets)
        return both[["s", "d", "w", "_part"]]

    def attach_wt(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_part"]).copy()
        g["wt"] = g.groupby("s", sort=False)["w"].transform("sum") \
            .astype(np.int64)
        return g

    edges = bucket_exchange(
        bucket_exchange(
            docs.map_batches(pair_partials, batch_format="pyarrow"),
            sum_und),
        attach_wt, key="_part").materialize()
    n_dir = edges.count()

    if n_dir <= local_bound:
        ranks = ray.data.from_pandas(
            _textrank_local(edges.to_pandas(), iters))
    else:
        def tag_edges(b: pd.DataFrame) -> pd.DataFrame:
            b = b[["s", "d", "w", "wt"]].copy()
            b["r"] = np.int64(0)
            b["t"] = np.int8(0)
            b["_jb"] = _tr_bkt(b["s"].to_numpy(object), num_buckets)
            return b

        def contribs(g: pd.DataFrame) -> pd.DataFrame:
            e = g[g["t"] == 0]
            rk = g[g["t"] == 1][["s", "r"]]
            m = e[["s", "d", "w", "wt"]].merge(rk, on="s", how="inner")
            c = (m["w"].to_numpy(np.int64) * m["r"].to_numpy(np.int64)) \
                // m["wt"].to_numpy(np.int64)
            p = pd.DataFrame({"tok": m["d"].to_numpy(object), "acc": c})
            p = p.groupby("tok", sort=False, as_index=False)["acc"].sum()
            p["_part"] = _tr_bkt(p["tok"].to_numpy(object), num_buckets)
            return p

        def new_ranks(g: pd.DataFrame) -> pd.DataFrame:
            s = g.drop(columns=["_part"]).groupby(
                "tok", sort=False, as_index=False)["acc"].sum()
            s["r"] = _TR_BASE + (17 * s["acc"].to_numpy(np.int64)) // 20
            return s[["tok", "r"]]

        tagged_edges = edges.map_batches(
            tag_edges, batch_format="pandas").materialize()
        nodes = bucket_exchange(
            edges.map_batches(
                lambda b: pd.DataFrame(
                    {"tok": pd.unique(b["s"]),
                     "_part": _tr_bkt(pd.unique(b["s"]).astype(object),
                                      num_buckets)}),
                batch_format="pandas"),
            lambda g: pd.DataFrame({"tok": pd.unique(g["tok"])})) \
            .materialize()
        ranks = nodes.map_batches(
            lambda b: pd.DataFrame({"tok": b["tok"].to_numpy(object),
                                    "r": np.int64(1 << _TR_Q)}),
            batch_format="pandas")
        zero = nodes.map_batches(
            lambda b: pd.DataFrame({"tok": b["tok"].to_numpy(object),
                                    "acc": np.int64(0),
                                    "_part": _tr_bkt(
                                        b["tok"].to_numpy(object),
                                        num_buckets)}),
            batch_format="pandas")
        for _ in range(iters):
            tagged_ranks = ranks.map_batches(
                lambda b: pd.DataFrame(
                    {"s": b["tok"].to_numpy(object), "d": "",
                     "w": np.int64(0), "wt": np.int64(0),
                     "r": b["r"].to_numpy(np.int64), "t": np.int8(1),
                     "_jb": _tr_bkt(b["tok"].to_numpy(object),
                                    num_buckets)}),
                batch_format="pandas")
            joined = bucket_exchange(tagged_edges.union(tagged_ranks),
                                     contribs, key="_jb")
            ranks = bucket_exchange(joined.union(zero), new_ranks)
        ranks = ranks.map_batches(
            lambda b: pd.DataFrame({"token": b["tok"].to_numpy(object),
                                    "score_q": b["r"].to_numpy(np.int64)}),
            batch_format="pandas")

    top = ranks.sort(["score_q", "token"], descending=[True, False]) \
        .limit(k).to_pandas()
    top["rn"] = np.arange(1, len(top) + 1, dtype=np.int64)
    return ray.data.from_pandas(top)


def code_switch_docs(docs: ray.data.Dataset, win: int = 16,
                     text_col: str = "text") -> ray.data.Dataset:
    """Windowed code-switch detection (the segment-level language scan a
    multilingual-corpus pipeline runs to catch mixed-language documents
    that a whole-doc language ID mislabels): tokens are whitespace-split,
    grouped into ``win``-token windows, each window language-identified
    with the SAME marker heuristic as functions/textproc.lang_id (shared
    _LANG_MARKERS — the two sides cannot drift), and per doc it reports
    window count, adjacent same-doc window pairs whose languages differ
    (both non-'und'), distinct non-'und' window languages, and the modal
    window language (ties → lexicographically smaller code). Map-only:
    every window of a document lives in its row's block, so the stage
    never shuffles."""
    from ..functions.textproc import lang_id

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        texts = b[text_col].reset_index(drop=True)
        ex = texts.str.split().explode().dropna()
        ex = ex[ex.str.len() > 0]
        doc = ex.index.to_numpy(np.int64)
        pos = pd.Series(np.arange(len(ex)), index=ex.index) \
            .groupby(level=0).cumcount().to_numpy(np.int64)
        wid = pos // win
        wt = pd.DataFrame({"doc": doc, "w": wid, "tok": ex.to_numpy(object)}) \
            .groupby(["doc", "w"], sort=True)["tok"] \
            .agg(" ".join).reset_index(name="txt")
        wt["lang"] = lang_id(wt["txt"]).to_numpy(object)
        wt = wt.sort_values(["doc", "w"], kind="mergesort")
        prev = wt.groupby("doc", sort=False)["lang"].shift(1)
        sw = ((wt["lang"] != prev) & (wt["lang"] != "und")
              & (prev != "und") & prev.notna())
        agg = wt.groupby("doc", sort=False).agg(
            n_windows=("w", "size"),
            n_switch=("w", lambda s: 0)).reset_index()
        agg["n_switch"] = sw.groupby(wt["doc"], sort=False).sum() \
            .reindex(agg["doc"]).to_numpy(np.int64)
        nl = wt[wt["lang"] != "und"].groupby("doc", sort=False)["lang"] \
            .nunique()
        agg["n_lang"] = nl.reindex(agg["doc"]).fillna(0) \
            .to_numpy(np.int64)
        mode = wt.groupby(["doc", "lang"], sort=False).size() \
            .reset_index(name="c") \
            .sort_values(["doc", "c", "lang"],
                         ascending=[True, False, True], kind="mergesort") \
            .drop_duplicates("doc").set_index("doc")["lang"]
        agg["main_lang"] = mode.reindex(agg["doc"]).to_numpy(object)
        out = pd.DataFrame({
            "doc_id": b["doc_id"].to_numpy(np.int64)[
                agg["doc"].to_numpy(np.int64)],
            "n_windows": agg["n_windows"].to_numpy(np.int64),
            "n_switch": agg["n_switch"].to_numpy(np.int64),
            "n_lang": agg["n_lang"].to_numpy(np.int64),
            "main_lang": agg["main_lang"].astype(object)})
        return out

    return docs.map_batches(fn, batch_format="pandas")


def _or_by_key(keys: np.ndarray, vals: np.ndarray):
    """(unique keys, per-key bitwise OR) via one sort + reduceat — the
    vectorized replacement for a per-key Python reduce."""
    if not len(keys):
        return keys, vals
    order = np.argsort(keys, kind="mergesort")
    ks, vs = keys[order], vals[order]
    first = np.empty(len(ks), bool)
    first[0] = True
    first[1:] = ks[1:] != ks[:-1]
    idx = np.nonzero(first)[0]
    return ks[idx], np.bitwise_or.reduceat(vs, idx)


def source_overlap_docs(docs: ray.data.Dataset, gram: int = 8,
                        num_buckets: int = 64) -> ray.data.Dataset:
    """Pairwise cross-source n-gram contamination matrix (the corpus
    forensic every multi-source training mix needs: how much verbatim
    text do source i and source j share?): each distinct ``gram``-token
    shingle maps to the BITMASK of sources containing it (sources are a
    small fixed domain, so one int64 carries the whole set), masks OR
    together distributively through one shingle-keyed exchange, and the
    (i, j) overlap counts fall out of a popcount-style scan of the mask
    histogram — the driver sees one row per distinct mask value (≤ 2^20
    for 20 sources), never a shingle. Output: one row per unordered
    source pair (i < j) with the count of distinct shared shingles."""
    import pyarrow.compute as pc

    from ..functions.hashing import fnv1a64, splitmix64
    from .exchange import bucket_exchange

    def shingle_masks(b: pa.Table) -> pd.DataFrame:
        t = b["text"]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        src = b["source"].to_pandas().str.removeprefix("src") \
            .astype(np.int64).to_numpy()
        wl = pc.split_pattern(t, " ")
        vals = wl.values.to_pandas().to_numpy(object)
        off = np.asarray(wl.offsets, np.int64)
        doc = np.repeat(np.arange(len(off) - 1), off[1:] - off[:-1])
        keep = np.char.str_len(vals.astype(str)) > 0
        vals, doc = vals[keep], doc[keep]
        n = len(vals)
        if n < gram:
            return pd.DataFrame({"g": pd.Series([], dtype=np.uint64),
                                 "m": pd.Series([], dtype=np.int64),
                                 "_part": pd.Series([], dtype=np.int32)})
        same = doc[:n - gram + 1] == doc[gram - 1:]
        joined = vals[:n - gram + 1].astype(object)
        for i in range(1, gram):
            joined = joined + " " + vals[i:n - gram + 1 + i].astype(object)
        old = np.seterr(over="ignore")
        try:
            gh = splitmix64(fnv1a64(joined[same]))
        finally:
            np.seterr(**old)
        mask = (np.int64(1) << src[doc[:n - gram + 1][same]]).astype(np.int64)
        gh2, red = _or_by_key(gh, mask)
        d = pd.DataFrame({"g": gh2, "m": red})
        d["_part"] = (d["g"].to_numpy(np.uint64)
                      % np.uint64(num_buckets)).astype(np.int32)
        return d

    def or_masks(g: pd.DataFrame) -> pd.DataFrame:
        gh2, red = _or_by_key(g["g"].to_numpy(np.uint64),
                              g["m"].to_numpy(np.int64))
        d = pd.DataFrame({"g": gh2, "m": red})
        out = d.groupby("m", sort=False).size().reset_index(name="c")
        out["m"] = out["m"].astype(np.int64)
        out["c"] = out["c"].astype(np.int64)
        return out

    hist = bucket_exchange(
        docs.map_batches(shingle_masks, batch_format="pyarrow"),
        or_masks).to_pandas()
    hist = hist.groupby("m", as_index=False)["c"].sum()
    masks = hist["m"].to_numpy(np.int64)
    cnts = hist["c"].to_numpy(np.int64)
    n_src = int(masks.max()).bit_length() if len(masks) else 0
    rows = []
    for i in range(n_src):
        for j in range(i + 1, n_src):
            both = ((masks >> i) & 1) & ((masks >> j) & 1)
            rows.append({"src_a": i, "src_b": j,
                         "n_shared": int((cnts * both).sum())})
    out = pd.DataFrame(rows)
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return ray.data.from_pandas(out)


def oov_rate_docs(docs: ray.data.Dataset, vocab_size: int = 256,
                  num_buckets: int = 64) -> ray.data.Dataset:
    """Vocabulary-coverage / OOV-rate screen (the tokenizer-fit check a
    training-data pipeline runs before committing to a vocab: what
    fraction of each document falls outside the top-V corpus tokens?):
    pass 1 counts tokens through one token-keyed exchange and takes the
    global top-``vocab_size`` (count DESC, token ASC — buckets partition
    tokens, so the union of per-bucket top-V contains the global top-V
    and the driver merge is <= buckets*V rows); pass 2 broadcasts the
    vocab as a frozenset and scores every document vectorized (exploded
    isin, no per-row Python). Output per doc: token count, OOV count,
    and the exact integer OOV permille (floor)."""
    import pyarrow.compute as pc

    from .exchange import bucket_exchange
    from ..functions.hashing import fnv1a64, splitmix64

    def tok_counts(b: pa.Table) -> pd.DataFrame:
        t = b["text"]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        wl = pc.split_pattern(t, " ")
        vals = wl.values.to_pandas()
        vals = vals[vals.str.len() > 0]
        c = vals.groupby(vals).size().reset_index()
        c.columns = ["tok", "cnt"]
        c["cnt"] = c["cnt"].astype(np.int64)
        old = np.seterr(over="ignore")
        try:
            c["_part"] = (splitmix64(fnv1a64(c["tok"].to_numpy(object)))
                          % np.uint64(num_buckets)).astype(np.int32)
        finally:
            np.seterr(**old)
        return c

    def bucket_top(g: pd.DataFrame) -> pd.DataFrame:
        c = g.drop(columns=["_part"]).groupby("tok", as_index=False)[
            "cnt"].sum()
        c["cnt"] = c["cnt"].astype(np.int64)
        return c.sort_values(["cnt", "tok"], ascending=[False, True],
                             kind="mergesort").head(vocab_size)

    tops = bucket_exchange(
        docs.map_batches(tok_counts, batch_format="pyarrow"),
        bucket_top).to_pandas() \
        .sort_values(["cnt", "tok"], ascending=[False, True],
                     kind="mergesort").head(vocab_size)
    vocab = ray.put(frozenset(tops["tok"].tolist()))

    def score(b: pa.Table) -> pd.DataFrame:
        vs = ray.get(vocab)
        t = b["text"]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        wl = pc.split_pattern(t, " ")
        vals = wl.values.to_pandas()
        off = np.asarray(wl.offsets, np.int64)
        doc = np.repeat(np.arange(len(off) - 1), off[1:] - off[:-1])
        keep = vals.str.len() > 0
        vals, doc = vals[keep.to_numpy()], doc[keep.to_numpy()]
        oov = ~vals.isin(vs)
        n_tok = np.bincount(doc, minlength=len(b)).astype(np.int64)
        n_oov = np.bincount(doc, weights=oov.to_numpy(np.float64),
                            minlength=len(b)).astype(np.int64)
        return pd.DataFrame({
            "doc_id": b["doc_id"].to_numpy().astype(np.int64),
            "n_tokens": n_tok,
            "n_oov": n_oov,
            "oov_permille": (n_oov * 1000) // np.maximum(n_tok, 1)})

    return docs.map_batches(score, batch_format="pyarrow")


_POW2 = np.concatenate([[0], 2 ** np.arange(63, dtype=np.int64)])


def _bit_len(g: np.ndarray) -> np.ndarray:
    """Exact integer bit length (1 + floor(log2 g)) for g >= 1 — a
    searchsorted over the power-of-two thresholds, never float log2
    (whose boundary ulps misbin exact powers of two)."""
    return np.searchsorted(_POW2, g, side="right").astype(np.int64) - 1


def postings_varint_docs(docs: ray.data.Dataset,
                         num_buckets: int = 64) -> ray.data.Dataset:
    """Posting-list compression planning (the index-layout stat an
    inverted-index builder computes before choosing an encoding: how many
    bytes does each term's delta+varint posting list cost vs fixed
    64-bit?): per term the doc ids sort ascending, gaps are
    first_doc + 1 then successive deltas (always >= 1 — doc ids are
    distinct), and the LEB128 varint cost of a gap is
    ceil(bit_length/7) bytes. One term-keyed exchange; everything after
    the shuffle is one vectorized sorted scan per bucket. Output per
    term: document frequency, first/last doc id, varint bytes, fixed
    bytes (8*df)."""
    import pyarrow.compute as pc

    from .exchange import bucket_exchange
    from ..functions.hashing import fnv1a64, splitmix64

    def pairs(b: pa.Table) -> pd.DataFrame:
        t = b["text"]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        wl = pc.split_pattern(t, " ")
        vals = wl.values.to_pandas()
        off = np.asarray(wl.offsets, np.int64)
        doc = np.repeat(b["doc_id"].to_numpy().astype(np.int64),
                        off[1:] - off[:-1])
        keep = (vals.str.len() > 0).to_numpy()
        d = pd.DataFrame({"tok": vals[keep].to_numpy(object),
                          "doc_id": doc[keep]}).drop_duplicates()
        old = np.seterr(over="ignore")
        try:
            d["_part"] = (splitmix64(fnv1a64(d["tok"].to_numpy(object)))
                          % np.uint64(num_buckets)).astype(np.int32)
        finally:
            np.seterr(**old)
        return d

    def encode(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_part"]).drop_duplicates(["tok", "doc_id"]) \
            .sort_values(["tok", "doc_id"], kind="mergesort")
        tok = g["tok"].to_numpy(object)
        did = g["doc_id"].to_numpy(np.int64)
        first = np.empty(len(g), bool)
        if len(g):
            first[0] = True
            first[1:] = tok[1:] != tok[:-1]
        gap = np.empty(len(g), np.int64)
        gap[first] = did[first] + 1
        gap[~first] = did[~first] - np.roll(did, 1)[~first]
        vb = (_bit_len(gap) + 6) // 7
        s = pd.DataFrame({"term": tok, "doc_id": did, "vb": vb})
        out = s.groupby("term", sort=False).agg(
            df=("doc_id", "size"), first_doc=("doc_id", "min"),
            last_doc=("doc_id", "max"),
            bytes_varint=("vb", "sum")).reset_index()
        for c in ("df", "first_doc", "last_doc", "bytes_varint"):
            out[c] = out[c].astype(np.int64)
        out["bytes_fixed"] = (8 * out["df"]).astype(np.int64)
        return out

    return bucket_exchange(
        docs.map_batches(pairs, batch_format="pyarrow"), encode)


def soundex_block_parts(parts: ray.data.Dataset,
                        num_buckets: int = 64) -> ray.data.Dataset:
    """Phonetic blocking over part names (the Soundex pass of classic
    record linkage — the blocking key Fellegi-Sunter pipelines use before
    pair scoring; complements the trigram sorted-neighborhood stage):
    counts group by the name's first token through one token-keyed
    exchange, the combiner stamps each distinct token with its American
    Soundex code (functions/textproc.soundex — vectorized byte-matrix
    sweep), and the output is one row per distinct token with its code
    and part count."""
    from .exchange import bucket_exchange
    from ..functions.hashing import fnv1a64, splitmix64
    from ..functions.textproc import soundex

    def prep(b: pa.Table) -> pd.DataFrame:
        w = b["p_name"].to_pandas().str.split(" ").str[0].rename("word")
        c = w.groupby(w).size().reset_index(name="n_parts")
        c["n_parts"] = c["n_parts"].astype(np.int64)
        old = np.seterr(over="ignore")
        try:
            c["_part"] = (splitmix64(fnv1a64(c["word"].to_numpy(object)))
                          % np.uint64(num_buckets)).astype(np.int32)
        finally:
            np.seterr(**old)
        return c

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        c = g.drop(columns=["_part"]).groupby("word", as_index=False)[
            "n_parts"].sum()
        c["n_parts"] = c["n_parts"].astype(np.int64)
        c["sx"] = soundex(c["word"]).to_numpy(object)
        return c[["word", "sx", "n_parts"]]

    return bucket_exchange(
        parts.map_batches(prep, batch_format="pyarrow"), combine)


def fellegi_sunter_parts(parts: ray.data.Dataset, min_score: int = 3,
                         num_buckets: int = 64) -> ray.data.Dataset:
    """Fellegi-Sunter record-linkage scoring (the 1969 probabilistic
    matcher; the decision layer above the soundex/trigram blockers):
    candidate pairs come from (brand, size) blocks, each field comparison
    contributes its log2(m/u) agreement weight — the m/u ratios here are
    DYADIC (8/1, 4/1, 2/1 agreement; 1/4, 1/2, 1/2 disagreement), so
    every weight is an exact small integer and the match score is exact
    int64: type (+3/-2), second name token (+2/-1), retail price within
    $10 of each other (+1/-1). One block-keyed exchange; pairs enumerate
    vectorized inside each block (block sizes are bounded by the
    brand x size key). Output: pairs with score >= min_score, their
    agreement bit pattern, and the score."""
    from .exchange import bucket_exchange
    from ..functions.hashing import fnv1a64, splitmix64
    from ..functions.rounding import round_half_away

    def prep(b: pa.Table) -> pd.DataFrame:
        d = pd.DataFrame({
            "key": b["p_partkey"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "brand": b["p_brand"].to_pandas().to_numpy(object),
            "size": b["p_size"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "ptype": b["p_type"].to_pandas().to_numpy(object),
            "tok2": b["p_name"].to_pandas().str.split(" ").str[-1]
            .to_numpy(object),
            "cents": round_half_away(
                b["p_retailprice"].to_numpy(zero_copy_only=False)
                .astype(np.float64) * 100.0, 0).astype(np.int64)})
        blk = d["brand"].astype(str) + "#" + d["size"].astype(str)
        old = np.seterr(over="ignore")
        try:
            d["_part"] = (splitmix64(fnv1a64(blk.to_numpy(object)))
                          % np.uint64(num_buckets)).astype(np.int32)
        finally:
            np.seterr(**old)
        return d

    def score(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, blk in g.groupby(["brand", "size"], sort=False):
            if len(blk) < 2:
                continue
            m = blk.merge(blk, how="cross", suffixes=("_a", "_b"))
            m = m[m["key_a"] < m["key_b"]]
            ag_t = (m["ptype_a"] == m["ptype_b"]).to_numpy()
            ag_n = (m["tok2_a"] == m["tok2_b"]).to_numpy()
            ag_p = (np.abs(m["cents_a"].to_numpy(np.int64)
                           - m["cents_b"].to_numpy(np.int64))
                    <= 1000)
            sc = (np.where(ag_t, 3, -2) + np.where(ag_n, 2, -1)
                  + np.where(ag_p, 1, -1)).astype(np.int64)
            keep = sc >= min_score
            outs.append(pd.DataFrame({
                "key_a": m["key_a"].to_numpy(np.int64)[keep],
                "key_b": m["key_b"].to_numpy(np.int64)[keep],
                "pattern": (ag_t.astype(np.int64) + 2 * ag_n
                            + 4 * ag_p)[keep],
                "score": sc[keep]}))
        if not outs:
            return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                                 for c in ("key_a", "key_b", "pattern",
                                           "score")})
        return pd.concat(outs, ignore_index=True)

    return bucket_exchange(
        parts.map_batches(prep, batch_format="pyarrow"), score)


def good_turing_docs(docs: ray.data.Dataset, max_r: int = 10,
                     num_buckets: int = 64) -> ray.data.Dataset:
    """Good-Turing frequency-of-frequencies smoothing (Good 1953; the
    count-adjustment step of Katz/SGT language-model smoothing): N_r =
    number of word-TRIGRAM types seen exactly r times; the adjusted
    count is r* = (r+1)·N_{r+1}/N_r. Trigram types (not unigrams): the
    fixture's closed vocabulary leaves no rare unigram tail, while
    trigram counts span the r ≤ max_r range at every scale — exactly the
    regime Good-Turing exists for.

    Two bucketed exchanges, both counted: token-hash buckets give exact
    per-type totals (one vectorized groupby per bucket) which pre-agg to
    (r, type_count) WITH r capped at max_r+2 (the overflow bucket) before
    they move — the second exchange and the driver pull are ≤ buckets ×
    (max_r+2) single-int rows regardless of vocabulary size. r* is the
    floor((r+1)·N_{r+1}/N_r · 2²⁰ + 0.5) integer quantization (a decimal
    ROUND of a rational can tie; power-of-two scaling cannot)."""
    import pyarrow.compute as pc

    from .exchange import bucket_exchange
    from ..functions.hashing import fnv1a64, splitmix64

    cap = max_r + 2

    def tok_counts(b: pa.Table) -> pd.DataFrame:
        t = b["text"]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        wl = pc.split_pattern(t, " ")
        vals = wl.values.to_pandas()
        off = np.asarray(wl.offsets, np.int64)
        doc = np.repeat(np.arange(len(off) - 1), off[1:] - off[:-1])
        keep = (vals.str.len() > 0).to_numpy()
        v = pd.Series(vals[keep].to_numpy(object))
        d = doc[keep]
        same = (d[:-2] == d[1:-1]) & (d[1:-1] == d[2:]) if len(d) >= 3 else np.zeros(0, bool)
        tri = (v.iloc[:-2].reset_index(drop=True) + " "
               + v.iloc[1:-1].reset_index(drop=True) + " "
               + v.iloc[2:].reset_index(drop=True))[same]
        c = tri.groupby(tri).size().reset_index()
        c.columns = ["tok", "cnt"]
        c["cnt"] = c["cnt"].astype(np.int64)
        old = np.seterr(over="ignore")
        try:
            c["_part"] = (splitmix64(fnv1a64(c["tok"].to_numpy(object)))
                          % np.uint64(num_buckets)).astype(np.int32)
        finally:
            np.seterr(**old)
        return c

    def bucket_freq_of_freq(g: pd.DataFrame) -> pd.DataFrame:
        per_type = g.groupby("tok", sort=False)["cnt"].sum()
        r = np.minimum(per_type.to_numpy(np.int64), cap)
        rv, nv = np.unique(r, return_counts=True)
        return pd.DataFrame({"r": rv, "n_r": nv.astype(np.int64),
                             "_p2": (rv % np.int64(32)).astype(np.int32)})

    def sum_n_r(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("r", sort=False, as_index=False)["n_r"].sum()
        out["n_r"] = out["n_r"].astype(np.int64)
        return out

    nr = bucket_exchange(
        bucket_exchange(docs.map_batches(tok_counts, batch_format="pyarrow"),
                        bucket_freq_of_freq),
        sum_n_r, key="_p2", small_partials=True,
    ).to_pandas()
    n_of = dict(zip(nr["r"].astype(int), nr["n_r"].astype(int)))
    rows = []
    for r in range(1, max_r + 1):
        if n_of.get(r, 0) == 0:
            continue
        n_r = n_of[r]
        n_r1 = n_of.get(r + 1, 0)  # r+1 <= max_r+1 < cap: always exact
        num = float((r + 1) * n_r1)
        rsq = int(np.floor(num / float(n_r) * 1048576.0 + 0.5))
        rows.append({"r": np.int64(r), "n_r": np.int64(n_r),
                     "n_r1": np.int64(n_r1), "r_star_q": np.int64(rsq)})
    out = pd.DataFrame(rows, columns=["r", "n_r", "n_r1", "r_star_q"])
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return ray.data.from_pandas(out)


def vocab_growth_docs(docs: ray.data.Dataset, n_checkpoints: int = 8,
                      num_buckets: int = 64) -> ray.data.Dataset:
    """Vocabulary-growth curve (the empirical Heaps-law measurement a
    corpus report includes: distinct token types vs corpus prefix in
    doc_id order). The prefix-distinct count needs no per-prefix
    distinct pass: a type is in prefix t iff its FIRST occurrence doc id
    ≤ t, so one token-hash exchange computing min(doc_id) per type
    pre-aggs to (checkpoint, types_entering) counts — ≤ buckets × K rows
    move, K = n_checkpoints. Cumulative token totals per checkpoint are
    map-side partial sums. All outputs exact integers."""
    import pyarrow.compute as pc

    from .exchange import bucket_exchange
    from ..functions.hashing import fnv1a64, splitmix64

    max_id = int(docs.max("doc_id"))
    thresholds = [(max_id * k) // n_checkpoints for k in range(1, n_checkpoints + 1)]
    thr = np.array(thresholds, np.int64)

    def tok_first(b: pa.Table) -> pd.DataFrame:
        t = b["text"]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        wl = pc.split_pattern(t, " ")
        vals = wl.values.to_pandas()
        off = np.asarray(wl.offsets, np.int64)
        doc = np.repeat(b["doc_id"].to_numpy().astype(np.int64),
                        off[1:] - off[:-1])
        keep = (vals.str.len() > 0).to_numpy()
        d = pd.DataFrame({"tok": vals[keep].to_numpy(object), "fd": doc[keep]})
        c = d.groupby("tok", sort=False, as_index=False)["fd"].min()
        old = np.seterr(over="ignore")
        try:
            c["_part"] = (splitmix64(fnv1a64(c["tok"].to_numpy(object)))
                          % np.uint64(num_buckets)).astype(np.int32)
        finally:
            np.seterr(**old)
        return c

    def bucket_entering(g: pd.DataFrame) -> pd.DataFrame:
        first = g.groupby("tok", sort=False)["fd"].min().to_numpy(np.int64)
        vocab = (first[None, :] <= thr[:, None]).sum(axis=1).astype(np.int64)
        return pd.DataFrame({"k": np.arange(1, n_checkpoints + 1, dtype=np.int64),
                             "vocab": vocab,
                             "_p2": np.zeros(n_checkpoints, np.int32)})

    def sum_vocab(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("k", sort=False, as_index=False)["vocab"].sum()
        out["vocab"] = out["vocab"].astype(np.int64)
        return out

    vg = bucket_exchange(
        bucket_exchange(docs.map_batches(tok_first, batch_format="pyarrow"),
                        bucket_entering),
        sum_vocab, key="_p2", small_partials=True,
    ).to_pandas()

    def tok_totals(b: pa.Table) -> pd.DataFrame:
        t = b["text"]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        wl = pc.split_pattern(t, " ")
        vals = wl.values.to_pandas()
        off = np.asarray(wl.offsets, np.int64)
        doc_idx = np.repeat(np.arange(len(off) - 1), off[1:] - off[:-1])
        keep = (vals.str.len() > 0).to_numpy()
        n_tok = np.bincount(doc_idx[keep], minlength=len(off) - 1).astype(np.int64)
        did = b["doc_id"].to_numpy().astype(np.int64)
        tok_per_ckpt = ((did[None, :] <= thr[:, None])
                        * n_tok[None, :]).sum(axis=1).astype(np.int64)
        return pd.DataFrame({"k": np.arange(1, n_checkpoints + 1, dtype=np.int64),
                             "tokens": tok_per_ckpt,
                             "_p2": np.zeros(n_checkpoints, np.int32)})

    def sum_tokens(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("k", sort=False, as_index=False)["tokens"].sum()
        out["tokens"] = out["tokens"].astype(np.int64)
        return out

    tt = bucket_exchange(
        docs.map_batches(tok_totals, batch_format="pyarrow"),
        sum_tokens, key="_p2", small_partials=True,
    ).to_pandas()

    out = pd.DataFrame({"k": np.arange(1, n_checkpoints + 1, dtype=np.int64)})
    out["threshold"] = thr
    out = out.merge(vg[["k", "vocab"]], on="k", how="left") \
             .merge(tt[["k", "tokens"]], on="k", how="left")
    out["vocab"] = out["vocab"].fillna(0).astype(np.int64)
    out["tokens"] = out["tokens"].fillna(0).astype(np.int64)
    return ray.data.from_pandas(out)


def tokenizer_fertility_docs(docs: ray.data.Dataset,
                             num_buckets: int = 32) -> ray.data.Dataset:
    """Tokenizer fertility / compression report per language — the
    tokenizer-fit metric a multilingual corpus report tracks (tokens per
    word and bytes per token decide whether a vocab under-serves a
    language): per doc, words = single-space tokens, subword tokens =
    the BPE-ish regex split count (letter runs / digit runs / single
    punctuation — functions/textproc token rule), bytes = UTF-8 length.
    Everything pre-aggregates to per-(lang, block) integer partials;
    ratios are power-of-two quantized (floor(x·2²⁰ + 0.5))."""
    import re

    import pyarrow.compute as pc

    from .exchange import bucket_exchange
    from ..functions.hashing import fnv1a64, splitmix64

    pat = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")

    def partial(b: pa.Table) -> pd.DataFrame:
        t = b["text"]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        texts = t.to_pandas()
        lang = b["lang"].to_pandas()
        words = texts.str.count(r"\S+").astype("int64")
        sub = texts.map(lambda s: len(pat.findall(s))).astype("int64")
        nbytes = texts.str.encode("utf-8").str.len().astype("int64")
        d = pd.DataFrame({"lang": lang.to_numpy(object), "words": words,
                          "sub": sub, "nbytes": nbytes,
                          "n_docs": np.int64(1)})
        g = d.groupby("lang", sort=False, as_index=False).sum()
        for c in ("words", "sub", "nbytes", "n_docs"):
            g[c] = g[c].astype(np.int64)
        old = np.seterr(over="ignore")
        try:
            g["_part"] = (splitmix64(fnv1a64(g["lang"].to_numpy(object)))
                          % np.uint64(num_buckets)).astype(np.int32)
        finally:
            np.seterr(**old)
        return g

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby("lang", sort=False, as_index=False)[
            ["words", "sub", "nbytes", "n_docs"]].sum()
        for col in ("words", "sub", "nbytes", "n_docs"):
            c[col] = c[col].astype(np.int64)
        w = np.maximum(c["words"].to_numpy(np.int64), 1)
        s = np.maximum(c["sub"].to_numpy(np.int64), 1)
        c["fertility_q"] = np.floor(
            c["sub"].to_numpy(np.int64).astype(np.float64)
            / w.astype(np.float64) * 1048576.0 + 0.5).astype(np.int64)
        c["bytes_per_tok_q"] = np.floor(
            c["nbytes"].to_numpy(np.int64).astype(np.float64)
            / s.astype(np.float64) * 1048576.0 + 0.5).astype(np.int64)
        return c

    return bucket_exchange(
        docs.select_columns(["lang", "text"]).map_batches(
            partial, batch_format="pyarrow"),
        combine, small_partials=True)


def span_mask_docs(docs: ray.data.Dataset, mask_permille: int = 150,
                   num_buckets: int = 64) -> ray.data.Dataset:
    """Span-corruption masking plan (the T5/UL2 pretraining-objective
    prep step): token i of doc d is masked iff
    splitmix64(splitmix64(doc_id) ⊕ i) % 1000 < ``mask_permille`` — the
    id-hash draw (block-structure-invariant, SQL-restatable; CLAUDE.md
    RNG rule), spans = maximal masked runs. Output per doc: token count,
    masked count, span count, and the longest span — all exact ints,
    computed vectorized from run boundaries (mask & ~prev_mask)."""
    import pyarrow.compute as pc

    from ..functions.hashing import splitmix64

    def fn(b: pa.Table) -> pd.DataFrame:
        t = b["text"]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        wl = pc.split_pattern(t, " ")
        vals = wl.values.to_pandas()
        off = np.asarray(wl.offsets, np.int64)
        doc_idx = np.repeat(np.arange(len(off) - 1), off[1:] - off[:-1])
        keep = (vals.str.len() > 0).to_numpy()
        doc_idx = doc_idx[keep]
        did = b["doc_id"].to_numpy().astype(np.int64)
        # token position WITHIN the doc (post-filter)
        n_tok = np.bincount(doc_idx, minlength=len(off) - 1).astype(np.int64)
        starts = np.concatenate([[0], np.cumsum(n_tok)[:-1]])
        pos = np.arange(len(doc_idx)) - starts[doc_idx]
        old = np.seterr(over="ignore")
        try:
            base = splitmix64(did.astype(np.uint64))
            draw = splitmix64(base[doc_idx] ^ pos.astype(np.uint64)) % np.uint64(1000)
        finally:
            np.seterr(**old)
        masked = draw < mask_permille
        prev_same = np.r_[False, doc_idx[1:] == doc_idx[:-1]]
        prev_masked = np.r_[False, masked[:-1]] & prev_same
        span_start = masked & ~prev_masked
        n_masked = np.bincount(doc_idx, weights=masked.astype(np.float64),
                               minlength=len(off) - 1).astype(np.int64)
        n_spans = np.bincount(doc_idx, weights=span_start.astype(np.float64),
                              minlength=len(off) - 1).astype(np.int64)
        # longest span per doc: run-length via span ids
        span_id = np.cumsum(span_start)
        run_len = np.bincount(span_id[masked], minlength=int(span_id.max()) + 1 if len(span_id) else 1)
        longest = np.zeros(len(off) - 1, np.int64)
        if masked.any():
            sdoc = doc_idx[span_start]
            sid = span_id[span_start]
            per_span = pd.DataFrame({"doc": sdoc, "len": run_len[sid]})
            mx = per_span.groupby("doc", sort=False)["len"].max()
            longest[mx.index.to_numpy()] = mx.to_numpy(np.int64)
        return pd.DataFrame({"doc_id": did, "n_tokens": n_tok,
                             "n_masked": n_masked, "n_spans": n_spans,
                             "longest_span": longest})

    return docs.select_columns(["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow")


def gated_corpus_pages(pages: ray.data.Dataset, quality_min: float = 0.5,
                       cap_k: int = 3,
                       rules: tuple[tuple[str, str], ...] = ROBOTS_RULES
                       ) -> ray.data.Dataset:
    """Composed corpus GATING pipeline — the crawl-side admission chain a
    web corpus applies before any heavy processing (the policy sibling of
    pipelines/corpus_prep: that one transforms survivors, this one decides
    admission): robots blocklist → quality threshold → per-host cap, as
    ONE streaming plan.

    Stage order is the flagship discipline: both predicates (robots rule
    scan + quality score) are MAP-SIDE on the balanced storage blocks —
    only the narrow (host, url, draw) rows of double-survivors enter the
    grouped-topk cap exchange (≤ cap_k rows per host per block). Output:
    (host, url) admitted pages."""
    from ..functions import textproc
    from ..functions.hashing import fnv1a64, splitmix64
    from ..functions.rounding import round_half_away
    from .agg import grouped_topk

    def gate(b: pa.Table) -> pd.DataFrame:
        urls = b["url"].to_pandas()
        texts = b["text"].to_pandas()
        m = urls.str.extract(r"^https?://([^/]+)(/.*)?$")
        host_s = m[0].fillna("")
        path_s = m[1].fillna("/")
        blocked = np.zeros(len(urls), bool)
        for h, p in rules:
            hit = path_s.str.startswith(p).to_numpy()
            if h != "*":
                hit &= (host_s == h).to_numpy()
            blocked |= hit
        q = round_half_away(
            textproc.quality_scores(texts)["quality"].to_numpy(np.float64), 4)
        keep = ~blocked & (q >= quality_min)
        kept = urls[keep]
        host = kept.str.extract(r"site-(\d+)\.example", expand=False).astype(np.int64)
        old = np.seterr(over="ignore")
        try:
            draw = splitmix64(fnv1a64(kept.to_numpy(object))).view(np.int64)
        finally:
            np.seterr(**old)
        return pd.DataFrame({"host": host.to_numpy(np.int64),
                             "url": kept.to_numpy(object), "draw": draw})

    gated = pages.select_columns(["url", "text"]).map_batches(
        gate, batch_format="pyarrow")
    capped = grouped_topk(gated, "host", "draw", cap_k, tiebreak="url",
                          descending=False)
    return capped.select_columns(["host", "url"])


def blocking_quality_parts(parts: ray.data.Dataset,
                           num_buckets: int = 64,
                           group_bound: int = 1_000_000) -> ray.data.Dataset:
    """Blocking-strategy evaluation (the record-linkage methodology
    metrics: Christen 2012): for the Soundex blocking key over part
    names and ground-truth matches defined as identical (p_brand,
    p_size), report the REDUCTION RATIO (1 − candidate pairs / all
    pairs) and PAIRS COMPLETENESS (fraction of true-match pairs that
    are co-blocked). Pair counts are exact C(n,2) integers from one
    (block, brand, size) count table (pre-aggregated per batch, one
    exchange, counted driver pull bounded by the key-combination
    cardinality); ratios quantize ·2²⁰."""
    import pyarrow.compute as pc

    from .exchange import bucket_exchange
    from ..functions.hashing import fnv1a64, splitmix64
    from ..functions.textproc import soundex

    def prep(b: pa.Table) -> pd.DataFrame:
        w = b["p_name"].to_pandas().str.split(" ").str[0]
        sx = soundex(w).to_numpy(object)
        d = pd.DataFrame({"sx": sx,
                          "brand": b["p_brand"].to_pandas().to_numpy(object),
                          "size": b["p_size"].to_numpy().astype(np.int64)})
        c = d.groupby(["sx", "brand", "size"], sort=False).size().rename("n").reset_index()
        c["n"] = c["n"].astype(np.int64)
        old = np.seterr(over="ignore")
        try:
            c["_part"] = (splitmix64(fnv1a64(c["sx"].to_numpy(object)))
                          % np.uint64(num_buckets)).astype(np.int32)
        finally:
            np.seterr(**old)
        return c

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        c = g.drop(columns=["_part"]).groupby(
            ["sx", "brand", "size"], as_index=False)["n"].sum()
        c["n"] = c["n"].astype(np.int64)
        return c

    tbl = bucket_exchange(
        parts.select_columns(["p_name", "p_brand", "p_size"]).map_batches(
            prep, batch_format="pyarrow"),
        combine, small_partials=True).to_pandas()
    if len(tbl) > group_bound:
        raise ValueError(f"{len(tbl)} key combinations exceed group_bound")

    def c2(v: np.ndarray) -> int:
        v = v.astype(np.int64)
        return int((v * (v - 1) // 2).sum())

    n_rec = int(tbl["n"].sum())
    total_pairs = n_rec * (n_rec - 1) // 2
    cand = c2(tbl.groupby("sx")["n"].sum().to_numpy())
    match = c2(tbl.groupby(["brand", "size"])["n"].sum().to_numpy())
    cob = c2(tbl["n"].to_numpy())
    red_q = int(np.floor((1.0 - float(cand) / float(total_pairs)) * 1048576.0 + 0.5))
    comp_q = int(np.floor(float(cob) / float(max(match, 1)) * 1048576.0 + 0.5))
    out = pd.DataFrame({
        "n_records": [n_rec], "total_pairs": [total_pairs],
        "cand_pairs": [cand], "match_pairs": [match],
        "co_blocked_pairs": [cob], "reduction_q": [red_q],
        "completeness_q": [comp_q]})
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return ray.data.from_pandas(out)


RBO_P = 0.9
RBO_K = 10
# fixed weight literals (1-p)·p^(d-1), shared verbatim by the SQL twin so
# neither engine calls a cross-engine pow
RBO_WEIGHTS = tuple(float(np.float64(1.0 - RBO_P) * np.float64(RBO_P) ** d)
                    for d in range(RBO_K))


def rbo_snapshot_terms(sf_dir: str, num_buckets: int = 64) -> ray.data.Dataset:
    """Rank-biased overlap (Webber, Moffat & Zobel 2010) between the two
    corpus snapshots' top-K token lists — the list-drift metric a corpus
    monitor tracks release over release (unlike Jaccard it weights rank
    agreement, so a head-token swap moves it more than a tail swap).

    Each snapshot's top-K tokens (count DESC, token ASC) come from a
    token-hash exchange whose per-bucket top-K union bounds the global
    top-K (the oov_rate pattern); the driver computes the K overlap
    depths (counted rows) and the ·2²⁰-quantized partial RBO with the
    FIXED weight literals and left-to-right accumulation the SQL twin
    replicates term-for-term. Output: one row per depth d with X_d and
    the final rbo_q on every row (driver-exact, strict-checked)."""
    import pyarrow.compute as pc

    from ..sources.snapshots import read_snapshot
    from .exchange import bucket_exchange
    from ..functions.hashing import fnv1a64, splitmix64

    def topk_tokens(version: int) -> list:
        def tok_counts(b: pa.Table) -> pd.DataFrame:
            t = b["text"]
            if isinstance(t, pa.ChunkedArray):
                t = t.combine_chunks()
            wl = pc.split_pattern(t, " ")
            vals = wl.values.to_pandas()
            vals = vals[vals.str.len() > 0]
            c = vals.groupby(vals).size().reset_index()
            c.columns = ["tok", "cnt"]
            c["cnt"] = c["cnt"].astype(np.int64)
            old = np.seterr(over="ignore")
            try:
                c["_part"] = (splitmix64(fnv1a64(c["tok"].to_numpy(object)))
                              % np.uint64(num_buckets)).astype(np.int32)
            finally:
                np.seterr(**old)
            return c

        def bucket_top(g: pd.DataFrame) -> pd.DataFrame:
            c = g.drop(columns=["_part"]).groupby("tok", as_index=False)["cnt"].sum()
            c["cnt"] = c["cnt"].astype(np.int64)
            return c.sort_values(["cnt", "tok"], ascending=[False, True],
                                 kind="mergesort").head(RBO_K)

        tops = bucket_exchange(
            read_snapshot(sf_dir, version).map_batches(tok_counts, batch_format="pyarrow"),
            bucket_top).to_pandas() \
            .sort_values(["cnt", "tok"], ascending=[False, True],
                         kind="mergesort").head(RBO_K)
        return tops["tok"].tolist()

    A = topk_tokens(1)
    B = topk_tokens(2)
    rows = []
    acc = np.float64(0.0)
    for d in range(1, RBO_K + 1):
        x = len(set(A[:d]) & set(B[:d]))
        acc = acc + np.float64(RBO_WEIGHTS[d - 1]) * np.float64(x) / np.float64(d)
        rows.append({"d": np.int64(d), "x_d": np.int64(x)})
    rbo_q = np.int64(np.floor(acc * 1048576.0 + 0.5))
    out = pd.DataFrame(rows)
    out["rbo_q"] = rbo_q
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return ray.data.from_pandas(out)


CH_SERVERS = 16
CH_VNODES = 8


def consistent_hash_pages(pages: ray.data.Dataset,
                          n_servers: int = CH_SERVERS,
                          vnodes: int = CH_VNODES,
                          num_buckets: int = 32) -> ray.data.Dataset:
    """Consistent-hashing ring balance audit (Karger et al. 1997 — the
    placement layer a distributed cache/shard router runs; the audit
    answers "how uneven is the load at V vnodes per server?"): ring
    position of vnode i of server s is splitmix64(s·vnodes + i); a key
    routes to the vnode with the smallest ring position ≥ its hash
    (wrapping to the ring minimum). The ring is a tiny broadcast
    (n_servers·vnodes u64s); routing is one vectorized searchsorted per
    batch; per-server counts pre-aggregate before the single exchange.
    Output per server: n_keys (exact)."""
    from .exchange import bucket_exchange
    from ..functions.hashing import fnv1a64, splitmix64

    old = np.seterr(over="ignore")
    try:
        ids = np.arange(n_servers * vnodes, dtype=np.uint64)
        ring = splitmix64(ids)
    finally:
        np.seterr(**old)
    order = np.argsort(ring, kind="stable")
    ring_sorted = ring[order]
    server_sorted = (ids[order] // np.uint64(vnodes)).astype(np.int64)

    def route(b: pa.Table) -> pd.DataFrame:
        old = np.seterr(over="ignore")
        try:
            h = splitmix64(fnv1a64(b["url"].to_pandas().to_numpy(object)))
        finally:
            np.seterr(**old)
        pos = np.searchsorted(ring_sorted, h, side="left")
        pos = np.where(pos == len(ring_sorted), 0, pos)  # wrap
        srv = server_sorted[pos]
        c = pd.Series(srv).value_counts().rename("n_keys").reset_index()
        c.columns = ["server", "n_keys"]
        c["server"] = c["server"].astype(np.int64)
        c["n_keys"] = c["n_keys"].astype(np.int64)
        c["_part"] = (c["server"].to_numpy(np.int64) % num_buckets).astype(np.int32)
        return c

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby("server", sort=False, as_index=False)["n_keys"].sum()
        c["n_keys"] = c["n_keys"].astype(np.int64)
        return c

    return bucket_exchange(
        pages.select_columns(["url"]).map_batches(route, batch_format="pyarrow"),
        combine, small_partials=True)


PHRASES = ("data pipeline", "query engine", "hash join")


def phrase_search_docs(docs: ray.data.Dataset,
                       phrases: tuple[str, ...] = PHRASES,
                       num_buckets: int = 32) -> ray.data.Dataset:
    """Positional phrase search (the inverted index's phrase-AND read
    path): a doc matches a 2-word phrase iff word w₁ occurs at position
    p and w₂ at p+1 (single-space token positions after empty filtering
    — the span_mask position rule). Vectorized per batch: consecutive
    token pairs join against the phrase list; per-phrase doc counts
    pre-aggregate before one exchange. Output: (phrase, n_docs,
    n_occurrences)."""
    import pyarrow.compute as pc

    from .exchange import bucket_exchange
    from ..functions.hashing import fnv1a64, splitmix64

    pset = {p: tuple(p.split(" ")) for p in phrases}

    def scan(b: pa.Table) -> pd.DataFrame:
        t = b["text"]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        wl = pc.split_pattern(t, " ")
        vals = wl.values.to_pandas()
        off = np.asarray(wl.offsets, np.int64)
        doc_idx = np.repeat(np.arange(len(off) - 1), off[1:] - off[:-1])
        keep = (vals.str.len() > 0).to_numpy()
        v = vals[keep].to_numpy(object)
        d = doc_idx[keep]
        same = np.r_[d[1:] == d[:-1], False] if len(d) else np.zeros(0, bool)
        big = pd.Series(v[:-1]) + " " + pd.Series(v[1:]) if len(v) > 1 else pd.Series([], dtype=object)
        rows = []
        for p in phrases:
            hit = (big.to_numpy(object) == p) & same[:len(big)]
            n_occ = int(hit.sum())
            n_docs = len(np.unique(d[:-1][hit])) if n_occ else 0
            rows.append({"phrase": p, "n_docs": np.int64(n_docs),
                         "n_occurrences": np.int64(n_occ)})
        out = pd.DataFrame(rows)
        old = np.seterr(over="ignore")
        try:
            out["_part"] = (splitmix64(fnv1a64(out["phrase"].to_numpy(object)))
                            % np.uint64(num_buckets)).astype(np.int32)
        finally:
            np.seterr(**old)
        return out

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby("phrase", sort=False, as_index=False)[
            ["n_docs", "n_occurrences"]].sum()
        for col in ("n_docs", "n_occurrences"):
            c[col] = c[col].astype(np.int64)
        return c

    return bucket_exchange(
        docs.select_columns(["doc_id", "text"]).map_batches(scan, batch_format="pyarrow"),
        combine, small_partials=True)


NDCG_WEIGHTS = tuple(float(np.float64(1.0) / np.log2(np.float64(i + 1)))
                     for i in range(1, 11))  # 1/log2(i+1), literal-shared


def ndcg_bm25_docs(docs: ray.data.Dataset, queries: dict[int, list[str]],
                   k: int = 10, num_buckets: int = 64) -> ray.data.Dataset:
    """Retrieval quality audit — nDCG@k of the BM25 ranking against an
    EXACT relevance label (total query-term occurrences per doc): the
    offline eval a retrieval-based curation loop runs before trusting a
    ranker. DCG accumulates rel_i · 1/log2(i+1) in RANK order with the
    weight literals shared verbatim by the SQL twin (log2 is not
    cross-engine guaranteed; a Python-computed literal is); the ideal
    gain takes the corpus-wide top-k relevance per query (rel DESC,
    doc ASC) through one posting-pruned exchange. Outputs ·2²⁰-quantized
    plus the integer gains."""
    import pyarrow.compute as pc

    from .exchange import bucket_exchange
    from ..functions.hashing import splitmix64

    ranking = bm25_topk(docs, queries, k=k).to_pandas()  # counted q×k

    term_of = [(int(q), t) for q, ts in sorted(queries.items()) for t in ts]

    def rel_partial(b: pa.Table) -> pd.DataFrame:
        t = b["text"]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        wl = pc.split_pattern(t, " ")
        vals = wl.values.to_pandas()
        off = np.asarray(wl.offsets, np.int64)
        doc_idx = np.repeat(np.arange(len(off) - 1), off[1:] - off[:-1])
        keep = (vals.str.len() > 0).to_numpy()
        v = vals[keep]
        d = doc_idx[keep]
        did = b["doc_id"].to_numpy().astype(np.int64)
        frames = []
        for q, term in term_of:
            hit = (v == term).to_numpy()
            if hit.any():
                cnt = np.bincount(d[hit], minlength=len(off) - 1)
                nz = np.flatnonzero(cnt)
                frames.append(pd.DataFrame({
                    "query_id": np.int64(q), "doc_id": did[nz],
                    "rel": cnt[nz].astype(np.int64)}))
        if not frames:
            return pd.DataFrame({"query_id": pd.Series([], dtype=np.int64),
                                 "doc_id": pd.Series([], dtype=np.int64),
                                 "rel": pd.Series([], dtype=np.int64),
                                 "_part": pd.Series([], dtype=np.int32)})
        out = pd.concat(frames, ignore_index=True)
        out = out.groupby(["query_id", "doc_id"], as_index=False)["rel"].sum()
        out["rel"] = out["rel"].astype(np.int64)
        old = np.seterr(over="ignore")
        try:
            out["_part"] = (splitmix64(out["query_id"].to_numpy().astype(np.uint64))
                            % np.uint64(num_buckets)).astype(np.int32)
        finally:
            np.seterr(**old)
        return out

    def topk_rel(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby(["query_id", "doc_id"], as_index=False)["rel"].sum()
        c["rel"] = c["rel"].astype(np.int64)
        c = c.sort_values(["query_id", "rel", "doc_id"],
                          ascending=[True, False, True], kind="mergesort")
        return c.groupby("query_id", sort=False).head(k)

    rel_tbl = bucket_exchange(
        docs.select_columns(["doc_id", "text"]).map_batches(
            rel_partial, batch_format="pyarrow"),
        topk_rel, small_partials=True).to_pandas()

    # relevance of the RANKED docs: the ranked set is counted (q×k) — a
    # second tiny pruned pass scores exactly those pairs
    ranked_pairs = set(zip(ranking["query_id"].astype(int),
                           ranking["doc_id"].astype(int)))

    def ranked_rel(b: pa.Table) -> pd.DataFrame:
        out = rel_partial(b)
        if len(out) == 0:
            return out
        m = [(int(q), int(d)) in ranked_pairs
             for q, d in zip(out["query_id"], out["doc_id"])]
        return out[np.array(m, bool)]

    rr = bucket_exchange(
        docs.select_columns(["doc_id", "text"]).map_batches(
            ranked_rel, batch_format="pyarrow"),
        lambda g: g.drop(columns=["_part"]).groupby(
            ["query_id", "doc_id"], as_index=False)["rel"].sum(),
        small_partials=True).to_pandas()
    rel_of = {(int(q), int(d)): int(r)
              for q, d, r in zip(rr["query_id"], rr["doc_id"], rr["rel"])}

    rows = []
    for q in sorted(queries):
        rq = ranking[ranking["query_id"] == q].sort_values("rn")
        dcg = np.float64(0.0)
        for i, d in enumerate(rq["doc_id"].astype(int)):
            if i >= k:
                break
            dcg = dcg + np.float64(NDCG_WEIGHTS[i]) * np.float64(
                rel_of.get((q, d), 0))
        ideal = rel_tbl[rel_tbl["query_id"] == q].sort_values(
            ["rel", "doc_id"], ascending=[False, True], kind="mergesort")
        idcg = np.float64(0.0)
        for i, r in enumerate(ideal["rel"].astype(int)):
            if i >= k:
                break
            idcg = idcg + np.float64(NDCG_WEIGHTS[i]) * np.float64(r)
        nd = dcg / idcg if idcg > 0 else np.float64(0.0)
        rows.append({"query_id": np.int64(q),
                     "dcg_q": np.int64(np.floor(dcg * 1048576.0 + 0.5)),
                     "idcg_q": np.int64(np.floor(idcg * 1048576.0 + 0.5)),
                     "ndcg_q": np.int64(np.floor(nd * 1048576.0 + 0.5))})
    out = pd.DataFrame(rows)
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return ray.data.from_pandas(out)


GAZETTEER_PATTERNS = (
    "the ", "and ", "tion", "data", "with ", "ing ", "ment",
    "for ", "pro", "qual", "lang", "text ", "ation", "ter ",
)


class GazetteerMatcher:
    """Actor-pool Aho-Corasick stage (functions/ahocorasick): the dense
    automaton tables build ONCE per actor in ``__init__`` (at gazetteer
    scale they'd arrive via one ``ray.put`` broadcast — plain numpy
    arrays, zero-copy), and ``__call__`` matches the whole batch in
    lockstep column sweeps. The regex-alternation filters (badword/PII)
    stay for tiny blocklists; this is the 10⁴-10⁶-pattern path."""

    def __init__(self, patterns: tuple[str, ...] = GAZETTEER_PATTERNS):
        from ..functions import ahocorasick as ac

        for p in patterns:  # border-free ⇒ self-overlap impossible ⇒
            for k in range(1, len(p)):  # counts match the SQL replace() twin
                assert p[:k] != p[-k:], f"pattern {p!r} has a border"
        self.trans, self.outc = ac.build_automaton(list(patterns))
        self.match = ac.match_counts

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": b["doc_id"].to_numpy(np.int64),
            "n_matches": self.match(b["text"].to_numpy(object),
                                    self.trans, self.outc)})


def gazetteer_match_stage(ds: ray.data.Dataset,
                          patterns: tuple[str, ...] = GAZETTEER_PATTERNS,
                          concurrency=(1, 8)) -> ray.data.Dataset:
    return ds.map_batches(GazetteerMatcher, fn_constructor_args=(patterns,),
                          batch_format="pandas", concurrency=concurrency,
                          num_cpus=1)
