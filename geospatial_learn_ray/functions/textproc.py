"""Vectorized text kernels for the pages/documents tables.

Covers the web-scale training-data operators the engine adds beyond the
reference (task brief): HTML→text extraction (byte-identical contract per
url, BASELINE.json input_hint), token counting, quality scoring,
language-ID heuristic, winnowing fingerprints, one-permutation MinHash and
SimHash signatures. Everything is deterministic and batch-vectorized
(pandas string kernels / numpy over padded byte matrices) — no per-row
Python in hot paths except where noted.
"""

from __future__ import annotations

import html as _htmlmod
import re

import numpy as np
import pandas as pd

from . import rounding
from .hashing import fnv1a64, rolling_hashes, splitmix64

# --- HTML → text extraction -------------------------------------------------

_TAG_RE = re.compile(rb"<[^>]+>")
_BODY_RE = re.compile(rb"<body[^>]*>(.*?)</body>", re.S | re.I)
_WS_RE = re.compile(rb"[ \t\r\n]+")


def extract_text(html_bytes: bytes) -> str:
    """Extract visible text from an HTML document (deterministic pure fn).

    Contract (north_rule): byte-identical ``text`` per ``url`` versus the
    reference semantics — the pages fixture wraps ``documents.text`` as
    ``<body><p>{text}</p></body>``, and this extractor must invert that
    wrapping exactly for any text that contains no markup itself: body
    scope → strip tags → collapse tag-boundary whitespace → unescape
    entities.
    """
    m = _BODY_RE.search(html_bytes)
    scope = m.group(1) if m else html_bytes
    no_tags = _TAG_RE.sub(b" ", scope)
    collapsed = _WS_RE.sub(b" ", no_tags).strip()
    return _htmlmod.unescape(collapsed.decode("utf-8", errors="replace"))


def extract_text_batch(html_col) -> list[str]:
    """Per-row loop over an Arrow binary column (reference path — the
    vectorized ``extract_text_series`` must match it byte-for-byte; the
    golden/pytest suites assert that)."""
    return [extract_text(v) for v in html_col.to_pylist()]


_TAG_RE_S = re.compile(r"<[^>]+>")
_BODY_RE_S = re.compile(r"<body[^>]*>(.*?)</body>", re.S | re.I)
_WS_RE_S = re.compile(r"[ \t\r\n]+")
# fused tag-strip + whitespace-collapse: a run of tags/whitespace ≡ (tags →
# " ") then ([ \t\r\n]+ → " ") — one C pass instead of two
_TAGWS_RE_S = re.compile(r"(?:<[^>]+>|[ \t\r\n])+")


def extract_text_series(html_col) -> pd.Series:
    """Vectorized extraction — same semantics as ``extract_text`` but via
    pandas C string kernels: decode(utf-8, replace) → first <body> scope
    (rows without body keep the whole document) → strip tags → collapse
    whitespace → entity-unescape only rows containing '&' (Python on the
    rare subset). ASCII regex delimiters make decode-then-regex equivalent
    to the scalar bytes-then-decode path; tests assert byte identity."""
    s = pd.Series(html_col.to_pandas() if hasattr(html_col, "to_pandas") else html_col)
    s = s.str.decode("utf-8", errors="replace")
    body = s.str.extract(_BODY_RE_S, expand=False)
    s = body.fillna(s)
    s = s.str.replace(_TAGWS_RE_S, " ", regex=True).str.strip()
    has_ent = s.str.contains("&", regex=False)
    if has_ent.any():
        s.loc[has_ent] = s.loc[has_ent].map(_htmlmod.unescape)
    return s


# --- tokenization / counting ------------------------------------------------

_WORD_RE = re.compile(r"\S+")
_BPEISH_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")
_PUNCT_RE = re.compile(r"[^\w\s]")

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")


def token_counts(texts: pd.Series) -> pd.DataFrame:
    """Whitespace token count + BPE-ish regex token count per row
    (vectorized pandas str.count — each regex match is one token)."""
    ws = texts.str.count(_WORD_RE.pattern).astype("int64")
    bpe = texts.str.count(_BPEISH_RE.pattern).astype("int64")
    return pd.DataFrame({"ws_tokens": ws, "bpe_tokens": bpe})


def quality_scores(texts: pd.Series) -> pd.DataFrame:
    """Quality heuristics per document (length, punctuation ratio, stopword
    ratio, mean token length) + a fixed linear quality score. All rules are
    closed-form so the DuckDB oracle can restate them exactly."""
    n_chars = texts.str.len().astype("int64")
    n_punct = texts.str.count(_PUNCT_RE.pattern).astype("int64")
    ws = texts.str.count(_WORD_RE.pattern).astype("int64").clip(lower=1)
    stop_hits = sum(texts.str.count(rf"\b{w}\b") for w in STOPWORDS).astype("int64")
    punct_ratio = n_punct / n_chars.clip(lower=1)
    stop_ratio = stop_hits / ws
    mean_tok_len = (n_chars - (ws - 1)).clip(lower=0) / ws  # chars excl. single spaces
    score = (
        0.4 * np.minimum(n_chars / 500.0, 1.0)
        + 0.3 * np.minimum(stop_ratio * 5.0, 1.0)
        + 0.3 * (1.0 - np.minimum(punct_ratio * 10.0, 1.0))
    )
    return pd.DataFrame(
        {
            "n_chars": n_chars,
            "punct_ratio": punct_ratio,
            "stop_ratio": stop_ratio,
            "mean_tok_len": mean_tok_len,
            "quality": score,
        }
    )


# --- language ID (n-gram/function-word heuristic) ---------------------------

_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    # tiny built-in function-word profiles (public linguistic knowledge)
    "en": ("the", "and", "of", "to", "is", "that", "for", "with"),
    "fr": ("le", "la", "les", "et", "de", "des", "est", "pour"),
    "es": ("el", "los", "las", "y", "de", "que", "es", "para"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "für"),
    "zh": ("的", "是", "了", "在", "和", "有", "我", "不"),
}


def lang_id(texts: pd.Series) -> pd.Series:
    """Deterministic language guess: argmax of function-word hit counts
    (ties → lexicographically smallest code; no markers → 'und').

    Counting semantics (chosen to be expressible both here and in ANSI
    SQL so the driver can value-hash-check the operator): multi-char
    markers count whitespace-delimited token matches; single-char (CJK)
    markers count substring occurrences (CJK text has no spaces)."""
    texts = texts.reset_index(drop=True)
    ex = texts.str.split().explode().dropna()
    rows = ex.index.to_numpy(np.int64)
    scores = {}
    for code, words in _LANG_MARKERS.items():
        multi = [w for w in words if len(w) > 1]
        s = np.bincount(rows[ex.isin(multi).to_numpy()], minlength=len(texts)).astype(np.int64)
        for w in words:
            if len(w) == 1:
                s = s + texts.str.count(re.escape(w)).fillna(0).to_numpy(np.int64)
        scores[code] = s
    mat = pd.DataFrame(scores).reindex(sorted(scores), axis=1)
    best = mat.idxmax(axis=1)
    best[mat.max(axis=1) == 0] = "und"
    return best.rename("lang_pred")


# --- fingerprints / signatures ---------------------------------------------

def winnow_fingerprints(texts, window: int = 8, guarantee: int = 16) -> tuple[np.ndarray, np.ndarray]:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken —
    SIGMOD'03): rolling k-gram hashes, minimum per sliding window of
    ``guarantee`` positions (full windows only — the paper's scheme), a
    window's min selected when it differs from the previous window's;
    per-doc fingerprint = xor-fold of splitmix64 of the selected minima.
    Returns (fingerprint uint64 [n], n_selected int64 [n]).

    Window placement depends only on each row's OWN length: a row with
    ``Li = len - window + 1`` k-gram positions contributes windows at
    columns ``0 .. Li-guarantee``; a shorter row (``0 < Li < guarantee``)
    contributes a single whole-row window, honoring the paper's
    at-least-one-match guarantee. (The previous version derived both the
    window width and the trailing-window set from the BATCH max length, so
    re-batching the same rows could change their fingerprints.)"""
    H, valid = rolling_hashes(texts, window=window)
    n, L = H.shape
    if L == 0:
        return np.full(n, 0, np.uint64), np.zeros(n, np.int64)
    Li = valid.sum(axis=1).astype(np.int64)
    w = guarantee
    Hm = np.where(valid, H, np.uint64(0xFFFFFFFFFFFFFFFF))
    if L < w:  # pad so a width-w sliding view exists; sentinels never win a min
        Hm = np.concatenate(
            [Hm, np.full((n, w - L), np.uint64(0xFFFFFFFFFFFFFFFF), np.uint64)], axis=1
        )
    sw = np.lib.stride_tricks.sliding_window_view(Hm, w, axis=1)
    mins = sw.min(axis=2)
    fp = np.zeros(n, np.uint64)
    cnt = np.zeros(n, np.int64)
    old = np.seterr(over="ignore")
    try:
        for col in range(mins.shape[1]):
            m = mins[:, col]
            fresh = (col == 0) | (m != mins[:, col - 1])
            in_row = (col <= Li - w) | ((col == 0) & (Li > 0))
            usable = fresh & in_row
            fp = np.where(usable, fp ^ splitmix64(m), fp)
            cnt += usable
    finally:
        np.seterr(**old)
    return fp, cnt


def winnow_selected(texts, window: int = 8, guarantee: int = 16) -> tuple[np.ndarray, np.ndarray]:
    """The EXPLODED form of ``winnow_fingerprints``: instead of xor-folding
    each row's selected minima into one fingerprint, return every selected
    span hash as (row_idx int64 [m], span_hash uint64 [m]) pairs — the
    winnowing selection rule (fresh min × in-row window) is IDENTICAL, so
    the two functions select the same positions. Feeds inter-document
    duplicated-span detection: a span hash shared by ≥2 docs marks ~window
    chars of copied text (the winnowing guarantee bounds the miss rate)."""
    H, valid = rolling_hashes(texts, window=window)
    n, L = H.shape
    if L == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.uint64)
    Li = valid.sum(axis=1).astype(np.int64)
    w = guarantee
    Hm = np.where(valid, H, np.uint64(0xFFFFFFFFFFFFFFFF))
    if L < w:
        Hm = np.concatenate(
            [Hm, np.full((n, w - L), np.uint64(0xFFFFFFFFFFFFFFFF), np.uint64)], axis=1
        )
    sw = np.lib.stride_tricks.sliding_window_view(Hm, w, axis=1)
    mins = sw.min(axis=2)
    ncols = mins.shape[1]
    fresh = np.ones((n, ncols), bool)
    fresh[:, 1:] = mins[:, 1:] != mins[:, :-1]
    cols = np.arange(ncols)
    in_row = (cols[None, :] <= (Li - w)[:, None]) | ((cols[None, :] == 0) & (Li > 0)[:, None])
    rr, cc = np.nonzero(fresh & in_row)
    return rr.astype(np.int64), mins[rr, cc]


def char_shingle_hashes(texts, k: int = 5) -> tuple[np.ndarray, np.ndarray]:
    """Char k-gram shingle hashes per doc: (H uint64 [n, L], valid [n, L])."""
    return rolling_hashes(texts, window=k)


def word_shingle_hashes(texts, k: int = 3) -> tuple[np.ndarray, np.ndarray, int]:
    """Word k-gram shingle hashes, flat layout: returns (H, row_idx, n_rows)
    where H[i] is the hash of one k-word shingle belonging to row row_idx[i].

    Vectorized: tokenize (pandas C split/explode) → fnv1a64 per token →
    polynomial combine over a window of k positions on the flat array,
    keeping only positions whose whole window stays inside one row. Word
    shingles are far more selective than char shingles on same-vocabulary
    corpora (web boilerplate) — the default for MinHash-LSH dedup."""
    s = pd.Series(texts.to_pandas() if hasattr(texts, "to_pandas") else texts)
    toks = s.str.split()
    lens = toks.str.len().fillna(0).astype(np.int64).to_numpy()
    flat = toks.explode().dropna()
    if len(flat) == 0:
        return np.zeros(0, np.uint64), np.zeros(0, np.int64), len(s)
    row_idx = np.repeat(np.arange(len(s)), lens)
    h = fnv1a64(flat.astype(str).to_numpy())
    if len(h) < k:
        return np.zeros(0, np.uint64), np.zeros(0, np.int64), len(s)
    base = np.uint64(1099511628211)
    old = np.seterr(over="ignore")
    try:
        H = np.zeros(len(h) - k + 1, np.uint64)
        for j in range(k):
            H = H * base + h[j : len(h) - k + 1 + j]
    finally:
        np.seterr(**old)
    valid = row_idx[: len(H)] == row_idx[k - 1 :]
    return H[valid], row_idx[: len(H)][valid], len(s)


def minhash_signatures(texts, num_perm: int = 64, shingle_k: int = 5,
                       shingle: str = "char") -> np.ndarray:
    """One-permutation MinHash (Li, Owen, Zhang — NIPS'12) over char or word
    k-shingles, densified: one pass over shingle hashes, bucket = top bits,
    scatter-min into [n, num_perm]; empty buckets filled by rotation
    (deterministic densification). num_perm must be a power of two."""
    assert num_perm & (num_perm - 1) == 0
    shift = np.uint64(64 - int(np.log2(num_perm)))
    if shingle == "word":
        h, rows, n = word_shingle_hashes(texts, k=shingle_k)
        sig = np.full((n, num_perm), np.uint64(0xFFFFFFFFFFFFFFFF), np.uint64)
        if len(h):
            h = splitmix64(h)
            bucket = (h >> shift).astype(np.int64)
            np.minimum.at(sig, (rows, bucket), h)
    else:
        H, valid = char_shingle_hashes(texts, k=shingle_k)
        n, L = H.shape
        sig = np.full((n, num_perm), np.uint64(0xFFFFFFFFFFFFFFFF), np.uint64)
        if L:
            rows, cols = np.nonzero(valid)
            h = H[rows, cols]
            h = splitmix64(h)  # decorrelate bucket bits from raw polynomial hash
            bucket = (h >> shift).astype(np.int64)
            np.minimum.at(sig, (rows, bucket), h)
    # densification: fill empty buckets from the next non-empty (cyclic)
    empty = sig == np.uint64(0xFFFFFFFFFFFFFFFF)
    if empty.any():
        for shift_by in range(1, num_perm):
            if not empty.any():
                break
            donor = np.roll(sig, shift_by, axis=1)
            take = empty & (donor != np.uint64(0xFFFFFFFFFFFFFFFF))
            sig[take] = donor[take]
            empty &= ~take
    return sig


def simhash64(texts: pd.Series) -> np.ndarray:
    """64-bit SimHash (Charikar'02 / Manku et al. WWW'07) over whitespace
    tokens, unit weights: per token hash, ±1 per bit, sign-pack. Vectorized
    via pandas explode + np.add.at on an [n, 64] accumulator."""
    toks = texts.str.split()
    lens = toks.str.len().fillna(0).astype(np.int64).to_numpy()
    flat = toks.explode().dropna()
    if len(flat) == 0:
        return np.zeros(len(texts), np.uint64)
    row_idx = np.repeat(np.arange(len(texts)), lens)
    h = fnv1a64(flat.astype(str).to_numpy())
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    contrib = 2 * bits - 1
    acc = np.zeros((len(texts), 64), np.int64)
    np.add.at(acc, row_idx, contrib)
    out = (acc > 0).astype(np.uint64)
    return (out << np.arange(64, dtype=np.uint64)[None, :]).sum(axis=1, dtype=np.uint64)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized popcount of xor (hamming distance between uint64 arrays)."""
    x = (np.asarray(a, np.uint64) ^ np.asarray(b, np.uint64)).view(np.uint8).reshape(-1, 8)
    return np.unpackbits(x, axis=1).sum(axis=1).astype(np.int64)


def jaccard_shingles(a: str, b: str, k: int = 5) -> float:
    """Exact char-k-shingle Jaccard (test oracle for minhash estimates)."""
    sa = {a[i : i + k] for i in range(max(len(a) - k + 1, 0))}
    sb = {b[i : i + k] for i in range(max(len(b) - k + 1, 0))}
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def jaccard_word_shingles(a: str, b: str, k: int = 3) -> float:
    """Exact word-k-gram Jaccard (test oracle for the word-shingle path)."""
    ta, tb = a.split(), b.split()
    sa = {tuple(ta[i : i + k]) for i in range(max(len(ta) - k + 1, 0))}
    sb = {tuple(tb[i : i + k]) for i in range(max(len(tb) - k + 1, 0))}
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def repetition_scores(texts: pd.Series) -> pd.DataFrame:
    """Within-document repetition metrics (the Gopher quality-filter family,
    Rae et al. 2021 §A1.1: duplicate / top n-gram fractions) — the standard
    web-corpus signals for boilerplate and degenerate generation:

    - dup_{n}gram_frac = (total n-grams − distinct n-grams) / total
    - top_{n}gram_frac = occurrences of the most frequent n-gram / total

    for n = 2, 3 over whitespace tokens (same tokenization as
    token_counts' ``\\S+``). Fully vectorized: one exploded token frame,
    shifted concatenation for the n-gram keys, one groupby per n. Every
    fraction is a ratio of exact integers, so the DuckDB oracle restates it
    bit-identically."""
    s = texts.str.split()
    ex = s.explode()
    doc = pd.Series(ex.index, index=np.arange(len(ex)))
    tok = pd.Series(ex.values, index=np.arange(len(ex)))
    n_tokens = s.str.len().fillna(0).astype("int64")
    out = pd.DataFrame({"n_tokens": n_tokens})
    for n in (2, 3):
        gram = tok.copy()
        ok = pd.Series(True, index=tok.index)
        for k in range(1, n):
            gram = gram + " " + tok.shift(-k)
            ok &= doc.shift(-k) == doc
        frame = pd.DataFrame({"doc": doc[ok], "gram": gram[ok]})
        cnt = frame.groupby(["doc", "gram"], sort=False).size()
        per = cnt.groupby(level=0).agg(["sum", "count", "max"])
        tot = per["sum"].reindex(n_tokens.index).fillna(0).astype("int64")
        dis = per["count"].reindex(n_tokens.index).fillna(0).astype("int64")
        mx = per["max"].reindex(n_tokens.index).fillna(0).astype("int64")
        with np.errstate(invalid="ignore", divide="ignore"):
            dup = np.where(tot > 0, (tot - dis) / tot.astype(np.float64), 0.0)
            top = np.where(tot > 0, mx / tot.astype(np.float64), 0.0)
        out[f"dup_{n}gram_frac"] = rounding.round_half_away(dup, 6)
        out[f"top_{n}gram_frac"] = rounding.round_half_away(top, 6)
    return out


def word_ngrams_frame(texts: pd.Series, n: int) -> pd.DataFrame:
    """All word n-grams per row (whitespace tokens, ``\\S+``-equivalent) as
    a (row, gram) frame — one exploded token series + n−1 shifted
    concatenations, no per-doc loops."""
    s = texts.str.split()
    ex = s.explode()
    doc = pd.Series(ex.index, index=np.arange(len(ex)))
    tok = pd.Series(ex.values, index=np.arange(len(ex)))
    gram = tok.copy()
    ok = tok.notna()
    for k in range(1, n):
        gram = gram + " " + tok.shift(-k)
        ok &= doc.shift(-k) == doc
    return pd.DataFrame({"row": doc[ok].to_numpy(), "gram": gram[ok].to_numpy()})

_TRACKING_PREFIXES = ("utm_", "fbclid", "gclid")


def canonicalize_urls(urls: pd.Series) -> pd.Series:
    """RFC 3986-subset URL normalization for pre-dedup canonicalization
    (the crawl-pipeline step before ``dedup_keep_latest``; no reference
    analogue — LLM-pipeline extension): lowercase scheme+host, strip the
    scheme's default port (:443 https / :80 http), drop the fragment,
    drop tracking query params (utm_*, fbclid, gclid) preserving the
    order of the rest, fold a trailing ``/index.html`` to ``/`` and strip
    the trailing slash from non-root paths. All steps are vectorized
    pandas string kernels except the per-URL query-param join, which is
    bounded by params-per-URL. The SQL twin restates every step with
    split_part/list_filter — identical semantics by construction."""
    s = urls.astype(str).str.split("#", n=1).str[0]
    bq = s.str.split("?", n=1)
    body, q = bq.str[0], bq.str[1]  # q is NaN where absent
    sp = body.str.split("://", n=1)
    scheme = sp.str[0].str.lower()
    rest = sp.str[1]
    hp = rest.str.split("/", n=1)
    host = hp.str[0].str.lower()
    tail = hp.str[1]
    path = pd.Series(np.where(tail.isna(), "", "/" + tail.fillna("")),
                     index=urls.index)
    m443 = (scheme == "https") & host.str.endswith(":443")
    host = host.mask(m443, host.str[:-4])
    m80 = (scheme == "http") & host.str.endswith(":80")
    host = host.mask(m80, host.str[:-3])
    mi = path.str.endswith("/index.html")
    path = path.mask(mi, path.str[:-10])  # leaves the trailing '/'
    mt = path.str.endswith("/") & (path.str.len() > 1)
    path = path.mask(mt, path.str[:-1])
    params = q.fillna("").str.split("&").explode()
    bad = params.str.startswith(_TRACKING_PREFIXES[0])
    for p in _TRACKING_PREFIXES[1:]:
        bad |= params.str.startswith(p)
    kept = params[~bad & (params != "")].groupby(level=0).agg("&".join)
    kept = kept.reindex(urls.index)
    qpart = pd.Series(np.where(kept.notna(), "?" + kept.fillna(""), ""),
                      index=urls.index)
    return scheme + "://" + host + path + qpart

# --- PII redaction (Dolma-style, ref: LLM-pipeline extension) ---------------
# Shared with the SQL twin (oraclesql._pii_redact_sql): every pattern is in
# the common subset of Python re and DuckDB RE2 (no lookaround, ASCII \b),
# verified leftmost-first identical on both engines.
PII_EMAIL_RE = "[a-z0-9._]+@[a-z0-9.-]+\\.[a-z]{2,}"
PII_PHONE_RE = "\\+1-555-[0-9]{4}"
PII_IP_RE = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"


def redact_pii(texts: pd.Series) -> pd.DataFrame:
    """Count and mask emails / phone numbers / IPv4 addresses (the Dolma
    pipeline's PII step; no reference analogue — LLM-pipeline extension).
    Counts are taken on the ORIGINAL text (the three patterns cannot
    overlap: @ / + / digits-only anchors), then masks are applied
    email → phone → ip. Fully vectorized pandas regex kernels."""
    s = texts.astype(str)
    n_email = s.str.count(PII_EMAIL_RE).astype(np.int64)
    n_phone = s.str.count(PII_PHONE_RE).astype(np.int64)
    n_ip = s.str.count(PII_IP_RE).astype(np.int64)
    red = (s.str.replace(PII_EMAIL_RE, "<EMAIL>", regex=True)
             .str.replace(PII_PHONE_RE, "<PHONE>", regex=True)
             .str.replace(PII_IP_RE, "<IP>", regex=True))
    return pd.DataFrame({"n_email": n_email, "n_phone": n_phone,
                         "n_ip": n_ip, "red_text": red})

# C4's blocklist filter (ref: C4 "bad words" drop; LLM-pipeline extension).
BADWORDS = ("slow", "crash", "dup")


def badword_counts(texts: pd.Series, words: tuple[str, ...] = BADWORDS) -> pd.DataFrame:
    """Count blocklist-word occurrences (ASCII word-boundary) and flag the
    C4 keep decision (drop any doc with >= 1 hit). One alternation regex
    over the whole batch — the blocklist is tiny by definition, so it is a
    compiled constant, not a broadcast side table."""
    pat = "\\b(?:" + "|".join(words) + ")\\b"
    n_bad = texts.astype(str).str.count(pat).astype(np.int64)
    return pd.DataFrame({"n_bad": n_bad, "kept": (n_bad == 0)})


def containment_word_shingles(a: str, b: str, k: int = 3) -> tuple[float, float]:
    """Exact word-k-gram CONTAINMENT pair (|A∩B|/|A|, |A∩B|/|B|) — the
    asymmetric near-dup measure (Broder 1997): a quote or subset document
    scores high containment at low Jaccard. Returns (-1.0, -1.0) when
    either side has no shingles (caller drops — mirrors the SQL twin's
    inner joins)."""
    ta, tb = a.split(), b.split()
    sa = {tuple(ta[i: i + k]) for i in range(max(len(ta) - k + 1, 0))}
    sb = {tuple(tb[i: i + k]) for i in range(max(len(tb) - k + 1, 0))}
    if not sa or not sb:
        return -1.0, -1.0
    ni = len(sa & sb)
    return ni / len(sa), ni / len(sb)


_SOUNDEX_CODE = np.zeros(128, np.int8)
for _c, _d in (("bfpv", 1), ("cgjkqsxz", 2), ("dt", 3), ("l", 4),
               ("mn", 5), ("r", 6)):
    for _ch in _c:
        _SOUNDEX_CODE[ord(_ch)] = _d
for _ch in "hw":
    _SOUNDEX_CODE[ord(_ch)] = 7          # transparent: skipped, not a wall


def soundex(words: pd.Series) -> pd.Series:
    """American Soundex (Russell & Odell, the archival standard; the
    phonetic blocking key of classic record linkage): first letter kept,
    consonant classes 1-6, vowels reset the run, h/w are TRANSPARENT
    (a duplicate code separated only by h/w is not re-emitted), output
    letter + 3 digits zero-padded. Vectorized as a column sweep over the
    padded lowercase byte matrix (loop over max word length, never over
    rows — the fuzzy_name byte-matrix recipe)."""
    w = words.str.lower().fillna("")
    n = len(w)
    if n == 0:
        return pd.Series([], dtype=object)
    L = max(int(w.str.len().max()), 1)
    M = np.zeros((n, L), np.uint8)
    for i, s in enumerate(w.to_numpy(object)):     # fill: bounded by the
        b = s.encode("ascii", "ignore")[:L]        # batch, cheap byte copy
        M[i, :len(b)] = np.frombuffer(b, np.uint8)
    C = _SOUNDEX_CODE[np.minimum(M, 127)]
    alpha = (M >= ord("a")) & (M <= ord("z"))
    first = np.where(alpha[:, 0], M[:, 0] - 32, 0).astype(np.uint8)
    digits = np.zeros((n, 3), np.int8)
    cnt = np.zeros(n, np.int64)
    prev = np.where(alpha[:, 0], C[:, 0], 0).astype(np.int8)  # first code
    for j in range(1, L):
        c = C[:, j]
        is_hw = (c == 7) & alpha[:, j]
        emit = alpha[:, j] & (c >= 1) & (c <= 6) & (c != prev) & (cnt < 3)
        for k in range(3):
            digits[:, k] = np.where(emit & (cnt == k), c, digits[:, k])
        cnt = cnt + emit
        # vowels (code 0) reset prev; h/w leave it; consonants set it
        prev = np.where(alpha[:, j] & ~is_hw, c, prev).astype(np.int8)
    out = np.array([chr(f) + "".join(str(d) for d in row) if f else ""
                    for f, row in zip(first, digits)], object)
    return pd.Series(out, index=words.index, dtype=object)
