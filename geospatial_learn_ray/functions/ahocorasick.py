"""Aho-Corasick multi-pattern matching, vectorized for batch lockstep.

The badword/PII filters use one compiled alternation regex — right for
a tiny blocklist, wrong for the gazetteer-scale dictionaries (entity
lists, PII term banks, 10⁴-10⁶ phrases) a production corpus pipeline
matches: regex alternation degrades superlinearly while Aho-Corasick
(1975) is O(text + matches) regardless of dictionary size.

The automaton here is built ONCE (driver or actor ``__init__``) into
two dense numpy tables — ``trans[state, byte] -> state`` (goto+fail
precomposed, so stepping never walks fail chains) and
``outc[state] -> #patterns ending here`` (output counts accumulated
through fail links) — and matching runs the whole BATCH of documents in
LOCKSTEP: one vectorized ``state = trans[state, col_j]`` per character
column over the padded byte matrix (the session-6 soundex column-sweep
recipe: loop over text length, never over rows). Tables are plain
arrays, so ``ray.put`` broadcasts them zero-copy to every actor.

Semantics: counts EVERY occurrence of every pattern (overlaps across
patterns and nested patterns all count). For patterns with no proper
border (prefix == suffix), self-overlap is impossible, so per-pattern
counts equal non-overlapping counts — the property the SQL twin's
``replace()``-based restatement relies on (asserted by the caller).
"""
from __future__ import annotations

import numpy as np

ALPHA = 128  # ASCII


def build_automaton(patterns: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """→ (trans [n_states, 128] int32, outc [n_states] int64)."""
    # trie
    goto: list[dict[int, int]] = [{}]
    out: list[int] = [0]
    for p in patterns:
        b = p.encode("ascii")
        s = 0
        for ch in b:
            if ch >= ALPHA:
                raise ValueError("ASCII patterns only")
            nxt = goto[s].get(ch)
            if nxt is None:
                goto.append({})
                out.append(0)
                nxt = len(goto) - 1
                goto[s][ch] = nxt
            s = nxt
        out[s] += 1
    n = len(goto)
    fail = np.zeros(n, np.int32)
    trans = np.zeros((n, ALPHA), np.int32)
    outc = np.asarray(out, np.int64)
    # BFS: precompose goto+fail into dense trans; accumulate outputs
    from collections import deque

    q = deque()
    for ch in range(ALPHA):
        nxt = goto[0].get(ch)
        if nxt is not None:
            trans[0, ch] = nxt
            q.append(nxt)
    while q:
        s = q.popleft()
        outc[s] += outc[fail[s]]
        for ch, nxt in goto[s].items():
            fail[nxt] = trans[fail[s], ch]
            q.append(nxt)
        for ch in range(ALPHA):
            nxt = goto[s].get(ch)
            trans[s, ch] = nxt if nxt is not None else trans[fail[s], ch]
    return trans, outc


def match_counts(texts, trans: np.ndarray, outc: np.ndarray) -> np.ndarray:
    """Total pattern occurrences per text (int64), whole batch in
    lockstep — one vectorized transition per character column."""
    enc = [t.encode("ascii", "replace") for t in texts]
    n = len(enc)
    if n == 0:
        return np.zeros(0, np.int64)
    L = max((len(e) for e in enc), default=0)
    mat = np.zeros((n, L), np.uint8)
    lens = np.zeros(n, np.int64)
    for i, e in enumerate(enc):
        mat[i, :len(e)] = np.frombuffer(e, np.uint8)
        lens[i] = len(e)
    mat = np.minimum(mat, ALPHA - 1)
    state = np.zeros(n, np.int32)
    total = np.zeros(n, np.int64)
    cols = np.arange(L)
    for j in range(L):
        state = trans[state, mat[:, j]]
        active = cols[j] < lens  # padding must not advance counts
        total += np.where(active, outc[state], 0)
        state = np.where(active, state, 0).astype(np.int32)
    return total
