"""Query callables for the driver contract (__ray_entry__.queries()).

One function per implemented operator/pipeline from SURVEY.md §2 (+ the
web-scale training-data operators); each takes an sf_dir and returns a
Dataset / DataFrame / Arrow table. Moved out of __ray_entry__.py so the
contract file stays a thin registry (VERDICT r2 next #10)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from geospatial_learn_ray.functions.geometry import ring_props, wkb_to_ring
from geospatial_learn_ray.functions.rounding import round_half_away
from geospatial_learn_ray.sources.pages import pages_sql, read_pages
from geospatial_learn_ray.sources.polygons import pip_sql, polygon_table, polygons_sql
from geospatial_learn_ray.sources.tiles import GRID_X, GRID_Y, read_tiles, tiles_sql
from geospatial_learn_ray.stages import agg, dedup, joins, knn, raster, scorer, textstages
from geospatial_learn_ray.stages.cellindex import geocode_and_cells
from geospatial_learn_ray.stages.pip_join import pip_join
from geospatial_learn_ray.stages.textstages import extract_stage
from geospatial_learn_ray.pipelines.flagship import CELL_COL, flagship_dataset
from geospatial_learn_ray.functions.oraclesql import _promo_intervals

EVENTS_LO, EVENTS_HI = "2024-01-10 00:00:00", "2024-01-20 00:00:00"


def _rp(sf_dir: str, table: str, columns: list[str] | None = None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


# --------------------------------------------------------------------------
# queries
# --------------------------------------------------------------------------

def _q_extract_text(sf_dir: str):
    return extract_stage(read_pages(sf_dir), keep_cols=("url",))


def _q_url_dedup(sf_dir: str):
    ds = read_pages(sf_dir, with_dups=True, columns=["url", "warc_ts", "lang"])
    return dedup.dedup_keep_latest(ds, key="url", ts_col="warc_ts")


def _q_zonal_stats_lineitem(sf_dir: str):
    ds = _rp(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity"])
    return agg.grouped_stats(ds, ["l_returnflag", "l_linestatus"], "l_quantity",
                             stats=("count", "sum", "mean", "min", "max", "std"), round_to=4)


def _q_zonal_frac_orders(sf_dir: str):
    ds = _rp(sf_dir, "orders", ["o_orderpriority", "o_orderstatus"])
    return agg.value_counts(ds, ["o_orderpriority"], "o_orderstatus")


def _q_date_filter_events(sf_dir: str):
    ds = _rp(sf_dir, "events", ["event_id", "ts", "event_type", "value"])
    lo = pa.scalar(pd.Timestamp(EVENTS_LO), pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp(EVENTS_HI), pa.timestamp("us"))
    return ds.map_batches(
        lambda b: b.filter(pc.and_(pc.greater_equal(b["ts"], lo), pc.less(b["ts"], hi))),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def _q_topk_users_by_events(sf_dir: str):
    ds = _rp(sf_dir, "events", ["user_id"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("user_id", sort=False).size().rename("n").reset_index()

    from ray.data.aggregate import Sum

    counts = ds.map_batches(partial, batch_format="pandas").groupby("user_id").aggregate(Sum("n", alias_name="n"))
    return counts.sort(["n", "user_id"], descending=[True, False]).limit(10)


def _q_distinct_langs(sf_dir: str):
    return pd.DataFrame({"lang": sorted(_rp(sf_dir, "documents", ["lang"]).unique("lang"))})


def _q_classify_lineitem(sf_dir: str):
    model_path = scorer.train_linear_model("/tmp/glr_models/linear.json")
    ds = _rp(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax"])
    return scorer.score_stage(ds, model_path, keep_cols=["l_orderkey", "l_linenumber"])


def _q_rmse_lineitem(sf_dir: str):
    ds = _rp(sf_dir, "lineitem", ["l_extendedprice", "l_discount", "l_tax"])

    def derive(b: pd.DataFrame) -> pd.DataFrame:
        disc = b["l_extendedprice"] * (1 - b["l_discount"])
        return pd.DataFrame({"a": disc, "b": disc * (1 + b["l_tax"])})

    val = agg.rmse(ds.map_batches(derive, batch_format="pandas"), "a", "b", round_to=4)
    return pd.DataFrame({"rmse": [val]})


def _q_token_counts(sf_dir: str):
    return textstages.token_count_stage(_rp(sf_dir, "documents", ["doc_id", "text"]))


def _q_quality_scores(sf_dir: str):
    return textstages.quality_stage(_rp(sf_dir, "documents", ["doc_id", "text"]))


def _q_repetition_scores(sf_dir: str):
    return textstages.repetition_stage(_rp(sf_dir, "documents", ["doc_id", "text"]))


def _q_decontaminate(sf_dir: str):
    return textstages.decontaminate_stage(_rp(sf_dir, "documents", ["doc_id", "text"]))


_MIX_RATES = {"en": 1.0, "es": 0.75, "de": 0.5, "fr": 0.25, "zh": 0.1}


def _q_stratified_sample(sf_dir: str):
    return textstages.stratified_sample_stage(
        _rp(sf_dir, "documents", ["doc_id", "lang"]), _MIX_RATES)


def _q_pack_sequences(sf_dir: str):
    from geospatial_learn_ray.stages import scan

    def tokens(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": b["doc_id"].to_numpy(),
            "n_tokens": b["text"].str.count(r"\S+").astype("int64").to_numpy(),
        })

    counted = _rp(sf_dir, "documents", ["doc_id", "text"]).map_batches(tokens, batch_format="pandas")
    return scan.pack_sequences(counted, budget=2048)


def _q_exact_text_dedup(sf_dir: str):
    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    return dedup.dedup_exact_content(ds, "text", "doc_id").select_columns(["doc_id"])


def _q_join_orders_customer(sf_dir: str):
    orders = _rp(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    customer = pa.concat_tables(
        [b for b in _rp(sf_dir, "customer", ["c_custkey", "c_name", "c_mktsegment"]).iter_batches(batch_format="pyarrow")]
    )
    out = joins.broadcast_join(orders, customer, "o_custkey", "c_custkey", how="inner")
    return out.select_columns(["o_orderkey", "o_totalprice", "c_name", "c_mktsegment"])


def _q_revenue_by_segment(sf_dir: str):
    orders = _rp(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    customer = pa.concat_tables(
        [b for b in _rp(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).iter_batches(batch_format="pyarrow")]
    )
    joined = joins.broadcast_join(orders, customer, "o_custkey", "c_custkey", how="inner")
    return agg.grouped_stats(joined, "c_mktsegment", "o_totalprice", stats=("count", "sum"), round_to=2)


def _q_topk_parts(sf_dir: str):
    ds = _rp(sf_dir, "part", ["p_partkey", "p_retailprice"])
    return ds.sort(["p_retailprice", "p_partkey"], descending=[True, False]).limit(10)


LARGE_ORDER = 300000.0


def _large_orders(sf_dir: str) -> pa.Table:
    ds = _rp(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    filtered = ds.map_batches(
        lambda b: b.filter(pc.greater(b["o_totalprice"], LARGE_ORDER)).select(["o_custkey"]),
        batch_format="pyarrow",
    )
    return pa.concat_tables(list(filtered.iter_batches(batch_format="pyarrow")))


def _q_anti_join_customers(sf_dir: str):
    customer = _rp(sf_dir, "customer", ["c_custkey", "c_name"])
    return joins.broadcast_join(customer, _large_orders(sf_dir), "c_custkey", "o_custkey", how="anti")


def _q_semi_join_customers(sf_dir: str):
    customer = _rp(sf_dir, "customer", ["c_custkey", "c_name"])
    return joins.broadcast_join(customer, _large_orders(sf_dir), "c_custkey", "o_custkey", how="semi")


def _q_window_events(sf_dir: str):
    ds = _rp(sf_dir, "events", ["ts", "event_type", "value"])

    def add_window(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["hour"] = b["ts"].dt.floor("h")
        return b[["event_type", "hour", "value"]]

    windowed = ds.map_batches(add_window, batch_format="pandas")
    # sum (not mean): the 4-decimal event values make sums exactly
    # representable after ROUND(4) on both engines; tiny-group means hit
    # decimal half-boundaries where ulp direction differs across engines
    return agg.grouped_stats(windowed, ["event_type", "hour"], "value", stats=("count", "sum"), round_to=4)


def _ann_queries(sf_dir: str):
    tbl = pa.concat_tables(
        [b for b in _rp(sf_dir, "embeddings").iter_batches(batch_format="pyarrow") ]
    )
    mask = (tbl["vec_id"].to_numpy() % 50) == 0
    q = tbl.filter(pa.array(mask))
    Q = np.stack([np.asarray(v, np.float64) for v in q["embedding"].to_pylist()])
    return Q, q["vec_id"].to_numpy()


def _q_ann_cosine_topk(sf_dir: str):
    Q, qids = _ann_queries(sf_dir)
    out = knn.ann_bruteforce_topk(_rp(sf_dir, "embeddings"), Q, qids, k=10)
    return out[["query_id", "neighbor_id", "rank"]]


# ---- rows-only (non-SQL-expressible; pytest oracles in tests/) ------------

def _q_geocode_cells(sf_dir: str):
    pages = read_pages(sf_dir, columns=["url"])
    located = geocode_and_cells(pages, hex_res=(5, 7, 9))

    def round_coords(b: pa.Table) -> pa.Table:
        # round_half_away (not pc.round): pyarrow's decimal rounding returns
        # different ulps than SQL ROUND for the same input
        b = b.set_column(b.schema.get_field_index("lon"), "lon",
                         pa.array(round_half_away(b["lon"].to_numpy(), 6)))
        return b.set_column(b.schema.get_field_index("lat"), "lat",
                            pa.array(round_half_away(b["lat"].to_numpy(), 6)))

    return located.map_batches(round_coords, batch_format="pyarrow")


def _q_pip_join(sf_dir: str):
    located = geocode_and_cells(read_pages(sf_dir, columns=["url"]), hex_res=(7,))
    return pip_join(located, polygon_table(), carry_cols=["url"], mode="inner")


def _q_pip_anti(sf_dir: str):
    located = geocode_and_cells(read_pages(sf_dir, columns=["url"]), hex_res=(7,))
    return pip_join(located, polygon_table(), carry_cols=["url"], mode="anti")


def _q_tile_agg(sf_dir: str):
    return flagship_dataset(sf_dir)["tile_agg"]


def _q_knn_pages(sf_dir: str):
    located = geocode_and_cells(read_pages(sf_dir, columns=["url"]), hex_res=(5,))
    return knn.knn_per_cell(located.select_columns(["url", "lon", "lat"]), k=5, res=5, id_col="url")


def _q_ann_ivf(sf_dir: str):
    Q, qids = _ann_queries(sf_dir)
    emb = _rp(sf_dir, "embeddings")
    C = knn.ivf_build_centroids(emb, n_centroids=16)
    return knn.ivf_topk(emb, Q, qids, C, k=10, nprobe=4)


def _q_semdedup(sf_dir: str):
    from geospatial_learn_ray.sources.embeddings import with_planted_dups

    # raw fixture has no near-dups (max cosine ~0.51) — plant them so the
    # grouping path is actually exercised (same layer as embedding_dedup)
    planted = with_planted_dups(_rp(sf_dir, "embeddings"))
    C = knn.ivf_build_centroids(planted, n_centroids=16)
    return dedup.semdedup(planted, C, threshold=0.95)


def _q_ann_ivf_store(sf_dir: str):
    import hashlib

    Q, qids = _ann_queries(sf_dir)
    emb = _rp(sf_dir, "embeddings")
    C = knn.ivf_build_centroids(emb, n_centroids=16)
    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:8]
    store = knn.ivf_build_store(_rp(sf_dir, "embeddings"), C, f"/tmp/glr_ivf_store_{tag}")
    return knn.ivf_topk_store(store, Q, qids, C, k=10, nprobe=4)


def _q_ann_lsh(sf_dir: str):
    Q, qids = _ann_queries(sf_dir)
    out = knn.lsh_topk(_rp(sf_dir, "embeddings"), Q, qids, k=10)
    return out[["query_id", "neighbor_id", "rank"]]


def _q_inverted_index(sf_dir: str):
    return textstages.inverted_index(_rp(sf_dir, "documents", ["doc_id", "text"]))


def _q_ann_pq(sf_dir: str):
    Q, qids = _ann_queries(sf_dir)
    emb = _rp(sf_dir, "embeddings")
    cb = knn.pq_train(emb, n_sub=4, ks=8, iters=3)
    codes = knn.pq_encode_stage(emb, cb)
    return knn.pq_topk(codes, Q, qids, cb, k=10)


def _q_ann_pq_store(sf_dir: str):
    import hashlib

    Q, qids = _ann_queries(sf_dir)
    emb = _rp(sf_dir, "embeddings")
    cb = knn.pq_train(emb, n_sub=4, ks=8, iters=3)
    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:8]
    store = knn.pq_build_store(_rp(sf_dir, "embeddings"), cb, f"/tmp/glr_pq_store_{tag}")
    return knn.pq_topk_store(store, Q, qids, cb, k=10)


def _q_minhash_pairs(sf_dir: str):
    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    return dedup.minhash_dedup_pairs(ds, threshold=0.5)


def _q_jaccard_verified(sf_dir: str):
    pairs = dedup.minhash_dedup_pairs(_rp(sf_dir, "documents", ["doc_id", "text"]), threshold=0.5)
    out = dedup.verify_jaccard_exact(
        pairs, _rp(sf_dir, "documents", ["doc_id", "text"]), threshold=0.5
    )
    return out.map_batches(
        lambda b: b[["id_a", "id_b", "jaccard"]], batch_format="pandas"
    )


def _q_simhash_pairs(sf_dir: str):
    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    return dedup.simhash_dedup_pairs(ds, max_hamming=3)


def _q_embedding_dedup(sf_dir: str):
    from geospatial_learn_ray.sources.embeddings import with_planted_dups

    planted = with_planted_dups(_rp(sf_dir, "embeddings"))
    return dedup.embedding_dedup_pairs(planted, threshold=0.95)


def _q_dedup_components(sf_dir: str):
    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    pairs = dedup.minhash_dedup_pairs(ds, threshold=0.5)
    return dedup.connected_components(pairs)


def _q_host_stats(sf_dir: str):
    return textstages.host_stats(read_pages(sf_dir, columns=["url", "lang"]))


def _q_bow_logistic(sf_dir: str):
    from geospatial_learn_ray.stages import train as _train

    # materialize the NARROW (d+2 floats/doc) feature table once: GD makes
    # one pass per iteration, and re-tokenizing the corpus 10x would be the
    # expensive half of the pipeline at scale (spillable, like knn's points)
    feats = _train.hashed_bow_features(
        _rp(sf_dir, "documents", ["doc_id", "text", "lang"]), n_buckets=8).materialize()
    w = _train.fit_logistic(feats, [f"x{j}" for j in range(8)], "y",
                            iters=10, lr=0.5)
    return pd.DataFrame({f"w{i}": [round_half_away(float(w[i]), 4)]
                         for i in range(len(w))})


def _q_dup_spans(sf_dir: str):
    return textstages.dup_span_scores(_rp(sf_dir, "documents", ["doc_id", "text"]))


def _q_dedup_apply(sf_dir: str):
    docs = _rp(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    pairs = dedup.minhash_dedup_pairs(_rp(sf_dir, "documents", ["doc_id", "text"]),
                                      threshold=0.5)
    return dedup.dedup_apply(docs, pairs)


def _q_interval_join_events(sf_dir: str):
    """Range join (brief's custom-operator example): events stabbed against
    broadcast overlapping promo windows, then count + exact cents sum per
    window (int-valued f64 terms -> order-exact sums at any sf)."""
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "value"])
    joined = joins.interval_join(ev, _promo_intervals())

    def cents(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "interval_id": b["interval_id"].to_numpy(np.int64),
            "cents": round_half_away(b["value"].to_numpy(np.float64) * 100.0, 0),
        })

    return agg.grouped_stats(joined.map_batches(cents, batch_format="pandas"),
                             "interval_id", "cents", stats=("count", "sum"))


# voting ensemble: three fixed dyadic-weight logistic artifacts (the saved-
# model pattern of classify_proba_lineitem) soft-voted per row
VOTE_MODELS = [
    (["l_quantity"], -3.0, [0.125]),
    (["l_discount", "l_tax"], 0.5, [20.0, -10.0]),
    (["l_quantity", "l_tax"], -2.0, [0.0625, 5.0]),
]


def _q_vote_predict(sf_dir: str):
    from geospatial_learn_ray.stages import train

    paths = []
    for i, (feats, b, w) in enumerate(VOTE_MODELS):
        paths.append(train.save_model(
            f"/tmp/glr_models/vote_{i}.json", feats, np.array([b, *w]),
            kind="logistic"))
    ds = _rp(sf_dir, "lineitem",
             ["l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax"])
    return train.predict_vote_stage(ds, paths, ["l_orderkey", "l_linenumber"])


def _q_rfe_rank(sf_dir: str):
    """RFE over EXACT integer-scaled features (q, 100·discount, 100·tax,
    100·price): raw f64 Gram sums are order-dependent and Cramer's
    cancellation amplified the ulp to the 6th coef decimal at sf0.1 —
    integer-valued terms make every sum order-exact at any sf (the
    zonal_stats_multi cents pattern)."""
    from geospatial_learn_ray.stages import train

    ds = _rp(sf_dir, "lineitem",
             ["l_quantity", "l_discount", "l_tax", "l_extendedprice"])

    def scale(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_quantity": b["l_quantity"].to_numpy(np.float64),
            "l_discount": round_half_away(b["l_discount"].to_numpy(np.float64) * 100.0, 0),
            "l_tax": round_half_away(b["l_tax"].to_numpy(np.float64) * 100.0, 0),
            "l_extendedprice": round_half_away(b["l_extendedprice"].to_numpy(np.float64) * 100.0, 0),
        })

    return train.rfe_rank(ds.map_batches(scale, batch_format="pandas"),
                          ["l_quantity", "l_discount", "l_tax"],
                          "l_extendedprice")


def _q_min_rect_tiles(sf_dir: str):
    ds = read_tiles(tile_px=16).map_batches(
        lambda b: b.filter(pa.compute.and_(
            pa.compute.less(b["tile_x"], 5), pa.compute.less(b["tile_y"], 5))),
        batch_format="pyarrow",
    )
    return raster.min_rect_stage(ds, side=16)


def _q_orientation_tiles(sf_dir: str):
    return raster.orientation_stage(read_tiles(tile_px=16), side=16)


def _q_lm_perplexity(sf_dir: str):
    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    return textstages.lm_perplexity_scores(ds)


def _q_tfidf_top_terms(sf_dir: str):
    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    return textstages.tfidf_top_terms(ds, k=5)


def _q_mg_heavy_hitters(sf_dir: str):
    from geospatial_learn_ray.stages.sketches import mg_heavy_hitters

    ds = _rp(sf_dir, "events", ["user_id"])
    # capacity 4096 > the 1500 distinct users at sf0.1 → the sketch is in
    # its exact regime (err = 0, counts exact — the strict-oracle contract;
    # the approximate regime's BOUNDS are pytest-checked instead)
    return mg_heavy_hitters(ds, "user_id", capacity=4096, min_count=70)


def _q_topk_orders_per_customer(sf_dir: str):
    ds = _rp(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])
    # o_totalprice passes through unchanged (no arithmetic) and o_orderkey
    # totalizes the per-customer order, so the hash is exact with no rounding
    return agg.grouped_topk(ds, "o_custkey", "o_totalprice", k=3,
                            tiebreak="o_orderkey")


def _q_weighted_sample(sf_dir: str):
    from geospatial_learn_ray.stages.sampling import weighted_sample

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )
    out = weighted_sample(ds, "o_orderkey", "o_totalprice", k=50)
    # selection/order happen at FULL precision inside the stage; only the
    # reported column is rounded (12 decimals: |skey| <= 0.05 here, so
    # x*1e12 < 2^53 stays exact). A distinct name — aliasing the rounded
    # value back to "skey" in SQL would shadow the ORDER BY.
    return out.map_batches(
        lambda b: pd.DataFrame({
            "o_orderkey": b["o_orderkey"].to_numpy(np.int64),
            "o_totalprice": b["o_totalprice"].to_numpy(np.float64),
            "skey_r": round_half_away(b["skey"].to_numpy(np.float64), 12),
        }),
        batch_format="pandas",
    )


def _q_paragraph_dedup(sf_dir: str):
    return dedup.paragraph_dedup(_rp(sf_dir, "documents", ["doc_id", "text"]))


def _q_boilerplate(sf_dir: str):
    return dedup.boilerplate_removal(_rp(sf_dir, "documents", ["doc_id", "text"]))


def _q_url_canon(sf_dir: str):
    from geospatial_learn_ray.functions.textproc import canonicalize_urls
    from geospatial_learn_ray.sources.pages import read_messy_urls

    def add(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["canon_url"] = canonicalize_urls(b["url"])
        return b

    return read_messy_urls(sf_dir).map_batches(add, batch_format="pandas")


def _q_pii_redact(sf_dir: str):
    from geospatial_learn_ray.functions.textproc import redact_pii
    from geospatial_learn_ray.sources.pages import read_pii_docs

    def red(b: pd.DataFrame) -> pd.DataFrame:
        out = redact_pii(b["text"])
        out.insert(0, "doc_id", b["doc_id"].to_numpy())
        return out

    return read_pii_docs(sf_dir).map_batches(red, batch_format="pandas")


def _q_badword_filter(sf_dir: str):
    from geospatial_learn_ray.functions.textproc import badword_counts

    def f(b: pd.DataFrame) -> pd.DataFrame:
        out = badword_counts(b["text"])
        out.insert(0, "doc_id", b["doc_id"].to_numpy())
        return out

    return _rp(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        f, batch_format="pandas")


def _q_cms_counts_events(sf_dir: str):
    from geospatial_learn_ray.stages.sketches import cms_counts

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    return cms_counts(ev, "user_id", probes=list(range(1, 33)))


def _q_bloom_semi_join(sf_dir: str):
    """Bloom-filter semi-join: orders pre-filtered (no exchange on the big
    side) by a bitmap built over the BUILDING customers, then a distributed
    count per surviving custkey. The bitmap is SIZED FROM A COUNT of the
    build side (8 bits/key, next power of two) — a fixed m saturates once
    the build side outgrows its design point. False positives are part of
    the deterministic contract the SQL twin reproduces."""
    from geospatial_learn_ray.stages.sketches import (
        bloom_auto_bits, bloom_build, bloom_probe,
    )

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).map_batches(
        lambda b: b.filter(pa.compute.equal(b["c_mktsegment"], "BUILDING")),
        batch_format="pyarrow",
    )
    m_bits = bloom_auto_bits(cust.count())  # small side: the extra count pass is cheap
    words = bloom_build(cust, "c_custkey", m_bits=m_bits, k=3)
    probe = bloom_probe(
        ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"]),
        "o_custkey", words, m_bits=m_bits, k=3,
    )
    counted = probe.map_batches(
        lambda b: b.append_column("_ck", b["o_custkey"]), batch_format="pyarrow"
    )
    return agg.grouped_stats(counted, "o_custkey", "_ck", stats=("count",))


def _q_hist_quantiles(sf_dir: str):
    from geospatial_learn_ray.stages.sketches import hist_quantiles

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_returnflag", "l_extendedprice"]
    )
    return hist_quantiles(li, "l_returnflag", "l_extendedprice")


def _q_hll_distinct_urls(sf_dir: str):
    from geospatial_learn_ray.stages.sketches import hll_distinct

    pages = read_pages(sf_dir, with_dups=True, columns=["url"])
    est = hll_distinct(pages, "url", precision=12)
    return pd.DataFrame({"approx_distinct_urls": [round_half_away(est, 1)]})


def _q_lang_id(sf_dir: str):
    return textstages.lang_id_stage(_rp(sf_dir, "documents", ["doc_id", "text"]))


def _q_fingerprints(sf_dir: str):
    return textstages.fingerprint_stage(_rp(sf_dir, "documents", ["doc_id", "text"]))


def _q_ndvi_tiles(sf_dir: str):
    return raster.ndvi_stage(read_tiles(tile_px=32))


def _q_mask_tiles(sf_dir: str):
    return raster.mask_stage(read_tiles(tile_px=32), rule="<", threshold=0.5).select_columns(
        ["tile_x", "tile_y", "masked_count"]
    )


def _q_raster_points(sf_dir: str):
    return raster.raster2points(read_tiles(tile_px=32), stride=8)


def _q_zonal_tile_stats(sf_dir: str):
    return raster.zonal_tile_stats(read_tiles(tile_px=32), polygon_table(), GRID_X, GRID_Y)


def _q_sessionize_events(sf_dir: str):
    from geospatial_learn_ray.stages.streaming import sessionize

    return sessionize(_rp(sf_dir, "events", ["user_id", "ts"]))


def _q_asof_join_events(sf_dir: str):
    from geospatial_learn_ray.stages.streaming import asof_join

    ds = _rp(sf_dir, "events", ["event_id", "user_id", "ts", "event_type", "value"])
    left = ds.map_batches(lambda b: b[b.event_type == "view"].drop(columns=["event_type"]), batch_format="pandas")
    right = ds.map_batches(lambda b: b[b.event_type == "purchase"].drop(columns=["event_type"]), batch_format="pandas")
    out = asof_join(left, right)
    return out.select_columns(["event_id", "user_id", "ts", "asof_value"])


def _q_revenue_by_nation(sf_dir: str):
    customer = pa.concat_tables(
        list(_rp(sf_dir, "customer", ["c_custkey", "c_nationkey"]).iter_batches(batch_format="pyarrow"))
    ).to_pandas()
    nation = pa.concat_tables(
        list(_rp(sf_dir, "nation", ["n_nationkey", "n_name"]).iter_batches(batch_format="pyarrow"))
    ).to_pandas()
    dim = customer.merge(nation, left_on="c_nationkey", right_on="n_nationkey")[["c_custkey", "n_name"]]
    orders = _rp(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    joined = joins.broadcast_join(orders, dim, "o_custkey", "c_custkey", how="inner")
    return agg.grouped_stats(joined, "n_name", "o_totalprice", stats=("count", "sum"), round_to=2)


def _q_parts_above_avg(sf_dir: str):
    ds = _rp(sf_dir, "part", ["p_partkey", "p_retailprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n": [len(b)], "s": [float(b.p_retailprice.sum())]})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    avg = parts.s.sum() / parts.n.sum()
    return ds.map_batches(
        lambda b: b.filter(pc.greater(b["p_retailprice"], avg)), batch_format="pyarrow"
    )


def _q_zonal_stats_multi(sf_dir: str):
    ds = _rp(sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_extendedprice"])

    # price carried as exact integer cents: float sums of l_extendedprice
    # are order-dependent at scale (ulp drift vs DuckDB SUM order measured
    # at sf0.1); integer sums are exact in any order at any sf
    def cents(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["l_price_cents"] = round_half_away(b["l_extendedprice"].to_numpy() * 100.0, 0).astype(np.int64)
        return b.drop(columns=["l_extendedprice"])

    return agg.grouped_stats_multi(
        ds.map_batches(cents, batch_format="pandas"), "l_returnflag",
        {"l_quantity": ("count", "mean", "std"), "l_price_cents": ("sum", "mean", "max")},
        round_to=4,
    )


def _q_zonal_median_lineitem(sf_dir: str):
    ds = _rp(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity"])
    return agg.grouped_holistic(
        ds, ["l_returnflag", "l_linestatus"], "l_quantity",
        stats=("median", "percentile"), percentile=95.0, round_to=4,
    )


def _q_rgb_indices_tiles(sf_dir: str):
    return raster.rgb_indices_stage(read_tiles(tile_px=32))


def _q_combine_scene_tiles(sf_dir: str):
    a = raster.mask_stage(read_tiles(tile_px=32), rule="<", threshold=0.8).drop_columns(["masked_count"])
    b = read_tiles(tile_px=32)
    out = raster.combine_scene(a, b, fill_class=0.0)

    def summarize(batch: pd.DataFrame) -> pd.DataFrame:
        vals = np.stack([np.asarray(v, np.float64) for v in batch["band_values"]])
        return pd.DataFrame(
            {"tile_x": batch["tile_x"], "tile_y": batch["tile_y"],
             "mean_value": round_half_away(vals.mean(axis=1), 6)}
        )

    return out.map_batches(summarize, batch_format="pandas")


def _q_apply_lut_tiles(sf_dir: str):
    lut = {i: (0 if i < 10 else 1 if i < 20 else 2) for i in range(40)}
    return raster.apply_lut_stage(read_tiles(tile_px=32), lut)


def _q_temporal_mean_tiles(sf_dir: str):
    e0 = read_tiles(tile_px=32)
    e1 = raster.mask_stage(read_tiles(tile_px=32), rule=">", threshold=1.5, outval=1.5).drop_columns(["masked_count"])
    out = raster.temporal_comp([e0, e1], stat="mean")

    def summarize(batch: pd.DataFrame) -> pd.DataFrame:
        vals = np.stack([np.asarray(v, np.float64) for v in batch["band_values"]])
        return pd.DataFrame(
            {"tile_x": batch["tile_x"], "tile_y": batch["tile_y"], "n_epochs": batch["n_epochs"],
             "mean_value": round_half_away(vals.mean(axis=1), 6)}
        )

    return out.map_batches(summarize, batch_format="pandas")


def _q_hist_match_tiles(sf_dir: str):
    ds = read_tiles(tile_px=32)
    lut = raster.hist_ecdf_lut(ds, bins=128)
    out = raster.apply_ecdf(read_tiles(tile_px=32), lut)

    def summarize(batch: pd.DataFrame) -> pd.DataFrame:
        vals = np.stack([np.asarray(v, np.float64) for v in batch["band_values"]])
        return pd.DataFrame(
            {"tile_x": batch["tile_x"], "tile_y": batch["tile_y"],
             "mean_ecdf": round_half_away(vals.mean(axis=1), 6)}
        )

    return out.map_batches(summarize, batch_format="pandas")


def _q_hex_meshgrid(sf_dir: str):
    from geospatial_learn_ray.functions import geo

    located = geocode_and_cells(read_pages(sf_dir, columns=["url"]), hex_res=(5,))
    # distributed distinct; the cell inventory itself is small by construction
    cells = np.array(sorted(located.unique("cell_h3_r5")), np.uint64)
    rings = geo.hex_cell_to_boundary(cells)  # (n, 7, 2) closed rings
    x, y = rings[:, :-1, 0], rings[:, :-1, 1]
    xs, ys = np.roll(x, -1, axis=1), np.roll(y, -1, axis=1)
    area = np.abs(0.5 * (x * ys - xs * y).sum(axis=1))  # vectorized shoelace
    # WKB POLYGON layout: header 9 + ring count 4 + npts * 16 bytes
    wkb_len = np.full(len(cells), 9 + 4 + rings.shape[1] * 16, np.int64)
    return pd.DataFrame({
        "cell_h3_r5": cells,
        "wkb_len": wkb_len,
        "area": round_half_away(area, 6),
    })


def _q_buffer_polygons(sf_dir: str):
    from geospatial_learn_ray.functions.geometry import buffer_ring, ring_props, wkb_to_ring

    tbl = polygon_table()
    rows = []
    for fid, wkb in zip(tbl["feature_id"].to_pylist(), tbl["geometry"].to_pylist()):
        ring = wkb_to_ring(wkb)
        buf = buffer_ring(ring, 1.0)
        rows.append(
            {"feature_id": fid, "area": round_half_away(ring_props(ring)["area"], 6),
             "buffered_area": round_half_away(ring_props(buf)["area"], 6)}
        )
    return pd.DataFrame(rows)


def _q_geom_pixel_bbox(sf_dir: str):
    return raster.geom2pixelbbox(polygon_table(), GRID_X, GRID_Y, tile_px=32)


def _q_train_test_split(sf_dir: str):
    from geospatial_learn_ray.stages.sampling import train_test_split_by_key

    ds = _rp(sf_dir, "documents", ["doc_id", "lang"])

    def key_str(b: pa.Table) -> pa.Table:
        return b.append_column("key", pc.cast(b["doc_id"], pa.string()))

    split = train_test_split_by_key(ds.map_batches(key_str, batch_format="pyarrow"), "key", test_frac=0.25)
    return split.select_columns(["doc_id", "split"])


def _q_rasterize_fraction(sf_dir: str):
    return raster.rasterize_fraction(read_tiles(tile_px=32, with_pixels=False), polygon_table())


def _q_point_raster_lookup(sf_dir: str):
    located = geocode_and_cells(read_pages(sf_dir, columns=["url"]), hex_res=(7,))
    return raster.point_raster_lookup(located, GRID_X, GRID_Y, tile_px=32, carry_cols=["url"])


def _q_clip_tiles(sf_dir: str):
    clipped = raster.clip_tiles(read_tiles(tile_px=32, with_pixels=False), -20.0, -20.0, 40.0, 30.0)

    def flatten(b: pa.Table) -> pa.Table:
        w = b["window"].combine_chunks() if isinstance(b["window"], pa.ChunkedArray) else b["window"]
        return pa.table(
            {
                "tile_x": b["tile_x"], "tile_y": b["tile_y"],
                "col_off": w.field("col_off"), "row_off": w.field("row_off"),
                "width": w.field("width"), "height": w.field("height"),
                "crs": b["crs"],
            }
        )

    return clipped.map_batches(flatten, batch_format="pyarrow")


def _q_fill_nodata_tiles(sf_dir: str):
    masked = raster.mask_stage(read_tiles(tile_px=32), rule="<", threshold=0.3).drop_columns(["masked_count"])
    out = raster.fill_nodata_stage(masked, nodata=0.0)
    return out.select_columns(["tile_x", "tile_y", "filled_count"])


def _q_polygonize_tiles(sf_dir: str):
    small = raster.clip_tiles(read_tiles(tile_px=16), -180.0, -80.0, -90.0, 0.0)
    return raster.polygonize_tiles(small, quant=2.0)


def _q_remove_small_objects(sf_dir: str):
    small = raster.clip_tiles(read_tiles(tile_px=16), -180.0, -80.0, -90.0, 0.0)
    return raster.remove_small_objects_stage(small, quant=2.0, tbin=1, min_size=6)


def _q_ragmerge(sf_dir: str):
    small = raster.clip_tiles(read_tiles(tile_px=16), -180.0, -80.0, -90.0, 0.0)
    return raster.ragmerge_count(small, side=16, quant=2.0, thresh=0.4, grid_x=16, grid_y=16)


def _q_ransac_lines(sf_dir: str):
    small = raster.clip_tiles(read_tiles(tile_px=16), -180.0, -80.0, -90.0, 0.0)
    return raster.ransac_lines_stage(small, side=16, edge_thresh=0.1)


def _q_hough_lines(sf_dir: str):
    small = raster.clip_tiles(read_tiles(tile_px=16), -180.0, -80.0, -90.0, 0.0)
    return raster.hough_lines_stage(small, side=16, edge_thresh=0.1)


def _q_ms_acwe(sf_dir: str):
    small = raster.clip_tiles(read_tiles(tile_px=16), -180.0, -80.0, -90.0, 0.0)
    return raster.ms_acwe_stage(small, side=16, iterations=5)


def _q_do_ac(sf_dir: str):
    small = raster.clip_tiles(read_tiles(tile_px=16), -180.0, -80.0, -90.0, 0.0)
    return raster.ms_acwe_stage(small, side=16, iterations=5, lambda1=1.0, lambda2=2.0,
                                init="threshold", init_thresh=0.5)


def _q_ms_gac(sf_dir: str):
    small = raster.clip_tiles(read_tiles(tile_px=16), -180.0, -80.0, -90.0, 0.0)
    return raster.ms_gac_stage(small, side=16, iterations=5)


def _q_multiband_gif(sf_dir: str):
    small = raster.clip_tiles(read_tiles(tile_px=16), -180.0, -80.0, -90.0, 0.0)
    return raster.multiband_gif_stage(small, side=16)


def _q_snake(sf_dir: str):
    small = raster.clip_tiles(read_tiles(tile_px=16), -180.0, -80.0, -90.0, 0.0)
    return raster.snake_stage(small, side=16)


def _q_ms_toposnakes(sf_dir: str):
    small = raster.clip_tiles(read_tiles(tile_px=16), -180.0, -80.0, -90.0, 0.0)
    return raster.ms_toposnakes_stage(small, side=16, iterations=5)


def _q_reproject_points(sf_dir: str):
    located = geocode_and_cells(read_pages(sf_dir, columns=["url"]), hex_res=(7,))
    return raster.reproject_points(located, carry_cols=["url"])


def _q_reproject_points_utm(sf_dir: str):
    located = geocode_and_cells(read_pages(sf_dir, columns=["url"]), hex_res=(7,))
    out = raster.reproject_points_utm(located, carry_cols=["url"])

    def snap(b: pd.DataFrame) -> pd.DataFrame:
        # oracle-parity projection: snap to f32 (absorbs ≤1-ulp libm
        # differences between numpy and DuckDB in the exp/ln chain — the
        # CLAUDE.md f32-cast technique), then decimeter round. f32 values
        # are dyadic so ROUND(…, 1) can never tie. The stage itself stays
        # full float64.
        b = b.copy()
        for c in ("utm_e", "utm_n"):
            b[c] = round_half_away(
                b[c].to_numpy(np.float64).astype(np.float32).astype(np.float64), 1
            )
        return b

    return out.map_batches(snap, batch_format="pandas")


def _q_utm_roundtrip(sf_dir: str):
    """Forward UTM then inverse back: the engine does REAL work both ways;
    the oracle is the identity (located lon/lat) — inverse∘forward = id to
    ~1e-10 deg, far inside the f32 snap (ulp ~7.6e-6 deg)."""
    located = geocode_and_cells(read_pages(sf_dir, columns=["url"]), hex_res=(7,))

    def rt(b: pa.Table) -> pd.DataFrame:
        lon = b["lon"].to_numpy()
        lat = b["lat"].to_numpy()
        zone, e, n = raster.utm_forward(lon, lat)
        lon2, lat2 = raster.utm_inverse(zone, e, n, lat < 0)
        return pd.DataFrame({
            "url": b["url"].to_pandas(),
            "lon_rt": round_half_away(lon2.astype(np.float32).astype(np.float64), 4),
            "lat_rt": round_half_away(lat2.astype(np.float32).astype(np.float64), 4),
        })

    return located.map_batches(rt, batch_format="pyarrow")


def _q_warp_utm_tiles(sf_dir: str):
    return raster.warp_tiles_utm(read_tiles(tile_px=16), tile_px=16, zone=18,
                                 e0=300000.0, n0=4000000.0, step=5000.0,
                                 out_w=64, out_h=64)


def _q_wkb_to_geojson(sf_dir: str):
    from geospatial_learn_ray.functions.geometry import ring_to_geojson, wkb_to_ring

    tbl = polygon_table()
    return pd.DataFrame(
        {
            "feature_id": tbl["feature_id"].to_pylist(),
            "geojson": [ring_to_geojson(wkb_to_ring(w)) for w in tbl["geometry"].to_pylist()],
        }
    )


def _q_texture_stats(sf_dir: str):
    return raster.texture_stats(read_tiles(tile_px=32), polygon_table(), levels=8)


def _q_otsu_zone_thresh(sf_dir: str):
    return raster.otsu_zone_stage(read_tiles(tile_px=32), polygon_table(), bins=64)


def _q_niblack_tiles(sf_dir: str):
    return raster.local_thresh_stage(read_tiles(tile_px=32, with_pixels=False), 32, algo="niblack")


def _q_sauvola_tiles(sf_dir: str):
    return raster.local_thresh_stage(read_tiles(tile_px=32, with_pixels=False), 32, algo="sauvola")


def _q_slope_tiles(sf_dir: str):
    return raster.slope_stage(read_tiles(tile_px=32, with_pixels=False), tile_px=32)


def _q_aspect_tiles(sf_dir: str):
    return raster.gdaldem_stage(read_tiles(tile_px=32, with_pixels=False), 32, prop="aspect")


def _q_hillshade_tiles(sf_dir: str):
    return raster.gdaldem_stage(read_tiles(tile_px=32, with_pixels=False), 32, prop="hillshade")


def _q_quegan_tiles(sf_dir: str):
    return raster.quegan_stage(read_tiles(tile_px=32, with_pixels=False), 32)


def _q_temp_match(sf_dir: str):
    return raster.temp_match(read_tiles(tile_px=32), polygon_table(), GRID_X, GRID_Y)


def _q_polygonize_merged(sf_dir: str):
    small = raster.clip_tiles(read_tiles(tile_px=16), -180.0, -80.0, -90.0, 0.0)
    rings = raster.polygonize_rings(small, quant=2.0)
    return raster.polygonize_merge_geometry(rings, side=16)


def _q_polygonize_rings(sf_dir: str):
    small = raster.clip_tiles(read_tiles(tile_px=16), -180.0, -80.0, -90.0, 0.0)
    out = raster.polygonize_rings(small, quant=2.0)
    return out.drop_columns(["edges"])


def _q_polygonize_edges(sf_dir: str):
    """STRICT companion to the rows-only WKB queries: the per-region
    DIRECTED boundary-edge multiset in global pixel-corner coordinates —
    the exact geometric content of the rings, minus the (non-SQL) vertex
    ordering. Order-insensitive compare makes it a value-hash check."""
    small = raster.clip_tiles(read_tiles(tile_px=16), -180.0, -80.0, -90.0, 0.0)
    rings = raster.polygonize_rings(small, quant=2.0)

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({k: pd.Series([], dtype=np.int64) for k in
                                 ("tile_x", "tile_y", "region_label", "x0", "y0", "x1", "y1")})
        bufs = b["edges"].to_list()
        counts = np.fromiter((len(buf) // 16 for buf in bufs), np.int64, len(bufs))
        e = np.frombuffer(b"".join(bufs), np.int32).reshape(-1, 4).astype(np.int64)
        return pd.DataFrame({
            "tile_x": np.repeat(b["tile_x"].to_numpy(np.int64), counts),
            "tile_y": np.repeat(b["tile_y"].to_numpy(np.int64), counts),
            "region_label": np.repeat(b["region_label"].to_numpy(np.int64), counts),
            "x0": e[:, 0], "y0": e[:, 1], "x1": e[:, 2], "y1": e[:, 3],
        })

    return rings.map_batches(explode, batch_format="pandas")


def _q_media_decode(sf_dir: str):
    from geospatial_learn_ray.stages import multimodal

    docs = pa.concat_tables(list(_rp(sf_dir, "documents").iter_batches(batch_format="pyarrow")))
    media = ray.data.from_arrow(multimodal.media_table(docs))
    return multimodal.decode_stage(media)


def _q_media_frame_sample(sf_dir: str):
    from geospatial_learn_ray.stages import multimodal

    docs = pa.concat_tables(list(_rp(sf_dir, "documents").iter_batches(batch_format="pyarrow")))
    media = ray.data.from_arrow(multimodal.media_table(docs))
    return multimodal.frame_sample_stage(media, every_kth=4)


def _q_media_resize(sf_dir: str):
    from geospatial_learn_ray.stages import multimodal

    docs = pa.concat_tables(list(_rp(sf_dir, "documents").iter_batches(batch_format="pyarrow")))
    media = ray.data.from_arrow(multimodal.media_table(docs))
    out = multimodal.resize_stage(media, out_w=8, out_h=8)
    # the resized binary itself isn't SQL-expressible; its CONTENT is — the
    # checksum column sums exactly the nearest-neighbor-sampled bytes
    return out.select_columns(["media_id", "width", "height", "checksum"])


def _q_media_features(sf_dir: str):
    from geospatial_learn_ray.stages import multimodal

    docs = pa.concat_tables(list(_rp(sf_dir, "documents").iter_batches(batch_format="pyarrow")))
    media = ray.data.from_arrow(multimodal.media_table(docs))
    return multimodal.featurize_stage(media)


# ---- training surface (learning.create_model / RF_oob_opt /
# regression_results / prob_pixel_bloc analogues; stages/train.py) --------

RIDGE_LAMBDAS = [0.0, 1.0, 100.0, 10000.0]

# proba artifact: EXACT decimal literals restated verbatim in the oracle SQL
# (z = (linear score - threshold)/100 — never 0, so pred has no > ties)
PROBA_FEATURES = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
PROBA_WEIGHTS = (0.0002, 0.0001, -0.05, 0.03)
PROBA_INTERCEPT = -5.3075000500000005e0


def _q_train_linear(sf_dir: str):
    from geospatial_learn_ray.stages import train

    ds = _rp(sf_dir, "lineitem", ["l_quantity", "l_extendedprice"])
    return train.fit_linear_closed_form_1d(ds, "l_quantity", "l_extendedprice")


def _q_regression_metrics(sf_dir: str):
    from geospatial_learn_ray.stages import train

    ds = _rp(sf_dir, "lineitem", ["l_quantity", "l_extendedprice"])
    w = train.fit_linear_closed_form_1d(ds, "l_quantity", "l_extendedprice")
    slope, intercept = float(w.slope.iloc[0]), float(w.intercept.iloc[0])

    def predict(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"y": b["l_extendedprice"].to_numpy(np.float64),
                             "pred": intercept + slope * b["l_quantity"].to_numpy(np.float64)})

    return train.regression_metrics(ds.map_batches(predict, batch_format="pandas"),
                                    "y", "pred", round_to=2)


def _q_ridge_param_scan(sf_dir: str):
    from geospatial_learn_ray.stages import train

    ds = _rp(sf_dir, "lineitem", ["l_orderkey", "l_quantity", "l_extendedprice"])
    return train.fit_ridge_grid(
        ds, ["l_quantity"], "l_extendedprice", lambdas=RIDGE_LAMBDAS,
        split_key="l_orderkey", val_mod=5, split_mode="mod",
        round_to=6, mse_round_to=2,
    )


def _q_classify_proba(sf_dir: str):
    from geospatial_learn_ray.stages import train

    path = train.save_model("/tmp/glr_models/proba_linear.json",
                            list(PROBA_FEATURES),
                            np.array([PROBA_INTERCEPT, *PROBA_WEIGHTS]))
    ds = _rp(sf_dir, "lineitem",
             ["l_orderkey", "l_linenumber", *PROBA_FEATURES])
    return train.predict_proba_stage(ds, path, keep_cols=["l_orderkey", "l_linenumber"])


def _q_rf_oob_scan(sf_dir: str):
    from geospatial_learn_ray.stages import train

    ds = _rp(sf_dir, "lineitem",
             ["l_orderkey", "l_linenumber", "l_returnflag", "l_discount", "l_tax", "l_quantity"])

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "y": (b["l_returnflag"] == "R").astype(np.int64),
            "x0": b["l_discount"].to_numpy(np.float64),
            "x1": b["l_tax"].to_numpy(np.float64),
            "x2": b["l_quantity"].to_numpy(np.float64),
            "k": b["l_orderkey"].to_numpy(np.int64) * 8 + b["l_linenumber"].to_numpy(np.int64),
        })

    return train.fit_bagged_stumps_oob(ds.map_batches(prep, batch_format="pandas"),
                                       ["x0", "x1", "x2"], "y", "k",
                                       max_stumps=32, step=4)


def _q_logistic_weights(sf_dir: str):
    from geospatial_learn_ray.stages import train

    ds = _rp(sf_dir, "lineitem", ["l_returnflag", "l_discount", "l_tax"])

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"y": (b["l_returnflag"] == "R").astype(np.int64),
                             "x1": b["l_discount"].to_numpy(np.float64) * 10.0,
                             "x2": b["l_tax"].to_numpy(np.float64) * 10.0})

    w = train.fit_logistic(ds.map_batches(prep, batch_format="pandas"),
                           ["x1", "x2"], "y", iters=10, lr=0.5)
    return pd.DataFrame({"w0": [round_half_away(float(w[0]), 4)],
                         "w1": [round_half_away(float(w[1]), 4)],
                         "w2": [round_half_away(float(w[2]), 4)]})


def _wkb_to_geojson_sql() -> str:
    """GeoJSON strings assembled in SQL: DuckDB's double→VARCHAR cast is the
    same shortest-round-trip formatting as Python's repr (probed), so the
    concatenated string matches json.dumps byte-for-byte."""
    box = [("pminx", "pminy"), ("pmaxx", "pminy"), ("pmaxx", "pmaxy"),
           ("pminx", "pmaxy"), ("pminx", "pminy")]
    lsh = [("pminx", "pminy"), ("pmaxx", "pminy"), ("pmaxx", "pmy"), ("pmx", "pmy"),
           ("pmx", "pmaxy"), ("pminx", "pmaxy"), ("pminx", "pminy")]

    def js(verts) -> str:
        pts = " || '],[' || ".join(
            f"CAST(ROUND({x}, 6) AS VARCHAR) || ',' || CAST(ROUND({y}, 6) AS VARCHAR)"
            for x, y in verts
        )
        return f"('{{\"type\":\"Polygon\",\"coordinates\":[[[' || {pts} || ']]]}}')"

    return (
        f"WITH {polygons_sql()} "
        f"SELECT feature_id, CASE WHEN is_l THEN {js(lsh)} ELSE {js(box)} END AS geojson FROM polys"
    )


def _q_shape_props(sf_dir: str):
    tbl = polygon_table()
    rows = []
    for fid, wkb in zip(tbl["feature_id"].to_pylist(), tbl["geometry"].to_pylist()):
        p = ring_props(wkb_to_ring(wkb))
        p = {k: round_half_away(v, 6) for k, v in p.items()}
        rows.append({"feature_id": fid, **p})
    return pd.DataFrame(rows)


def _shape_props_sql() -> str:
    """ring_props (shoelace / perimeter / centroid / extent / hull solidity)
    restated per closed-form shape: sequential-sum expressions in the exact
    vertex orders the engine uses (ring order for area/centroid/perimeter;
    Andrew-hull order — box = same 4 corners, L = 5-vertex pentagon — for
    the solidity denominator)."""
    box = [("pminx", "pminy"), ("pmaxx", "pminy"), ("pmaxx", "pmaxy"), ("pminx", "pmaxy")]
    lsh = [("pminx", "pminy"), ("pmaxx", "pminy"), ("pmaxx", "pmy"),
           ("pmx", "pmy"), ("pmx", "pmaxy"), ("pminx", "pmaxy")]
    hull_l = [("pminx", "pminy"), ("pmaxx", "pminy"), ("pmaxx", "pmy"),
              ("pmx", "pmaxy"), ("pminx", "pmaxy")]

    def seq(terms: list[str]) -> str:
        out = terms[0]
        for t in terms[1:]:
            out = f"({out} + {t})"
        return out

    def shoelace(v):
        n = len(v)
        return seq([f"({v[k][0]}*{v[(k + 1) % n][1]} - {v[(k + 1) % n][0]}*{v[k][1]})" for k in range(n)])

    def perim(v):
        n = len(v)
        return seq([f"(ABS({v[(k + 1) % n][0]} - {v[k][0]}) + ABS({v[(k + 1) % n][1]} - {v[k][1]}))"
                    for k in range(n)])

    def cxs(v):
        n = len(v)
        return seq([f"(({v[k][0]} + {v[(k + 1) % n][0]})*({v[k][0]}*{v[(k + 1) % n][1]} - {v[(k + 1) % n][0]}*{v[k][1]}))"
                    for k in range(n)])

    def cys(v):
        n = len(v)
        return seq([f"(({v[k][1]} + {v[(k + 1) % n][1]})*({v[k][0]}*{v[(k + 1) % n][1]} - {v[(k + 1) % n][0]}*{v[k][1]}))"
                    for k in range(n)])

    def pick(fn_box: str, fn_l: str) -> str:
        return f"CASE WHEN is_l THEN {fn_l} ELSE {fn_box} END"

    signed = pick(f"(0.5*{shoelace(box)})", f"(0.5*{shoelace(lsh)})")
    hull_area = pick(f"(0.5*ABS({shoelace(box)}))", f"(0.5*ABS({shoelace(hull_l)}))")
    return (
        f"WITH {polygons_sql()}, "
        f"p AS (SELECT feature_id, is_l, {signed} AS sg, "
        f"  {pick(perim(box), perim(lsh))} AS per, "
        f"  {pick(cxs(box), cxs(lsh))} AS cxs, {pick(cys(box), cys(lsh))} AS cys, "
        f"  {hull_area} AS ha, pmaxx - pminx AS w, pmaxy - pminy AS h FROM polys) "
        "SELECT feature_id, ROUND(ABS(sg), 6) AS area, ROUND(per, 6) AS perimeter, "
        "ROUND(cxs/(6.0*sg), 6) AS centroid_x, ROUND(cys/(6.0*sg), 6) AS centroid_y, "
        "ROUND(w, 6) AS bbox_w, ROUND(h, 6) AS bbox_h, "
        "ROUND(CASE WHEN w*h > 0 THEN ABS(sg)/(w*h) ELSE 0.0 END, 6) AS extent, "
        "ROUND(CASE WHEN ha > 0 THEN ABS(sg)/ha ELSE 0.0 END, 6) AS solidity "
        "FROM p"
    )


def _q_dsir_weights(sf_dir: str):
    return textstages.dsir_weights(
        _rp(sf_dir, "documents", ["doc_id", "text", "lang"]))


def _q_pagerank_hosts(sf_dir: str):
    from geospatial_learn_ray.stages import graph as _graph

    return _graph.pagerank_hosts(read_pages(sf_dir, columns=["url"]))


def _q_chunk_docs(sf_dir: str):
    return textstages.chunk_documents(_rp(sf_dir, "documents", ["doc_id", "text"]))


def _q_host_cap(sf_dir: str):
    return textstages.host_cap_sample(read_pages(sf_dir, columns=["url"]))


def _q_bpe_merges(sf_dir: str):
    return textstages.bpe_train_merges(_rp(sf_dir, "documents", ["text"]))


def _q_bpe_token_counts(sf_dir: str):
    return textstages.bpe_token_counts(_rp(sf_dir, "documents", ["doc_id", "text"]))


def _q_quality_pct(sf_dir: str):
    return textstages.quality_percentile_by_lang(
        _rp(sf_dir, "documents", ["doc_id", "text", "lang"]))


def _q_incremental_dedup(sf_dir: str):
    import hashlib

    from geospatial_learn_ray.stages import dedup as _dedup

    base = _rp(sf_dir, "documents", ["doc_id", "text"]).filter(
        lambda r: r["doc_id"] % 7 != 3)
    inc = _rp(sf_dir, "documents", ["doc_id", "text"]).filter(
        lambda r: r["doc_id"] % 7 == 3)
    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:8]
    store = _dedup.content_store_build(base, f"/tmp/glr_dedup_store_{tag}")
    return _dedup.incremental_novel_docs(inc, store)


def _q_hopping_window(sf_dir: str):
    from geospatial_learn_ray.stages import streaming as _streaming

    return _streaming.hopping_window(
        _rp(sf_dir, "events", ["ts", "event_type", "value"]))


def _q_embedding_drift(sf_dir: str):
    return knn.embedding_drift_by_label(
        _rp(sf_dir, "embeddings", ["vec_id", "embedding", "label"]))


def _q_media_dhash(sf_dir: str):
    from geospatial_learn_ray.stages import multimodal

    docs = pa.concat_tables(list(_rp(sf_dir, "documents").iter_batches(batch_format="pyarrow")))
    media = ray.data.from_arrow(multimodal.media_table(docs))
    return multimodal.dhash_dedup_stage(media)


def _q_rollup_stats(sf_dir: str):
    from geospatial_learn_ray.stages import agg as _agg

    return _agg.rollup_stats(
        _rp(sf_dir, "documents", ["source", "lang", "n_chars"]),
        ["source", "lang"], "n_chars")


def _q_containment(sf_dir: str):
    pairs = dedup.minhash_dedup_pairs(
        _rp(sf_dir, "documents", ["doc_id", "text"]), threshold=0.5)
    return dedup.verify_containment(
        pairs, _rp(sf_dir, "documents", ["doc_id", "text"]), threshold=0.6)


def _q_corpus_prep(sf_dir: str):
    from geospatial_learn_ray.pipelines.corpus_prep import corpus_prep

    return corpus_prep(_rp(sf_dir, "documents", ["doc_id", "text", "lang"]),
                       _MIX_RATES)


def _q_jl_project(sf_dir: str):
    return knn.jl_project(_rp(sf_dir, "embeddings", ["vec_id", "embedding"]))


def _q_corpus_shuffle(sf_dir: str):
    from geospatial_learn_ray.stages import sampling as _sampling

    return _sampling.corpus_shuffle_order(_rp(sf_dir, "documents", ["doc_id"]))


def _q_reproject_points_laea(sf_dir: str):
    located = geocode_and_cells(read_pages(sf_dir, columns=["url"]), hex_res=(7,))
    out = raster.reproject_points_laea(located, carry_cols=["url"])

    def snap(b: pd.DataFrame) -> pd.DataFrame:
        # same f32-snap + decimeter-round oracle projection as the UTM twin
        b = b.copy()
        for c in ("laea_x", "laea_y"):
            b[c] = round_half_away(
                b[c].to_numpy(np.float64).astype(np.float32).astype(np.float64), 1
            )
        return b

    return out.map_batches(snap, batch_format="pandas")


def _q_lang_confusion(sf_dir: str):
    from geospatial_learn_ray.functions import textproc as _tp
    from geospatial_learn_ray.stages import agg as _agg

    ds = _rp(sf_dir, "documents", ["doc_id", "text", "lang"])

    def pred(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"lang": b["lang"].to_numpy(object),
                             "lang_pred": _tp.lang_id(b["text"]).to_numpy()})

    return _agg.value_counts(ds.map_batches(pred, batch_format="pandas"),
                             ["lang"], "lang_pred")


def _q_quality_blend(sf_dir: str):
    return textstages.quality_blend(_rp(sf_dir, "documents", ["doc_id", "text"]))


def _q_vocab_stats(sf_dir: str):
    return textstages.corpus_vocab_stats(_rp(sf_dir, "documents", ["text"]))


def _q_funnel(sf_dir: str):
    from geospatial_learn_ray.stages.streaming import funnel_conversion

    return funnel_conversion(_rp(sf_dir, "events",
                                 ["user_id", "ts", "event_type"]))


def _q_daily_users(sf_dir: str):
    from geospatial_learn_ray.stages.streaming import daily_user_accounting

    return daily_user_accounting(_rp(sf_dir, "events", ["user_id", "ts"]))


def _q_cohort_retention(sf_dir: str):
    from geospatial_learn_ray.stages.streaming import cohort_retention

    return cohort_retention(_rp(sf_dir, "events", ["user_id", "ts"]))


def _q_dbscan_pages(sf_dir: str):
    from geospatial_learn_ray.functions import geo
    from geospatial_learn_ray.functions.hashing import fnv1a64, splitmix64
    from geospatial_learn_ray.stages.cluster import grid_dbscan

    def to_pts(b: pa.Table) -> pd.DataFrame:
        u = b["url"]
        lon, lat = geo.geocode(u)
        old = np.seterr(over="ignore")
        try:
            pid = splitmix64(fnv1a64(u)).view(np.int64)
        finally:
            np.seterr(**old)
        return pd.DataFrame({"pid": pid, "x": lon, "y": lat})

    pts = read_pages(sf_dir, columns=["url"]).map_batches(
        to_pts, batch_format="pyarrow")
    return grid_dbscan(pts, eps=0.002, min_pts=5)


def _q_nearest_city(sf_dir: str):
    from geospatial_learn_ray.stages.cellindex import nearest_city

    return nearest_city(read_pages(sf_dir, columns=["url"])) \
        .select_columns(["url", "city", "dist_km"])


def _q_canny_edges(sf_dir: str):
    small = raster.clip_tiles(read_tiles(tile_px=16), -180.0, -80.0, -90.0, 0.0)
    return raster.canny_edges_stage(small, side=16)


def _q_edt_proximity(sf_dir: str):
    small = raster.clip_tiles(read_tiles(tile_px=16), -180.0, -80.0, -90.0, 0.0)
    return raster.edt_proximity_stage(small, side=16)


def _q_hex_kring(sf_dir: str):
    from geospatial_learn_ray.stages.cellindex import hex_kring_smooth

    return hex_kring_smooth(read_pages(sf_dir, columns=["url", "text"]))


def _q_burst_detect(sf_dir: str):
    from geospatial_learn_ray.stages.streaming import burst_detect

    # rate_factor/min_count lowered from the production defaults so the
    # synthetic near-uniform event rates still produce verdict rows
    return burst_detect(_rp(sf_dir, "events", ["user_id", "ts"]),
                        rate_factor=2, min_count=2)


def _q_geohash_cells(sf_dir: str):
    from geospatial_learn_ray.stages.cellindex import geocode_and_geohash

    return geocode_and_geohash(read_pages(sf_dir, columns=["url"])) \
        .select_columns(["url", "gh8", "gh4"])


def _q_robots_blocklist(sf_dir: str):
    return textstages.robots_blocklist(read_pages(sf_dir, columns=["url"]))


def _q_trimmed_stats(sf_dir: str):
    ds = _rp(sf_dir, "lineitem",
             ["l_returnflag", "l_linestatus", "l_extendedprice"])
    return agg.grouped_trimmed_stats(ds, ["l_returnflag", "l_linestatus"],
                                     "l_extendedprice")


def _q_triangle_hosts(sf_dir: str):
    from geospatial_learn_ray.stages import graph as _graph

    return _graph.triangle_count_hosts(read_pages(sf_dir, columns=["url"]))


def _q_snapshot_diff(sf_dir: str):
    from geospatial_learn_ray.sources.snapshots import read_snapshot
    from geospatial_learn_ray.stages.cdc import snapshot_diff

    return snapshot_diff(read_snapshot(sf_dir, 1), read_snapshot(sf_dir, 2))


def _q_late_events(sf_dir: str):
    from geospatial_learn_ray.sources.events import read_delayed_events
    from geospatial_learn_ray.stages.streaming import late_events

    return late_events(read_delayed_events(sf_dir))


def _q_char_entropy(sf_dir: str):
    return textstages.char_entropy(_rp(sf_dir, "documents", ["doc_id", "text"]))


def _q_lang_temp_weights(sf_dir: str):
    return textstages.lang_temperature_weights(
        _rp(sf_dir, "documents", ["doc_id", "lang"]))


def _q_hll_users_by_type(sf_dir: str):
    from geospatial_learn_ray.stages.sketches import hll_distinct_grouped

    return hll_distinct_grouped(_rp(sf_dir, "events", ["event_type", "user_id"]),
                                "event_type", "user_id")


def _q_event_gaps(sf_dir: str):
    from geospatial_learn_ray.stages.streaming import event_gaps

    return event_gaps(_rp(sf_dir, "events", ["user_id", "ts"]))


BM25_QUERIES = {0: ["hash", "join", "merge"], 1: ["window", "sort", "order"],
                2: ["query", "filter", "scan"], 3: ["spark", "stream", "vector"]}


def _q_bm25_topk(sf_dir: str):
    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    return textstages.bm25_topk(ds, BM25_QUERIES, k=10)


def _q_kmv_users_by_type(sf_dir: str):
    from geospatial_learn_ray.stages.sketches import kmv_distinct_grouped

    return kmv_distinct_grouped(
        _rp(sf_dir, "events", ["event_type", "user_id"]),
        "event_type", "user_id")


def _q_kmv_overlap(sf_dir: str):
    from geospatial_learn_ray.stages.sketches import kmv_overlap_pairs

    return kmv_overlap_pairs(
        _rp(sf_dir, "events", ["event_type", "user_id"]),
        "event_type", "user_id")


def _q_pmi_bigrams(sf_dir: str):
    from geospatial_learn_ray.stages.textstages import pmi_bigrams

    return pmi_bigrams(_rp(sf_dir, "documents", ["text"]))


def _q_scd2_history(sf_dir: str):
    from geospatial_learn_ray.sources.snapshots import read_snapshot
    from geospatial_learn_ray.stages.cdc import scd2_history

    return scd2_history([read_snapshot(sf_dir, 1), read_snapshot(sf_dir, 2)])


def _q_crawl_frontier(sf_dir: str):
    from geospatial_learn_ray.stages.textstages import crawl_frontier

    return crawl_frontier(read_pages(sf_dir, columns=["url"]))


def _q_skyline_orders(sf_dir: str):
    return agg.skyline_2d(
        _rp(sf_dir, "orders", ["o_orderkey", "o_totalprice", "o_orderdate"]),
        "o_totalprice", "o_orderdate", carry=["o_orderkey"])


def _q_ab_test(sf_dir: str):
    return agg.ab_test_stats(_rp(sf_dir, "events", ["user_id", "value"]))


def _q_fuzzy_names(sf_dir: str):
    from geospatial_learn_ray.stages.dedup import fuzzy_name_pairs

    return fuzzy_name_pairs(_rp(sf_dir, "customer", ["c_custkey", "c_name"]))


def _q_idw_grid(sf_dir: str):
    from geospatial_learn_ray.stages.cellindex import idw_grid

    return idw_grid(read_pages(sf_dir, columns=["url", "text"]))


def _q_skeletonize(sf_dir: str):
    small = raster.clip_tiles(read_tiles(tile_px=16), -180.0, -80.0, -90.0, 0.0)
    return raster.skeletonize_stage(small, side=16)


def _q_debounce(sf_dir: str):
    from geospatial_learn_ray.stages.streaming import debounce_events

    return debounce_events(
        _rp(sf_dir, "events", ["user_id", "event_type", "event_id", "ts"]))


def _q_viewshed(sf_dir: str):
    small = raster.clip_tiles(read_tiles(tile_px=16), -180.0, -80.0, -90.0, 0.0)
    return raster.viewshed_stage(small, side=16)


def _q_label_prop(sf_dir: str):
    from geospatial_learn_ray.stages.graph import label_prop_hosts

    return label_prop_hosts(read_pages(sf_dir, columns=["url"]))


def _q_exact_median(sf_dir: str):
    return agg.exact_median(_rp(sf_dir, "lineitem", ["l_extendedprice"]),
                            "l_extendedprice")


def _q_mst_hosts(sf_dir: str):
    from geospatial_learn_ray.stages.graph import mst_hosts

    return mst_hosts(read_pages(sf_dir, columns=["url"]))


def _q_pca_top1(sf_dir: str):
    from geospatial_learn_ray.stages.knn import pca_power_top1

    return pca_power_top1(_rp(sf_dir, "embeddings", ["embedding"]))


def _q_tile_pyramid(sf_dir: str):
    small = raster.clip_tiles(read_tiles(tile_px=16), -180.0, -80.0, -90.0, 0.0)
    return raster.tile_pyramid_stage(small, side=16)


def _q_pivot_events(sf_dir: str):
    return agg.pivot_counts(_rp(sf_dir, "events", ["user_id", "event_type"]),
                            "user_id", "event_type")


def _q_roc_auc(sf_dir: str):
    from geospatial_learn_ray.stages.train import roc_auc_quality

    return roc_auc_quality(_rp(sf_dir, "documents", ["text", "lang"]))


def _q_hits_hosts(sf_dir: str):
    from geospatial_learn_ray.stages.graph import hits_hosts

    return hits_hosts(read_pages(sf_dir, columns=["url"]))


def _q_contour_cells(sf_dir: str):
    small = raster.clip_tiles(read_tiles(tile_px=16), -180.0, -80.0, -90.0, 0.0)
    return raster.contour_cells_stage(small, side=16)


def _q_calibration(sf_dir: str):
    from geospatial_learn_ray.stages import train

    path = train.save_model("/tmp/glr_models/proba_linear.json",
                            list(PROBA_FEATURES),
                            np.array([PROBA_INTERCEPT, *PROBA_WEIGHTS]))
    ds = _rp(sf_dir, "lineitem",
             ["l_orderkey", "l_linenumber", "l_returnflag", *PROBA_FEATURES])
    proba = train.predict_proba_stage(ds, path, keep_cols=["l_returnflag"])

    def lab(b):
        b = b.copy()
        b["y"] = (b["l_returnflag"].to_numpy(object) == "R").astype(np.int64)
        return b[["proba_1", "y"]]

    return train.calibration_bins(
        proba.map_batches(lab, batch_format="pandas"))


def _q_scene_cuts(sf_dir: str):
    from geospatial_learn_ray.stages import multimodal

    docs = _rp(sf_dir, "documents", ["doc_id", "text"])
    media = docs.map_batches(multimodal.media_table, batch_format="pyarrow")
    return multimodal.scene_cut_stage(media)


def _q_sq8_encode(sf_dir: str):
    from geospatial_learn_ray.stages.knn import sq8_encode

    return sq8_encode(_rp(sf_dir, "embeddings", ["vec_id", "embedding"]))


def _q_event_transitions(sf_dir: str):
    from geospatial_learn_ray.stages.streaming import event_transitions

    return event_transitions(
        _rp(sf_dir, "events", ["user_id", "event_type", "event_id", "ts"]))


def _q_leverage(sf_dir: str):
    from geospatial_learn_ray.stages.train import leverage_topk

    return leverage_topk(_rp(sf_dir, "lineitem",
                             ["l_orderkey", "l_linenumber", "l_quantity",
                              "l_discount", "l_tax"]))


def _q_segment_slopes(sf_dir: str):
    from geospatial_learn_ray.stages.train import segment_slopes

    return segment_slopes(
        _rp(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"]),
        _rp(sf_dir, "customer", ["c_custkey", "c_mktsegment"]))


def _q_cusum_hourly(sf_dir: str):
    from geospatial_learn_ray.stages.streaming import cusum_hourly

    return cusum_hourly(_rp(sf_dir, "events", ["ts"]))


def _q_d8_directions(sf_dir: str):
    small = raster.clip_tiles(read_tiles(tile_px=16), -180.0, -80.0, -90.0, 0.0)
    return raster.d8_directions_stage(small, side=16)


def _q_flow_accum(sf_dir: str):
    small = raster.clip_tiles(read_tiles(tile_px=16), -180.0, -80.0, -90.0, 0.0)
    return raster.flow_accum_stage(small, side=16)


def _q_neyman(sf_dir: str):
    from geospatial_learn_ray.stages.sampling import neyman_allocation

    return neyman_allocation(
        _rp(sf_dir, "orders", ["o_orderpriority", "o_totalprice"]))


def _q_interval_coverage(sf_dir: str):
    from geospatial_learn_ray.stages.streaming import interval_coverage

    return interval_coverage(_rp(sf_dir, "events", ["user_id", "ts", "value"]))


def _q_kcore_hosts(sf_dir: str):
    from geospatial_learn_ray.stages import graph as _graph

    return _graph.kcore_hosts(read_pages(sf_dir, columns=["url"]))


def _q_haar_tiles(sf_dir: str):
    small = raster.clip_tiles(read_tiles(tile_px=16), -180.0, -80.0, -90.0, 0.0)
    return raster.haar_tiles_stage(small, side=16)


def _q_watershed(sf_dir: str):
    small = raster.clip_tiles(read_tiles(tile_px=16), -180.0, -80.0, -90.0, 0.0)
    return raster.watershed_basins_stage(small, side=16)


def _q_focal_majority(sf_dir: str):
    small = raster.clip_tiles(read_tiles(tile_px=16), -180.0, -80.0, -90.0, 0.0)
    return raster.focal_majority_stage(small, side=16)


def _q_link_predict(sf_dir: str):
    from geospatial_learn_ray.stages import graph as _graph

    return _graph.link_predict_hosts(read_pages(sf_dir, columns=["url"]))


def _q_media_loudness(sf_dir: str):
    from geospatial_learn_ray.stages import multimodal

    docs = _rp(sf_dir, "documents", ["doc_id", "text"])
    media = docs.map_batches(multimodal.media_table, batch_format="pyarrow")
    return multimodal.loudness_stage(media)


def _q_cost_distance(sf_dir: str):
    small = raster.clip_tiles(read_tiles(tile_px=16), -180.0, -80.0, -90.0, 0.0)
    return raster.cost_distance_stage(small, side=16)


def _q_mi_lang_quality(sf_dir: str):
    return textstages.mi_lang_quality(
        _rp(sf_dir, "documents", ["text", "lang"]))


def _q_clustering_coeff(sf_dir: str):
    from geospatial_learn_ray.stages import graph as _graph

    return _graph.clustering_coeff_hosts(read_pages(sf_dir, columns=["url"]))


def _q_variogram(sf_dir: str):
    small = raster.clip_tiles(read_tiles(tile_px=16), -180.0, -80.0, -90.0, 0.0)
    return raster.variogram_stage(small, side=16)


def _q_moran_i(sf_dir: str):
    small = raster.clip_tiles(read_tiles(tile_px=16), -180.0, -80.0, -90.0, 0.0)
    return raster.moran_i_stage(small, side=16)


def _q_getis_gi(sf_dir: str):
    small = raster.clip_tiles(read_tiles(tile_px=16), -180.0, -80.0, -90.0, 0.0)
    return raster.getis_gi_stage(small, side=16)


def _q_bfs_depth_hosts(sf_dir: str):
    from geospatial_learn_ray.stages import graph as _graph

    return _graph.bfs_depth_hosts(read_pages(sf_dir, columns=["url"]))


def _q_theilsen(sf_dir: str):
    from geospatial_learn_ray.stages import train

    return train.theilsen_slopes(
        _rp(sf_dir, "orders",
            ["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"]))


def _q_kn_perplexity(sf_dir: str):
    from geospatial_learn_ray.stages import textstages

    return textstages.kn_perplexity_scores(
        _rp(sf_dir, "documents", ["doc_id", "text"]))


def _q_kriging_grid(sf_dir: str):
    from geospatial_learn_ray.stages.cellindex import kriging_grid

    return kriging_grid(read_pages(sf_dir, columns=["url", "text"]))


def _q_quadtree_cells(sf_dir: str):
    from geospatial_learn_ray.stages.cellindex import quadtree_cells

    return quadtree_cells(read_pages(sf_dir, columns=["url"]))


def _q_hyperanf_hosts(sf_dir: str):
    from geospatial_learn_ray.stages import graph as _graph

    return _graph.hyperanf_hosts(read_pages(sf_dir, columns=["url"]))


def _q_kfold_cv(sf_dir: str):
    from geospatial_learn_ray.stages import train

    ds = _rp(sf_dir, "lineitem", ["l_orderkey", "l_quantity", "l_extendedprice"])
    return train.kfold_cv_1d(ds, "l_quantity", "l_extendedprice",
                             "l_orderkey", k=5)


# everything the contract file's queries()/oracle_sql() reach for
def _q_mann_kendall(sf_dir: str):
    from geospatial_learn_ray.stages import train

    return train.mann_kendall_orders(
        _rp(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"]))


def _q_terrain_indices(sf_dir: str):
    small = raster.clip_tiles(read_tiles(tile_px=16), -180.0, -80.0, -90.0, 0.0)
    return raster.terrain_indices_stage(small, side=16)


def _q_acf_daily(sf_dir: str):
    from geospatial_learn_ray.stages import streaming

    return streaming.acf_daily_orders(_rp(sf_dir, "orders", ["o_orderdate"]))


def _q_mad_outliers(sf_dir: str):
    from geospatial_learn_ray.stages import streaming

    return streaming.mad_outliers_events(
        _rp(sf_dir, "events", ["event_type", "ts"]))


def _q_ams_f2(sf_dir: str):
    from geospatial_learn_ray.stages import sketches

    return sketches.ams_f2(_rp(sf_dir, "events", ["user_id"]), "user_id")


def _q_isotonic(sf_dir: str):
    from geospatial_learn_ray.stages import train

    return train.isotonic_orders(
        _rp(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"]))


def _q_naive_bayes(sf_dir: str):
    from geospatial_learn_ray.stages import textstages

    return textstages.naive_bayes_lang(
        _rp(sf_dir, "documents", ["doc_id", "text", "lang"]))

def _q_gini_nation(sf_dir: str):
    return agg.gini_by_nation(
        _rp(sf_dir, "orders", ["o_custkey", "o_totalprice"]),
        _rp(sf_dir, "customer", ["c_custkey", "c_nationkey"]))

def _q_seasonal_decomp(sf_dir: str):
    from geospatial_learn_ray.stages import streaming

    return streaming.seasonal_decomp_orders(
        _rp(sf_dir, "orders", ["o_orderdate"]))

def _q_dp_simplify(sf_dir: str):
    from geospatial_learn_ray.stages import streaming

    return streaming.simplify_trajectories(
        _rp(sf_dir, "events", ["event_id", "ts", "user_id"]))

def _q_nb_confusion(sf_dir: str):
    from geospatial_learn_ray.stages import textstages

    return textstages.classification_report(
        textstages.naive_bayes_lang(
            _rp(sf_dir, "documents", ["doc_id", "text", "lang"])))

def _q_sssp_hosts(sf_dir: str):
    from geospatial_learn_ray.stages import graph

    return graph.sssp_hosts(read_pages(sf_dir, columns=["url"]))

def _q_kde_grid(sf_dir: str):
    from geospatial_learn_ray.stages.cellindex import kde_heat_grid

    return kde_heat_grid(read_pages(sf_dir, columns=["url"]))

def _q_benford(sf_dir: str):
    return agg.benford_digits(
        _rp(sf_dir, "orders", ["o_totalprice"]))

def _q_kappa(sf_dir: str):
    from geospatial_learn_ray.stages import textstages

    return textstages.cohens_kappa(
        textstages.naive_bayes_lang(
            _rp(sf_dir, "documents", ["doc_id", "text", "lang"])))

def _q_label_centroid(sf_dir: str):
    return knn.label_centroid_cosine(
        _rp(sf_dir, "embeddings", ["embedding", "label"]))

def _q_assoc_rules(sf_dir: str):
    from geospatial_learn_ray.stages import streaming

    return streaming.assoc_rules_events(
        _rp(sf_dir, "events", ["user_id", "event_type"]))

def _q_markov_stationary(sf_dir: str):
    from geospatial_learn_ray.stages import streaming

    return streaming.markov_stationary_events(
        _rp(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"]))

def _q_twap(sf_dir: str):
    from geospatial_learn_ray.stages import streaming

    return streaming.twap_events(
        _rp(sf_dir, "events", ["event_id", "ts", "event_type", "value"]))

def _q_rolling_zscore(sf_dir: str):
    from geospatial_learn_ray.stages import streaming

    return streaming.rolling_zscore_events(
        _rp(sf_dir, "events", ["event_id", "ts", "user_id", "value"]))

def _q_rfm(sf_dir: str):
    return agg.rfm_customers(
        _rp(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"]))

def _q_emerging_hotspots(sf_dir: str):
    from geospatial_learn_ray.stages.cellindex import emerging_hotspots

    return emerging_hotspots(read_pages(sf_dir, columns=["url", "warc_ts"]))

def _q_media_phash(sf_dir: str):
    from geospatial_learn_ray.stages import multimodal

    docs = pa.concat_tables(list(_rp(sf_dir, "documents").iter_batches(batch_format="pyarrow")))
    media = ray.data.from_arrow(multimodal.media_table(docs))
    return multimodal.phash_dedup_stage(media)

def _q_convex_hull(sf_dir: str):
    from geospatial_learn_ray.stages.cellindex import convex_hull_hosts

    return convex_hull_hosts(read_pages(sf_dir, columns=["url"]))

def _q_capped_balance(sf_dir: str):
    from geospatial_learn_ray.stages import streaming

    return streaming.capped_balance_users(
        _rp(sf_dir, "events", ["event_id", "ts", "user_id", "event_type", "value"]))

def _q_psi_drift(sf_dir: str):
    return agg.psi_drift_orders(
        _rp(sf_dir, "orders", ["o_orderdate", "o_totalprice"]))


def _q_setsim_join(sf_dir: str):
    return dedup.setsim_join_docs(
        _rp(sf_dir, "documents", ["doc_id", "text"]))


def _q_bloom_zone(sf_dir: str):
    from geospatial_learn_ray.stages import sketches

    return sketches.bloom_zone_prune(
        _rp(sf_dir, "orders", ["o_orderkey", "o_custkey"]))


def _q_interval_schedule(sf_dir: str):
    from geospatial_learn_ray.stages import streaming

    return streaming.interval_schedule_users(
        _rp(sf_dir, "events", ["event_id", "ts", "user_id"]))


def _q_golden_record(sf_dir: str):
    from geospatial_learn_ray.stages.cdc import golden_record_customers

    return golden_record_customers(
        _rp(sf_dir, "orders",
            ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
             "o_orderdate", "o_orderpriority"]))


def _q_dtw_pairs(sf_dir: str):
    from geospatial_learn_ray.stages import streaming

    return streaming.dtw_pairs_users(
        _rp(sf_dir, "events", ["event_id", "ts", "user_id"]))


def _q_emd_drift(sf_dir: str):
    return agg.emd_drift_orders(
        _rp(sf_dir, "orders", ["o_orderdate", "o_totalprice"]))


def _q_ewma_daily(sf_dir: str):
    from geospatial_learn_ray.stages import streaming

    return streaming.ewma_daily_orders(_rp(sf_dir, "orders", ["o_orderdate"]))

def _q_readability(sf_dir: str):
    return textstages.readability_docs(
        _rp(sf_dir, "documents", ["doc_id", "text"]))


def _q_curvature(sf_dir: str):
    small = raster.clip_tiles(read_tiles(tile_px=16), -180.0, -80.0, -90.0, 0.0)
    return raster.curvature_stage(small, side=16)

def _q_lbp(sf_dir: str):
    small = raster.clip_tiles(read_tiles(tile_px=16), -180.0, -80.0, -90.0, 0.0)
    return raster.lbp_stage(small, side=16)


def _q_survival_gaps(sf_dir: str):
    from geospatial_learn_ray.stages import streaming

    return streaming.survival_gaps_users(
        _rp(sf_dir, "events", ["user_id", "ts"]))

def _q_bootstrap_ci(sf_dir: str):
    from geospatial_learn_ray.stages import streaming

    return streaming.bootstrap_ci_orders(
        _rp(sf_dir, "orders", ["o_orderdate", "o_totalprice"]))


def _q_snap_points(sf_dir: str):
    from geospatial_learn_ray.stages.cellindex import snap_points_pages

    return snap_points_pages(read_pages(sf_dir, columns=["url"]))


def _q_gbm_stumps(sf_dir: str):
    from geospatial_learn_ray.stages import train

    return train.gbm_stumps_lineitem(
        _rp(sf_dir, "lineitem",
            ["l_quantity", "l_discount", "l_extendedprice"]))


def _q_zipf_fit(sf_dir: str):
    return textstages.zipf_fit_docs(
        _rp(sf_dir, "documents", ["doc_id", "text"]))

def _q_changepoint_daily(sf_dir: str):
    from geospatial_learn_ray.stages import streaming

    return streaming.changepoint_daily_orders(
        _rp(sf_dir, "orders", ["o_orderdate"]))

def _q_cdc_chunks(sf_dir: str):
    return dedup.cdc_chunk_dedup(_rp(sf_dir, "documents", ["doc_id", "text"]))


def _q_cube_stats(sf_dir: str):
    return agg.cube_stats_orders(
        _rp(sf_dir, "orders",
            ["o_orderdate", "o_orderpriority", "o_totalprice"]))


def _q_single_linkage(sf_dir: str):
    from geospatial_learn_ray.stages import graph

    return graph.single_linkage_hosts(read_pages(sf_dir, columns=["url"]))


def _q_g2_collocations(sf_dir: str):
    return textstages.g2_collocations(
        _rp(sf_dir, "documents", ["doc_id", "text"]))


def _q_focal_median(sf_dir: str):
    small = raster.clip_tiles(read_tiles(tile_px=16), -180.0, -80.0, -90.0, 0.0)
    return raster.focal_median_stage(small, side=16)


def _q_harris_corners(sf_dir: str):
    small = raster.clip_tiles(read_tiles(tile_px=16), -180.0, -80.0, -90.0, 0.0)
    return raster.harris_corners_stage(small, side=16)


def _q_twi(sf_dir: str):
    small = raster.clip_tiles(read_tiles(tile_px=16), -180.0, -80.0, -90.0, 0.0)
    return raster.twi_stage(small, side=16)


def _q_traj_intersections(sf_dir: str):
    from geospatial_learn_ray.stages import streaming

    return streaming.traj_intersections_users(
        _rp(sf_dir, "events", ["user_id", "ts", "event_id"]))


def _q_closeness(sf_dir: str):
    from geospatial_learn_ray.stages import graph

    return graph.closeness_hosts(read_pages(sf_dir, columns=["url"]))


def _q_rake(sf_dir: str):
    return textstages.rake_keywords(
        _rp(sf_dir, "documents", ["doc_id", "text"]))


def _q_hough_circles(sf_dir: str):
    small = raster.clip_tiles(read_tiles(tile_px=16), -180.0, -80.0, -90.0, 0.0)
    return raster.hough_circles_stage(small, side=16, edge_thresh=0.1)


def _q_iforest(sf_dir: str):
    from geospatial_learn_ray.stages import train

    return train.iforest_orders(
        _rp(sf_dir, "orders",
            ["o_orderkey", "o_totalprice", "o_orderdate", "o_custkey"]))


def _q_media_spectrogram(sf_dir: str):
    from geospatial_learn_ray.stages import multimodal

    docs = _rp(sf_dir, "documents", ["doc_id", "text"])
    media = docs.map_batches(multimodal.media_table, batch_format="pyarrow")
    return multimodal.spectrogram_stage(media)



def _q_seam_carve(sf_dir: str):
    small = raster.clip_tiles(read_tiles(tile_px=16), -180.0, -80.0, -90.0, 0.0)
    return raster.seam_carve_stage(small, side=16)



def _q_sorted_neighborhood(sf_dir: str):
    return textstages.sorted_neighborhood_docs(
        _rp(sf_dir, "documents", ["doc_id", "lang", "text"]))



def _q_attribution(sf_dir: str):
    from geospatial_learn_ray.stages import streaming

    return streaming.attribution_events(
        _rp(sf_dir, "events",
            ["event_id", "ts", "user_id", "event_type", "value"]))



def _q_zorder_layout(sf_dir: str):
    from geospatial_learn_ray.stages.cellindex import zorder_layout_pages

    return zorder_layout_pages(read_pages(sf_dir, columns=["url"]))



def _q_rrf_fusion(sf_dir: str):
    return textstages.rrf_fusion_docs(
        _rp(sf_dir, "documents", ["doc_id", "text"]),
        _rp(sf_dir, "embeddings"))



def _q_textrank(sf_dir: str):
    return textstages.textrank_keywords_docs(
        _rp(sf_dir, "documents", ["text"]))



def _q_als_round(sf_dir: str):
    from geospatial_learn_ray.stages import train

    return train.als_round_events(
        _rp(sf_dir, "events", ["user_id", "event_type"]))



def _q_jenks(sf_dir: str):
    from geospatial_learn_ray.stages.cluster import jenks_breaks_nation

    return jenks_breaks_nation(
        _rp(sf_dir, "orders", ["o_custkey", "o_totalprice"]),
        _rp(sf_dir, "customer", ["c_custkey", "c_nationkey"]),
        _rp(sf_dir, "nation", ["n_nationkey", "n_name"]))



def _q_code_switch(sf_dir: str):
    return textstages.code_switch_docs(
        _rp(sf_dir, "documents", ["doc_id", "text"]))



def _q_source_overlap(sf_dir: str):
    return textstages.source_overlap_docs(
        _rp(sf_dir, "documents", ["text", "source"]))



def _q_tasseled_cap(sf_dir: str):
    return raster.tasseled_cap_stage(read_tiles(tile_px=32), side=32)


def _q_bilinear_resample(sf_dir: str):
    small = raster.clip_tiles(read_tiles(tile_px=16), -180.0, -80.0, -90.0, 0.0)
    return raster.bilinear_resample_stage(small, side=16)


def _q_regex_funnel(sf_dir: str):
    from geospatial_learn_ray.stages import streaming

    return streaming.regex_funnel_events(
        _rp(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"]))


def _q_betweenness(sf_dir: str):
    from geospatial_learn_ray.stages.graph import betweenness_hosts

    return betweenness_hosts(read_pages(sf_dir, columns=["url"]), k_pivots=8)


def _q_mmr_rerank(sf_dir: str):
    return knn.mmr_rerank(_rp(sf_dir, "embeddings"))


def _q_oov_rate(sf_dir: str):
    # the synthetic corpus has ~31 distinct tokens: V=16 keeps a real
    # out-of-vocabulary tail so the OOV path is actually exercised
    return textstages.oov_rate_docs(
        _rp(sf_dir, "documents", ["doc_id", "text"]), vocab_size=16)


def _q_postings_varint(sf_dir: str):
    return textstages.postings_varint_docs(
        _rp(sf_dir, "documents", ["doc_id", "text"]))


def _q_sieve(sf_dir: str):
    small = raster.clip_tiles(read_tiles(tile_px=16), -180.0, -80.0, -90.0, 0.0)
    return raster.sieve_stage(small, side=16)


def _q_brovey(sf_dir: str):
    return raster.brovey_pansharpen_stage(read_tiles(tile_px=32), side=32)


def _q_soundex(sf_dir: str):
    return textstages.soundex_block_parts(_rp(sf_dir, "part", ["p_name"]))


def _q_profile(sf_dir: str):
    return agg.profile_lineitem(
        _rp(sf_dir, "lineitem",
            ["l_quantity", "l_discount", "l_extendedprice",
             "l_returnflag", "l_linestatus", "l_shipdate"]))


def _q_dq_checks(sf_dir: str):
    return agg.dq_checks_orders(
        _rp(sf_dir, "orders",
            ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
             "o_orderdate"]),
        _rp(sf_dir, "customer", ["c_custkey"]))


def _q_tophat(sf_dir: str):
    small = raster.clip_tiles(read_tiles(tile_px=16), -180.0, -80.0, -90.0, 0.0)
    return raster.tophat_stage(small, side=16)


def _q_hilbert_layout(sf_dir: str):
    from geospatial_learn_ray.stages.cellindex import hilbert_layout_pages

    return hilbert_layout_pages(read_pages(sf_dir, columns=["url"]))


def _q_ks_test(sf_dir: str):
    return agg.ks_test_orders(
        _rp(sf_dir, "orders", ["o_orderpriority", "o_totalprice"]))


def _q_mannwhitney(sf_dir: str):
    return agg.mannwhitney_orders(
        _rp(sf_dir, "orders", ["o_orderpriority", "o_totalprice"]))


def _q_assortativity(sf_dir: str):
    from geospatial_learn_ray.stages.graph import assortativity_hosts

    return assortativity_hosts(read_pages(sf_dir, columns=["url"]))


def _q_json_props(sf_dir: str):
    from geospatial_learn_ray.stages import streaming

    return streaming.json_props_events(
        _rp(sf_dir, "events", ["event_type", "props"]))


def _q_fellegi_sunter(sf_dir: str):
    return textstages.fellegi_sunter_parts(
        _rp(sf_dir, "part",
            ["p_partkey", "p_name", "p_brand", "p_type", "p_size",
             "p_retailprice"]))


WMS_ENDPOINT = "https://wms.example/service"
WMS_LAYER = "layer1"


def _q_wms_fetch(sf_dir: str):
    from geospatial_learn_ray.sources import wms

    out = wms.fetch_wms_tiles(wms.wms_manifest(tile_px=16),
                              WMS_ENDPOINT, WMS_LAYER, concurrency=(1, 4))
    return out.select_columns(
        ["tile_x", "tile_y", "minx", "miny", "maxx", "maxy",
         "width", "height", "payload_bytes", "checksum", "first_byte"])


def _q_gdb_convert(sf_dir: str):
    from geospatial_learn_ray.sources.gdb import gdb_convert

    return gdb_convert().drop_columns(["geometry"])


def _q_jsonl_roundtrip(sf_dir: str):
    from geospatial_learn_ray.sources.pages import jsonl_roundtrip

    return jsonl_roundtrip(sf_dir)


def _q_csv_roundtrip(sf_dir: str):
    from geospatial_learn_ray.sources.pages import csv_roundtrip

    return csv_roundtrip(sf_dir)


def _q_percolation(sf_dir: str):
    from geospatial_learn_ray.stages.graph import percolation_curve_hosts

    return percolation_curve_hosts(read_pages(sf_dir, columns=["url"]))


def _q_rbo_snapshots(sf_dir: str):
    return textstages.rbo_snapshot_terms(sf_dir)


def _q_blocking_quality(sf_dir: str):
    return textstages.blocking_quality_parts(
        _rp(sf_dir, "part", ["p_name", "p_brand", "p_size"]))


def _q_learned_index(sf_dir: str):
    from geospatial_learn_ray.stages.train import learned_index_audit

    return learned_index_audit(_rp(sf_dir, "orders", ["o_orderkey"]))


def _q_hex_rollup(sf_dir: str):
    from geospatial_learn_ray.stages.cellindex import hex_rollup_counts

    return hex_rollup_counts(read_pages(sf_dir, columns=["url"]))


def _q_rle_audit(sf_dir: str):
    return agg.rle_runs_audit(
        _rp(sf_dir, "orders",
            ["o_orderkey", "o_orderstatus", "o_orderpriority", "o_custkey"]),
        "o_orderkey", ["o_orderstatus", "o_orderpriority", "o_custkey"])


def _q_ann_ivfpq(sf_dir: str):
    Q, qids = _ann_queries(sf_dir)
    return knn.ivfpq_topk(_rp(sf_dir, "embeddings"), Q, qids, k=10)


def _q_registry_pipeline(sf_dir: str):
    # the §2.10 extension surface end to end: registered UDF chain +
    # registered aggregation, everything dispatched by NAME
    from geospatial_learn_ray.functions import registry

    docs = _rp(sf_dir, "documents", ["lang", "text"])
    prepped = registry.apply_named(docs, ["drop_empty_text", "add_n_chars"])
    return registry.grouped_agg_named(prepped, "lang_char_range", "lang")


def _q_gated_corpus(sf_dir: str):
    return textstages.gated_corpus_pages(read_pages(sf_dir))


def _q_incremental_stats(sf_dir: str):
    ev = _rp(sf_dir, "events", ["event_id", "event_type", "value"])
    base = ev.map_batches(
        lambda b: b[b["event_id"].to_numpy() % 10 != 0], batch_format="pandas")
    delta = ev.map_batches(
        lambda b: b[b["event_id"].to_numpy() % 10 == 0], batch_format="pandas")
    return agg.incremental_stats(base, delta, "event_type", "value")


def _q_matryoshka(sf_dir: str):
    Q, qids = _ann_queries(sf_dir)
    return knn.matryoshka_overlap(_rp(sf_dir, "embeddings"), Q, qids, k=10)


def _q_dataset_fingerprint(sf_dir: str):
    return dedup.dataset_fingerprint(
        _rp(sf_dir, "documents", ["doc_id", "text"]))


def _q_hopping_distinct(sf_dir: str):
    from geospatial_learn_ray.stages import streaming

    return streaming.hopping_distinct_users(
        _rp(sf_dir, "events", ["ts", "user_id"]))


def _q_tokenizer_fertility(sf_dir: str):
    return textstages.tokenizer_fertility_docs(
        _rp(sf_dir, "documents", ["lang", "text"]))


def _q_span_mask(sf_dir: str):
    return textstages.span_mask_docs(
        _rp(sf_dir, "documents", ["doc_id", "text"]))


def _q_ndcg(sf_dir: str):
    return textstages.ndcg_bm25_docs(
        _rp(sf_dir, "documents", ["doc_id", "text"]), BM25_QUERIES, k=10)


def _q_ucb_replay(sf_dir: str):
    from geospatial_learn_ray.stages import streaming

    return streaming.ucb_replay_events(
        _rp(sf_dir, "events", ["ts", "event_type", "value"]))


def _q_consistent_hash(sf_dir: str):
    return textstages.consistent_hash_pages(read_pages(sf_dir, columns=["url"]))


def _q_phrase_search(sf_dir: str):
    return textstages.phrase_search_docs(
        _rp(sf_dir, "documents", ["doc_id", "text"]))


def _q_ktruss(sf_dir: str):
    from geospatial_learn_ray.stages.graph import ktruss_hosts

    return ktruss_hosts(read_pages(sf_dir, columns=["url"]))


def _q_cuped(sf_dir: str):
    return agg.cuped_events(_rp(sf_dir, "events", ["user_id", "ts", "value"]))


def _q_revenue_by_region(sf_dir: str):
    # 4-table star rollup: the dimension chain customer→nation→region is
    # snowflaked DRIVER-SIDE into one broadcast key→region map (dims are
    # small BY DEFINITION), the fact table streams through one map-side
    # broadcast join — the star-schema shape at any fact scale
    customer = pa.concat_tables(list(_rp(sf_dir, "customer",
        ["c_custkey", "c_nationkey"]).iter_batches(batch_format="pyarrow"))).to_pandas()
    nation = pa.concat_tables(list(_rp(sf_dir, "nation",
        ["n_nationkey", "n_regionkey"]).iter_batches(batch_format="pyarrow"))).to_pandas()
    region = pa.concat_tables(list(_rp(sf_dir, "region",
        ["r_regionkey", "r_name"]).iter_batches(batch_format="pyarrow"))).to_pandas()
    dim = (customer.merge(nation, left_on="c_nationkey", right_on="n_nationkey")
           .merge(region, left_on="n_regionkey", right_on="r_regionkey")
           [["c_custkey", "r_name"]])
    orders = _rp(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    joined = joins.broadcast_join(orders, dim, "o_custkey", "c_custkey", how="inner")
    return agg.grouped_stats(joined, "r_name", "o_totalprice",
                             stats=("count", "sum"), round_to=2)


def _q_bearing_octants(sf_dir: str):
    from geospatial_learn_ray.stages import streaming

    return streaming.bearing_octants(
        _rp(sf_dir, "events", ["event_id", "ts", "user_id"]))


def _q_spearman(sf_dir: str):
    return agg.spearman_lineitem(
        _rp(sf_dir, "lineitem", ["l_quantity", "l_discount"]))


def _q_clahe(sf_dir: str):
    small = raster.clip_tiles(read_tiles(tile_px=16), -180.0, -80.0, -135.0, -40.0)
    return raster.clahe_stage(small, side=16)


def _q_integral_image(sf_dir: str):
    small = raster.clip_tiles(read_tiles(tile_px=16), -180.0, -80.0, -135.0, -40.0)
    return raster.integral_image_stage(small, side=16)


def _q_cva_change(sf_dir: str):
    small = raster.clip_tiles(read_tiles(tile_px=16), -180.0, -80.0, -135.0, -40.0)
    return raster.cva_change_stage(small, side=16)


def _q_ppr(sf_dir: str):
    from geospatial_learn_ray.stages.graph import ppr_hosts

    return ppr_hosts(read_pages(sf_dir, columns=["url"]))


def _q_coloring(sf_dir: str):
    from geospatial_learn_ray.stages.graph import speculative_coloring_hosts

    return speculative_coloring_hosts(read_pages(sf_dir, columns=["url"]))


def _q_cart_depth2(sf_dir: str):
    from geospatial_learn_ray.stages.train import cart_depth2_lineitem

    return cart_depth2_lineitem(
        _rp(sf_dir, "lineitem",
            ["l_quantity", "l_discount", "l_tax", "l_returnflag"]))


def _q_ann_binary(sf_dir: str):
    Q, qids = _ann_queries(sf_dir)
    return knn.binary_quant_topk(_rp(sf_dir, "embeddings"), Q, qids, k=10)


def _q_zonemap(sf_dir: str):
    return agg.zonemap_stats(
        _rp(sf_dir, "lineitem", ["l_orderkey", "l_quantity"]),
        "l_orderkey", "l_quantity")


def _q_good_turing(sf_dir: str):
    return textstages.good_turing_docs(_rp(sf_dir, "documents", ["doc_id", "text"]))


def _q_vocab_growth(sf_dir: str):
    return textstages.vocab_growth_docs(_rp(sf_dir, "documents", ["doc_id", "text"]))


def _q_colour_thresh(sf_dir: str):
    small = raster.clip_tiles(read_tiles(tile_px=16), -180.0, -80.0, -90.0, 0.0)
    return raster.colour_thresh_stage(small)


def _q_phasecong(sf_dir: str):
    small = raster.clip_tiles(read_tiles(tile_px=16), -180.0, -80.0, -135.0, -40.0)
    return raster.phasecong_stage(small, side=16)


def _q_ms_toposeg(sf_dir: str):
    # composed canny → topo-ACWE(edge burn) → CCL → cross-tile merge:
    # an 8×8-tile clip keeps the chained SQL twin's unrolled rounds fast
    small = raster.clip_tiles(read_tiles(tile_px=16), -180.0, -80.0, -135.0, -40.0)
    return raster.ms_toposeg_stage(small, side=16, iterations=4,
                                   grid_x=8, grid_y=8)


def _q_rf_predict(sf_dir: str):
    """Bagged-CART random forest (reference learning.py clfdict's
    RandomForest workhorse): 8 hash-bagged depth-2 trees, exact histogram
    split search, majority-vote prediction over every row."""
    from geospatial_learn_ray.stages import train

    return train.rf_predict_lineitem(
        _rp(sf_dir, "lineitem",
            ["l_orderkey", "l_linenumber", "l_quantity", "l_discount",
             "l_tax"]))


def _q_semseg_cnn(sf_dir: str):
    """CNN semantic segmentation (reference convnet.py:431 semseg_pred):
    integer-weight conv forward in an actor pool over a 16×16-tile clip
    (keeps the 27-step SQL window chain fast)."""
    small = raster.clip_tiles(read_tiles(tile_px=16), -180.0, -80.0, -90.0, 0.0)
    return scorer.semseg_cnn_stage(small, side=16)


def _q_tiff_roundtrip(sf_dir: str):
    """Real-format egress+ingest: tiles → per-tile GeoTIFF files →
    windowed read back → exact-integer per-tile aggregate. The oracle
    aggregates the closed-form raster directly, so a green hash proves
    the TIFF codec round-trips every f32 pixel bit-exactly (reference
    raster.py:287 array2raster / raster.py:373 raster2array)."""
    from geospatial_learn_ray.sources import tiff as tiffsrc
    from geospatial_learn_ray.state.scratch import scratch_dir

    out = scratch_dir("graft_tiff_")
    manifest = tiffsrc.write_tiles_to_tiffs(read_tiles(tile_px=32), out,
                                            tile_px=32)
    n = manifest.count()  # consume the write before reading back
    assert n == GRID_X * GRID_Y, n
    back = tiffsrc.read_tiffs_to_tiles(out)

    def agg_batch(b: pd.DataFrame) -> pd.DataFrame:
        V = np.stack(b["band_values"].to_numpy())
        qs = np.floor(V.astype(np.float64) * 64.0 + 0.5).astype(np.int64)
        return pd.DataFrame({
            "tile_x": b["tile_x"].to_numpy(np.int64),
            "tile_y": b["tile_y"].to_numpy(np.int64),
            "n_px": np.full(len(b), qs.shape[1], np.int64),
            "q_sum": qs.sum(axis=1), "q_min": qs.min(axis=1),
            "q_max": qs.max(axis=1)})

    return back.map_batches(agg_batch, batch_format="pandas")


def _q_tiff_scene_windows(sf_dir: str):
    """Whole-scene GeoTIFF + strip-pruned WINDOWED reads (the GDAL
    ReadAsArray(col, row, w, h) model, reference raster.py:373): one
    1024×512 scene written once, every task seeks only its window's
    strips, per-window exact-integer aggregate."""
    import os

    from geospatial_learn_ray.sources import tiff as tiffsrc
    from geospatial_learn_ray.state.scratch import scratch_dir

    d = scratch_dir("graft_tiffscene_")
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, "scene.tif")
    tiffsrc.write_scene_tiff(path, grid_x=32, grid_y=16, tile_px=32)
    back = tiffsrc.read_scene_windows(path, grid_x=32, grid_y=16, tile_px=32)

    def agg_batch(b: pd.DataFrame) -> pd.DataFrame:
        V = np.stack(b["band_values"].to_numpy())
        qs = np.floor(V.astype(np.float64) * 64.0 + 0.5).astype(np.int64)
        return pd.DataFrame({
            "tile_x": b["tile_x"].to_numpy(np.int64),
            "tile_y": b["tile_y"].to_numpy(np.int64),
            "n_px": np.full(len(b), qs.shape[1], np.int64),
            "q_sum": qs.sum(axis=1), "q_min": qs.min(axis=1),
            "q_max": qs.max(axis=1)})

    return back.map_batches(agg_batch, batch_format="pandas")


def _q_k_anonymity(sf_dir: str):
    """Release-governance audit: k-anonymity + l-diversity per
    quasi-identifier group (nation, market segment) with the account
    balance bucketed to exact thousands as the sensitive attribute."""
    from geospatial_learn_ray.stages.governance import k_anonymity_audit

    ds = _rp(sf_dir, "customer",
             ["c_nationkey", "c_mktsegment", "c_acctbal"])

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "c_nationkey": b["c_nationkey"].to_numpy(np.int64),
            "c_mktsegment": b["c_mktsegment"],
            "bal_k": np.floor(b["c_acctbal"].to_numpy(np.float64)
                              / 1000.0).astype(np.int64)})

    return k_anonymity_audit(ds.map_batches(prep, batch_format="pandas"),
                             ["c_nationkey", "c_mktsegment"], "bal_k",
                             k=5, l=2)


def _q_warc_roundtrip(sf_dir: str):
    """REAL WARC(.gz) egress + ingest (the CommonCrawl interchange
    format, stdlib gzip): pages → member-per-record gzip shards → parse
    back → (url, date, payload fingerprint). The oracle restates the
    payload from the pages generator, so a green hash certifies the
    full record framing + gzip round-trip."""
    import os

    from geospatial_learn_ray.functions.hashing import fnv1a64
    from geospatial_learn_ray.sources import warc
    from geospatial_learn_ray.state.scratch import scratch_dir

    out = scratch_dir("graft_warc_")
    pages = read_pages(sf_dir, columns=["url", "warc_ts", "html"])
    man = warc.write_warc_shards(pages, out)
    n_shards = man.count()
    assert n_shards > 0
    back = warc.read_warc_shards(out)

    def fingerprint(b: pd.DataFrame) -> pd.DataFrame:
        payload = b["payload"].to_numpy(object)
        text = np.array([p.decode("ascii") for p in payload], object)
        return pd.DataFrame({
            "url": b["url"],
            "warc_ts": b["warc_ts"].to_numpy("datetime64[us]"),
            "payload_len": np.array([len(p) for p in payload], np.int64),
            "payload_fnv": fnv1a64(text).view(np.int64)})

    return back.map_batches(fingerprint, batch_format="pandas")


def _q_warc_corpus(sf_dir: str):
    """The web-scale ingest story end to end, every stage previously
    oracled: WARC(.gz) shards → distributed record parse → html→text
    extraction → language ID + quality scoring (one map) → quality
    gate → exact text dedup (hash-bucketed, combiner keyed on the real
    text) → per-language corpus rollup. Output is O(#languages)."""
    import os

    from geospatial_learn_ray.functions import textproc
    from geospatial_learn_ray.functions.hashing import fnv1a64, splitmix64
    from geospatial_learn_ray.sources import warc
    from geospatial_learn_ray.stages.exchange import bucket_exchange
    from geospatial_learn_ray.state.scratch import scratch_dir

    out = scratch_dir("graft_warccp_")
    pages = read_pages(sf_dir, columns=["url", "warc_ts", "html"])
    assert warc.write_warc_shards(pages, out).count() > 0
    back = warc.read_warc_shards(out)

    def to_html(b: pa.Table) -> pa.Table:
        return pa.table({"url": b["url"], "html": b["payload"]})

    extracted = extract_stage(back.map_batches(to_html, batch_format="pyarrow"),
                              keep_cols=("url",))

    def score(b: pd.DataFrame) -> pd.DataFrame:
        lang = textproc.lang_id(b["text"]).to_numpy()
        q = round_half_away(
            textproc.quality_scores(b["text"])["quality"].to_numpy(), 4)
        keep = q > 0.5
        g = pd.DataFrame({"text": b["text"].to_numpy(object)[keep],
                          "lang_pred": lang[keep]})
        old = np.seterr(over="ignore")
        try:
            g["_part"] = (splitmix64(fnv1a64(g["text"].to_numpy(object)))
                          % np.uint64(64)).astype(np.int32)
        finally:
            np.seterr(**old)
        return g

    def dedup_combine(g: pd.DataFrame) -> pd.DataFrame:
        d = (g.groupby("text", sort=False)
             .agg(lang_pred=("lang_pred", "min")).reset_index())
        part = (pd.DataFrame({
            "lang_pred": d["lang_pred"],
            "n_docs": np.ones(len(d), np.int64),
            "n_chars": d["text"].str.len().to_numpy(np.int64)})
            .groupby("lang_pred", sort=False, as_index=False).sum())
        part["n_docs"] = part["n_docs"].astype(np.int64)
        part["n_chars"] = part["n_chars"].astype(np.int64)
        part["_part"] = np.int32(0)
        return part

    def lang_combine(g: pd.DataFrame) -> pd.DataFrame:
        s = (g.drop(columns=["_part"])
             .groupby("lang_pred", sort=False, as_index=False).sum())
        s["n_docs"] = s["n_docs"].astype(np.int64)
        s["n_chars"] = s["n_chars"].astype(np.int64)
        return s

    deduped = bucket_exchange(
        extracted.map_batches(score, batch_format="pandas"), dedup_combine)
    return bucket_exchange(deduped, lang_combine, small_partials=True)


def _q_gazetteer(sf_dir: str):
    """Aho-Corasick gazetteer matching (the large-dictionary scale path
    the regex blocklist filters can't take): dense automaton per actor,
    lockstep vectorized batch matching."""
    return textstages.gazetteer_match_stage(
        _rp(sf_dir, "documents", ["doc_id", "text"]))


def _q_png_roundtrip(sf_dir: str):
    """REAL PNG codec round-trip per document (functions/pngcodec —
    stdlib zlib): stats computed from decoded pixels; oracle restates
    the keystream, certifying encode→decode bit-exactness."""
    from geospatial_learn_ray.stages.multimodal import png_roundtrip_stage

    return png_roundtrip_stage(_rp(sf_dir, "documents", ["doc_id"]))


def _q_scene_semseg_zonal(sf_dir: str):
    """Composed round-5 pipeline: scene GeoTIFF → strip-pruned windowed
    ingest → integer-CNN semantic segmentation (actor pool) → per-tile
    class counts → tile-center→polygon zonal rollup. Every stage is the
    already-oracled operator; the composition is value-hash-checked end
    to end."""
    import os

    from geospatial_learn_ray.functions.geometry import PolygonIndex
    from geospatial_learn_ray.sources import tiff as tiffsrc
    from geospatial_learn_ray.sources.tiles import tile_bounds
    from geospatial_learn_ray.state.scratch import scratch_dir

    d = scratch_dir("graft_semsegzonal_")
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, "scene.tif")
    tiffsrc.write_scene_tiff(path, grid_x=16, grid_y=16, tile_px=16)
    wins = tiffsrc.read_scene_windows(path, grid_x=16, grid_y=16, tile_px=16)
    per_tile = scorer.semseg_cnn_stage(wins, side=16)

    polys = polygon_table()
    ref = ray.data.from_pandas  # noqa: F841 (keep import surface minimal)
    import ray as _ray

    pref = _ray.put(polys)

    class ZonalMap:
        def __init__(self, r):
            t = _ray.get(r) if isinstance(r, _ray.ObjectRef) else r
            self.index = PolygonIndex.from_wkb(
                t["feature_id"].to_numpy(), t["geometry"].to_pylist())

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            tx = b["tile_x"].to_numpy(np.int64)
            ty = b["tile_y"].to_numpy(np.int64)
            minx, miny, maxx, maxy = tile_bounds(tx, ty)
            tidx, fids = self.index.query((minx + maxx) / 2,
                                          (miny + maxy) / 2)
            out = b.iloc[tidx].copy()
            out["feature_id"] = fids
            return out[["feature_id", "n_c0", "n_c1", "n_c2",
                        "win_logit_sum"]]

    mapped = per_tile.map_batches(ZonalMap, fn_constructor_args=(pref,),
                                  batch_format="pandas", concurrency=(1, 4))
    from ray.data.aggregate import Count, Sum

    agg_ds = mapped.groupby("feature_id").aggregate(
        Count(alias_name="n_tiles"), Sum("n_c0", alias_name="n_c0"),
        Sum("n_c1", alias_name="n_c1"), Sum("n_c2", alias_name="n_c2"),
        Sum("win_logit_sum", alias_name="win_logit_sum"))

    def retype(b: pd.DataFrame) -> pd.DataFrame:
        for c in b.columns:
            b[c] = b[c].astype(np.int64)
        return b

    return agg_ds.map_batches(retype, batch_format="pandas")


def _q_compact_plan(sf_dir: str):
    """Compaction planning over the per-host shard manifest: host byte
    totals (one exchange) → distributed prefix-sum bin packing into
    256 KiB merge groups (stages/scan.compact_plan)."""
    from geospatial_learn_ray.functions.hashing import fnv1a64, splitmix64
    from geospatial_learn_ray.stages.exchange import bucket_exchange
    from geospatial_learn_ray.stages.scan import compact_plan

    pages = read_pages(sf_dir, columns=["url", "text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        host = b["url"].str.extract(r"^[a-z]+://([^/]+)/", expand=False).fillna("")
        nb = b["text"].str.encode("utf-8").str.len().astype(np.int64)
        g = (pd.DataFrame({"host": host, "nbytes": nb})
             .groupby("host", sort=False)["nbytes"].sum().reset_index())
        g["nbytes"] = g["nbytes"].astype(np.int64)
        old = np.seterr(over="ignore")
        try:
            g["_part"] = (splitmix64(fnv1a64(g["host"].to_numpy(object)))
                          % np.uint64(64)).astype(np.int32)
        finally:
            np.seterr(**old)
        return g

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("host", sort=False, as_index=False)["nbytes"].sum()
        s["nbytes"] = s["nbytes"].astype(np.int64)
        old = np.seterr(over="ignore")
        try:
            s["hkey"] = splitmix64(
                fnv1a64(s["host"].to_numpy(object))).view(np.int64)
        finally:
            np.seterr(**old)
        return s

    manifest = bucket_exchange(
        pages.map_batches(partial, batch_format="pandas"), combine,
        small_partials=True)
    return compact_plan(manifest, "hkey", "nbytes", target_bytes=1 << 18)


def _q_dp_counts(sf_dir: str):
    from geospatial_learn_ray.stages.governance import dp_noisy_counts

    return dp_noisy_counts(_rp(sf_dir, "events", ["event_type"]),
                           "event_type", seed=2024, bound=5)


def _q_rf_oob(sf_dir: str):
    from geospatial_learn_ray.stages import train

    return train.rf_oob_error(
        _rp(sf_dir, "lineitem",
            ["l_orderkey", "l_linenumber", "l_quantity", "l_discount",
             "l_tax"]))


# KEEP LAST: evaluated at import; any _q_* defined below it would be
# invisible to __ray_entry__'s `import *`.
__all__ = [n for n in list(globals()) if n.startswith("_q_")] + [
    "BM25_QUERIES",
    "EVENTS_LO", "EVENTS_HI", "LARGE_ORDER", "PROBA_INTERCEPT",
    "RIDGE_LAMBDAS", "VOTE_MODELS", "WMS_ENDPOINT", "WMS_LAYER",
    "_MIX_RATES", "_rp",
    "_shape_props_sql", "_wkb_to_geojson_sql",
]
