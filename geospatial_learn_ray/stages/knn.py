"""kNN — per-cell spatial kNN with neighbor-ring spill, and embedding ANN.

north_star: "kNN via per-cell local ball-tree actors with neighbor-ring
spill". Shape:

1. every point is replicated to its own hex cell and its ring-1 neighbor
   cells (flat_map ×7, cheap narrow rows) with a ``home`` flag;
2. ``groupby(cell).map_groups``: within each group a local index answers
   kNN for the group's *home* points using home+spill candidates;
3. exactness guarantee: a home point's true k-th neighbor is found iff it
   lies within one cell ring — i.e. distance < hex apothem; each output row
   carries ``exact`` marking whether kth_dist is inside the guarantee
   radius (the resolution is chosen so P99 of kth_dist passes).

Distance metric: planar equirectangular degrees with cos(lat) longitude
scaling — stated explicitly; the brute-force test oracle uses the same.

Embedding ANN (similarity search over list<float> embeddings):
- brute-force cosine top-k: numpy matmul per batch against a broadcast
  query matrix (partial top-k per batch → tiny global merge);
- IVF variant: deterministic seeded k-means-lite centroids, inverted
  lists per centroid, probe the nearest ``nprobe`` lists.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..functions import geo


def planar_dist2(lon0, lat0, lon1, lat1):
    """Squared equirectangular distance in degrees² (cos-lat scaled)."""
    kx = np.cos(np.radians((lat0 + lat1) / 2.0))
    dx = (lon0 - lon1) * kx
    dy = lat0 - lat1
    return dx * dx + dy * dy


def knn_per_cell(
    ds: ray.data.Dataset,
    k: int = 5,
    res: int = 5,
    id_col: str = "url",
) -> ray.data.Dataset:
    """points(id, lon, lat) → (id, neighbor_id, dist, rank, exact) exact-
    within-ring kNN. Requires lon/lat columns; cells computed at ``res``."""
    guard = geo._hex_edge(res) * np.sqrt(3.0) / 2.0  # hex apothem (degrees)

    def replicate(batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy()
        lat = batch["lat"].to_numpy()
        home = geo.hex_latlng_to_cell(lat, lon, res)
        ring = geo.hex_k_ring(home, 1)  # [n, 7] — offset 0 is the home cell
        n, m = ring.shape
        ids = np.repeat(np.asarray(batch[id_col]), m)
        home_flag = ring.ravel() == np.repeat(home, m)
        return pa.table(
            {
                id_col: pa.array(ids),
                "lon": pa.array(np.repeat(lon, m)),
                "lat": pa.array(np.repeat(lat, m)),
                "cell": pa.array(ring.ravel()),
                "home": pa.array(home_flag),
            }
        )

    def add_part(b: pa.Table) -> pa.Table:
        # coarse reducer bucket of the cell key: one vectorized map_groups
        # call per bucket (~64), never one Python call per cell
        part = (b["cell"].to_numpy() % np.uint64(64)).astype(np.int32)
        return b.append_column("_part", pa.array(part))

    replicated = ds.map_batches(replicate, batch_format="pyarrow").map_batches(add_part, batch_format="pyarrow")

    def _empty(dtype) -> pd.DataFrame:
        return pd.DataFrame(
            {id_col: pd.Series([], dtype=dtype), "neighbor_id": pd.Series([], dtype=dtype),
             "dist": pd.Series([], dtype=np.float64), "rank": pd.Series([], dtype=np.int64),
             "exact": pd.Series([], dtype=bool)}
        )

    def cell_knn(g: pd.DataFrame, out_rows: list) -> None:
        home = g["home"].to_numpy()
        if not home.any():
            return
        lon_c = g["lon"].to_numpy()
        lat_c = g["lat"].to_numpy()
        ids_c = g[id_col].to_numpy()
        hidx = np.nonzero(home)[0]
        d2 = planar_dist2(lon_c[hidx, None], lat_c[hidx, None], lon_c[None, :], lat_c[None, :])
        for row, i in enumerate(hidx):
            di = np.where(ids_c == ids_c[i], np.inf, d2[row])
            kk = min(k, int(np.isfinite(di).sum()))
            if kk == 0:
                continue
            order = np.lexsort((ids_c, di))[:kk]  # deterministic (dist, id)
            dist = np.sqrt(di[order])
            out_rows.append(
                pd.DataFrame(
                    {
                        id_col: ids_c[i],
                        "neighbor_id": ids_c[order],
                        "dist": np.round(dist, 8),
                        "rank": np.arange(1, kk + 1),
                        "exact": dist[kk - 1] <= guard if kk == k else False,
                    }
                )
            )

    def part_knn(g: pd.DataFrame) -> pd.DataFrame:
        out_rows: list = []
        for _, cell_g in g.groupby("cell", sort=False):
            cell_knn(cell_g, out_rows)
        if not out_rows:
            return _empty(g[id_col].dtype)
        return pd.concat(out_rows, ignore_index=True)

    return replicated.groupby("_part").map_groups(part_knn, batch_format="pandas")


# --- embedding similarity search ------------------------------------------

def ann_bruteforce_topk(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Exact cosine top-k: broadcast query matrix (ray.put), per-batch numpy
    matmul emitting partial top-k rows (≤ Q·k per batch), tiny global merge
    on the driver. The baseline for ANN recall tests."""
    Qn = queries / np.linalg.norm(queries, axis=1, keepdims=True).clip(min=1e-12)
    qref = ray.put((Qn, np.asarray(query_ids)))

    class PartialTopK:
        def __init__(self, ref):
            self.Q, self.qids = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            X = np.stack(b[vec_col].to_numpy()).astype(np.float64)
            X = X / np.linalg.norm(X, axis=1, keepdims=True).clip(min=1e-12)
            ids = b[id_col].to_numpy()
            sims = self.Q @ X.T  # [Q, n]
            kk = min(k, sims.shape[1])
            out = []
            for qi in range(len(self.Q)):
                s = sims[qi]
                order = np.lexsort((ids, -s))[:kk]
                out.append(pd.DataFrame({"query_id": self.qids[qi], "neighbor_id": ids[order], "cosine": s[order]}))
            return pd.concat(out, ignore_index=True)

    partials = ds.map_batches(PartialTopK, fn_constructor_args=(qref,), batch_format="pandas",
                              concurrency=(1, 8), num_cpus=1).to_pandas()
    final = []
    for qid, g in partials.groupby("query_id"):
        g = g.sort_values(["cosine", "neighbor_id"], ascending=[False, True]).head(k).copy()
        g["rank"] = np.arange(1, len(g) + 1)
        final.append(g)
    out = pd.concat(final, ignore_index=True)
    out["cosine"] = out["cosine"].round(6)
    return out


def ivf_build_centroids(ds: ray.data.Dataset, n_centroids: int = 16, vec_col: str = "embedding",
                        sample_frac: float = 0.2, iters: int = 5, seed: int = 3, dim: int = 64) -> np.ndarray:
    """Deterministic k-means-lite on a driver-side sample (the scale path
    trains on a bounded sample regardless of data size)."""
    sample = np.stack(
        ds.select_columns([vec_col]).random_sample(sample_frac, seed=seed).to_pandas()[vec_col].to_numpy()
    ).astype(np.float64)
    sample = sample / np.linalg.norm(sample, axis=1, keepdims=True).clip(min=1e-12)
    rng = np.random.default_rng(seed)
    C = sample[rng.choice(len(sample), n_centroids, replace=False)]
    for _ in range(iters):
        assign = (sample @ C.T).argmax(axis=1)
        for c in range(n_centroids):
            m = assign == c
            if m.any():
                v = sample[m].mean(axis=0)
                C[c] = v / np.linalg.norm(v).clip(min=1e-12)
    return C


def ivf_topk(
    ds: ray.data.Dataset, queries: np.ndarray, query_ids: np.ndarray, centroids: np.ndarray,
    k: int = 10, nprobe: int = 4, id_col: str = "vec_id", vec_col: str = "embedding",
) -> pd.DataFrame:
    """IVF ANN: assign vectors to nearest centroid in map_batches, keep only
    vectors in each query's ``nprobe`` nearest lists, exact cosine there.
    Approximate (recall measured in tests against the brute-force path)."""
    Qn = queries / np.linalg.norm(queries, axis=1, keepdims=True).clip(min=1e-12)
    probe = np.argsort(-(Qn @ centroids.T), axis=1)[:, :nprobe]  # [Q, nprobe]
    probe_sets = [set(p.tolist()) for p in probe]
    ref = ray.put((Qn, np.asarray(query_ids), centroids, probe_sets))

    class IVFTopK:
        def __init__(self, r):
            self.Q, self.qids, self.C, self.probe_sets = ray.get(r) if isinstance(r, ray.ObjectRef) else r

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            X = np.stack(b[vec_col].to_numpy()).astype(np.float64)
            X = X / np.linalg.norm(X, axis=1, keepdims=True).clip(min=1e-12)
            ids = b[id_col].to_numpy()
            assign = (X @ self.C.T).argmax(axis=1)
            out = []
            kk = min(k, len(X))
            for qi in range(len(self.Q)):
                m = np.isin(assign, list(self.probe_sets[qi]))
                if not m.any():
                    continue
                s = self.Q[qi] @ X[m].T
                sub_ids = ids[m]
                order = np.lexsort((sub_ids, -s))[: min(kk, m.sum())]
                out.append(pd.DataFrame({"query_id": self.qids[qi], "neighbor_id": sub_ids[order], "cosine": s[order]}))
            if not out:
                return pd.DataFrame({"query_id": pd.Series([], np.int64), "neighbor_id": pd.Series([], np.int64), "cosine": pd.Series([], np.float64)})
            return pd.concat(out, ignore_index=True)

    partials = ds.map_batches(IVFTopK, fn_constructor_args=(ref,), batch_format="pandas",
                              concurrency=(1, 8)).to_pandas()
    final = []
    for qid, g in partials.groupby("query_id"):
        g = g.sort_values(["cosine", "neighbor_id"], ascending=[False, True]).head(k).copy()
        g["rank"] = np.arange(1, len(g) + 1)
        final.append(g)
    if not final:
        return pd.DataFrame({"query_id": [], "neighbor_id": [], "cosine": [], "rank": []})
    out = pd.concat(final, ignore_index=True)
    out["cosine"] = out["cosine"].round(6)
    return out
