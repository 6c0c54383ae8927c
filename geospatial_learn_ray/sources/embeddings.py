"""Embedding table helpers, incl. the planted-near-duplicate fixture.

The driver's ``embeddings.parquet`` vectors are random (max pairwise cosine
≈0.51 at sf0.01), so an honest near-dup detector must return zero pairs.
To exercise the operator, ``with_planted_dups`` appends a perturbed copy of
every ``vec_id % 10 == 0`` vector (id + PLANT_OFFSET, deterministic ±0.5%
coordinate noise from splitmix64) — cosine(original, copy) ≥ 0.999, so the
LSH pipeline must recover exactly those pairs (pytest asserts recall=1)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..functions.hashing import splitmix64

PLANT_OFFSET = 1_000_000


def with_planted_dups(ds: ray.data.Dataset, id_col: str = "vec_id", vec_col: str = "embedding") -> ray.data.Dataset:
    def plant(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy()
        mask = ids % 10 == 0
        if not mask.any():
            return b
        X = np.stack([np.asarray(v, np.float64) for v in b[vec_col].to_pylist()])
        sel = X[mask]
        sel_ids = ids[mask]
        dim = sel.shape[1]
        noise_seed = (sel_ids[:, None] * np.int64(dim) + np.arange(dim)[None, :]).astype(np.uint64)
        noise = (splitmix64(noise_seed.ravel()).reshape(sel.shape).astype(np.float64) / 2.0**64 - 0.5) * 0.01
        pert = (sel * (1.0 + noise)).astype(np.float32)
        extra = pa.table(
            {
                id_col: pa.array(sel_ids + PLANT_OFFSET, pa.int64()),
                vec_col: pa.array(list(pert), pa.list_(pa.float32())),
                "label": b["label"].filter(pa.array(mask)),
            }
        )
        return pa.concat_tables([b.select([id_col, vec_col, "label"]), extra])

    return ds.map_batches(plant, batch_format="pyarrow")
