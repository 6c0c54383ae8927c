"""User-extension registry — the Ray mapping of the reference's
extension surfaces (SURVEY.md §2.10): the ``clfdict``/``regdict``
string→estimator registries (learning.py:560-592,804-823), the
``stat=`` dispatch-by-string of zonal_stats / statChoose / shape_props
(shape.py:1023-1068, raster.py:2345, shape.py:399), and the pluggable
pipeline hook. Here the surface is "write a function, register it":

- **batch UDFs** (name → ``Callable[[pa.Table], pa.Table]``): applied by
  name with ``apply_named`` — each becomes one ``map_batches`` stage, so
  a registered UDF inherits the engine's streaming/zero-copy semantics;
- **named aggregations** (name → (partial, combine) pair): the
  decomposable-combiner contract every exchange in this repo uses —
  ``grouped_agg_named`` runs partial per batch, one bucketed exchange,
  combine per bucket;
- **stat dispatch**: ``zonal_stats_by_name`` routes a stat STRING to
  ``grouped_stats`` (decomposable) or ``grouped_holistic`` (holistic) —
  the statChoose analogue, with the routing table explicit.
"""

from __future__ import annotations

from collections.abc import Callable

import pyarrow as pa
import ray.data

UDFS: dict[str, Callable] = {}
AGGS: dict[str, tuple[Callable, Callable]] = {}


def register_udf(name: str, fn: Callable, overwrite: bool = False) -> None:
    if name in UDFS and not overwrite:
        raise ValueError(f"UDF {name!r} already registered (overwrite=True to replace)")
    UDFS[name] = fn


def register_agg(name: str, partial: Callable, combine: Callable,
                 overwrite: bool = False) -> None:
    if name in AGGS and not overwrite:
        raise ValueError(f"aggregation {name!r} already registered")
    AGGS[name] = (partial, combine)


def apply_named(ds: ray.data.Dataset, names: list[str],
                batch_format: str = "pyarrow") -> ray.data.Dataset:
    """Chain registered batch-UDFs by name — unknown names fail loudly
    BEFORE any execution (lazy plans surface errors late otherwise)."""
    missing = [n for n in names if n not in UDFS]
    if missing:
        raise KeyError(f"unregistered UDFs: {missing}; have {sorted(UDFS)}")
    for n in names:
        ds = ds.map_batches(UDFS[n], batch_format=batch_format)
    return ds


def grouped_agg_named(ds: ray.data.Dataset, name: str,
                      keys: list[str] | str) -> ray.data.Dataset:
    """Run a registered (partial, combine) aggregation through the
    engine's standard coarse-bucket exchange."""
    from ..stages.agg import _add_part
    from ..stages.exchange import bucket_exchange

    if name not in AGGS:
        raise KeyError(f"unregistered aggregation {name!r}; have {sorted(AGGS)}")
    keys = [keys] if isinstance(keys, str) else list(keys)
    partial, combine = AGGS[name]
    parted = ds.map_batches(partial, batch_format="pandas").map_batches(
        lambda b: _add_part(b, keys), batch_format="pandas")
    return bucket_exchange(parted, combine, small_partials=True)


# stat-name → (implementing stage, kwargs) routing table: the statChoose /
# zonal_stats `stat=` dispatch, with the decomposable/holistic split the
# reference hides inside N separate raster passes made explicit.
DECOMPOSABLE_STATS = ("count", "sum", "mean", "min", "max", "std", "var")
HOLISTIC_STATS = ("median", "percentile", "skew", "kurt", "mode")


def zonal_stats_by_name(ds: ray.data.Dataset, keys: list[str] | str,
                        value_col: str, stat: str,
                        round_to: int | None = 4,
                        percentile: float = 95.0) -> ray.data.Dataset:
    from ..stages import agg

    if stat in DECOMPOSABLE_STATS:
        return agg.grouped_stats(ds, keys, value_col, stats=(stat,),
                                 round_to=round_to)
    if stat in HOLISTIC_STATS:
        return agg.grouped_holistic(ds, keys, value_col, stats=(stat,),
                                    percentile=percentile, round_to=round_to)
    raise ValueError(
        f"unknown stat {stat!r}; decomposable: {DECOMPOSABLE_STATS}, "
        f"holistic: {HOLISTIC_STATS}")


def _register_builtins() -> None:
    """Built-in entries (the reference ships populated registries too)."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    def drop_empty_text(b: pa.Table) -> pa.Table:
        t = b["text"]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        return b.filter(pc.greater(pc.utf8_length(t), 0))

    def add_n_chars(b: pa.Table) -> pa.Table:
        t = b["text"]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        return b.append_column("n_chars", pc.cast(pc.utf8_length(t), pa.int64()))

    register_udf("drop_empty_text", drop_empty_text, overwrite=True)
    register_udf("add_n_chars", add_n_chars, overwrite=True)

    def minmax_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("lang", sort=False)["n_chars"]
        out = g.agg(mn="min", mx="max", n="count").reset_index()
        for c in ("mn", "mx", "n"):
            out[c] = out[c].astype(np.int64)
        return out

    def minmax_combine(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby("lang", sort=False).agg(
            mn=("mn", "min"), mx=("mx", "max"), n=("n", "sum")).reset_index()
        for col in ("mn", "mx", "n"):
            c[col] = c[col].astype(np.int64)
        return c

    register_agg("lang_char_range", minmax_partial, minmax_combine,
                 overwrite=True)


_register_builtins()
