"""Broadcast point-in-polygon join — the engine's spatial join.

Reference semantics: ``shape.zonal_stats``'s polygon⋈pixels inner join
(shape.py:837: per-polygon bbox→window, rasterized mask, masked read) and
``learning.get_training`` (learning.py:1706). Instead of rasterizing each
polygon per feature, the polygon layer (small side) is broadcast once —
``ray.put`` on the driver — and every worker builds a bbox-grid index
(functions/geometry.PolygonIndex, the STRtree role) once in actor
``__init__``; point batches stream through ``map_batches`` and emit exact
(point, feature_id) join pairs. No shuffle: the join is map-side.

At 100 TB the polygon side stays small (admin boundaries ~10⁵ features ≈
100 MB WKB) so broadcast is the right topology; a hash-partitioned join is
only needed if both sides are large (see stages/dedup.py bucket pattern).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..functions.geometry import PolygonIndex


class PiPJoiner:
    """Actor-pool callable: polygon index built once per actor from the
    broadcast table ref; per batch emits join rows (carry_cols + feature_id).

    ``mode``: 'inner' (join pairs), 'semi' (points matching ≥1 polygon),
    'anti' (points matching none — mask_with_poly(mtype='outside')
    analogue, raster.py:963-964).
    """

    def __init__(self, polygons_ref, carry_cols: list[str], mode: str = "inner"):
        table: pa.Table = ray.get(polygons_ref) if isinstance(polygons_ref, ray.ObjectRef) else polygons_ref
        self.index = PolygonIndex.from_wkb(
            table["feature_id"].to_numpy(), table["geometry"].to_pylist()
        )
        self.carry_cols = carry_cols
        self.mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        px = batch["lon"].to_numpy()
        py = batch["lat"].to_numpy()
        pt_idx, fids = self.index.query(px, py)
        if self.mode == "inner":
            out = batch.select(self.carry_cols).take(pa.array(pt_idx))
            return out.append_column("feature_id", pa.array(fids, pa.int64()))
        matched = np.zeros(len(batch), bool)
        matched[pt_idx] = True
        keep = matched if self.mode == "semi" else ~matched
        return batch.select(self.carry_cols).filter(pa.array(keep))


def pip_join(
    ds: ray.data.Dataset,
    polygons: pa.Table,
    carry_cols: list[str],
    mode: str = "inner",
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 8192,
) -> ray.data.Dataset:
    """points ⋈ polygons broadcast join. ``polygons`` is ray.put once here;
    each actor ray.gets it a single time in ``__init__``. Pool sizing
    defaults to (cpus//8, cpus//2) — a floor of warm actors so the stage
    overlaps its upstream instead of ramping from one actor."""
    if concurrency is None:
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        concurrency = (max(1, cpus // 8), max(4, cpus // 2))
    ref = ray.put(polygons)
    return ds.map_batches(
        PiPJoiner,
        fn_constructor_args=(ref, carry_cols, mode),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
