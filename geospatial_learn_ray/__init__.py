"""geospatial_learn_ray — a Ray-Data-native spatial-join + tiling engine.

Built from scratch with the query/data-processing capabilities of the
reference (Ciaran1981/geospatial-learn, read-only at /root/reference),
re-expressed Ray-Data-first:

- ``ray.data.Dataset`` of Arrow blocks end-to-end, streaming execution
- vectorized ``map_batches`` kernels (pyarrow.compute / numpy)
- actor pools for stateful stages (indexes, models, window readers)
- explicit keys for every wide op: ``url`` (pages), ``cell_h3`` /
  ``cell_s2`` (tiles), ``feature_id`` (polygons)
- per-partition lineage manifests + Parquet checkpoints (resumable)

Subpackages
-----------
functions   pure vectorized kernels (hashing, geo cells, geometry, text)
sources     deterministic synthetic tables (pages, polygons, tiles)
stages      Dataset→Dataset operators (joins, aggs, dedup, knn, scorers)
pipelines   end-to-end composed pipelines (flagship spatial-join+tiling)
state       lineage manifests, checkpointing, resume
"""

__version__ = "0.1.0"
