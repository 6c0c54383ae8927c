"""Lineage manifests, Parquet checkpoints, resume (north_rule requirement)."""
