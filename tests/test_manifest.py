"""Unit tests for the resumable-checkpoint layer (state/manifest.py),
including the stale-shard purge: after a fingerprint change, a shard that
previously had rows but now produces zero must not leak its old parquet
rows into the resumed result, and must get a rows=0 manifest so it stops
recomputing.
"""

import json
import os

import pandas as pd
import pyarrow as pa
import ray.data

from geospatial_learn_ray.state.manifest import (
    assign_shard,
    completed_shards,
    read_stage,
    run_resumable_stage,
)

NUM_SHARDS = 4


def _input(drop_shard: int | None = None) -> ray.data.Dataset:
    df = pd.DataFrame({"key": [f"k{i}" for i in range(200)], "v": range(200)})
    ds = assign_shard(ray.data.from_pandas(df), "key", NUM_SHARDS)
    if drop_shard is not None:
        ds = ds.map_batches(
            lambda b: b.filter(pa.compute.not_equal(b["shard"], drop_shard)),
            batch_format="pyarrow",
        )
    return ds


def test_stale_shard_purged_on_fingerprint_change(tmp_path):
    out = str(tmp_path / "ckpt")
    ident = lambda ds: ds

    run_resumable_stage(_input(), ident, out, "s", "fpA", NUM_SHARDS)
    assert completed_shards(out, "s", "fpA") == set(range(NUM_SHARDS))
    n_full = read_stage(out, "s").count()
    assert n_full == 200

    # new fingerprint, input now empty for shard 2 → its old rows must go
    got = run_resumable_stage(_input(drop_shard=2), ident, out, "s", "fpB", NUM_SHARDS)
    keys = set(got.to_pandas()["key"])
    exp = set(_input(drop_shard=2).to_pandas()["key"])
    assert keys == exp  # no stale shard-2 rows leaked
    assert not os.path.isdir(os.path.join(out, "s", "shard=2"))

    # shard 2 has a rows=0 manifest under the new fingerprint
    m = json.load(open(os.path.join(out, "s", "_manifest", "shard-2.json")))
    assert m["rows"] == 0 and m["fingerprint"] == "fpB"
    assert completed_shards(out, "s", "fpB") == set(range(NUM_SHARDS))

    # rerun with the same fingerprint: nothing recomputes (mtimes stable)
    mdir = os.path.join(out, "s", "_manifest")
    mtimes = {f: os.path.getmtime(os.path.join(mdir, f)) for f in os.listdir(mdir)}
    run_resumable_stage(_input(drop_shard=2), ident, out, "s", "fpB", NUM_SHARDS)
    assert {f: os.path.getmtime(os.path.join(mdir, f)) for f in os.listdir(mdir)} == mtimes


def test_heal_with_read_stage_input(tmp_path):
    """Regression: stage B's input is read_stage(A) — the hive-restored
    shard column must come back typed int32 so B's heal-path shard filter
    (is_in over the missing set) works. Before the fix, hive inference
    yielded a *string* shard column and healing crashed with
    ArrowTypeError string-vs-int32; fresh runs and no-op resumes never
    exercise the filter, which is how the suite missed it."""
    out = str(tmp_path / "ckpt")
    ident = lambda ds: ds
    run_resumable_stage(_input(), ident, out, "a", "fpA", NUM_SHARDS)
    a = read_stage(out, "a")
    assert dict(zip(a.schema().names, a.schema().types))["shard"] == pa.int32()
    run_resumable_stage(a, ident, out, "b", "fpA", NUM_SHARDS)

    # damage one of B's manifests → only that shard recomputes, via the
    # typed filter over A's read-back shard column
    victim = os.path.join(out, "b", "_manifest", "shard-1.json")
    open(victim, "w").close()
    mdir = os.path.join(out, "b", "_manifest")
    before = {f: os.path.getmtime(os.path.join(mdir, f)) for f in os.listdir(mdir)}
    got = run_resumable_stage(read_stage(out, "a"), ident, out, "b", "fpA", NUM_SHARDS)
    after = {f: os.path.getmtime(os.path.join(mdir, f)) for f in os.listdir(mdir)}
    changed = {f for f in after if after[f] != before.get(f)}
    assert changed == {"shard-1.json"}
    assert set(got.to_pandas()["key"]) == set(_input().to_pandas()["key"])


def test_unsharded_stage_purges_stale_dirs(tmp_path):
    out = str(tmp_path / "ckpt")
    ident = lambda ds: ds
    run_resumable_stage(_input(), ident, out, "g", "fpA", NUM_SHARDS, input_sharded=False)
    assert read_stage(out, "g").count() == 200
    # fingerprint change + shard 1 now empty → full recompute, dir purged
    got = run_resumable_stage(
        _input(drop_shard=1), ident, out, "g", "fpB", NUM_SHARDS, input_sharded=False
    )
    assert not os.path.isdir(os.path.join(out, "g", "shard=1"))
    assert set(got.to_pandas()["key"]) == set(_input(drop_shard=1).to_pandas()["key"])


def test_run_corpus_prep_resumable(tmp_path):
    """Corpus-prep resume probes (the flagship suite's LLM twin): second
    run is a no-op (manifest mtimes unchanged); truncating one shard
    manifest heals only that shard; a param change refingerprints."""
    import json
    import os

    from geospatial_learn_ray.pipelines.corpus_prep import run_corpus_prep
    from geospatial_learn_ray.pipelines.querydefs import _MIX_RATES

    out = str(tmp_path / "cp")
    c1 = run_corpus_prep("/root/testdata/sf0.001", out, _MIX_RATES)
    assert c1["packed"] > 0

    def manifest_mtimes():
        t = {}
        for stage in ("survivors", "packed"):
            mdir = os.path.join(out, stage, "_manifest")
            for f in sorted(os.listdir(mdir)):
                t[f"{stage}/{f}"] = os.path.getmtime(os.path.join(mdir, f))
        return t

    before = manifest_mtimes()
    c2 = run_corpus_prep("/root/testdata/sf0.001", out, _MIX_RATES)
    assert c2 == c1
    assert manifest_mtimes() == before

    # heal one survivors shard
    mdir = os.path.join(out, "survivors", "_manifest")
    victim = os.path.join(mdir, sorted(os.listdir(mdir))[0])
    with open(victim, "w") as f:
        f.write("")
    c3 = run_corpus_prep("/root/testdata/sf0.001", out, _MIX_RATES)
    assert c3 == c1
    after = manifest_mtimes()
    changed = [k for k in before if after[k] != before[k]]
    assert any(k.startswith("survivors/") for k in changed)

    # param change -> new fingerprint -> full recompute, different result
    # (0.62 filters ~30% more; an ALL-empty stage cannot round-trip its
    # schema through Parquet -- read_stage documents that limit)
    c4 = run_corpus_prep("/root/testdata/sf0.001", out, _MIX_RATES,
                         quality_min=0.62)
    assert 0 < c4["survivors"] < c1["survivors"]
