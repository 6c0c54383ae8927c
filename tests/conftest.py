import os
import sys

import pytest
import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()
    # sweep this session's per-call Parquet checkpoints (knn / prefix-scan
    # scratch dirs — lazily consumed, so only safe to remove afterwards)
    import glob
    import shutil
    import tempfile

    root = os.environ.get("GRAFT_SCRATCH", tempfile.gettempdir())
    for d in [p for pat in ("graft_knn_narrow_*", "graft_scan_*", "graft_jsonl_*",
                    "graft_csv_*")
         for p in glob.glob(os.path.join(root, pat))]:
        shutil.rmtree(d, ignore_errors=True)
