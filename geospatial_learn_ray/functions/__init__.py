"""Pure, deterministic, vectorized kernels used inside ``map_batches``."""


def _bs() -> int | None:
    """Hot-stage batch size. Default None = whole blocks: fused vectorized
    stages then pass Arrow blocks through zero-copy, with no re-batching
    slicing between them (measured ~2x faster than 16384 on the flagship;
    Ray's dynamic block splitting still bounds block bytes). Env-tunable
    via GRAFT_BATCH_SIZE for stages whose batches must be bounded."""
    import os

    v = os.environ.get("GRAFT_BATCH_SIZE", "none")
    return None if v == "none" else int(v)
