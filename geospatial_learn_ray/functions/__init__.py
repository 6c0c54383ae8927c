"""Pure, deterministic, vectorized kernels used inside ``map_batches``."""
