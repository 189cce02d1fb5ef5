"""dygiepp_spark — PySpark-native DyGIE++-style KG construction engine."""

import os as _os

# Pin BLAS to one thread BEFORE numpy first loads anywhere that
# imports this package (drivers, executors, the oracle, tests).
# Two reasons (CLAUDE.md invariant):
# 1. throughput — multithreaded BLAS thrashes on the decode's small
#    matmuls (measured 3x);
# 2. determinism — thread-count-dependent summation order shifts
#    float32 logits by ~1e-6, enough to flip near-tied argmaxes
#    BETWEEN processes (driver oracle vs pinned executors), breaking
#    the exact-parity contract. Same thread count on both sides =>
#    bit-identical kernels.
for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS",
           "MKL_NUM_THREADS", "NUMEXPR_NUM_THREADS",
           "VECLIB_MAXIMUM_THREADS"):
    _os.environ.setdefault(_v, "1")
