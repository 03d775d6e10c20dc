#!/usr/bin/env bash
# Pre-seed the persistent XLA compile caches so driver/CI runs pay compile
# cost once, not per run.
#
# Cold-compile budget (measured, one v5e + this host):
#   bench.py (10-stage d16 decode graph)   ~8 min cold, <1 min warm
#   bench.py --train (d16 train step)      ~4 min cold, <1 min warm
#   fast CPU test tier (-m "not slow")     ~19 min cold, ~5 min warm
#   full CPU suite                         cannot finish 10 min cold; run
#                                          this script (or the fast tier)
#                                          first, then ~20 min warm
#
# Caches: TPU programs -> $JAX_COMPILATION_CACHE_DIR (default
# /tmp/var_tpu_jax_cache, set by bench.py and scripts/bench_*.py);
# CPU test programs -> /tmp/var_tpu_test_cache_$USER (tests/conftest.py).
# Both survive across processes; wipe them to re-measure cold timings.
set -e
cd "$(dirname "$0")/.."

echo "== warming TPU decode + train graphs (skipped if no TPU) =="
python bench.py --iters 1 || true
python bench.py --train --iters 1 || true

echo "== warming CPU test-tier graphs =="
python -m pytest tests/ -q -m "not slow" -x

echo "done; caches:"
du -sh "${JAX_COMPILATION_CACHE_DIR:-/tmp/var_tpu_jax_cache}" 2>/dev/null || true
du -sh "/tmp/var_tpu_test_cache_$(whoami)" 2>/dev/null || true
