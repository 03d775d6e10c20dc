#!/bin/sh
# Neighbor-constrained smooth sampling, threshold mode
# (reference run_smoothing.sh -> smoothing.py --cfg 0.0 --threshold 0.7).
python -m var_tpu.apps.smooth --cfg 0.0 --threshold 0.7 "$@"
