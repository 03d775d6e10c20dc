#!/bin/sh
# Per-scale l2_dist analysis (reference run_l2_dist_analysis.sh ->
# var_size_analysis.py --mode l2_dist): accumulated-latent distance per
# scale with plots. --data_path required; add --depths 16,30 for the size
# comparison.
python -m var_tpu.apps.analysis --l2_dist --limit 500 --cfg 4 --plot "$@"
