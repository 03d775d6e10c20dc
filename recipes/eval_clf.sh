#!/bin/bash
# zero-shot classification sweep (reference run_clf.sh capability)
DATA=$1
for mode in bayesian smooth_bayesian fast_neighbor_bayesian; do
  python -m var_tpu.apps.classify --data_path="$DATA" --mode=$mode --out_dir=clf_out_$mode
done
