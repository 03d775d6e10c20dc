#!/bin/sh
# Per-scale variance / dist-prob analysis on ImageNet-A at d30
# (reference run_var_analysis.sh -> var_analysis.py --mode var
# --dataset imagenet-a). Point --data_path at the ImageNet-A folder and
# --imagenet_a_json at its class map.
python -m var_tpu.apps.analysis --depths 30 --limit 7500 --plot "$@"
