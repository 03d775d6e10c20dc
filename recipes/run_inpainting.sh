#!/bin/sh
# Token-mask inpainting (reference run_inpainting.sh -> inpainting.py
# --depth 30). Keeps ground-truth tokens through --keep_through scales.
python -m var_tpu.apps.inpaint --depth 30 "$@"
