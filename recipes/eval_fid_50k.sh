#!/bin/bash
# FID-50k protocol (reference README.md:151-157): sample 50 images for each
# of the 1000 ImageNet classes with the benchmark recipe (cfg=1.5,
# top_p=0.96, top_k=900, seed=0), pack them into the OpenAI-evaluator npz,
# then score against the ImageNet-256 reference batch with the public
# OpenAI guided-diffusion evaluator.
#
# Usage: recipes/eval_fid_50k.sh [VAR_CKPT] [OUT_DIR]
# Resume-safe: re-running skips already-written PNGs.
set -e
CKPT=${1:-var_d16.pth}
OUT=${2:-fid_samples_d16}

python -m var_tpu.apps.fid_sample \
  --depth 16 --var_ckpt "$CKPT" --vae_ckpt vae_ch160v4096z32.pth \
  --per_class 50 --batch 50 --cfg 1.5 --top_k 900 --top_p 0.96 --seed 0 \
  --out_dir "$OUT" --pack

# Scoring (run wherever the evaluator + reference stats live; both are
# public: github.com/openai/guided-diffusion/tree/main/evaluations):
#   python evaluator.py VIRTUAL_imagenet256_labeled.npz "$OUT".npz
echo "wrote $OUT.npz — score with the OpenAI evaluator (see comment above)"
