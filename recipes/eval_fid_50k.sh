#!/bin/bash
# FID-50k protocol (reference README.md:151-157): sample 50 images for each
# of the 1000 ImageNet classes with the benchmark recipe (cfg=1.5,
# top_p=0.96, top_k=900, seed=0), pack them into the evaluator npz, then
# SCORE in-repo with var_tpu.apps.fid_score (Fréchet distance, pluggable
# features — Inception pool3 when the public pt_inception TorchScript file
# is present, the frozen-VAE features otherwise).
#
# Usage: recipes/eval_fid_50k.sh [VAR_CKPT] [OUT_DIR] [REF]
#   REF: reference side — the OpenAI VIRTUAL_imagenet256_labeled.npz, a
#        precomputed-stats npz (mu/sigma), or a folder of real images.
# Resume-safe: re-running skips already-written PNGs.
set -e
CKPT=${1:-var_d16.pth}
OUT=${2:-fid_samples_d16}
REF=${3:-VIRTUAL_imagenet256_labeled.npz}

python -m var_tpu.apps.fid_sample \
  --depth 16 --var_ckpt "$CKPT" --vae_ckpt vae_ch160v4096z32.pth \
  --per_class 50 --batch 50 --cfg 1.5 --top_k 900 --top_p 0.96 --seed 0 \
  --out_dir "$OUT" --pack

if [ -e pt_inception-2015-12-05-6726825d.pt ]; then EXTRACTOR=inception; else EXTRACTOR=vae; fi
if [ -e "$REF" ]; then
  python -m var_tpu.apps.fid_score "$REF" "$OUT".npz --extractor "$EXTRACTOR"
else
  echo "reference batch $REF not found — score later with:"
  echo "  python -m var_tpu.apps.fid_score $REF $OUT.npz --extractor $EXTRACTOR"
fi
