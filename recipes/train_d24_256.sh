#!/bin/bash
# VAR-d24 @ 256px (reference README.md:137-138 recipe)
python train.py --data_path="$1" --depth=24 --bs=768 --ep=350 --tblr=8e-5 --fp16=1 --alng=1e-4 --wpe=0.01
