#!/bin/bash
# VAR-d30 @ 256px (reference README.md:140-141 recipe)
python train.py --data_path="$1" --depth=30 --bs=1024 --ep=350 --tblr=8e-5 --fp16=1 --alng=1e-5 --wpe=0.01 --twde=0.08
