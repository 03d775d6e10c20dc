#!/bin/bash
# VAR-d16 @ 256px (reference README.md:131-132 recipe)
python train.py --data_path="$1" --depth=16 --bs=768 --ep=200 --fp16=1 --alng=1e-3 --wpe=0.1
