#!/bin/bash
# VAR-d20 @ 256px (reference README.md:134-135 recipe)
python train.py --data_path="$1" --depth=20 --bs=768 --ep=250 --fp16=1 --alng=1e-3 --wpe=0.1
