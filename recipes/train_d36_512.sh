#!/bin/bash
# VAR-d36-s @ 512px with shared AdaLN (reference README.md:143-144 recipe)
python train.py --data_path="$1" --depth=36 --saln=1 --pn=512 --bs=768 --ep=350 --tblr=8e-5 --fp16=1 --alng=5e-6 --wpe=0.01 --twde=0.08
