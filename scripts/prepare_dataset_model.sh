#!/usr/bin/env bash
# Fetch the reference datasets + pretrained models (same artifacts the
# reference's scripts/prepare_dataset_model.sh downloads). Run on a machine
# with network access; all torch checkpoints load through the built-in
# converters (videoswap_tpu/models/converters.py, videoswap_tpu/edlora.py).
set -euo pipefail

mkdir -p datasets experiments/pretrained_models

# 1. evaluation datasets + released results/TAP files (gdown required)
gdown 'https://drive.google.com/uc?id=1APB3BoYb9MTOyJZnk-RRKnPkcv7OfM_w' -O datasets.zip
unzip -o datasets.zip -d datasets/

# 2. AnimateDiff motion module (mm_sd_v14.ckpt)
mkdir -p experiments/pretrained_models/animatediff_motion_module
gdown 'https://drive.google.com/uc?id=1RqkQuGPaCO5sGZ6V6KZ-jUWmsRu48Kdq' \
  -O experiments/pretrained_models/animatediff_motion_module/mm_sd_v14.ckpt

# 3. SD-1.5 base (chilloutmix, diffusers layout) via git-lfs
git lfs install
git clone https://huggingface.co/windwhinny/chilloutmix.git \
  experiments/pretrained_models/chilloutmix

# 4. ED-LoRA concepts + trained adapters released by the reference authors
gdown 'https://drive.google.com/uc?id=1uhiF4OpjDFQFN2fHUAtLJYXLSCT8uRYK' -O pretrained.zip
unzip -o pretrained.zip -d experiments/pretrained_models/

echo 'done — point options/*.yml path.pretrained_model_path at the results'
