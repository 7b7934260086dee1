#!/usr/bin/env bash
# Dataset acquisition for the experiment config zoo (configs/expr/**).
# Each dataset lands under data/<Type>/<scene> exactly where the loaders
# look (arcnerf_tpu/datasets/*_dataset.py). Sizes are approximate.
#
# Run from the repo root:  bash scripts/get_data.sh nerf_synthetic
# (no network in CI containers — this script documents the layout and
# sources; run it on a connected machine.)

set -euo pipefail
mkdir -p data
cd data

case "${1:-help}" in
nerf_synthetic)
    # NeRF-synthetic (lego, chair, ...) ~2 GB — configs/expr/NeRF/*
    # official: https://drive.google.com/drive/folders/128yBriW1IG_3NJ5Rp7APSTZsJqdJdfc1
    # mirrors:  https://huggingface.co/datasets/arnaudstiegler/nerf_synthetic
    echo "download nerf_synthetic.zip and unzip so that data/NeRF/lego/transforms_train.json exists"
    ;;
llff)
    # LLFF (fern, ...) ~7 GB — configs/expr/LLFF/*
    # official: https://drive.google.com/drive/folders/14boI-o5hGO9srnWaaogTU5_ji7wkX2S7
    echo "unzip so that data/LLFF/fern/poses_bounds.npy exists"
    ;;
dtu)
    # DTU (scan65, ...) — configs/expr/DTU/*; IDR-preprocessed layout
    # https://www.dropbox.com/sh/w0y8bbdmxzik3uk/AAAaZffBiJevxQzRskoOYcyja (IDR data)
    echo "unzip so that data/DTU/scan65/cameras.npz and image/ exist"
    ;;
mipnerf360)
    # MipNeRF-360 (garden, ...) ~12 GB — configs/expr/MipNeRF360/*
    # official: http://storage.googleapis.com/gresearch/refraw360/360_v2.zip
    curl -L -o 360_v2.zip http://storage.googleapis.com/gresearch/refraw360/360_v2.zip
    mkdir -p MipNeRF360 && unzip -q 360_v2.zip -d MipNeRF360 && rm 360_v2.zip
    ;;
tanks_and_temples)
    # Tanks&Temples (Truck, ...) nerf++ layout — configs/expr/TanksAndTemples/*
    # https://drive.google.com/drive/folders/1yCvIaeGuQ7Xea6_8YK0WmmXK7cRhVRzX (nerf++ release)
    echo "unzip so that data/TanksAndTemples/tat_training_Truck/{train,test}/rgb exist"
    ;;
hdrreal)
    # HDR-NeRF real dataset (flower, ...) — configs/expr/HDRReal/*
    # https://drive.google.com/drive/folders/1OTDLLH8ydKX1DcaNpbQ46LlP0dKx6E-I (HDR-NeRF release)
    echo "unzip so that data/HDRReal/flower/ contains images + exposure txt"
    ;;
capture)
    # Self-captured scenes: record a video, then run the pose pipeline:
    echo "python tools/extract_video.py --video <mp4> --scene_name qqtiger"
    echo "python tools/run_poses.py --scene_name qqtiger   # COLMAP required"
    ;;
*)
    grep -E "^[a-z_]+\)" "$0" | tr -d ')' | sed 's/^/  /'
    echo "usage: bash scripts/get_data.sh <dataset>"
    ;;
esac
