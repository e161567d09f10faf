#!/bin/sh
# Cross-implementation degrid/recon comparison — rebuild of reference
# src/RUNME2_others_degrid_phantom.m (IRT/gpuNUFFT/BART comparison): here
# the exact-DTFT oracle plays the gold-standard role and both tron backends
# are compared, with NMSE/SSIM tables to CSV and difference figures.
set -e
cd "$(dirname "$0")/.."
mkdir -p output
python scripts/compare_recon.py --n 64 --npe 128 --out output
python scripts/compare_recon.py --n 64 --npe 128 --golden --out output
echo done
