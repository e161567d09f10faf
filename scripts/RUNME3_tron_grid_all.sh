#!/bin/sh
# Adjoint (gridding) reconstructions, timed 3x each — rebuild of reference
# src/RUNME3_tron_grid_all.sh.  The reference's git-lfs datasets are not
# shipped; synthetic stand-ins with the same geometry are generated first.
set -e
cd "$(dirname "$0")/.."
mkdir -p output

timed() {
  t0=$(date +%s.%N)
  "$@"
  t1=$(date +%s.%N)
  echo "elapsed: $(echo "$t1 $t0" | awk '{printf "%.2f s", $1-$2}')  [$*]"
}

# phantom data from RUNME1
[ -f output/sl_data_tron.ra ] || sh scripts/RUNME1_tron_degrid_phantom.sh

# 1) linear-angle phantom gridding (reference: tron -a -d 512).
#    --scheme linear_half matches the convention RUNME1's degrid used
#    (the reference's grid/degrid linear conventions differ; SURVEY.md §7)
for i in 1 2 3; do
  timed python -m tron_tpu.cli -a -d 512 --scheme linear_half \
    output/sl_data_tron.ra output/sl_img_tron.ra
done

# 2) golden-angle multicoil dynamic series (whole-body analog, reduced):
#    reference: tron -a -G -u 0.4 -d 21 ex_whole_body.ra
[ -f output/ga_multicoil.ra ] || \
  python -m tron_tpu.tools.make_goldenangle output/ga_multicoil.ra --nc 6 --nro 512 --npe 1479
for i in 1 2 3; do
  timed python -m tron_tpu.cli -a -G -u 0.4 -d 21 output/ga_multicoil.ra output/ga_img_tron.ra
done
echo done
