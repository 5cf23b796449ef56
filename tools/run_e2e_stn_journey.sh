#!/bin/bash
# STN registration end-to-end journey: the VTF-STN serve+eval path at
# realistic scale on the chip (SURVEY §3.3 STN flavor): train stn_newmodel3
# on misaligned pairs -> 6-image test stacks -> crop (real_A/real_B/reg_B
# + the fakes) -> cli eval-reg SSIM/NCC/MI before-vs-after + difference
# plots -> gallery. Companion to tools/run_e2e_journey.sh (FFT-GLO flavor).
#
# Scene: --scene face (the generator the on-chip anchor run converged on).
# The blocks scene is a degenerate registration target — measured round 4:
# NCC stuck ~0 after 1600 steps because its 8 px autocorrelation leaves no
# loss basin at the ±6 px/±4° misalignment scale.
#
# Two eval-reg passes:
#  1. the reference protocol (cross-modality: real_A vs real_B/reg_B,
#     TFC-STN/evaluation/calc_ssim.py:72-74) — note with the inverted
#     thermal mapping a PERFECT registration drives NCC(A, reg_B) more
#     negative, so read direction, not magnitude;
#  2. synthetic ground truth (same-modality: test_aligned_B vs
#     real_B/reg_B) — the clean "did it recover the warp" numbers, matching
#     the anchor run's metric definitions.
#
#   nohup bash tools/run_e2e_stn_journey.sh > /tmp/e2e_stn.log 2>&1 &
set -x
cd /root/repo
ROOT=/tmp/e2e_stn_pairs_face
RUN=/tmp/e2e_stn_run_face

python tools/make_e2e_dataset.py --root $ROOT --n 512 --test 32 --warp-b \
  --scene face || exit 1

# 100 epochs x 16 steps/epoch = 1600 steps (the anchor run converged by 1200)
timeout 5400 python -m tfcgan_tpu.cli train --experiment stn_newmodel3 \
  --data-root $ROOT --batch-size 32 --n-epochs 100 \
  --checkpoint-interval 99 --sample-interval 400 --out-dir $RUN || exit 1
sleep 20

CKPT=$(ls -d $RUN/step_* | sort | tail -1)
OUT=$RUN/eval_$(basename $CKPT)
timeout 1800 python -m tfcgan_tpu.cli test --experiment stn_newmodel3 \
  --data-root $ROOT --checkpoint $CKPT --out-dir $OUT/stacks || exit 1
sleep 15
python -m tfcgan_tpu.cli prep-crop --cpu --stack-dir $OUT/stacks --out-root $OUT \
  --roles real_A,real_B,reg_B,fake_A1,fake_A2,fake_B || exit 1
# pass 1: reference protocol (cross-modality)
timeout 1200 python -m tfcgan_tpu.cli eval-reg --cpu --real-a-dir $OUT/real_A \
  --real-b-dir $OUT/real_B --reg-b-dir $OUT/reg_B \
  --out-csv $OUT/reg_metrics.csv --plots-dir $OUT/diff_plots \
  > $OUT/reg_metrics_mean.txt 2>&1 || exit 1
cat $OUT/reg_metrics_mean.txt
# pass 2: synthetic ground truth (same-modality, anchor-run style)
timeout 1200 python -m tfcgan_tpu.cli eval-reg --cpu --real-a-dir $ROOT/test_aligned_B \
  --real-b-dir $OUT/real_B --reg-b-dir $OUT/reg_B \
  --out-csv $OUT/reg_metrics_gt.csv \
  > $OUT/reg_metrics_gt_mean.txt 2>&1 || exit 1
cat $OUT/reg_metrics_gt_mean.txt
python -m tfcgan_tpu.cli gallery --cpu --dir $OUT/diff_plots --title "stn e2e diff plots"
echo "E2E_STN_JOURNEY_DONE"
