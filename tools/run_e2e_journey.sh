#!/bin/bash
# End-to-end quality protocol (VERDICT r2 #4): the full user journey the
# reference runs via eurecom_eval.sh (SURVEY §3.3), at realistic scale on the
# real chip — train from a 512-pair on-disk A|B set (DevicePool staging),
# checkpoint, per-checkpoint: test stacks -> crop -> metric CSVs, gallery.
# Real Eurecom/Devcom data is not in this environment; the synthetic-but-
# learnable mapping from tools/make_e2e_dataset.py stands in (see its
# docstring). Results land in BASELINE.md as the standing quality table.
#
#   nohup bash tools/run_e2e_journey.sh > /tmp/e2e_journey.log 2>&1 &
set -x
cd /root/repo
ROOT=/tmp/e2e_pairs
RUN=/tmp/e2e_run

python tools/make_e2e_dataset.py --root $ROOT --n 512 --test 32 || exit 1

# 125 epochs x 16 steps/epoch = 2000 steps, checkpoints every 25 epochs
timeout 5400 python -m tfcgan_tpu.cli train --experiment fft_glo \
  --data-root $ROOT --batch-size 32 --n-epochs 125 \
  --checkpoint-interval 25 --sample-interval 400 --out-dir $RUN || exit 1
sleep 20

for CKPT in $(ls -d $RUN/step_* | sort); do
  STEP=$(basename $CKPT)
  OUT=$RUN/eval_$STEP
  timeout 1500 python -m tfcgan_tpu.cli test --experiment fft_glo \
    --data-root $ROOT --checkpoint $CKPT --out-dir $OUT/stacks || exit 1
  sleep 15
  python -m tfcgan_tpu.cli prep-crop --cpu --stack-dir $OUT/stacks \
    --out-root $OUT --roles real_A,fake_B,real_B || exit 1
  timeout 1200 python -m tfcgan_tpu.cli eval --cpu --fake-dir $OUT/fake_B \
    --real-dir $OUT/real_B --out-csv $OUT/metrics.csv \
    | tee $OUT/metrics_mean.txt || exit 1
  sleep 15
done
python -m tfcgan_tpu.cli gallery --cpu --dir $RUN/samples --title "fft_glo e2e"
echo "E2E_JOURNEY_DONE"
