#!/bin/bash
# Resume tools/run_e2e_stn_journey.sh from the serve+eval half: the train
# phase completed (checkpoint step_00001601) but the first `cli test` client
# wedged on connect (the known back-to-back-client axon failure mode,
# CLAUDE.md) and was killed by its timeout. Re-runs test -> prep-crop ->
# eval-reg -> gallery against the existing checkpoint.
#
#   nohup bash tools/resume_e2e_stn_eval.sh > /tmp/e2e_stn_eval.log 2>&1 &
set -x
cd /root/repo
ROOT=/tmp/e2e_stn_pairs
RUN=/tmp/e2e_stn_run

CKPT=$(ls -d $RUN/step_* | sort | tail -1)
OUT=$RUN/eval_$(basename $CKPT)
timeout 1800 python -m tfcgan_tpu.cli test --experiment stn_newmodel3 \
  --data-root $ROOT --checkpoint $CKPT --out-dir $OUT/stacks || exit 1
sleep 15
python -m tfcgan_tpu.cli prep-crop --stack-dir $OUT/stacks --out-root $OUT \
  --roles real_A,real_B,reg_B,fake_A1,fake_A2,fake_B || exit 1
timeout 1200 python -m tfcgan_tpu.cli eval-reg --real-a-dir $OUT/real_A \
  --real-b-dir $OUT/real_B --reg-b-dir $OUT/reg_B \
  --out-csv $OUT/reg_metrics.csv --plots-dir $OUT/diff_plots \
  > $OUT/reg_metrics_mean.txt 2>&1 || exit 1
cat $OUT/reg_metrics_mean.txt
python -m tfcgan_tpu.cli gallery --dir $OUT/diff_plots --title "stn e2e diff plots"
echo "E2E_STN_JOURNEY_DONE"
