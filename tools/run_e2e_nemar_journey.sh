#!/bin/bash
# End-to-end NeMAR serve+eval chain on the chip (VERDICT r4 #2 done-criterion):
# train on misaligned synthetic face pairs -> `cli test` NeMAR 6-image stacks
# (nemar/test.py visuals: A|B|registered_A|fake_B|fake_TR_B|fake_RT_B) ->
# prep-crop -> eval-reg over (real_B, real_A, reg_A): netR warps A onto B, so
# the moving image is A and "before" = the raw misalignment.
set -x
ROOT=${ROOT:-/tmp/e2e_nemar_pairs}
RUN=${RUN:-/tmp/e2e_nemar_run}
python tools/make_e2e_dataset.py --root $ROOT --scene face --warp-b \
  --n 256 --test 16 --size 128 || exit 1

# 50 epochs x 16 steps/epoch = 800 steps at b16@128^2 (~3 min of step time;
# the nemar journey's NCC/PSNR plateaued by ~600)
timeout 3600 python -m tfcgan_tpu.cli train --experiment nemar \
  --data-root $ROOT --batch-size 16 --image-size 128 --n-epochs 50 \
  --checkpoint-interval 49 --sample-interval 400 --out-dir $RUN || exit 1
sleep 15

CKPT=$(ls -d $RUN/step_* | sort | tail -1)
OUT=$RUN/eval_$(basename $CKPT)
timeout 1800 python -m tfcgan_tpu.cli test --experiment nemar \
  --data-root $ROOT --image-size 128 --checkpoint $CKPT \
  --out-dir $OUT/stacks || exit 1
sleep 10
python -m tfcgan_tpu.cli prep-crop --cpu --stack-dir $OUT/stacks --out-root $OUT \
  --roles real_A,real_B,reg_A,fake_B,fake_TR_B,fake_RT_B || exit 1
timeout 1200 python -m tfcgan_tpu.cli eval-reg --cpu --real-a-dir $OUT/real_B \
  --real-b-dir $OUT/real_A --reg-b-dir $OUT/reg_A \
  --out-csv $OUT/reg_metrics.csv --plots-dir $OUT/diff_plots \
  > $OUT/reg_metrics_mean.txt 2>&1 || exit 1
cat $OUT/reg_metrics_mean.txt
# translation quality of the serve output vs the real thermal side
timeout 1200 python -m tfcgan_tpu.cli eval --cpu --fake-dir $OUT/fake_TR_B \
  --real-dir $OUT/real_B --out-csv $OUT/pair_metrics.csv --iqa niqe \
  > $OUT/pair_metrics_mean.txt 2>&1 || exit 1
cat $OUT/pair_metrics_mean.txt
echo "E2E_NEMAR_OK"
