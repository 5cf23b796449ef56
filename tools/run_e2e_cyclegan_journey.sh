#!/bin/bash
# End-to-end CycleGAN serve chain on the chip: train on synthetic face pairs
# -> `cli test` BOTH-leg grids (real_A|fake_B|real_B|fake_A,
# cyclegan_og/cyclegan.py:327-342) -> prep-crop -> eval of each direction.
set -x
ROOT=${ROOT:-/tmp/e2e_cyclegan_pairs}
RUN=${RUN:-/tmp/e2e_cyclegan_run}
python tools/make_e2e_dataset.py --root $ROOT --scene face --n 256 --test 16 \
  --size 128 || exit 1

timeout 3600 python -m tfcgan_tpu.cli train --experiment cyclegan \
  --data-root $ROOT --batch-size 16 --image-size 128 --n-epochs 40 \
  --checkpoint-interval 39 --sample-interval 300 --out-dir $RUN || exit 1
sleep 15

CKPT=$(ls -d $RUN/step_* | sort | tail -1)
OUT=$RUN/eval_$(basename $CKPT)
timeout 1800 python -m tfcgan_tpu.cli test --experiment cyclegan \
  --data-root $ROOT --image-size 128 --checkpoint $CKPT \
  --out-dir $OUT/stacks || exit 1
sleep 10
python -m tfcgan_tpu.cli prep-crop --cpu --stack-dir $OUT/stacks --out-root $OUT \
  --roles real_A,fake_B,real_B,fake_A || exit 1
timeout 1200 python -m tfcgan_tpu.cli eval --cpu --fake-dir $OUT/fake_B \
  --real-dir $OUT/real_B --out-csv $OUT/ab_metrics.csv \
  > $OUT/ab_metrics_mean.txt 2>&1 || exit 1
timeout 1200 python -m tfcgan_tpu.cli eval --cpu --fake-dir $OUT/fake_A \
  --real-dir $OUT/real_A --out-csv $OUT/ba_metrics.csv \
  > $OUT/ba_metrics_mean.txt 2>&1 || exit 1
cat $OUT/ab_metrics_mean.txt $OUT/ba_metrics_mean.txt
echo "E2E_CYCLEGAN_OK"
