#!/bin/bash
# Per-run evaluation trio: plain, calibration (CIFAR-10-C), OOD (SVHN)
# (reference experiments/run_evaluation.sh).
set -e
cd "$(dirname "$0")"

exp_dir="${EXPDIR:-../logs/my_exp_cifar}"
calibration_data="${CALDATA:-cifar10c-gaussian_blur}"
ood_data="${OODDATA:-svhn}"
skip="${SKIP:-50}"

for conf_file in "$exp_dir"/*/config.json
do
    python eval_bnn.py with config_file=$conf_file skip_first=$skip
    python eval_bnn.py with config_file=$conf_file \
        eval_data=$calibration_data calibration_eval=True skip_first=$skip
    python eval_bnn.py with config_file=$conf_file \
        eval_data=$ood_data ood_eval=True skip_first=$skip
done
