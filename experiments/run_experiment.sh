#!/bin/bash
# Tempering-curve sweep: 5 replicates x priors x temperatures
# (reference experiments/run_experiment.sh). Sequential process-level
# fan-out, command-compatible with the reference. For the TPU-native
# version that runs the whole grid as vmapped chains in ONE program, use
# sweep_tempering.py instead.
set -e
cd "$(dirname "$0")"

logdir="${LOGDIR:-../logs/my_exp_cifar}"
data="${DATA:-cifar10}"
model="${MODEL:-googleresnet}"

priors=( improper gaussian laplace student-t convcorrnormal )
scales=( 1.41 )
temps=( 0.001 0.01 0.03 0.1 0.3 1.0 )
lr=0.01
num_cycles=60
lengthscales=( 0.5 1.0 )

for i in {1..5}   # 5 replicates for the error bars
do
    for prior in "${priors[@]}"; do
        for scale in "${scales[@]}"; do
            for temp in "${temps[@]}"; do
                common="data=$data inference=VerletSGLDReject warmup=45 \
burnin=0 skip=1 n_samples=300 lr=$lr momentum=0.994 weight_scale=$scale \
cycles=$num_cycles batch_size=128 temperature=$temp save_samples=True \
progressbar=False log_dir=$logdir batchnorm=True seed=$i"
                if [[ $prior == "convcorrnormal" ]]; then
                    for lengthscale in "${lengthscales[@]}"; do
                        python train_bnn.py with weight_prior=$prior \
                            model=correlated$model $common \
                            weight_prior_params="{\"lengthscale\": $lengthscale}"
                    done
                else
                    python train_bnn.py with weight_prior=$prior \
                        model=$model $common
                fi
            done
        done
    done
done
