#!/bin/bash
# Launch a training example on all hosts of a TPU pod slice.
#
# Counterpart of the reference's cluster launcher
# (scripts/run_imagenet.sh of gpauloski/kfac-pytorch), re-targeted at
# TPU VMs: instead of torchrun-over-ssh per node, each TPU host runs the
# same SPMD program; jax.distributed.initialize() picks up the pod
# topology from the TPU runtime.
#
# Usage:
#   ./scripts/run_tpu_pod.sh <tpu-name> <zone> examples/cifar10_resnet.py [args...]
#
# Requires: gcloud CLI configured with access to the TPU VM.

set -euo pipefail

TPU_NAME=${1:?tpu name}
ZONE=${2:?zone}
SCRIPT=${3:?training script}
shift 3

REPO_DIR=${REPO_DIR:-$(cd "$(dirname "$0")/.." && pwd)}

# Sync the repo to every host and launch the same SPMD program on all of
# them. JAX's runtime wires multi-host coordination automatically.
gcloud compute tpus tpu-vm scp --recurse "${REPO_DIR}" "${TPU_NAME}:~/kfac_pytorch_tpu_repo" \
    --zone "${ZONE}" --worker=all

gcloud compute tpus tpu-vm ssh "${TPU_NAME}" --zone "${ZONE}" --worker=all \
    --command "cd ~/kfac_pytorch_tpu_repo && \
        PYTHONPATH=~/kfac_pytorch_tpu_repo python ${SCRIPT} $*"
