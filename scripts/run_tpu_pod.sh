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
#
# Multi-host (>= 2 hosts / DCN) notes:
# - A pod slice bigger than one host (e.g. v5p-16+) has multiple TPU-VM
#   workers; `--worker=all` below starts the SAME SPMD program on every
#   host. `examples.utils.maybe_init_distributed()` (wired into all
#   three example CLIs) calls `jax.distributed.initialize()`, which
#   reads the pod topology from the TPU runtime -- no rendezvous flags
#   needed (the reference instead drives torchrun over ssh per node,
#   scripts/run_imagenet.sh:35-77 of gpauloski/kfac-pytorch).
# - `kaisa_mesh(...)` is DCN-aware by default: devices are ordered
#   host-major so each `kfac_col` group (the per-step gradient-gather
#   group) stays on one host's ICI when the per-host chip count allows;
#   only the rare inverse broadcast (once per inv_update_steps) crosses
#   DCN. See `parallel/strategy.py:order_devices_dcn`.
# - Each host feeds only its addressable shard of the global batch; the
#   example CLIs place batches with `examples.utils.shard_batch`, which
#   on multi-host assembles the global array from process-local data
#   (`jax.make_array_from_process_local_data`).

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
