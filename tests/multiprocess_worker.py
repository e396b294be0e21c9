"""Worker program for the multi-process CPU harness.

One rank of an N-process ``jax.distributed`` run (CPU backend, 2 local
virtual devices per process). Exercises the REAL process-boundary code:
``examples.utils.maybe_init_distributed`` (env-var rendezvous, the same
entry the pod launcher uses), ``examples.utils.shard_batch``'s
``make_array_from_process_local_data`` branch, the DCN-aware device
ordering feeding a live ``Mesh``, and sharded K-FAC steps with
cross-process collectives.

The TPU-native analogue of one rank of the reference's fork+gloo harness
(``testing/distributed.py:24-141`` of gpauloski/kfac-pytorch). Spawned by
``tests/multiprocess_test.py``; not a pytest module.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    # Env (set by the parent test):
    # XLA_FLAGS=--xla_force_host_platform_device_count=2,
    # KFAC_COORDINATOR_ADDRESS / KFAC_NUM_PROCESSES / KFAC_PROCESS_ID.
    # The platform is forced via jax.config (an installed accelerator
    # plugin preempts the JAX_PLATFORMS env var on this image), and CPU
    # cross-process collectives need the gloo implementation.
    import jax

    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_cpu_collectives_implementation', 'gloo')

    from examples.utils import maybe_init_distributed
    from examples.utils import shard_batch

    maybe_init_distributed()

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding

    from kfac_pytorch_tpu import KFACPreconditioner
    from kfac_pytorch_tpu.models import TinyModel
    from kfac_pytorch_tpu.parallel import kaisa_mesh, KAISASharding

    n_proc = int(os.environ['KFAC_NUM_PROCESSES'])
    pid = int(os.environ['KFAC_PROCESS_ID'])
    assert jax.process_count() == n_proc, jax.process_count()
    assert jax.process_index() == pid

    world = len(jax.devices())
    local = len(jax.local_devices())
    assert world == n_proc * local, (world, local)

    # HYBRID-ish mesh: 2 workers x 2 cols on 4 devices. order_devices_dcn
    # (host-major) runs inside kaisa_mesh; with cols == devices-per-host
    # every kfac_col group is intra-process.
    mesh = kaisa_mesh(0.5)
    for row in np.asarray(mesh.devices).reshape(-1, mesh.shape['kfac_col']):
        hosts = {d.process_index for d in row}
        assert len(hosts) == 1, f'kfac_col group crosses hosts: {hosts}'
    sharding = KAISASharding(mesh)
    data_sharding = NamedSharding(mesh, sharding.data_spec())

    model = TinyModel()
    gx = np.asarray(
        jax.random.normal(jax.random.PRNGKey(0), (16, 8)), np.float32,
    )
    gy = np.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (16, 10)), np.float32,
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(2), jnp.zeros((1, 8)))

    def loss_fn(p, bx, by):
        return jnp.mean((model.apply(p, bx) - by) ** 2)

    precond = KFACPreconditioner(
        model,
        example_args=(jnp.zeros((1, 8)),),
        sharding=sharding,
        grad_worker_fraction=0.5,
        lr=0.1,
        damping=0.003,
    )
    state = precond.init()
    vag = jax.jit(precond.value_and_grad(loss_fn))
    step = jax.jit(precond.step)

    # Each process feeds only ITS rows of the global batch
    # (make_array_from_process_local_data assembles the global array).
    rows = 16 // n_proc
    lx, ly = gx[pid * rows:(pid + 1) * rows], gy[pid * rows:(pid + 1) * rows]
    bx = shard_batch(lx, data_sharding)
    by = shard_batch(ly, data_sharding)
    assert bx.shape == (16, 8), bx.shape

    losses = []
    for _ in range(3):
        (loss, _), grads, captured = vag(params, bx, by)
        pgrads, state = step(state, grads, captured)
        params = jax.tree.map(lambda p, g: p - 0.1 * g, params, pgrads)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses

    # Deterministic cross-rank fingerprint of the final params: every
    # process must hold the identical replicated result.
    checksum = float(
        sum(jnp.sum(jnp.abs(leaf)) for leaf in jax.tree.leaves(params)),
    )
    print(f'MPRESULT loss={losses[-1]:.9f} checksum={checksum:.9f}')
    jax.distributed.shutdown()


if __name__ == '__main__':
    main()
