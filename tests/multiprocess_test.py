"""Multi-process CPU distributed tests.

The TPU-native analogue of the reference's keystone fork+gloo N-process
harness (``testing/distributed.py:24-141`` of gpauloski/kfac-pytorch):
N subprocesses rendezvous through ``jax.distributed.initialize`` (CPU
backend, 2 virtual local devices each) and run REAL process-boundary
code -- ``maybe_init_distributed``, ``shard_batch``'s
``make_array_from_process_local_data`` branch, the DCN device-order
contract on a live mesh, and sharded K-FAC steps whose collectives cross
process boundaries. The single-process virtual-mesh suite
(``tests/conftest.py``) covers SPMD semantics; this covers the process
plumbing it cannot.
"""

from __future__ import annotations

import os
import subprocess
import sys

N_PROCESSES = 2
_HANG_TIMEOUT = 420  # generous: 2 ranks compile TinyModel steps on CPU


def _launch_ranks(port: int) -> list[tuple[int, str, str]]:
    """Launch N worker ranks against one coordinator port.

    Returns ``(returncode, stdout, stderr)`` per rank.
    """
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, 'tests', 'multiprocess_worker.py')
    procs = []
    for pid in range(N_PROCESSES):
        env = dict(os.environ)
        # 2 virtual devices per process; the worker asserts 4 global.
        # (The worker forces the cpu platform via jax.config itself.)
        env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'
        env['KFAC_COORDINATOR_ADDRESS'] = f'127.0.0.1:{port}'
        env['KFAC_NUM_PROCESSES'] = str(N_PROCESSES)
        env['KFAC_PROCESS_ID'] = str(pid)
        procs.append(
            subprocess.Popen(
                [sys.executable, worker],
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
                env=env,
                cwd=root,
            ),
        )
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=_HANG_TIMEOUT)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.communicate()
    return outs


def _is_rendezvous_failure(outs: list[tuple[int, str, str]]) -> bool:
    """True when a rank died binding/contacting the coordinator port --
    the ``open_port`` TOCTOU race (another process grabbed the probed
    port between close and coordinator bind), retryable with a fresh
    port."""
    markers = ('bind', 'address already in use', 'unavailable',
               'deadline exceeded', 'failed to connect')
    return any(
        rc != 0 and any(m in err.lower() for m in markers)
        for rc, _, err in outs
    )


def test_two_process_sharded_kfac_training() -> None:
    from kfac_pytorch_tpu.testing import open_port

    for attempt in range(3):
        outs = _launch_ranks(open_port())
        if not _is_rendezvous_failure(outs) or attempt == 2:
            break

    results = []
    for pid, (rc, out, err) in enumerate(outs):
        assert rc == 0, f'rank {pid} failed (rc={rc}):\n{err[-3000:]}'
        lines = [
            ln for ln in out.splitlines() if ln.startswith('MPRESULT')
        ]
        assert lines, f'rank {pid} printed no result:\n{out}'
        results.append(lines[-1])

    # SPMD: every rank must compute the identical global loss and hold
    # identical replicated final params.
    assert len(set(results)) == 1, results
