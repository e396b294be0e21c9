"""A/B the full vs lower-block-triangle Gram at ResNet-50 factor shapes.

For each representative (rows, d) Gram the rn50/b128 capture step runs
(conv G factors and 1x1-conv A factors -- the ~9 ms/capture-step of
plain covariances, docs/PERF_NOTES.md "remaining opportunities"), scan
the contraction on the real chip and report full ``get_cov`` vs
``get_cov_blocked`` at nb=2/4. Decides the ``gram_method='auto'``
threshold.

Run: PYTHONPATH=/root/repo python scripts/profile_gram.py
"""

from __future__ import annotations

import time
from typing import Any

import jax

jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')

import jax.numpy as jnp  # noqa: E402

SCAN_LEN = 30


def _hsync(tree: Any) -> Any:
    from kfac_pytorch_tpu.tracing import hostsync
    return hostsync(tree)


def timed(fn: Any, x: jax.Array) -> float:
    @jax.jit
    def run(a: jax.Array) -> jax.Array:
        def body(c, _):
            return c, fn(a + c)  # +c defeats CSE across iterations

        _, ys = jax.lax.scan(body, jnp.zeros((), a.dtype), None, SCAN_LEN)
        return ys[-1]

    _hsync(run(x))
    best = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        _hsync(run(x))
        best = min(best, time.perf_counter() - t0)
    return best / SCAN_LEN


def main() -> None:
    from kfac_pytorch_tpu.ops.covariance import get_cov
    from kfac_pytorch_tpu.ops.covariance import get_cov_blocked

    # (rows, d): rn50 b128 conv G factors and 1x1 A factors (+bias col).
    shapes = [
        (401408, 64),
        (401408, 256),
        (401408, 257),
        (100352, 512),
        (100352, 513),
        (25088, 1024),
        (25088, 1025),
        (6272, 2048),
        (6272, 2049),
    ]
    print(f'backend={jax.default_backend()} scan={SCAN_LEN} dtype=bf16')
    print(f'{"rows":>8} {"d":>6} {"full ms":>9} {"tri2 ms":>9} '
          f'{"tri4 ms":>9} {"best":>6}')
    total_full = total_best = 0.0
    for rows, d in shapes:
        key = jax.random.PRNGKey(d)
        x = jax.random.normal(key, (rows, d), jnp.bfloat16)
        t_full = timed(lambda a: get_cov(a), x) * 1e3
        t2 = timed(lambda a: get_cov_blocked(a, nb=2), x) * 1e3
        t4 = timed(lambda a: get_cov_blocked(a, nb=4), x) * 1e3
        best = min(t_full, t2, t4)
        which = {t_full: 'full', t2: 'tri2', t4: 'tri4'}[best]
        total_full += t_full
        total_best += best
        print(f'{rows:>8} {d:>6} {t_full:>9.3f} {t2:>9.3f} '
              f'{t4:>9.3f} {which:>6}')
    print(f'sum: full {total_full:.2f} ms -> best {total_best:.2f} ms '
          f'({total_full / total_best:.2f}x)')


if __name__ == '__main__':
    main()
