"""A/B: fused Pallas conv-cov kernel vs the XLA patches path, on-chip.

Times ``Conv2dHelper.get_a_factor`` for every distinct conv-A-factor shape
in the headline ResNet-20/CIFAR bench (batch 256) with the Pallas fused
kernel on and off, plus exactness vs the XLA path.

Methodology: per-dispatch host timing through the axon tunnel is noise
(0.05-18 ms spread on identical calls), so each variant runs as a
100-iteration ``lax.scan`` in ONE dispatch; a per-iteration input scale
defeats CSE. Run on the real TPU:

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_conv_cov.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from kfac_pytorch_tpu.layers.helpers import Conv2dHelper

# (name, batch, H, W, C, kernel, strides): ResNet-20 CIFAR at batch 256.
SHAPES = [
    ('stem 3->16 32x32', 256, 32, 32, 3, (3, 3), (1, 1)),
    ('block1 16ch 32x32', 256, 32, 32, 16, (3, 3), (1, 1)),
    ('block2 32ch 16x16', 256, 16, 16, 32, (3, 3), (1, 1)),
    ('block3 64ch 8x8', 256, 8, 8, 64, (3, 3), (1, 1)),
    ('down 16->32 s2', 256, 32, 32, 16, (3, 3), (2, 2)),
    ('down 32->64 s2', 256, 16, 16, 32, (3, 3), (2, 2)),
]

N_ITERS = 100


def _hsync(tree):
    from kfac_pytorch_tpu.tracing import hostsync
    return hostsync(tree)


def scan_time(factor_fn, x) -> float:
    """Device ms per call: 100 calls in one scanned dispatch."""
    scales = 1.0 + 0.001 * jnp.arange(N_ITERS, dtype=x.dtype)

    @jax.jit
    def run(x):
        def body(acc, s):
            return acc + factor_fn(x * s), None

        d = factor_fn(x).shape[0]
        acc, _ = jax.lax.scan(
            body, jnp.zeros((d, d), jnp.float32), scales,
        )
        return acc

    _hsync(run(x))
    best = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        _hsync(run(x))
        best = min(best, time.perf_counter() - t0)
    return best / N_ITERS * 1e3


def main() -> None:
    print('backend:', jax.default_backend())
    total_xla = total_best = 0.0
    for name, n, h, w, c, ks, st in SHAPES:
        x = jax.random.normal(
            jax.random.PRNGKey(0), (n, h, w, c), jnp.bfloat16,
        )
        mk = lambda pallas: Conv2dHelper(  # noqa: E731
            in_features=c * ks[0] * ks[1],
            out_features=0,
            has_bias=False,
            compute_dtype=jnp.bfloat16,
            kernel_size=ks,
            strides=st,
            padding='SAME',
            use_pallas=pallas,
        )
        t_xla = scan_time(mk(False).get_a_factor, x)
        line = f'{name:22s} xla {t_xla:7.3f} ms'
        t_best = t_xla
        if st == (1, 1) and c >= 16:
            t_pl = scan_time(mk(True).get_a_factor, x)
            cov_x = jax.jit(mk(False).get_a_factor)(x)
            cov_p = jax.jit(mk(True).get_a_factor)(x)
            err = float(
                jnp.max(jnp.abs(cov_x - cov_p))
                / (jnp.max(jnp.abs(cov_x)) + 1e-12),
            )
            line += (
                f'  pallas {t_pl:7.3f} ms'
                f'  speedup {t_xla / t_pl:5.2f}x  relerr {err:.2e}'
            )
            t_best = min(t_best, t_pl)
        total_xla += t_xla
        total_best += t_best
        print(line)
    print(
        f'{"TOTAL (1 of each)":22s} xla {total_xla:7.3f} ms'
        f'  best {total_best:7.3f} ms',
    )


if __name__ == '__main__':
    main()
