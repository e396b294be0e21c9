"""Standalone A/B of conv A-factor algorithms on ResNet-50 conv shapes.

Times each distinct (activation shape, kernel, stride) conv geometry in
ResNet-50/ImageNet for the 'patches' and 'convgrad' A-factor paths, one
scanned dispatch per measurement (bf16 inputs, f32 factor out).

Run: python scripts/profile_afactor_rn50.py [batch]
"""

from __future__ import annotations

import sys
import time
from typing import Any

import jax

jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')

import jax.numpy as jnp  # noqa: E402

from kfac_pytorch_tpu.layers.helpers import Conv2dHelper  # noqa: E402

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 128

# (h, w, c, kh, kw, stride, count) -- distinct RN50 conv geometries
# (1x1 convs use the strided-slice fast path in every method; the 3x3s
# and the 7x7 stem are where the patch slab hurts).
GEOMS = [
    (224, 224, 3, 7, 7, 2, 1),
    (56, 56, 64, 3, 3, 1, 3),
    (56, 56, 128, 3, 3, 2, 1),
    (28, 28, 128, 3, 3, 1, 3),
    (28, 28, 256, 3, 3, 2, 1),
    (14, 14, 256, 3, 3, 1, 5),
    (14, 14, 512, 3, 3, 2, 1),
    (7, 7, 512, 3, 3, 1, 2),
]

# ResNet-20/CIFAR geometries (--rn20): small channel counts (16/32)
# starve the 128-wide lanes, so the rn50-tuned 'auto' rule needs its own
# sweep here.
GEOMS_RN20 = [
    (32, 32, 3, 3, 3, 1, 1),
    (32, 32, 16, 3, 3, 1, 13),
    (32, 32, 16, 3, 3, 2, 1),
    (16, 16, 32, 3, 3, 1, 11),
    (16, 16, 32, 3, 3, 2, 1),
    (8, 8, 64, 3, 3, 1, 11),
]


def rpc_floor() -> float:
    """Host-sync round-trip latency (hostsync forces a device->host
    fetch because block_until_ready returns early on the tunnel
    backend); subtracted from every timed dispatch."""
    from kfac_pytorch_tpu.tracing import hostsync

    tiny = jnp.zeros((4,), jnp.float32)
    run = jax.jit(lambda v: v + 1.0)
    hostsync(run(tiny))
    best = float('inf')
    for _ in range(5):
        t0 = time.perf_counter()
        hostsync(run(tiny))
        best = min(best, time.perf_counter() - t0)
    return best


def timed(fn: Any, x: jax.Array, n: int = 10) -> float:
    from kfac_pytorch_tpu.tracing import hostsync

    @jax.jit
    def run(x: jax.Array) -> jax.Array:
        # Carry a SCALAR accumulator (sum keeps the factor alive without
        # stacking [n, d, d] outputs -- a stacked output would be fetched
        # by hostsync and the tunnel transfer would dwarf the compute).
        def body(carry, _):
            s, acc = carry
            # Cast the scale to x's dtype: a traced f32 scalar would
            # silently promote the bf16 activation (and the contraction
            # under test) to f32.
            xs = x * s.astype(x.dtype) if hasattr(s, 'astype') else x * s
            return (s + 1e-6, acc + jnp.sum(fn(xs))), None

        (_, acc), _ = jax.lax.scan(body, (1.0, 0.0), xs=None, length=n)
        return acc

    floor = rpc_floor()
    hostsync(run(x))
    best = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        hostsync(run(x))
        best = min(best, time.perf_counter() - t0)
    return max(best - floor, 1e-9) / n


def run_one(h: int, w: int, c: int, kh: int, kw: int, s: int,
            method: str) -> float:
    x = jax.random.normal(
        jax.random.PRNGKey(0), (BATCH, h, w, c), jnp.bfloat16,
    )
    helper = Conv2dHelper(
        in_features=kh * kw * c,
        out_features=c,
        has_bias=True,
        kernel_size=(kh, kw),
        strides=(s, s),
        padding='SAME',
        a_factor_method=method,
        compute_dtype='bfloat16',
    )
    return timed(helper.get_a_factor, x)


def main() -> None:
    """Each (geometry, method) runs in its own subprocess so one compile
    blow-up or tunnel kill doesn't take down the sweep."""
    import subprocess

    totals: dict[str, float] = {}
    incomplete: set[str] = set()
    print(f'batch={BATCH}  backend={jax.default_backend()}', flush=True)
    geoms = GEOMS_RN20 if '--rn20' in sys.argv else GEOMS
    for h, w, c, kh, kw, s, count in geoms:
        line = f'({h:3d},{w:3d},{c:4d}) k{kh}x{kw} s{s} x{count}:'
        methods = ('patches', 'convgrad', 'rowgram')
        if '--methods' in sys.argv:
            methods = tuple(
                sys.argv[sys.argv.index('--methods') + 1].split(','),
            )
        for method in methods:
            proc = subprocess.run(
                [sys.executable, __file__, str(BATCH), '--one',
                 str(h), str(w), str(c), str(kh), str(kw), str(s), method],
                capture_output=True, text=True, timeout=900,
            )
            out = [ln for ln in proc.stdout.splitlines()
                   if ln.startswith('RESULT ')]
            if proc.returncode != 0 or not out:
                line += f'  {method}= FAILED(rc={proc.returncode})'
                incomplete.add(method)
                continue
            t = float(out[-1].split()[1])
            totals[method] = totals.get(method, 0.0) + t * count
            line += f'  {method}={t * 1e3:7.3f}ms'
        print(line, flush=True)
    print('totals (weighted by layer count):')
    for k, v in totals.items():
        flag = '  [INCOMPLETE]' if k in incomplete else ''
        print(f'  {k:9s}: {v * 1e3:8.3f} ms{flag}')


if __name__ == '__main__':
    if '--one' in sys.argv:
        i = sys.argv.index('--one')
        h, w, c, kh, kw, s = (int(v) for v in sys.argv[i + 1:i + 7])
        print('RESULT', run_one(h, w, c, kh, kw, s, sys.argv[i + 7]))
    else:
        main()
