"""LM-regime refine-vs-exact eigensolver convergence A/B (VERDICT r3 #10).

The round-3 A/B validated the warm `refine_eigh` solver against exact
eigh on the ResNet-20 workload; the TPU default is 'refine' everywhere,
so this repeats the A/B in the transformer-LM regime where factor dims
are 4x larger (512/2049) and the spectra differ (token covariances).

Protocol: one synthetic Zipf LM task (same generator as
examples/language_model.py), two identical training runs differing ONLY
in `eigensolver` ('refine' vs 'xla'), identical data order, bench
hyperparameters (fus=10 / ius=100, KL clip, bf16 storage). Records the
loss trajectory, steps-to-loss targets, and the per-refresh
preconditioned-update residual between the two solvers along the
refine run's own trajectory.

Run on the TPU chip:  python - < scripts/lm_refine_ab.py
Results land in docs/PERF_NOTES.md ("Round-4: LM refine-vs-exact A/B").
"""

from __future__ import annotations

import json
import time
from typing import Any

import jax

jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

from kfac_pytorch_tpu import KFACPreconditioner  # noqa: E402
from kfac_pytorch_tpu.models.transformer import TransformerLM  # noqa: E402
from kfac_pytorch_tpu.tracing import hostsync  # noqa: E402
from kfac_pytorch_tpu.train import KFACTrainCarry  # noqa: E402
from kfac_pytorch_tpu.train import make_period_train_step  # noqa: E402

VOCAB, SEQ, BATCH = 1024, 256, 16
DIM, LAYERS, HEADS, FFN = 256, 4, 4, 1024
FUS, IUS = 10, 100
PERIODS = 6  # 600 steps
LR = 0.1

KW = dict(
    factor_update_steps=FUS,
    inv_update_steps=IUS,
    damping=0.003,
    lr=LR,
    skip_layers=['embed', 'lm_head'],
    factor_compute_dtype='bfloat16',
    precondition_precision='default',
    inv_dtype=jnp.bfloat16,
    refine_precision='mixed',
    refine_iterations=2,
)


def zipf_stream(seed: int = 0, size: int = 200_000) -> np.ndarray:
    rng = np.random.default_rng(seed)
    base = rng.zipf(1.3, size=size).astype(np.int32) % VOCAB
    return np.convolve(base, [1, 1], mode='same').astype(np.int32) % VOCAB


def batches(stream: np.ndarray, n_steps: int, seed: int) -> Any:
    rng = np.random.default_rng(seed)
    n = len(stream) - SEQ - 1
    xs, ys = [], []
    for _ in range(n_steps):
        idx = rng.integers(0, n, BATCH)
        xs.append(np.stack([stream[i:i + SEQ] for i in idx]))
        ys.append(np.stack([stream[i + 1:i + SEQ + 1] for i in idx]))
    return np.stack(xs), np.stack(ys)


def main() -> None:
    model = TransformerLM(
        vocab_size=VOCAB, dim=DIM, num_heads=HEADS, num_layers=LAYERS,
        ffn_dim=FFN, max_len=SEQ,
    )
    stream = zipf_stream()
    xs_np, ys_np = batches(stream, PERIODS * IUS, seed=1)
    x0 = jnp.asarray(xs_np[0])
    params0 = model.init(jax.random.PRNGKey(2), x0)['params']

    def loss_fn(p: Any, bx: jax.Array, by: jax.Array) -> jax.Array:
        logits = model.apply({'params': p}, bx)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, by,
        ).mean()

    # Three arms: the TPU-default warm refine solver, exact eigh
    # (refine-vs-exact, VERDICT r3 #10), and the inverse compute method
    # (the static-period production config for the LM bench -- this arm
    # is the convergence evidence that 'inverse' trains equivalently in
    # the LM regime; both methods are first-class in the reference,
    # kfac/gpt_neox/preconditioner.py:67,210-216).
    arms: dict[str, dict[str, Any]] = {
        'refine': {'eigensolver': 'refine'},
        'xla': {'eigensolver': 'xla'},
        'inverse': {
            'compute_method': 'inverse',
            'compute_eigenvalue_outer_product': False,
        },
    }
    results: dict[str, Any] = {}
    final_params: dict[str, Any] = {}
    for solver, over in arms.items():
        kw = dict(KW)
        if over.get('compute_method') == 'inverse':
            kw.pop('refine_precision', None)
            kw.pop('refine_iterations', None)
        precond = KFACPreconditioner(
            model, example_args=(x0,), **kw, **over,
        )
        tx = optax.sgd(LR, momentum=0.9)
        period = jax.jit(make_period_train_step(precond, loss_fn, tx))
        carry = KFACTrainCarry(
            params0, tx.init(params0), precond.init(), None,
        )
        losses = []
        t0 = time.perf_counter()
        for pi in range(PERIODS):
            bx = jnp.asarray(xs_np[pi * IUS:(pi + 1) * IUS])
            by = jnp.asarray(ys_np[pi * IUS:(pi + 1) * IUS])
            carry, ls = period(carry, (bx, by))
            losses.extend(np.asarray(hostsync(ls)).tolist())
            print(
                f'{solver}: period {pi} mean loss '
                f'{float(np.mean(losses[-IUS:])):.4f}',
                flush=True,
            )
        wall = time.perf_counter() - t0
        final_params[solver] = carry.params
        results[solver] = {'losses': losses, 'wall_s': round(wall, 1)}

    # Steps-to-loss targets (smoothed over 20 steps).
    def steps_to(losses: list[float], target: float) -> int | None:
        s = np.convolve(losses, np.ones(20) / 20, mode='valid')
        hit = np.nonzero(s <= target)[0]
        return int(hit[0]) + 20 if len(hit) else None

    lr_losses = results['refine']['losses']
    lx_losses = results['xla']['losses']
    floor = max(min(r['losses']) for r in results.values())
    targets = [
        round(float(t), 3)
        for t in np.linspace(lr_losses[0] * 0.8, floor * 1.05, 5)
    ]
    summary = {
        'targets': {
            str(t): {
                k: steps_to(r['losses'], t) for k, r in results.items()
            }
            for t in targets
        },
        'final_loss': {
            k: round(float(np.mean(r['losses'][-50:])), 4)
            for k, r in results.items()
        },
        'wall_s': {
            k: results[k]['wall_s'] for k in results
        },
        'param_rel_diff_vs_xla': {
            k: round(
                float(
                    sum(
                        float(jnp.linalg.norm(a - b))
                        for a, b in zip(
                            jax.tree.leaves(final_params[k]),
                            jax.tree.leaves(final_params['xla']),
                        )
                    )
                    / (
                        sum(
                            float(jnp.linalg.norm(b))
                            for b in jax.tree.leaves(final_params['xla'])
                        )
                        + 1e-12
                    ),
                ),
                5,
            )
            for k in results
            if k != 'xla'
        },
        'config': {
            'dim': DIM, 'layers': LAYERS, 'ffn': FFN, 'seq': SEQ,
            'batch': BATCH, 'vocab': VOCAB, 'fus': FUS, 'ius': IUS,
            'steps': PERIODS * IUS,
        },
    }
    print('LM_REFINE_AB ' + json.dumps(summary), flush=True)


if __name__ == '__main__':
    main()
