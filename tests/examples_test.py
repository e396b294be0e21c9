"""Unit tests for example utilities (datasets, LR schedule, checkpoints)."""

from __future__ import annotations

import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from examples.utils import create_lr_schedule  # noqa: E402
from examples.utils import label_smooth_loss  # noqa: E402
from examples.utils import latest_checkpoint  # noqa: E402
from examples.utils import Metric  # noqa: E402
from examples.vision.datasets import Dataset  # noqa: E402
from examples.vision.datasets import synthetic  # noqa: E402


def test_metric() -> None:
    m = Metric('loss')
    m.update(2.0, n=2)
    m.update(4.0, n=2)
    assert m.avg == pytest.approx(3.0)
    assert Metric('empty').avg == 0.0


def test_label_smooth_loss() -> None:
    logits = jnp.array([[10.0, -10.0], [-10.0, 10.0]])
    labels = jnp.array([0, 1])
    sharp = float(label_smooth_loss(logits, labels, smoothing=0.0))
    smooth = float(label_smooth_loss(logits, labels, smoothing=0.1))
    assert sharp < smooth  # smoothing penalizes overconfidence
    assert sharp == pytest.approx(0.0, abs=1e-6)


def test_lr_schedule_warmup_and_decay() -> None:
    sched = create_lr_schedule(
        1.0, warmup_epochs=5, decay_epochs=[10, 20], steps_per_epoch=1,
    )
    # warmup ramps linearly
    assert float(sched(0)) == pytest.approx(0.2)
    assert float(sched(4)) == pytest.approx(1.0)
    # full LR until first decay epoch
    assert float(sched(9)) == pytest.approx(1.0)
    assert float(sched(10)) == pytest.approx(0.1)
    assert float(sched(20)) == pytest.approx(0.01)


def test_latest_checkpoint(tmp_path) -> None:
    assert latest_checkpoint(str(tmp_path)) is None
    os.makedirs(tmp_path / 'ckpt_3')
    os.makedirs(tmp_path / 'ckpt_11')
    os.makedirs(tmp_path / 'other')
    assert latest_checkpoint(str(tmp_path)) == str(tmp_path / 'ckpt_11')


def test_synthetic_dataset_shapes_and_determinism() -> None:
    train, val = synthetic((8, 8, 1), 4, batch_size=16, seed=3, size=160)
    assert len(train) == 9  # 144 train / 16
    x, y = next(iter(train.epoch()))
    assert x.shape == (16, 8, 8, 1)
    assert y.shape == (16,)
    assert y.dtype == np.int32
    # same seed -> same data
    train2, _ = synthetic((8, 8, 1), 4, batch_size=16, seed=3, size=160)
    x2, y2 = next(iter(train2.epoch()))
    np.testing.assert_allclose(x, x2)


def test_dataset_augmentation_changes_images() -> None:
    rng = np.random.default_rng(0)
    images = rng.normal(0, 1, (32, 16, 16, 3)).astype(np.float32)
    labels = np.zeros(32, np.int32)
    ds = Dataset(images, labels, 16, train=True, augment=True, seed=1)
    x, _ = next(iter(ds.epoch()))
    assert x.shape == (16, 16, 16, 3)
    # augmented batches differ from the raw slices for at least one image
    raw = images[:16]
    assert not np.allclose(np.sort(x, axis=None), np.sort(raw, axis=None))


def test_prefetcher_preserves_order_and_applies_put() -> None:
    from examples.utils import Prefetcher

    items = [(np.full((2,), i), np.array(i)) for i in range(20)]
    out = list(Prefetcher(iter(items), put_fn=lambda x, y: (x + 1, y)))
    assert len(out) == 20
    for i, (x, y) in enumerate(out):
        np.testing.assert_allclose(x, i + 1)
        assert int(y) == i


def test_prefetcher_propagates_worker_exception() -> None:
    import pytest

    from examples.utils import Prefetcher

    def gen():
        yield (np.zeros(1), np.zeros(1))
        raise RuntimeError('boom in loader')

    pf = Prefetcher(gen(), depth=1)
    next(pf)
    with pytest.raises(RuntimeError, match='boom in loader'):
        for _ in pf:
            pass


def test_prefetcher_overlaps_producer_with_consumer() -> None:
    import time as _time

    from examples.utils import Prefetcher

    def slow_gen():
        for i in range(5):
            _time.sleep(0.02)  # host-side augmentation stand-in
            yield (i,)

    start = _time.perf_counter()
    for (i,) in Prefetcher(slow_gen(), depth=2):
        _time.sleep(0.02)  # device step stand-in
    wall = _time.perf_counter() - start
    # Serial would be ~0.2s; pipelined ~0.12s. Generous CI bound:
    assert wall < 0.18


def test_pipeline_transformer_cli_smoke() -> None:
    """The pipelined-transformer CLI trains a few steps on the virtual
    CPU mesh (2D and with --kfac 0 fast path)."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env['XLA_FLAGS'] = (
        env.get('XLA_FLAGS', '')
        + ' --xla_force_host_platform_device_count=8'
    ).strip()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(root, 'examples', 'pipeline_transformer.py'),
            '--force-cpu', '--pipe', '2', '--data', '2',
            '--steps', '8', '--log-every', '4',
            '--dim', '32', '--heads', '2', '--ffn-dim', '64',
            '--seq-len', '16', '--batch-size', '16',
            '--kfac-factor-update-steps', '2',
            '--kfac-inv-update-steps', '4',
        ],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=root,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert 'step     8' in out.stdout, out.stdout


def test_pipeline_transformer_cli_static_period_inverse_smoke() -> None:
    """--kfac-static-period --kfac-inverse trains through
    make_pipeline_period_train_step (the production GPT-NeoX-style
    schedule) on the virtual CPU mesh."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env['XLA_FLAGS'] = (
        env.get('XLA_FLAGS', '')
        + ' --xla_force_host_platform_device_count=8'
    ).strip()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(root, 'examples', 'pipeline_transformer.py'),
            '--force-cpu', '--pipe', '2', '--data', '2',
            '--steps', '8', '--log-every', '4',
            '--dim', '32', '--heads', '2', '--ffn-dim', '64',
            '--seq-len', '16', '--batch-size', '16',
            '--kfac-factor-update-steps', '2',
            '--kfac-inv-update-steps', '4',
            '--kfac-static-period', '--kfac-inverse',
        ],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=root,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert 'step     8' in out.stdout, out.stdout
    # Divisibility validation fires before any compile.
    bad = subprocess.run(
        [
            sys.executable,
            os.path.join(root, 'examples', 'pipeline_transformer.py'),
            '--force-cpu', '--pipe', '2', '--data', '2',
            '--steps', '6',
            '--dim', '32', '--heads', '2', '--ffn-dim', '64',
            '--seq-len', '16', '--batch-size', '16',
            '--kfac-inv-update-steps', '4',
            '--kfac-static-period',
        ],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=root,
    )
    assert bad.returncode != 0
    assert 'divisible' in bad.stderr


def test_language_model_cli_static_period_smoke() -> None:
    """--kfac-static-period trains through make_period_train_step and
    reaches the same epoch reporting as the dynamic path."""
    import subprocess

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(root, 'examples', 'language_model.py'),
            '--epochs', '1', '--steps-per-epoch', '20',
            '--kfac-inv-update-steps', '10',
            '--kfac-factor-update-steps', '2',
            '--dim', '32', '--layers', '1', '--heads', '2',
            '--ffn-dim', '64', '--seq-len', '16', '--batch-size', '16',
            '--kfac-static-period', '--force-cpu',
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=root,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert 'epoch 0' in out.stdout, out.stdout


def test_language_model_cli_static_period_divisibility() -> None:
    """A non-divisible steps-per-epoch fails loudly, not silently."""
    import subprocess

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(root, 'examples', 'language_model.py'),
            '--epochs', '1', '--steps-per-epoch', '15',
            '--kfac-inv-update-steps', '10',
            '--dim', '32', '--layers', '1', '--heads', '2',
            '--ffn-dim', '64', '--seq-len', '16', '--batch-size', '16',
            '--kfac-static-period', '--force-cpu',
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=root,
    )
    assert out.returncode != 0
    assert 'divisible' in (out.stderr + out.stdout)


def test_language_model_cli_static_period_fus_divisibility() -> None:
    """ius not divisible by fus fails with a clean CLI error (ADVICE r3)."""
    import subprocess

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(root, 'examples', 'language_model.py'),
            '--epochs', '1', '--steps-per-epoch', '20',
            '--kfac-inv-update-steps', '10',
            '--kfac-factor-update-steps', '3',
            '--dim', '32', '--layers', '1', '--heads', '2',
            '--ffn-dim', '64', '--seq-len', '16', '--batch-size', '16',
            '--kfac-static-period', '--force-cpu',
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=root,
    )
    assert out.returncode != 0
    assert 'divisible' in (out.stderr + out.stdout)
    assert 'Traceback' not in out.stderr


def test_cifar10_resnet_cli_smoke() -> None:
    """The CIFAR-10 ResNet CLI trains one epoch on synthetic data over
    the 8-device virtual CPU mesh with a KAISA strategy flag
    (reference CLI: torch_cifar10_resnet.py:261-386)."""
    import subprocess

    env = dict(os.environ)
    env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=8'
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(root, 'examples', 'cifar10_resnet.py'),
            '--force-cpu',
            '--model', 'resnet20', '--epochs', '1',
            '--batch-size', '8', '--val-batch-size', '8',
            '--synthetic-size', '128',
            '--kfac-strategy', 'mem-opt',
            '--kfac-factor-update-steps', '1',
            '--kfac-inv-update-steps', '2',
            '--log-every', '1',
        ],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=root,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert 'KFAC registered' in out.stdout, out.stdout
    assert 'epoch 0' in out.stdout, out.stdout


def test_imagenet_resnet_cli_smoke() -> None:
    """The ImageNet ResNet CLI trains one epoch on synthetic data
    (single-device CPU, label smoothing + warmup path)."""
    import subprocess

    env = dict(os.environ)
    # force_cpu_platform respects an external device-count flag: pin a
    # single device so this smoke covers the unsharded configuration.
    env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=1'
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(root, 'examples', 'imagenet_resnet.py'),
            '--force-cpu',
            '--model', 'resnet50', '--epochs', '1',
            '--image-size', '32',
            '--batch-size', '8', '--val-batch-size', '8',
            '--synthetic-size', '16',
            '--kfac-worker-fraction', '1.0',
            '--kfac-factor-update-steps', '1',
            '--kfac-inv-update-steps', '2',
            '--log-every', '1',
        ],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=root,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert 'epoch 0' in out.stdout, out.stdout


def _write_cifar_fixture(dirpath: str, per_file: int = 64) -> None:
    """Deterministic CIFAR-10 binary batches (1 label byte + 3072 CHW)."""
    rng = np.random.default_rng(7)
    os.makedirs(dirpath, exist_ok=True)
    for fname in [f'data_batch_{i}.bin' for i in range(1, 6)] + [
        'test_batch.bin',
    ]:
        labels = rng.integers(0, 10, per_file, dtype=np.uint8)
        pixels = rng.integers(
            0, 256, (per_file, 3072), dtype=np.int64,
        ).astype(np.uint8)
        rec = np.concatenate([labels[:, None], pixels], axis=1)
        rec.tofile(os.path.join(dirpath, fname))


def test_cifar10_real_binary_decode_path(tmp_path) -> None:
    """The CIFAR binary branch (reference vision/datasets.py:19-153)
    decodes, normalizes, and iterates with augmentation."""
    from examples.vision import datasets

    _write_cifar_fixture(str(tmp_path))
    train, val = datasets.cifar10(str(tmp_path), 32, 16)
    assert train.images.shape == (320, 32, 32, 3)
    assert val.images.shape == (64, 32, 32, 3)
    assert train.images.dtype == np.float32
    # Normalized: uniform-random uint8 pixels land near mean 0 per
    # channel after (x/255 - mean) / std.
    assert abs(float(train.images.mean())) < 0.25
    assert 0 <= int(train.labels.min()) and int(train.labels.max()) <= 9
    assert len(train) == 10  # 320 // 32
    xb, yb = next(iter(train.epoch()))
    assert xb.shape == (32, 32, 32, 3) and yb.shape == (32,)


def test_cifar10_resnet_cli_real_data_smoke(tmp_path) -> None:
    """The CIFAR CLI end-to-end on REAL binary data (--data-dir), not the
    synthetic fallback."""
    import subprocess

    _write_cifar_fixture(str(tmp_path))
    env = dict(os.environ)
    env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=8'
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(root, 'examples', 'cifar10_resnet.py'),
            '--force-cpu',
            '--data-dir', str(tmp_path),
            '--model', 'resnet20', '--epochs', '1',
            '--batch-size', '8', '--val-batch-size', '8',
            '--kfac-factor-update-steps', '1',
            '--kfac-inv-update-steps', '5',
            '--log-every', '1',
        ],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=root,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert 'epoch 0' in out.stdout, out.stdout


def test_language_model_file_stream(tmp_path) -> None:
    """The byte-level --data-file branch of the LM CLI."""
    import argparse
    import importlib.util

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        'lm_cli', os.path.join(root, 'examples', 'language_model.py'),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    payload = bytes(range(256)) * 8
    f = tmp_path / 'corpus.bin'
    f.write_bytes(payload)
    args = argparse.Namespace(
        data_file=str(f), vocab_size=128, seed=0,
    )
    stream = mod.token_stream(args)
    assert stream.dtype == np.int32
    assert len(stream) == len(payload)
    np.testing.assert_array_equal(
        stream, np.frombuffer(payload, np.uint8).astype(np.int32) % 128,
    )


def test_dynamic_loss_scale_amp_workflow() -> None:
    """GradScaler-style loop: scaled loss, unscaled captures via
    grad_scale, skipped step on overflow, backoff/growth semantics
    (reference examples/vision/engine.py:63-88)."""
    import jax
    import optax

    from examples.utils import DynamicLossScale
    from kfac_pytorch_tpu import KFACPreconditioner
    from kfac_pytorch_tpu.models import TinyModel

    scaler = DynamicLossScale(init_scale=1024.0, growth_interval=2)
    model = TinyModel()
    x = jnp.asarray(np.random.default_rng(0).normal(size=(8, 8)), jnp.float32)
    y = jnp.asarray(np.random.default_rng(1).normal(size=(8, 10)), jnp.float32)
    params = model.init(jax.random.PRNGKey(2), x)

    def scaled_loss(p, bx, by):
        out = model.apply(p, bx)
        return jnp.mean((out - by) ** 2) * scaler.scale()

    precond = KFACPreconditioner(
        model, example_args=(x,), grad_scale=scaler.scale,
    )
    state = precond.init()
    vag = precond.value_and_grad(scaled_loss)
    (_, _), grads, captured = vag(params, x, y)

    # Captured factors are UNSCALED (grad_scale divides g before the
    # covariance): compare against a scale-1 run.
    ref = KFACPreconditioner(model, example_args=(x,))

    def plain_loss(p, bx, by):
        out = model.apply(p, bx)
        return jnp.mean((out - by) ** 2)

    (_, _), grads_ref, cap_ref = ref.value_and_grad(plain_loss)(params, x, y)
    for name in captured:
        np.testing.assert_allclose(
            np.asarray(captured[name].g),
            np.asarray(cap_ref[name].g),
            rtol=1e-4,
            atol=1e-8,
        )

    # Raw grads are scaled; unscale before the optimizer step.
    finite = bool(DynamicLossScale.grads_finite(grads))
    assert finite
    unscaled = jax.tree.map(lambda g: g / scaler.scale(), grads)
    for a, b in zip(jax.tree.leaves(unscaled), jax.tree.leaves(grads_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3)

    # Overflow: backoff and skip; growth after growth_interval good steps.
    scaler.update(found_inf=True)
    assert scaler._scale == 512.0
    scaler.update(found_inf=False)
    scaler.update(found_inf=False)
    assert scaler._scale == 1024.0
    _ = optax  # referenced for parity with other tests


def test_trainer_surfaces_nonfinite_skips(capsys) -> None:
    """A forced-overflow batch surfaces the skipped-layer count in the
    vision engine's log -- the AMP observability loop end-to-end
    (engine nonfinite_guard -> nonfinite_captures -> train_epoch log),
    the analogue of GradScaler's visible skips in the reference's loop
    (examples/vision/engine.py:80-88 of gpauloski/kfac-pytorch).
    """
    import jax
    import optax

    from examples.vision.engine import Trainer
    from kfac_pytorch_tpu import KFACPreconditioner
    from kfac_pytorch_tpu.models import resnet20

    rng = np.random.default_rng(0)
    batches = [
        (
            rng.normal(size=(4, 32, 32, 3)).astype(np.float32),
            rng.integers(0, 10, 4).astype(np.int32),
        )
        for _ in range(3)
    ]
    # Batch 1 overflows: every layer's captured factors go nonfinite.
    batches[1] = (np.full_like(batches[1][0], np.nan), batches[1][1])

    class Stub:
        def __len__(self) -> int:
            return len(batches)

        def epoch(self):  # noqa: ANN202
            return iter(batches)

    model = resnet20()
    x0 = jnp.asarray(batches[0][0])
    variables = model.init(jax.random.PRNGKey(0), x0)
    precond = KFACPreconditioner(
        model,
        example_args=(x0,),
        factor_update_steps=1,
        inv_update_steps=2,
        skip_layers=['shortcut'],
    )
    trainer = Trainer(model=model, tx=optax.sgd(0.01), precond=precond)
    state = trainer.init_state(
        variables['params'], variables['batch_stats'],
    )
    state, _ = trainer.train_epoch(
        state, Stub(), epoch=0, log_every=1, verbose=True,
    )
    # The NaN batch skips every registered layer's EMA fold; the
    # unguarded optimizer still applies the NaN grads (skipping the
    # update on overflow is DynamicLossScale's job, not the engine's),
    # so the following batch's captures are nonfinite too: 2 epochs'
    # worth of layer skips, all surfaced.
    assert trainer.epoch_nonfinite_skips == 2 * len(precond.specs)
    assert 'kfac_nonfinite_skips' in capsys.readouterr().out
    # The guard kept the factor EMAs finite through the overflow batch.
    for cf in state.kfac_state.factors.values():
        assert bool(jnp.all(jnp.isfinite(cf.a)))
        assert bool(jnp.all(jnp.isfinite(cf.g)))
