"""Per-op device-time breakdown of a scanned K-FAC capture step.

Wraps ``jax.profiler.trace`` around one dispatch of a scanned step and
aggregates device self-time per HLO op category from the captured
xplane, answering "where do the capture milliseconds actually go"
(MXU contractions vs patch materialization vs elementwise glue).

Usage:
  python scripts/profile_ops.py [--rn50] [--sgd|--capture|--full]
Env: PROFILE_BATCH (rn50 batch, default 128), PROFILE_SCAN_LEN (default 10).
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict
from typing import Any

import jax

jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')

import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

SCAN_LEN = int(os.environ.get('PROFILE_SCAN_LEN', '10'))


def _hsync(tree: Any) -> Any:
    from kfac_pytorch_tpu.tracing import hostsync
    return hostsync(tree)


def build_step(kind: str) -> tuple[Any, Any]:
    sys.path.insert(0, '/root/repo')
    import bench

    if '--rn50' in sys.argv:
        model, params, batch_stats, precond, loss_fn, x, y = (
            bench.build_rn50(int(os.environ.get('PROFILE_BATCH', '128')))
        )
    else:
        model, params, batch_stats, precond, loss_fn, x, y = bench.build()
    tx = optax.sgd(0.1, momentum=0.9)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    if kind == 'sgd':
        def body(carry: Any, _: Any):
            p, bn, o = carry
            (loss, bn2), grads = grad_fn(p, bn, x, y)
            updates, o = tx.update(grads, o)
            return (optax.apply_updates(p, updates), bn2, o), loss

        return body, (params, batch_stats, tx.init(params))

    if kind == 'capture':
        vag = precond.value_and_grad(loss_fn, has_aux=True)

        def body(carry: Any, _: Any):
            p, bn, o = carry
            (loss, bn2), grads, captured = vag(p, bn, x, y)
            loss = loss + 0.0 * sum(
                jnp.sum(c.a[0]) + jnp.sum(c.g[0]) for c in captured.values()
            )
            updates, o = tx.update(grads, o)
            return (optax.apply_updates(p, updates), bn2, o), loss

        return body, (params, batch_stats, tx.init(params))

    from kfac_pytorch_tpu.train import KFACTrainCarry, make_train_step

    kstep = make_train_step(precond, loss_fn, tx, has_aux=True)

    def body(carry: Any, _: Any):
        return kstep(carry, (x, y))

    return body, KFACTrainCarry(
        params, tx.init(params), precond.init(), batch_stats,
    )


def collect_trace(run: Any, carry: Any, logdir: str) -> None:
    _hsync(run(carry))  # compile + warm outside the trace
    with jax.profiler.trace(logdir):
        _hsync(run(carry))


def summarize(logdir: str, top: int = 40) -> None:
    """Aggregate device self-time per op name from the trace-events JSON."""
    try:
        # xprof ships a working converter on this stack; the
        # tensorboard_plugin_profile one trips a protobuf version check.
        from xprof.convert import raw_to_tool_data
    except ImportError:
        from tensorboard_plugin_profile.convert import raw_to_tool_data

    xspaces = glob.glob(
        os.path.join(logdir, 'plugins/profile/*/*.xplane.pb'),
    )
    assert xspaces, f'no xplane under {logdir}'
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        xspaces, 'trace_viewer', {},
    )
    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data)
        except OSError:
            pass
    trace = json.loads(data)
    events = trace.get('traceEvents', [])
    # Device-side events live on TPU pid tracks; keep only the leaf
    # "XLA Ops" thread -- scope/module threads nest the same time and
    # would double-count.
    pid_names = {
        e['pid']: e['args'].get('name', '')
        for e in events
        if e.get('ph') == 'M' and e.get('name') == 'process_name'
        and 'args' in e
    }
    device_pids = {
        pid for pid, name in pid_names.items()
        if 'TPU' in name or 'tpu' in name or '/device' in name.lower()
    }
    op_tids = {
        (e['pid'], e['tid'])
        for e in events
        if e.get('ph') == 'M' and e.get('name') == 'thread_name'
        and 'args' in e and 'XLA Ops' in e['args'].get('name', '')
    }
    agg: dict[str, float] = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get('ph') != 'X' or 'dur' not in e:
            continue
        if device_pids and e.get('pid') not in device_pids:
            continue
        if op_tids and (e.get('pid'), e.get('tid')) not in op_tids:
            continue
        name = e.get('name', '?')
        agg[name] += e['dur']
        total += e['dur']
    items = sorted(agg.items(), key=lambda kv: -kv[1])[:top]
    print(f'total device-event time: {total/1e3:.3f} ms '
          f'({len(agg)} distinct ops; scan length {SCAN_LEN})')
    for name, dur in items:
        print(f'{dur/1e3:10.3f} ms  {100*dur/max(total,1e-9):5.1f}%  {name[:110]}')


def main() -> None:
    kind = 'capture'
    for k in ('sgd', 'capture', 'full'):
        if f'--{k}' in sys.argv:
            kind = k
    body, carry = build_step(kind)

    @jax.jit
    def run(c: Any) -> Any:
        return jax.lax.scan(body, c, xs=None, length=SCAN_LEN)

    logdir = os.environ.get('PROFILE_LOGDIR', f'/tmp/kfac_trace_{kind}')
    os.makedirs(logdir, exist_ok=True)
    collect_trace(run, carry, logdir)
    summarize(logdir)


if __name__ == '__main__':
    main()
