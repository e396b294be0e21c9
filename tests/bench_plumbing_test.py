"""Tests for bench.py's section-subprocess plumbing (no chip work).

The driver consumes exactly one JSON line from ``python bench.py``; the
per-section subprocess isolation (timeout + retry around a wedge-prone
TPU tunnel) must parse child output robustly. These tests cover the
pure parsing contract and the section registry without touching any
backend.
"""

from __future__ import annotations

import json
import sys

import pytest


@pytest.fixture(scope='module')
def bench():  # noqa: ANN201
    saved = sys.argv
    sys.argv = ['bench']
    sys.path.insert(0, '.')
    import bench as mod

    yield mod
    sys.argv = saved


def test_parse_section_output_takes_last_marker(bench) -> None:  # noqa: ANN001
    out = bench._parse_section_output(
        'WARNING: noise\n'
        + bench._SECTION_PREFIX
        + json.dumps({'a': 1})
        + '\nprogress...\n'
        + bench._SECTION_PREFIX
        + json.dumps({'a': 2})
        + '\n',
    )
    assert out == {'a': 2}


def test_parse_section_output_no_marker(bench) -> None:  # noqa: ANN001
    assert bench._parse_section_output('just warnings\n') is None


def test_parse_section_output_malformed_json(bench) -> None:  # noqa: ANN001
    assert (
        bench._parse_section_output(bench._SECTION_PREFIX + '{oops')
        is None
    )


def test_parse_section_output_non_dict(bench) -> None:  # noqa: ANN001
    assert (
        bench._parse_section_output(bench._SECTION_PREFIX + '[1, 2]')
        is None
    )


def test_section_registry_names(bench) -> None:  # noqa: ANN001
    # main() dispatches these names to children; a rename that misses
    # the registry would silently drop a bench section.
    assert {
        'rn50', 'rn20', 'rn20_factor', 'lm', 'pipe1', 'sync',
    } <= set(bench.SECTIONS)
    assert all(callable(f) for f in bench.SECTIONS.values())


def test_safe_wraps_exceptions(bench) -> None:  # noqa: ANN001
    def boom() -> None:
        raise RuntimeError('nope')

    out = bench._safe(boom)
    assert out == {'error': 'RuntimeError: nope'}
    assert bench._safe(lambda: {'x': 1}) == {'x': 1}


def test_warmed_best_runs_warmups_outside_timing(bench) -> None:  # noqa: ANN001
    # The shared timing helper must invoke the closure warmups+repeats
    # times and report the best/spread over the timed repeats only.
    calls = []

    def call() -> None:
        calls.append(1)

    best, spread = bench._warmed_best(call, repeats=3, warmups=2)
    assert len(calls) == 5
    assert best >= 0.0
    assert spread >= 0.0


def test_section_estimates_cover_registry(bench) -> None:  # noqa: ANN001
    # The budget governor skips sections by estimate; a section missing
    # from the table would fall back to its (much larger) timeout and
    # be skipped too eagerly.
    assert set(bench.SECTIONS) <= set(bench._SECTION_EST_S)


_STUBS = {
    'rn50': lambda: {
        'rn50': {
            'sgd_step_ms': 1.0,
            'kfac_step_ms': 1.1,
            'overhead_pct': 10.0,
        },
    },
    'rn20': lambda: {'overhead_pct': 1.0},
    'rn20_factor': lambda: {'capture': {'c': 1}, 'decomp': {'d': 1}},
    'lm': lambda: {'overhead_pct': 2.0},
    'pipe1': lambda: {'b128': {'overhead_pct': 3.0}},
    'sync': lambda: {'hostsync_ms': 1.0},
    'tta': lambda: {'kfac_wins': True},
}


def test_run_section_salvages_partial_on_timeout(  # noqa: ANN001
    bench, monkeypatch,
) -> None:
    """A section child killed by its timeout may already have printed
    partial SECTION_RESULT markers (e.g. the rn50 headline before the
    eigen continuity arm); _run_section must salvage the last one
    instead of discarding the section."""
    import subprocess

    partial = bench._SECTION_PREFIX + json.dumps({'rn50': {'a': 1}})

    def fake_run(*args, **kwargs):  # noqa: ANN002, ANN003, ANN202
        raise subprocess.TimeoutExpired(
            cmd='bench', timeout=1.0, output=f'noise\n{partial}\n',
        )

    monkeypatch.setattr(bench.subprocess, 'run', fake_run, raising=False)
    out = bench._run_section('rn50', timeout_s=1.0, retries=0)
    assert out['rn50'] == {'a': 1}
    assert 'partial' in out

    def fake_run_empty(*args, **kwargs):  # noqa: ANN002, ANN003, ANN202
        raise subprocess.TimeoutExpired(cmd='bench', timeout=1.0)

    monkeypatch.setattr(
        bench.subprocess, 'run', fake_run_empty, raising=False,
    )
    out = bench._run_section('rn50', timeout_s=1.0, retries=0)
    assert 'error' in out


def test_main_emits_after_every_section(  # noqa: ANN001
    bench, monkeypatch, capsys,
) -> None:
    # BENCH_r04 postmortem: the driver parses the LAST JSON line of a
    # possibly-killed process, so main() must re-emit the cumulative
    # result after every section -- the first line already carries the
    # headline.
    monkeypatch.setattr(
        bench, 'SECTIONS', {**bench.SECTIONS, **_STUBS},
    )
    monkeypatch.setenv('KFAC_BENCH_INLINE', '1')
    monkeypatch.setenv('KFAC_BENCH_BUDGET_S', '100000')
    bench.main()
    lines = [
        ln
        for ln in capsys.readouterr().out.splitlines()
        if ln.startswith('{')
    ]
    assert len(lines) >= 7
    boot = json.loads(lines[0])
    first = json.loads(lines[1])
    last = json.loads(lines[-1])
    # Bootstrap line before any section: parseable honest null.
    assert boot['value'] is None
    assert boot['detail']['sections_done'] == []
    assert first['value'] == 10.0
    assert first['detail']['sections_done'] == ['rn50']
    assert last['value'] == 10.0
    assert last['detail']['sections_done'][-1] == 'sync'
    assert last['detail']['time_to_accuracy'] == {'kfac_wins': True}
    assert last['detail']['resnet20_cifar']['c'] == 1


def test_main_budget_governor_skips_everything_at_zero(  # noqa: ANN001
    bench, monkeypatch, capsys,
) -> None:
    monkeypatch.setattr(
        bench, 'SECTIONS', {**bench.SECTIONS, **_STUBS},
    )
    monkeypatch.setenv('KFAC_BENCH_INLINE', '1')
    monkeypatch.setenv('KFAC_BENCH_BUDGET_S', '0')
    bench.main()
    captured = capsys.readouterr()
    lines = [
        ln for ln in captured.out.splitlines() if ln.startswith('{')
    ]
    # Even with zero budget the bench emits parseable lines; the
    # headline is an honest null and every section carries a skip
    # marker instead of silently vanishing.
    last = json.loads(lines[-1])
    assert last['value'] is None
    assert 'skipped' in last['detail']['resnet20_cifar']
    assert 'skipped' in last['detail']['sync_probe']
