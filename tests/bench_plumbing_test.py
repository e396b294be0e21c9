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
