"""Golden-table tests for KAISA assignment (counterpart of reference
``tests/assignment_test.py``)."""

from __future__ import annotations

import pytest

from kfac_pytorch_tpu.assignment import KAISAAssignment


def test_partition_grad_workers() -> None:
    out = KAISAAssignment.partition_grad_workers(8, 2)
    assert out == {
        frozenset({0, 4}),
        frozenset({1, 5}),
        frozenset({2, 6}),
        frozenset({3, 7}),
    }
    out = KAISAAssignment.partition_grad_workers(8, 8)
    assert out == {frozenset(range(8))}
    out = KAISAAssignment.partition_grad_workers(8, 1)
    assert out == {frozenset({i}) for i in range(8)}


def test_partition_grad_receivers() -> None:
    out = KAISAAssignment.partition_grad_receivers(8, 2)
    assert out == {frozenset({0, 1, 2, 3}), frozenset({4, 5, 6, 7})}
    out = KAISAAssignment.partition_grad_receivers(4, 4)
    assert out == {frozenset({i}) for i in range(4)}


def test_partition_errors() -> None:
    with pytest.raises(ValueError):
        KAISAAssignment.partition_grad_workers(8, 3)
    with pytest.raises(ValueError):
        KAISAAssignment.partition_grad_workers(0, 1)
    with pytest.raises(ValueError):
        KAISAAssignment.partition_grad_receivers(8, 5)


def test_greedy_assignment_colocated_golden() -> None:
    """Hand-computed: two worker groups, three layers of descending cost."""
    work = {
        'l1': {'A': 10.0, 'G': 10.0},  # total 20
        'l2': {'A': 6.0, 'G': 6.0},  # total 12
        'l3': {'A': 1.0, 'G': 1.0},  # total 2
    }
    out = KAISAAssignment.greedy_assignment(
        work,
        [[0, 1], [2, 3]],
        4,
        colocate_factors=True,
    )
    # l1 (cost 20) -> group [0,1] device 0; l2 -> group [2,3] device 2;
    # l3 -> group [2,3] (load 12 < 20) device 3 (load 0 < 12).
    assert out == {
        'l1': {'A': 0, 'G': 0},
        'l2': {'A': 2, 'G': 2},
        'l3': {'A': 3, 'G': 3},
    }


def test_greedy_assignment_distributed_factors() -> None:
    work = {
        'l1': {'A': 4.0, 'G': 8.0},
    }
    out = KAISAAssignment.greedy_assignment(
        work,
        [[0, 1]],
        2,
        colocate_factors=False,
    )
    # G (8) -> device 0; A (4) -> device 1.
    assert out == {'l1': {'A': 1, 'G': 0}}


def test_broadcast_predicates() -> None:
    work = {'l1': {'A': 1.0, 'G': 1.0}}
    comm = KAISAAssignment(
        work, local_rank=0, world_size=4, grad_worker_fraction=1.0,
    )
    assert comm.broadcast_inverses() and not comm.broadcast_gradients()
    mem = KAISAAssignment(
        work, local_rank=0, world_size=4, grad_worker_fraction=0.25,
    )
    assert not mem.broadcast_inverses() and mem.broadcast_gradients()
    hybrid = KAISAAssignment(
        work, local_rank=0, world_size=4, grad_worker_fraction=0.5,
    )
    assert hybrid.broadcast_inverses() and hybrid.broadcast_gradients()


def test_groups_and_src_grad_worker() -> None:
    work = {
        'a': {'A': 4.0, 'G': 4.0},
        'b': {'A': 3.0, 'G': 3.0},
        'c': {'A': 2.0, 'G': 2.0},
        'd': {'A': 1.0, 'G': 1.0},
    }
    asn = KAISAAssignment(
        work, local_rank=0, world_size=8, grad_worker_fraction=0.25,
    )
    for layer in 'abcd':
        worker_group = asn.grad_worker_group(layer)
        receiver_group = asn.grad_receiver_group(layer)
        assert len(worker_group) == 2
        assert len(receiver_group) == 4
        assert asn.inv_worker(layer, 'A') in worker_group
        # exactly one worker intersects each receiver row
        assert len(worker_group & receiver_group) == 1
        assert asn.src_grad_worker(layer) in worker_group
        assert asn.src_grad_worker(layer) in receiver_group
        assert asn.is_grad_worker(layer) == (0 in worker_group)


def test_load_balance_even_layers() -> None:
    """Equal-cost layers spread evenly over the world (COMM-OPT)."""
    work = {f'l{i}': {'A': 1.0, 'G': 1.0} for i in range(8)}
    asn = KAISAAssignment(
        work, local_rank=0, world_size=8, grad_worker_fraction=1.0,
    )
    owners = [asn.inv_worker(f'l{i}', 'A') for i in range(8)]
    assert sorted(owners) == list(range(8))


def test_validation() -> None:
    work = {'l': {'A': 1.0, 'G': 1.0}}
    with pytest.raises(ValueError):
        KAISAAssignment(
            work, local_rank=0, world_size=4, grad_worker_fraction=2.0,
        )
    with pytest.raises(ValueError):
        KAISAAssignment(
            work, local_rank=5, world_size=4, grad_worker_fraction=1.0,
        )
    with pytest.raises(ValueError):
        KAISAAssignment(
            work, local_rank=0, world_size=8, grad_worker_fraction=0.4,
        )
