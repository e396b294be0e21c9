"""Batched fixed-sweep eigensolver: two-sided (classical) Jacobi, TPU-native.

Why not ``jnp.linalg.eigh``: XLA's TPU eigh (QDWH) is iteration-bound and
data-dependent -- on realistic K-FAC covariance factors (rank-deficient,
condition number >= 1e6) it measures 30-100 ms per call *at any size*
(even ``[6, 64, 64]``), dominating the whole preconditioner refresh
(docs/PERF_NOTES.md). The reference implementation relies on LAPACK/
cuSOLVER's ``torch.linalg.eigh`` (``kfac/layers/eigen.py:295-348`` of
gpauloski/kfac-pytorch); this module is its TPU-native replacement.

Algorithm: **two-sided (classical) Jacobi** with an odd-even transposition
tournament. Each round rotates adjacent column/row pairs of ``B`` (the
matrix being diagonalized) to annihilate their off-diagonal entry, and
applies the same column rotations to the eigenvector accumulator ``V``.
Properties that make it the right fit here:

- **Fixed work, no convergence loop**: a static number of sweeps compiles
  to straight-line vector code -- no data-dependent ``while``.
- **Orthogonality by construction**: ``V`` is a product of exact plane
  rotations applied to an orthonormal start, so it stays orthonormal to
  f32 rounding regardless of the conditioning of ``A``. (A one-sided
  Hestenes variant was tried first and rejected: normalizing the
  near-null columns of ``A @ V0`` destroys orthogonality at cond >= 1e6.)
- **Warm start**: passing the previous eigenbasis as ``v0`` makes
  ``B = v0^T A v0`` nearly diagonal, so 2-4 sweeps suffice at every
  refresh after the first (K-FAC factors are slow-moving EMAs). The
  engine carries ``v0`` for free: it is exactly the ``qa``/``qg``
  already in its state.
- **Batched and layout-friendly**: all rotations of a round apply as two
  elementwise FMAs over the whole ``[B, d, d]`` stack; the pairing walks
  an odd-even transposition tournament (columns/rows physically swap, so
  the fixed adjacent pairing meets every pair once per d rounds) -- no
  gathers, no index bookkeeping, just rolls and masks.

Role in the engine: production-selectable via
``KFACPreconditioner(eigensolver='jacobi', jacobi_sweeps=N)`` -- warm-
started from the engine's carried eigenbasis, with eigenvalues clamped
>= 0 like the exact path. The *default* in-loop refresh on TPU is
``ops/refine.py`` (warm-started matmul-only refinement): Jacobi's O(d)
rounds per sweep are VPU-elementwise work and cost more inside the
training loop, but its exact plane rotations keep the basis orthonormal
by construction at any conditioning -- the conservative choice when
refine's residual contract is in doubt for a new spectrum regime.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ['jacobi_eigh', 'jacobi_rotation', 'paired_round']

_TINY = 1e-30


def jacobi_rotation(
    diag_self: jax.Array,
    diag_partner: jax.Array,
    offdiag: jax.Array,
    tie_sign: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Per-slot classical Jacobi rotation (cs, sn).

    For the pair ``(p, q)`` the classical rotation annihilating
    ``B[p, q]`` has ``cot(2 theta) = (B[q,q] - B[p,p]) / (2 B[p,q])``.
    Evaluated per slot with ``diag_self = B[j,j]``,
    ``diag_partner = B[partner,partner]``, ``offdiag = B[j,partner]``,
    the two members of a pair get the same ``cs`` and opposite-sign
    ``sn`` automatically, which is exactly what the uniform
    rotate-and-swap update needs. ``tie_sign`` (+1 for the even/left
    member, -1 for the odd/right member) keeps the 45-degree case
    (``diag_self == diag_partner``) consistent across the pair.
    """
    two_c = 2.0 * offdiag
    denom = jnp.where(jnp.abs(two_c) < _TINY, _TINY, two_c)
    tau = (diag_partner - diag_self) / denom
    sgn = jnp.where(tau > 0, 1.0, jnp.where(tau < 0, -1.0, tie_sign))
    t = sgn / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
    # Converged pair (offdiag negligible vs the diagonal): identity.
    converged = jnp.abs(offdiag) <= 1e-12 * (
        jnp.abs(diag_self) + jnp.abs(diag_partner)
    )
    t = jnp.where(converged, 0.0, t)
    # Exact sqrt+div (not the approximate rsqrt): cs^2 + sn^2 must hold
    # to f32 rounding or V drifts from orthogonality over thousands of
    # rounds.
    cs = 1.0 / jnp.sqrt(1.0 + t * t)
    sn = t * cs
    return cs, sn


def _partner_cols(x: jax.Array, even: jax.Array) -> jax.Array:
    """Partner columns under adjacent (2i, 2i+1) pairing; axis -1."""
    fwd = jnp.roll(x, -1, axis=-1)
    bwd = jnp.roll(x, 1, axis=-1)
    return jnp.where(even, fwd, bwd)


def paired_round(
    b: jax.Array,
    v: jax.Array,
    odd_offset: bool,
) -> tuple[jax.Array, jax.Array]:
    """One odd-even transposition round of two-sided Jacobi.

    Rotates-and-swaps row/column pairs ``(2i, 2i+1)`` of ``b`` (and the
    matching columns of ``v``) when ``odd_offset`` is False; the
    shifted pairing ``(2i+1, 2i+2)`` when True. ``b``/``v`` are
    ``[..., d, d]``.
    """
    d = b.shape[-1]
    if odd_offset:
        b = jnp.roll(b, -1, axis=-1)
        b = jnp.roll(b, -1, axis=-2)
        v = jnp.roll(v, -1, axis=-1)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, d), 1)
    even = (col % 2) == 0
    if d % 2 == 1:
        # Odd dimension: the last slot has no partner this round.
        idle = col == d - 1
    elif odd_offset:
        # After the roll, (d-2, d-1) is the wraparound pair; keeping it
        # idle realizes the brick-pattern transposition tournament.
        idle = (col == d - 2) | (col == d - 1)
    else:
        idle = jnp.zeros((1, d), bool)

    diag = jnp.diagonal(b, axis1=-2, axis2=-1)          # [..., d]
    diag_p = _partner_cols(diag, even)
    # offdiag[j] = b[j, partner(j)]. f32 rounding lets b drift slightly
    # asymmetric, and if the two members of a pair read opposite sides
    # (b[p,q] vs b[q,p]) their rotation angles disagree -- the applied
    # transform stops being orthogonal. Average the two sides so the
    # pair shares one exact gamma (then sn_q == -sn_p bit-exactly).
    off = jnp.diagonal(_partner_cols(b, even), axis1=-2, axis2=-1)
    off = 0.5 * (off + _partner_cols(off, even))
    tie = jnp.where(even, 1.0, -1.0)
    cs, sn = jacobi_rotation(diag, diag_p, off, tie)
    # Idle slots pass through: sn=1, cs=0 makes the uniform update below
    # return `self` untouched. (A *converged* pair instead keeps cs=1,
    # sn=0 -- identity rotation plus the physical swap the tournament
    # schedule requires.)
    cs = jnp.where(idle, 0.0, cs)
    sn = jnp.where(idle, 1.0, sn)

    # Rotate-and-swap, uniform across the pair because sn carries the
    # pair-consistent sign: slot p <- sn*self + cs*partner picks up the
    # rotated partner value, realizing both the rotation and the swap.
    cs_c = cs[..., None, :]
    sn_c = sn[..., None, :]
    b = sn_c * b + cs_c * _partner_cols(b, even)          # columns
    v = sn_c * v + cs_c * _partner_cols(v, even)
    cs_r = jnp.swapaxes(cs_c, -1, -2)
    sn_r = jnp.swapaxes(sn_c, -1, -2)
    even_r = jnp.swapaxes(even[..., None, :], -1, -2)
    b_rows = jnp.where(
        even_r, jnp.roll(b, -1, axis=-2), jnp.roll(b, 1, axis=-2)
    )
    b = sn_r * b + cs_r * b_rows                           # rows

    if odd_offset:
        b = jnp.roll(b, 1, axis=-1)
        b = jnp.roll(b, 1, axis=-2)
        v = jnp.roll(v, 1, axis=-1)
    return b, v


@functools.partial(jax.jit, static_argnames=('sweeps',))
def jacobi_eigh(
    a: jax.Array,
    v0: jax.Array | None = None,
    sweeps: int = 6,
) -> tuple[jax.Array, jax.Array]:
    """Eigendecomposition of a batch of symmetric matrices.

    Args:
        a: ``[B, d, d]`` (or ``[d, d]``) symmetric batch, any float
            dtype (computed in f32).
        v0: optional warm-start orthonormal basis (e.g. the previous
            refresh's eigenvectors). Identity when None (cold start).
        sweeps: fixed sweep count; one sweep = d transposition rounds
            covering every pair once. 2-4 suffice warm; 8-15 for a cold
            start on mature (ill-conditioned) factors.

    Returns:
        ``(v, w)``: eigenvectors (columns) and eigenvalues, unsorted
        (K-FAC is basis-order agnostic). ``a ~= v @ diag(w) @ v.T``,
        ``v`` orthonormal to f32 rounding regardless of cond(a).
    """
    squeeze = a.ndim == 2
    if squeeze:
        a = a[None]
    _, d, _ = a.shape
    a = a.astype(jnp.float32)
    a = (a + jnp.swapaxes(a, -1, -2)) * 0.5
    if v0 is None:
        b = a
        v = jnp.broadcast_to(jnp.eye(d, dtype=a.dtype), a.shape)
    else:
        v = v0.astype(jnp.float32)
        b = jnp.einsum(
            'bji,bjk,bkl->bil',
            v,
            a,
            v,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        b = (b + jnp.swapaxes(b, -1, -2)) * 0.5

    def round_body(r, carry):
        bb, vv = carry
        return jax.lax.cond(
            r % 2 == 0,
            lambda c: paired_round(c[0], c[1], False),
            lambda c: paired_round(c[0], c[1], True),
            (bb, vv),
        )

    n_rounds = sweeps * d
    b, v = jax.lax.fori_loop(0, n_rounds, round_body, (b, v))

    w = jnp.diagonal(b, axis1=-2, axis2=-1)
    if squeeze:
        return v[0], w[0]
    return v, w
