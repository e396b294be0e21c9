"""Covariance (Kronecker factor) math for K-FAC on TPU.

TPU-native re-design of the factor-extraction math in the reference
implementation (``kfac/layers/utils.py:8-83`` and
``kfac/layers/modules.py:123-237`` of gpauloski/kfac-pytorch). Everything is
a pure ``jax.numpy`` function with static shapes so XLA can tile the
contractions onto the MXU and fuse the elementwise scaling.

Numerical contract (matches the reference within test tolerances):

- ``get_cov(a) = (a^T a / N + (a^T a / N)^T) / 2`` with ``N = a.shape[0]``.
- Bias handling appends a column of ones (homogeneous coordinates) so the
  bias gradient shares the Kronecker factorization with the weight.
- Conv2d activations are expanded to im2col patches with feature ordering
  ``(kh, kw, in_channels)`` -- chosen to match the flattening order of flax
  ``nn.Conv`` kernels ``(kh, kw, in, out)`` so the factor indexing and the
  gradient-matrix indexing agree.
"""

from __future__ import annotations

from collections.abc import Sequence

import jax
import jax.numpy as jnp

__all__ = [
    'append_bias_ones',
    'get_cov',
    'get_cov_blocked',
    'reshape_data',
    'extract_conv2d_patches',
    'conv2d_out_shape',
]


def append_bias_ones(x: jax.Array) -> jax.Array:
    """Append a vector of ones to the last dimension of ``x``.

    E.g. maps shape ``[4, 6] -> [4, 7]`` where ``[:, -1]`` is all ones.
    Mirrors reference ``kfac/layers/utils.py:8-15``.
    """
    ones = jnp.ones((*x.shape[:-1], 1), dtype=x.dtype)
    return jnp.concatenate([x, ones], axis=-1)


def get_cov(
    a: jax.Array,
    b: jax.Array | None = None,
    scale: float | jax.Array | None = None,
) -> jax.Array:
    """Empirical second moment of a 2D array.

    ``cov = a^T @ (b or a) / scale`` with ``scale`` defaulting to the row
    count. When ``b`` is None the result is explicitly symmetrized,
    mirroring reference ``kfac/layers/utils.py:18-59``.

    The contraction runs on the MXU; ``preferred_element_type`` pins fp32
    accumulation so bf16 activations do not lose the running-average signal.
    """
    if a.ndim != 2:
        raise ValueError(
            f'Input tensor must have 2 dimensions. Got shape {a.shape}',
        )
    if b is not None and a.shape != b.shape:
        raise ValueError(
            'Input tensors must have same shape. Got '
            f'{a.shape} and {b.shape}.',
        )
    if scale is None:
        scale = a.shape[0]
    rhs = a if b is None else b
    # bf16 operands are exact in a single MXU pass (f32 accumulate), so
    # HIGHEST (which would emulate an f32 contraction) only applies to
    # f32+ inputs.
    precision = (
        jax.lax.Precision.HIGHEST
        if jnp.dtype(a.dtype).itemsize >= 4
        else jax.lax.Precision.DEFAULT
    )
    # Scale is applied to the small (d, d) output rather than the big
    # row-matrix operand (one less full pass over the data; same value).
    cov = (
        jax.lax.dot_general(
            a,
            rhs,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        / scale
    ).astype(jnp.promote_types(a.dtype, jnp.float32))
    if b is None:
        cov = (cov + cov.T) / 2.0
    return cov


def get_cov_blocked(
    a: jax.Array,
    scale: float | jax.Array | None = None,
    nb: int = 2,
) -> jax.Array:
    """``get_cov(a)`` computing only the lower block triangle of the Gram.

    XLA has no ``syrk`` primitive, so ``get_cov`` pays the full ``d^2``
    contraction for a symmetric output. This exact reformulation splits
    the feature axis into ``nb`` column chunks and runs one trailing
    contraction per chunk: ``dot_j = a[:, lo_j:]^T @ a[:, lo_j:hi_j]``,
    i.e. block column ``j`` from its diagonal block down. The strictly
    upper blocks come from mirroring -- ``(nb+1)/(2*nb)`` of the FLOPs
    (0.75x at nb=2), while the row matrix is re-read only ~``(nb+1)/2``
    times vs 2 for the plain Gram (docs/PERF_NOTES.md: K-chunked
    triangles only pay when the extra passes stay cheap, i.e. when the
    contraction is compute-bound: large ``d``).

    Same numerical contract as symmetric ``get_cov`` (f32 accumulation,
    scale applied to the small output, exactly symmetric result); the
    mirrored blocks pick one of the two rounding-equivalent values the
    full path averages.
    """
    if a.ndim != 2:
        raise ValueError(
            f'Input tensor must have 2 dimensions. Got shape {a.shape}',
        )
    d = a.shape[1]
    if nb < 2 or d < nb:
        return get_cov(a, scale=scale)
    if scale is None:
        scale = a.shape[0]
    precision = (
        jax.lax.Precision.HIGHEST
        if jnp.dtype(a.dtype).itemsize >= 4
        else jax.lax.Precision.DEFAULT
    )
    bounds = [round(i * d / nb) for i in range(nb + 1)]
    cols = []
    for j in range(nb):
        lo, hi = bounds[j], bounds[j + 1]
        blk = jax.lax.dot_general(
            a[:, lo:],
            a[:, lo:hi],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        cols.append(jnp.pad(blk, ((lo, 0), (0, 0))))
    low = jnp.concatenate(cols, axis=1) / scale
    low = low.astype(jnp.promote_types(a.dtype, jnp.float32))
    band = jnp.concatenate([
        jnp.full((bounds[j + 1] - bounds[j],), j, jnp.int32)
        for j in range(nb)
    ])
    strictly_lower = (band[:, None] > band[None, :]).astype(low.dtype)
    same_band = (band[:, None] == band[None, :]).astype(low.dtype)
    lower = low * strictly_lower
    diag = low * same_band
    return lower + lower.T + (diag + diag.T) / 2.0


def reshape_data(
    data_list: Sequence[jax.Array],
    batch_first: bool = True,
    collapse_dims: bool = False,
) -> jax.Array:
    """Concatenate per-microbatch arrays along the batch dim.

    Mirrors reference ``kfac/layers/utils.py:62-83``. With
    ``collapse_dims=True`` the result is guaranteed 2D (all leading dims
    folded together), which is how sequence/spatial dims get folded into the
    covariance contraction.
    """
    d = jnp.concatenate(list(data_list), axis=int(not batch_first))
    if collapse_dims and d.ndim > 2:
        d = d.reshape(-1, d.shape[-1])
    return d


def _normalize_padding(
    padding: str | int | Sequence[int] | Sequence[tuple[int, int]],
) -> str | tuple[tuple[int, int], tuple[int, int]]:
    """Normalize a flax-style padding spec to explicit (lo, hi) pairs."""
    if isinstance(padding, str):
        return padding.upper()
    if isinstance(padding, int):
        return ((padding, padding), (padding, padding))
    pads = []
    for p in padding:
        if isinstance(p, int):
            pads.append((p, p))
        else:
            pads.append((int(p[0]), int(p[1])))
    if len(pads) == 1:
        pads = pads * 2
    return (pads[0], pads[1])


def conv2d_out_shape(
    in_shape: tuple[int, int],
    kernel_size: tuple[int, int],
    strides: tuple[int, int],
    padding: str | int | Sequence[int] | Sequence[tuple[int, int]],
) -> tuple[int, int]:
    """Spatial output shape of a 2D convolution (NHWC)."""
    pad = _normalize_padding(padding)
    h, w = in_shape
    kh, kw = kernel_size
    sh, sw = strides
    if pad == 'SAME':
        return (-(-h // sh), -(-w // sw))
    if pad == 'VALID':
        return ((h - kh) // sh + 1, (w - kw) // sw + 1)
    (ph0, ph1), (pw0, pw1) = pad
    return (
        (h + ph0 + ph1 - kh) // sh + 1,
        (w + pw0 + pw1 - kw) // sw + 1,
    )


def extract_conv2d_patches(
    x: jax.Array,
    kernel_size: tuple[int, int],
    strides: tuple[int, int] = (1, 1),
    padding: str | int | Sequence[int] | Sequence[tuple[int, int]] = 'VALID',
) -> jax.Array:
    """im2col patch extraction for NHWC inputs.

    Equivalent role to the reference's ``unfold``-based ``_extract_patches``
    (``kfac/layers/modules.py:210-237``) but laid out for TPU: the kernel
    window is a *static* double loop of strided slices (kh*kw slices),
    which XLA fuses into a single gather-free copy; no dynamic shapes.

    Args:
        x: input feature maps ``(batch, h, w, in_channels)`` (NHWC).
        kernel_size: ``(kh, kw)``.
        strides: ``(sh, sw)``.
        padding: 'SAME', 'VALID', int, or explicit per-dim (lo, hi) pairs.

    Returns:
        Array of shape ``(batch, out_h, out_w, kh * kw * in_channels)`` with
        feature ordering ``(kh, kw, c)`` to match flax kernel flattening.
    """
    if x.ndim != 4:
        raise ValueError(f'Expected NHWC input, got shape {x.shape}')
    n, h, w, c = x.shape
    kh, kw = kernel_size
    sh, sw = strides
    pad = _normalize_padding(padding)
    if pad == 'SAME':
        out_h, out_w = conv2d_out_shape((h, w), kernel_size, strides, 'SAME')
        pad_h = max((out_h - 1) * sh + kh - h, 0)
        pad_w = max((out_w - 1) * sw + kw - w, 0)
        pad = (
            (pad_h // 2, pad_h - pad_h // 2),
            (pad_w // 2, pad_w - pad_w // 2),
        )
    elif pad == 'VALID':
        pad = ((0, 0), (0, 0))
    (ph0, ph1), (pw0, pw1) = pad
    if ph0 or ph1 or pw0 or pw1:
        x = jnp.pad(x, ((0, 0), (ph0, ph1), (pw0, pw1), (0, 0)))
    hp = h + ph0 + ph1
    wp = w + pw0 + pw1
    out_h = (hp - kh) // sh + 1
    out_w = (wp - kw) // sw + 1

    slices = []
    for i in range(kh):
        for j in range(kw):
            s = jax.lax.slice(
                x,
                (0, i, j, 0),
                (n, i + (out_h - 1) * sh + 1, j + (out_w - 1) * sw + 1, c),
                (1, sh, sw, 1),
            )
            slices.append(s)
    # (n, oh, ow, kh*kw, c) -> features ordered (kh, kw, c)
    patches = jnp.stack(slices, axis=3)
    return patches.reshape(n, out_h, out_w, kh * kw * c)


def _pad_for_conv(
    x: jax.Array,
    kernel_size: tuple[int, int],
    strides: tuple[int, int],
    padding: str | int | Sequence[int] | Sequence[tuple[int, int]],
) -> tuple[jax.Array, int, int]:
    """Explicitly zero-pad NHWC ``x``; return (padded, out_h, out_w)."""
    n, h, w, c = x.shape
    kh, kw = kernel_size
    sh, sw = strides
    pad = _normalize_padding(padding)
    if pad == 'SAME':
        out_h, out_w = conv2d_out_shape((h, w), kernel_size, strides, 'SAME')
        pad_h = max((out_h - 1) * sh + kh - h, 0)
        pad_w = max((out_w - 1) * sw + kw - w, 0)
        pad = (
            (pad_h // 2, pad_h - pad_h // 2),
            (pad_w // 2, pad_w - pad_w // 2),
        )
    elif pad == 'VALID':
        pad = ((0, 0), (0, 0))
    (ph0, ph1), (pw0, pw1) = pad
    if ph0 or ph1 or pw0 or pw1:
        x = jnp.pad(x, ((0, 0), (ph0, ph1), (pw0, pw1), (0, 0)))
    hp, wp = x.shape[1], x.shape[2]
    out_h = (hp - kh) // sh + 1
    out_w = (wp - kw) // sw + 1
    return x, out_h, out_w


def conv2d_a_factor_slices(
    x: jax.Array,
    kernel_size: tuple[int, int],
    strides: tuple[int, int] = (1, 1),
    padding: str | int | Sequence[int] | Sequence[tuple[int, int]] = 'SAME',
    has_bias: bool = True,
    pad_to: int | None = None,
) -> jax.Array:
    """Conv2d A factor via a concat-of-strided-slices patch slab.

    Same math as the ``conv_general_dilated_patches`` path of
    ``Conv2dHelper.get_a_factor`` (reference
    ``kfac/layers/modules.py:170-237`` of gpauloski/kfac-pytorch), but the
    im2col slab is built as ``kh*kw`` strided slices concatenated on the
    feature axis. The layout matters: measured on-chip at the ResNet-50
    stem geometry (224x224x3, 7x7/s2, b128), XLA fuses concat->Gram into
    a ~10.4 ms program vs ~27 ms for the native patches op and ~54 ms
    for a stack-on-new-axis slab -- the fusion choice, not the copy
    itself, dominates. Features come out in ``(kh, kw, c)`` order
    directly (no factor permutation needed).

    Wins when the channel count is small (the patches op's (c, kh, kw)
    grouping starves the lanes); for c >= 16 prefer ``convgrad``.

    Channels are padded to 8 when ``c < 8``: a 3-channel piece writes
    6-byte interleaved runs into the slab (measured ~10.4 ms for the
    ResNet-50 stem at b128), an 8-channel piece writes 16-byte units
    (~5.2 ms) -- the 1.8x extra Gram FLOPs run at full MXU rate and are
    cheaper than the scatter. The pad channel carries ONES when the
    layer has a bias: every ones-column of the im2col matrix is
    identical, so the bias cross row and corner fall out of the same
    Gram (exactly the ``[P, 1]`` homogeneous formulation); the zero pad
    channels are sliced away. The pad width is HBM-gated: if the padded
    slab would exceed ~1.5 GB (the cp=8 stem slab at batch 256 is
    2.5 GB and OOMs a 16 GB chip), the pad drops to 4 channels (8-byte
    write units -- still 1.3x better than 6-byte, half the slab).
    """
    if x.ndim != 4:
        raise ValueError(f'Expected NHWC input, got shape {x.shape}')
    n, _, _, c = x.shape
    kh, kw = kernel_size
    sh, sw = strides

    xp, out_h, out_w = _pad_for_conv(x, kernel_size, strides, padding)
    # Channel padding happens AFTER the spatial halo padding so the
    # ones channel is all-ones in the halo too (zero-padded halo ones
    # would make the ones-columns position-dependent and break the
    # homogeneous-bias identity).
    if pad_to is not None:
        cp = max(pad_to, c)
    else:
        cp = 8 if c < 8 else c
        slab_bytes = (
            n * out_h * out_w * kh * kw * cp
            * jnp.dtype(x.dtype).itemsize
        )
        if c < 4 and slab_bytes > 1.5e9:
            cp = 4
    if cp != c:
        pad_val = jnp.ones if has_bias else jnp.zeros
        extra = [
            pad_val(xp.shape[:-1] + (1,), xp.dtype),
            jnp.zeros(xp.shape[:-1] + (cp - c - 1,), xp.dtype),
        ]
        xp = jnp.concatenate(
            [xp] + [e for e in extra if e.shape[-1]], axis=-1,
        )
    elif has_bias:
        # No pad slot available: append the ones channel explicitly.
        xp = jnp.concatenate(
            [xp, jnp.ones(xp.shape[:-1] + (1,), xp.dtype)], axis=-1,
        )
        cp = c + 1
    cols = [
        jax.lax.slice(
            xp,
            (0, i, j, 0),
            (n, i + (out_h - 1) * sh + 1, j + (out_w - 1) * sw + 1, cp),
            (1, sh, sw, 1),
        )
        for i in range(kh)
        for j in range(kw)
    ]
    p = jnp.concatenate(cols, axis=-1).reshape(-1, kh * kw * cp)
    spatial_size = out_h * out_w
    covp = get_cov(p, scale=float(p.shape[0]) * spatial_size**2)
    keep = [k * cp + ci for k in range(kh * kw) for ci in range(c)]
    if has_bias:
        keep.append(c)  # any ones-column; they are all identical
    if len(keep) == covp.shape[0]:
        return covp
    idx = jnp.asarray(keep)
    return covp[idx][:, idx]


def conv2d_a_factor_convgrad(
    x: jax.Array,
    kernel_size: tuple[int, int],
    strides: tuple[int, int] = (1, 1),
    padding: str | int | Sequence[int] | Sequence[tuple[int, int]] = 'SAME',
    has_bias: bool = True,
) -> jax.Array:
    """Conv2d A factor as ``kh*kw`` conv weight-gradients -- no patch slab.

    Each patch column ``(i1, j1, :)`` of the im2col matrix ``P`` is a
    strided slice ``q1`` of the (padded) activation, and the block column
    ``A[:, (i1, j1, :)] = P^T q1`` is *exactly* a convolution
    weight-gradient ``dW = conv-grad(x, q1)`` -- the same contraction XLA
    already runs at MXU speed for the layer's backward pass. Lowering it
    as ``lax.conv_general_dilated`` with batch as the contracted feature
    dimension (``dimension_numbers=('CHWN', 'IHWO', 'NHWC')``, kernel
    dilation = the conv's stride) gives the factor without ever
    materializing ``P``: the patch slab's ``kh*kw``-fold HBM traffic
    (the capture-step bottleneck at ImageNet shapes, docs/PERF_NOTES.md)
    is replaced by ``kh*kw`` re-reads of the activation itself.

    Exact for any stride/padding; same semantics as the patches path of
    ``Conv2dHelper.get_a_factor`` (reference
    ``kfac/layers/modules.py:170-237`` of gpauloski/kfac-pytorch):
    ``cov = P^T P / (rows * spatial^2)``, symmetrized, feature order
    ``(kh, kw, c)``, homogeneous bias row/col appended.

    Symmetry is exploited at the conv level: for block column ``(i1,
    j1)`` only output rows ``i2 >= i1`` are computed (a rectangular
    output window -- slice the lhs to start at row ``i1``); the strictly
    upper block rows come from transposing the computed mirror blocks.
    ``sum_i (kh-i)/kh^2 = (kh+1)/(2 kh)`` of the full contraction FLOPs
    (2/3 at kh=3), exactness preserved.
    """
    if x.ndim != 4:
        raise ValueError(f'Expected NHWC input, got shape {x.shape}')
    n, _, _, c = x.shape
    kh, kw = kernel_size
    sh, sw = strides
    xp, out_h, out_w = _pad_for_conv(x, kernel_size, strides, padding)

    spatial = out_h * out_w
    rows_total = n * spatial
    inv_scale = 1.0 / (rows_total * float(spatial) ** 2)
    precision = (
        jax.lax.Precision.HIGHEST
        if jnp.dtype(x.dtype).itemsize >= 4
        else jax.lax.Precision.DEFAULT
    )

    cols = []
    for i1 in range(kh):
        for j1 in range(kw):
            q1 = jax.lax.slice(
                xp,
                (0, i1, j1, 0),
                (n, i1 + (out_h - 1) * sh + 1, j1 + (out_w - 1) * sw + 1, c),
                (1, sh, sw, 1),
            )
            # out[c2, r, j2, c1] = sum_{n,y,x} xp[n, (i1+r) + y*sh,
            # j2 + x*sw, c2] * q1[n, y, x, c1] -- the conv weight-
            # gradient with window (out_h, out_w) dilated by the stride.
            # Negative lhs padding trims the first i1 rows IN the conv
            # (so only block rows i2 = i1 + r >= i1 are formed) without
            # materializing a sliced copy of the activation -- the
            # slice-copy variant OOMed ResNet-50 b256 on 16 GB HBM.
            blk = jax.lax.conv_general_dilated(
                xp,
                q1,
                window_strides=(1, 1),
                padding=((-i1, 0), (0, 0)),
                rhs_dilation=(sh, sw),
                dimension_numbers=('CHWN', 'IHWO', 'NHWC'),
                preferred_element_type=jnp.float32,
                precision=precision,
            )
            # (c2, kh - i1, kw, c1) -> ((i2, j2, c2), c1) block column,
            # zero-padded on top for the uncomputed i2 < i1 block rows.
            assert blk.shape == (c, kh - i1, kw, c), blk.shape
            col = blk.transpose(1, 2, 0, 3).reshape((kh - i1) * kw * c, c)
            cols.append(jnp.pad(col, ((i1 * kw * c, 0), (0, 0))))
    low = jnp.concatenate(cols, axis=1)
    # The i2 == i1 block band is present in both `low` and `low.T`
    # (within-band blocks are computed for ALL (j1, j2) pairs); one copy
    # is masked off before mirroring. Everything here is O(d0^2)
    # elementwise on the small factor, not the big contraction.
    band = jnp.repeat(jnp.arange(kh), kw * c)
    strictly_lower = (band[:, None] > band[None, :]).astype(low.dtype)
    same_band = (band[:, None] == band[None, :]).astype(low.dtype)
    cov0 = (
        low * strictly_lower
        + low.T * strictly_lower.T
        + low * same_band
    ) * inv_scale
    cov0 = (cov0 + cov0.T) / 2.0

    if not has_bias:
        return cov0
    sums = []
    for i in range(kh):
        for j in range(kw):
            s = jax.lax.slice(
                xp,
                (0, i, j, 0),
                (n, i + (out_h - 1) * sh + 1, j + (out_w - 1) * sw + 1, c),
                (1, sh, sw, 1),
            )
            sums.append(jnp.sum(s, axis=(0, 1, 2), dtype=jnp.float32))
    cross = jnp.concatenate(sums) * inv_scale
    corner = jnp.asarray(1.0 / float(spatial) ** 2, jnp.float32)
    top = jnp.concatenate([cov0, cross[:, None]], axis=1)
    bottom = jnp.concatenate([cross, corner[None]])[None, :]
    return jnp.concatenate([top, bottom], axis=0)


def conv2d_a_factor_rowgram(
    x: jax.Array,
    kernel_size: tuple[int, int],
    strides: tuple[int, int] = (1, 1),
    padding: str | int | Sequence[int] | Sequence[tuple[int, int]] = 'SAME',
    has_bias: bool = True,
) -> jax.Array:
    """Conv2d A factor via row-pair Grams -- no patch materialization.

    The im2col covariance ``A = P^T P`` (reference
    ``kfac/layers/modules.py:170-237`` of gpauloski/kfac-pytorch) is the
    capture-step bottleneck when lowered naively: the patch matrix is
    ``kh*kw`` times the activation bytes of HBM traffic. This exact
    reformulation never builds ``P``. Merge W and C into one axis
    (``x2[n, u, w*C + c]`` -- a free reshape of NHWC) and compute one
    Gram per vertical-offset pair::

        M_{i1,i2}[l, m] = sum_{n, y} x2[n, sh*y + i1, l] * x2[n, sh*y + i2, m]

    (``kh*(kh+1)/2`` Grams; the strided row slices fuse into the dot, so
    HBM reads the activation once per pair). Every A block is then a
    band sum of an M::

        A[(i1,j1,c1), (i2,j2,c2)] = sum_x M_{i1,i2}[(sw*x+j1)*C+c1, (sw*x+j2)*C+c2]

    extracted as strided-slice diagonals of the small ``(WpC, WpC)``
    matrices. Exact for any stride/padding (no Toeplitz boundary
    approximation), and the big contractions run at MXU speed
    (measured ~150 TF/s bf16) instead of being bound by patch traffic.

    Returns ``(d, d)`` float32 factor with feature order ``(kh, kw, c)``
    and semantics identical to the patches path: ``cov = Q^T Q / R``,
    ``Q = [P, 1] / spatial``, ``R = n*oh*ow``, symmetrized.
    """
    if x.ndim != 4:
        raise ValueError(f'Expected NHWC input, got shape {x.shape}')
    n, h, w, c = x.shape
    kh, kw = kernel_size
    sh, sw = strides
    pad = _normalize_padding(padding)
    if pad == 'SAME':
        out_h, out_w = conv2d_out_shape((h, w), kernel_size, strides, 'SAME')
        pad_h = max((out_h - 1) * sh + kh - h, 0)
        pad_w = max((out_w - 1) * sw + kw - w, 0)
        pad = (
            (pad_h // 2, pad_h - pad_h // 2),
            (pad_w // 2, pad_w - pad_w // 2),
        )
    elif pad == 'VALID':
        pad = ((0, 0), (0, 0))
    (ph0, ph1), (pw0, pw1) = pad
    if ph0 or ph1 or pw0 or pw1:
        x = jnp.pad(x, ((0, 0), (ph0, ph1), (pw0, pw1), (0, 0)))
    hp, wp = x.shape[1], x.shape[2]
    out_h = (hp - kh) // sh + 1
    out_w = (wp - kw) // sw + 1

    d0 = kh * kw * c
    spatial = out_h * out_w
    rows_total = n * spatial
    inv_scale = 1.0 / (rows_total * float(spatial) ** 2)
    precision = (
        jax.lax.Precision.HIGHEST
        if jnp.dtype(x.dtype).itemsize >= 4
        else jax.lax.Precision.DEFAULT
    )

    x2 = x.reshape(n, hp, wp * c)

    def row_slab(i: int) -> jax.Array:
        return jax.lax.slice(
            x2, (0, i, 0), (n, i + (out_h - 1) * sh + 1, wp * c), (1, sh, 1),
        )

    slabs = [row_slab(i) for i in range(kh)]
    grams: dict[tuple[int, int], jax.Array] = {}
    for i1 in range(kh):
        for i2 in range(i1, kh):
            grams[(i1, i2)] = jax.lax.dot_general(
                slabs[i1],
                slabs[i2],
                dimension_numbers=(((0, 1), (0, 1)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision,
            )

    def band_block(i1: int, j1: int, i2: int, j2: int) -> jax.Array:
        if i1 <= i2:
            m = grams[(i1, i2)]
        else:
            return band_block(i2, j2, i1, j1).T
        m4 = m.reshape(wp, c, wp, c)
        sub = jax.lax.slice(
            m4,
            (j1, 0, j2, 0),
            (j1 + (out_w - 1) * sw + 1, c, j2 + (out_w - 1) * sw + 1, c),
            (sw, 1, sw, 1),
        )
        # sum_x sub[x, :, x, :]
        return jnp.sum(jnp.diagonal(sub, axis1=0, axis2=2), axis=-1)

    rows = []
    for i1 in range(kh):
        for j1 in range(kw):
            row = [
                band_block(i1, j1, i2, j2)
                for i2 in range(kh)
                for j2 in range(kw)
            ]
            rows.append(jnp.concatenate(row, axis=1))
    cov0 = jnp.concatenate(rows, axis=0) * inv_scale
    cov0 = (cov0 + cov0.T) / 2.0

    if not has_bias:
        return cov0
    # Homogeneous bias row/col: colsum(P) over the strided windows.
    sums = []
    for i in range(kh):
        for j in range(kw):
            s = jax.lax.slice(
                x,
                (0, i, j, 0),
                (n, i + (out_h - 1) * sh + 1, j + (out_w - 1) * sw + 1, c),
                (1, sh, sw, 1),
            )
            sums.append(jnp.sum(s, axis=(0, 1, 2), dtype=jnp.float32))
    cross = jnp.concatenate(sums) * inv_scale
    corner = jnp.asarray(
        1.0 / float(spatial) ** 2, jnp.float32,
    )
    top = jnp.concatenate([cov0, cross[:, None]], axis=1)
    bottom = jnp.concatenate([cross, corner[None]])[None, :]
    return jnp.concatenate([top, bottom], axis=0)
