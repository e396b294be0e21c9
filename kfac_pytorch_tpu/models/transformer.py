"""Transformer language model (flax, K-FAC-ready).

Counterpart of the reference's example LM
(``examples/language/transformer.py:15-132`` of gpauloski/kfac-pytorch):
a decoder-style causal transformer whose attention and FFN projections are
plain ``nn.Dense`` modules so K-FAC registers them (the reference applies
K-FAC to exactly those Linears, ``examples/torch_language_model.py:
246-262``).

TPU notes: weights/activations support a ``dtype`` knob for bf16 compute;
attention uses a single fused qkv projection (one MXU matmul); shapes stay
static for jit. For tensor parallelism, shard the qkv/ffn kernels over a
``model`` mesh axis with ``nn.with_partitioning`` at construction time or
constrain via pjit -- the K-FAC capture path is sharding-agnostic.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    'TransformerLM',
    'TransformerBlock',
    'PipelineTransformerStage',
    'sinusoidal_positions',
]


def sinusoidal_positions(max_len: int, dim: int) -> np.ndarray:
    """Classic sin/cos positional encoding table (reference
    ``PositionalEncoding``, ``examples/language/transformer.py:15-45``)."""
    pos = np.arange(max_len)[:, None]
    div = np.exp(np.arange(0, dim, 2) * (-np.log(10000.0) / dim))
    table = np.zeros((max_len, dim), np.float32)
    table[:, 0::2] = np.sin(pos * div)
    table[:, 1::2] = np.cos(pos * div[: table[:, 1::2].shape[1]])
    return table


class MultiHeadSelfAttention(nn.Module):
    dim: int
    num_heads: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array) -> jax.Array:
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name='qkv')(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t: jax.Array) -> jax.Array:
            b, s, _ = t.shape
            return t.reshape(b, s, self.num_heads, head_dim)

        q, k, v = heads(q), heads(k), heads(v)
        scale = 1.0 / np.sqrt(head_dim)
        logits = jnp.einsum('bqhd,bkhd->bhqk', q, k) * scale
        logits = jnp.where(mask, logits, jnp.finfo(logits.dtype).min)
        probs = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum('bhqk,bkhd->bqhd', probs, v)
        out = out.reshape(x.shape)
        return nn.Dense(self.dim, dtype=self.dtype, name='proj')(out)


class TransformerBlock(nn.Module):
    dim: int
    num_heads: int
    ffn_dim: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array) -> jax.Array:
        y = nn.LayerNorm(dtype=self.dtype)(x)
        x = x + MultiHeadSelfAttention(
            self.dim, self.num_heads, dtype=self.dtype, name='attn',
        )(y, mask)
        y = nn.LayerNorm(dtype=self.dtype)(x)
        h = nn.Dense(self.ffn_dim, dtype=self.dtype, name='ffn_in')(y)
        h = nn.gelu(h)
        x = x + nn.Dense(self.dim, dtype=self.dtype, name='ffn_out')(h)
        return x


class PipelineTransformerStage(nn.Module):
    """One causal transformer block as a shape-preserving pipeline stage.

    The GPT-NeoX model family of the reference's pipelined preconditioner
    (``kfac/gpt_neox/preconditioner.py:40-515`` of gpauloski/kfac-pytorch),
    expressed as a user flax module for
    :class:`PipelineKFACPreconditioner`
    (``kfac_pytorch_tpu.parallel.pipe_precond``):
    fused-qkv and ffn_in are :class:`ColumnParallelDense` (kernels
    column-sharded over the ``model`` mesh axis, pre-activations
    gathered); attn_out and ffn_out are :class:`RowParallelDense`
    (kernels row-sharded, partials psum'd) -- the Megatron layout the
    reference registers as Column/RowParallelLinear. Outside a mapped
    context the same module computes identical full-width math, so the
    unpipelined equivalence is exact by construction.

    Input/output: ``[mb, T, dim]``.
    """

    dim: int
    num_heads: int
    ffn_dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from kfac_pytorch_tpu.layers.tp import ColumnParallelDense
        from kfac_pytorch_tpu.layers.tp import RowParallelDense

        mb, seq, dim = x.shape
        head_dim = self.dim // self.num_heads
        mask = jnp.tril(jnp.ones((seq, seq), bool))[None, None]

        y = nn.LayerNorm()(x)
        qkv = ColumnParallelDense(3 * self.dim, name='qkv')(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t: jax.Array) -> jax.Array:
            return t.reshape(mb, seq, self.num_heads, head_dim)

        q, k, v = heads(q), heads(k), heads(v)
        logits = jnp.einsum('bqhd,bkhd->bhqk', q, k) / np.sqrt(head_dim)
        logits = jnp.where(mask, logits, jnp.finfo(logits.dtype).min)
        probs = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum('bhqk,bkhd->bqhd', probs, v).reshape(x.shape)
        x = x + RowParallelDense(self.dim, name='attn_out')(out)

        y = nn.LayerNorm()(x)
        h = nn.gelu(ColumnParallelDense(self.ffn_dim, name='ffn_in')(y))
        x = x + RowParallelDense(self.dim, name='ffn_out')(h)
        return x


class TransformerLM(nn.Module):
    """Causal transformer LM over integer token sequences."""

    vocab_size: int
    dim: int = 256
    num_heads: int = 8
    num_layers: int = 4
    ffn_dim: int = 1024
    max_len: int = 1024
    dtype: Any = None

    @nn.compact
    def __call__(self, tokens: jax.Array) -> jax.Array:
        _, seq = tokens.shape
        x = nn.Embed(
            self.vocab_size, self.dim, dtype=self.dtype, name='embed',
        )(tokens)
        table = sinusoidal_positions(self.max_len, self.dim)
        x = x + jnp.asarray(table[:seq], x.dtype)
        mask = jnp.tril(jnp.ones((seq, seq), bool))[None, None]
        for i in range(self.num_layers):
            x = TransformerBlock(
                self.dim,
                self.num_heads,
                self.ffn_dim,
                dtype=self.dtype,
                name=f'block{i}',
            )(x, mask)
        x = nn.LayerNorm(dtype=self.dtype)(x)
        return nn.Dense(self.vocab_size, dtype=self.dtype, name='lm_head')(x)
