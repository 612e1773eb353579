"""Online-softmax Pallas attention (k-blocked) — schedule candidate for
the large-N shapes where the whole-row kernel (attn_pallas.flash_rows)
underruns the MXU.

flash_rows keeps the full [block_q, N] f32 score row in VMEM; at the
VAE mid-block (N=8192, D=256) that forces block_q <= 512 under the
raised 96 MB budget and measures ~15% MFU — the serialized
MXU -> VPU-softmax -> MXU phases on 17 MB rows leave both units idle
half the time.  This kernel is the classic streaming design instead:
the key axis is tiled (block_k), softmax runs ONLINE with running
(row-max m, normalizer l, f32 accumulator) in VMEM scratch, so tiles
are small ([block_q, block_k] scores, [block_k, D] k/v), Mosaic can
double-buffer k/v fetches against compute, and VMEM pressure is
independent of N.

Numerics: bf16 q/k/v, f32 scores/softmax/accumulator, exact row max
within each processed prefix (the final result equals the two-pass
softmax up to f32 rounding; equivalence is test-pinned against
unrolled_attention).  Reference semantics as attn_pallas.flash_rows
(egregora_audio_super_resolution.py:319-344 via the torch modules).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attn_pallas import FLOP_LOG


def _kernel(q_ref, k_ref, v_ref, o_ref, acc, m_s, l_s, *, scale: float,
            nk: int):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)
        m_s[...] = jnp.full_like(m_s, -1e30)
        l_s[...] = jnp.zeros_like(l_s)

    q = q_ref[0]                                   # [BQ, D] bf16
    k = k_ref[0]                                   # [BK, D] bf16
    v = v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    m_prev = m_s[...]                              # [BQ, 1] f32
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    corr = jnp.exp(m_prev - m_new)                 # [BQ, 1]
    e = jnp.exp(s - m_new)                         # [BQ, BK] f32
    l_s[...] = l_s[...] * corr + jnp.sum(e, axis=1, keepdims=True)
    m_s[...] = m_new
    pv = jax.lax.dot_general(e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    acc[...] = acc[...] * corr + pv

    @pl.when(j == nk - 1)
    def _done():
        o_ref[0] = (acc[...] / l_s[...]).astype(o_ref.dtype)


def flash_online(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                 block_q: int = 512, block_k: int = 1024,
                 interpret: bool = False) -> jnp.ndarray:
    """Exact attention ``[B, N, D] -> [B, N, D]`` (B = batch*heads)."""
    b, n, d = q.shape
    FLOP_LOG.append(4 * b * n * n * d)
    bq = min(block_q, n)
    bk = min(block_k, n)
    nq = n
    if n % bq:
        nq = -(-n // bq) * bq
        q = jnp.pad(q, ((0, 0), (0, nq - n), (0, 0)))
    if n % bk:
        raise ValueError(f"N={n} not a multiple of block_k={bk}")
    nk = n // bk
    grid = (b, nq // bq, nk)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=float(d) ** -0.5, nk=nk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j, kk: (i, j, 0)),
            pl.BlockSpec((1, bk, d), lambda i, j, kk: (i, kk, 0)),
            pl.BlockSpec((1, bk, d), lambda i, j, kk: (i, kk, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda i, j, kk: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, nq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, d), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(q, k, v)
    return out[:, :n] if nq != n else out
