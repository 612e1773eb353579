"""Whole-row Pallas attention: VMEM-resident scores, zero HBM transient.

Why the XLA engines (ops/attention.py) sit at ~17 TFLOP/s: XLA cannot
fuse matmul -> softmax -> matmul, so every q-block's [block, N] f32
score rows round-trip HBM — ~10 GB of transient traffic per UNet ds=2
call (B=26, H=8, N=2048) against 112 G true FLOPs.  The engine is
HBM-bound at ~4% MXU utilization.

Why the classic flash-attention kernel ALSO lost here (measured 2.8x
worse, round 4): at head dim 32 the kv-block online-softmax design
pays 4x lane padding on every tiny [block_k, 32] tile AND a
(B*H x N/block_q x N/block_k) grid whose per-program overhead swamps
~microseconds of math.

This kernel splits the difference.  Each grid program owns one
(batch*head, q-block) pair and the ENTIRE key axis: the [block_q, N]
score row lives in VMEM from QK dot through softmax into the AV dot,
so the softmax is exact (true row max, no online rescaling, no
correction passes) and nothing but q/k/v/out ever touches HBM.  K/V
block indices are constant across the inner q-block grid dimension, so
Mosaic's pipeline fetches them once per (b*h).  All shapes this stack
runs (N in {512, 2048, 8192}, D in {32, 64, 256}) fit the row in VMEM
with block_q <= 1024.

Numerics match ops/attention.unrolled_attention: bf16 q/k/v, f32
scores + softmax (true row max), AV accumulated f32 and cast to the
value dtype (equivalence test-pinned; reference semantics
egregora_audio_super_resolution.py:319-344 via the torch modules).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Pallas custom calls report ZERO flops to XLA cost_analysis, which
# bench.py's MFU lines are built on.  flash_rows logs its true FLOPs
# (4*b*n*n*d per call) at trace time; bench resets the log before
# lowering a program and adds the sum back to the cost-analysis count.
FLOP_LOG: list = []


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0]                                  # [BQ, D]
    k = k_ref[0]                                  # [N, D]
    v = v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s * scale                                 # [BQ, N] f32, VMEM-resident
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    w = e / jnp.sum(e, axis=1, keepdims=True)
    o = jax.lax.dot_general(w.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def flash_rows(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
               block_q: int = 1024, interpret: bool = False) -> jnp.ndarray:
    """Exact attention ``[B, N, D] -> [B, N, D]`` (B = batch*heads).

    ``block_q`` bounds the VMEM score row (block_q x N f32 plus its exp
    and the bf16 weights: ~2.5x block_q*N*4 bytes); 1024 is ~20 MB at
    N=2048 and is clamped to 128 at N=8192 (VAE mid-block) to fit the
    16 MB scoped-VMEM stack limit (see the clamp below).

    Unjitted on purpose: the body is trace-time-cheap, callers are
    jitted programs, and the FLOP_LOG append must run on every outer
    trace (a jit cache here would swallow it).
    """
    b, n, d = q.shape
    FLOP_LOG.append(4 * b * n * n * d)
    if n >= 8192:
        # the f32 [block_q, N] score row + its exp + Mosaic's
        # double-buffered k/v blocks exceed the DEFAULT 16 MB
        # scoped-VMEM budget at this N (measured OOM on v5e even at
        # block_q=128) — vmem_limit_bytes below raises the budget, and
        # 512 rows (~17 MB score + 17 MB exp + 2x8.4 MB k/v) fit in 96
        block_q = min(block_q, 512)
    bq = min(block_q, n)
    nq = n
    if n % bq:
        # pad query rows up to a block multiple; the pad rows attend the
        # real keys (finite softmax, no NaN) and are sliced away below
        nq = -(-n // bq) * bq
        q = jnp.pad(q, ((0, 0), (0, nq - n), (0, 0)))
    grid = (b, nq // bq)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=float(d) ** -0.5),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, nq, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(q, k, v)
    return out[:, :n] if nq != n else out
