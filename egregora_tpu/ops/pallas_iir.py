"""First-order IIR scan as a Pallas TPU kernel.

The reference's hottest interpreted loop is the per-sample K-weighting
IIR (``egregora_audio_eval_pack.py:140-147``).  ops/iir.py replaces it
with ``lax.associative_scan`` — O(log N) full passes over HBM (~22
passes for a 4M-sample signal).  This kernel does it in ONE pass:

* the TPU executes a Pallas grid sequentially on a core, so the IIR
  carry lives in SMEM scratch across grid steps (streaming kernel);
* within a block the recurrence is parallelized across 128 lanes: lane
  ``l`` owns the contiguous sub-segment ``[l*ROWS, (l+1)*ROWS)``.  The
  block is transposed once into VMEM scratch as ``[ROWS, LANES]`` so
  each sequential step is one full-width VPU row op (per-row state in
  the loop carry, rows stored through the mutable scratch ref — Mosaic
  has no value-level dynamic_slice);
* lane carries combine through a lower-triangular ``k^(R*(l-1-m))``
  matrix — one 128x128 MXU matmul instead of a scalar prefix loop;
* a rank-1 correction ``offset_lane * k^(r+1)`` fixes every element —
  the classic two-level block-scan decomposition.

Solves ``z[n] = (1-k) x[n] + k z[n-1]`` (z[-1] = 0) per channel; the
K-weight wrapper (x - z + HF tilt) stays in XLA where it fuses.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
ROWS = 256                      # samples per lane per block
BLOCK = LANES * ROWS            # 32768 samples / grid step


@functools.lru_cache(maxsize=16)
def _lane_prefix_mats(k: float):
    """(T [L, L], p [L]): offs = T @ z_last + carry * p.

    ``T[l, m] = k^(ROWS*(l-1-m))`` for m < l (how much of segment m's
    final state survives into segment l's start), ``p[l] = k^(ROWS*l)``.
    """
    l = np.arange(LANES)
    expo = (l[:, None] - 1 - l[None, :]).astype(np.float64) * ROWS
    with np.errstate(over="ignore", under="ignore"):
        t = np.where(l[:, None] > l[None, :], np.power(float(k), expo), 0.0)
        p = np.power(float(k), (l * ROWS).astype(np.float64))
    return t.astype(np.float32), p.astype(np.float32)


def _iir_block_kernel(x_ref, t_ref, p_ref, out_ref, carry_ref, xt_s, z_s, *,
                      k: float):
    """One grid step: scan BLOCK samples given carry in carry_ref[0]."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry_ref[0] = 0.0

    k_ = jnp.float32(k)
    one_m_k = jnp.float32(1.0 - k)

    # one vectorized transpose into scratch: [ROWS, LANES], lane = segment
    xt_s[...] = x_ref[0, :].reshape(LANES, ROWS).T

    # 1) local scans: 128 independent segments, one VPU row per step;
    # rows stream through the mutable scratch ref
    def body(r, z_prev):
        z_new = one_m_k * xt_s[pl.ds(r, 1), :] + k_ * z_prev   # [1, LANES]
        z_s[pl.ds(r, 1), :] = z_new
        return z_new

    z_last = jax.lax.fori_loop(0, ROWS, body, jnp.zeros((1, LANES), jnp.float32))

    # 2) lane-prefix as one MXU matmul
    carry_in = carry_ref[0]
    offs = (jnp.dot(t_ref[...], z_last[0][:, None],
                    preferred_element_type=jnp.float32)[:, 0]
            + carry_in * p_ref[0, :])                          # [LANES]
    kR = jnp.float32(k ** ROWS)
    carry_ref[0] = z_last[0, LANES - 1] + kR * offs[LANES - 1]

    # 3) rank-1 correction: z[r, l] += offs[l] * k^(r+1)
    # iota must be integer-typed on TPU (tpu.iota verification)
    r_idx = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 1), 0).astype(jnp.float32)
    powers = k_ * jnp.exp(r_idx * jnp.log(k_))
    z = z_s[...] + offs[None, :] * powers                      # [ROWS, LANES]
    out_ref[0, :] = z.T.reshape(BLOCK)


@functools.partial(jax.jit, static_argnames=("k",))
def iir_lowpass_pallas(x: jnp.ndarray, k: float) -> jnp.ndarray:
    """``z[n] = (1-k) x[n] + k z[n-1]`` along the last axis of ``[C, N]``.

    Pads N up to a BLOCK multiple internally.  One HBM pass total.
    """
    c, n = x.shape
    n_pad = -(-n // BLOCK) * BLOCK
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, n_pad - n)))
    grid = n_pad // BLOCK

    t_mat, p_vec = _lane_prefix_mats(float(k))
    t_mat = jnp.asarray(t_mat)
    p_vec = jnp.asarray(p_vec)[None, :]

    def one_channel(xc):
        return pl.pallas_call(
            functools.partial(_iir_block_kernel, k=float(k)),
            out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            grid=(grid,),
            in_specs=[pl.BlockSpec((1, BLOCK), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((LANES, LANES), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, LANES), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, BLOCK), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.SMEM((1,), jnp.float32),
                pltpu.VMEM((ROWS, LANES), jnp.float32),
                pltpu.VMEM((ROWS, LANES), jnp.float32),
            ],
        )(xc[None, :], t_mat, p_vec)[0]

    out = jnp.stack([one_channel(xp[i]) for i in range(c)])
    return out[:, :n]
