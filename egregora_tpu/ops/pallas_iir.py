"""First-order IIR scan as a Pallas TPU kernel.

The reference's hottest interpreted loop is the per-sample K-weighting
IIR (``egregora_audio_eval_pack.py:140-147``).  ops/iir.py replaces it
with ``lax.associative_scan`` — O(log N) full passes over HBM (~22
passes for a 4M-sample signal).  This kernel does it in ONE pass:

* the TPU executes a Pallas grid sequentially on a core, so the IIR
  carry lives in SMEM scratch across grid steps (streaming kernel);
* within a block the recurrence is parallelized across 128 lanes: lane
  ``l`` owns the contiguous sub-segment ``[l*ROWS, (l+1)*ROWS)``.  The
  block is transposed in VMEM to ``[ROWS, LANES]`` so each sequential
  step is one full-width VPU row op; lane carries are then combined by
  a 128-step scalar prefix pass, and a rank-1 correction
  ``offset_lane * k^(r+1)`` fixes every element — the classic
  two-level block-scan decomposition.

Solves ``z[n] = (1-k) x[n] + k z[n-1]`` (z[-1] = 0) per channel; the
K-weight wrapper (x - z + HF tilt) stays in XLA where it fuses.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
ROWS = 256                      # samples per lane per block
BLOCK = LANES * ROWS            # 32768 samples / grid step


def _iir_block_kernel(x_ref, out_ref, carry_ref, *, k: float):
    """One grid step: scan BLOCK samples given carry in carry_ref[0]."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry_ref[0] = 0.0

    k_ = jnp.float32(k)
    one_m_k = jnp.float32(1.0 - k)

    # [1, BLOCK] -> segments-as-lanes layout [ROWS, LANES]
    xt = x_ref[0, :].reshape(LANES, ROWS).T

    # 1) local scans: 128 independent segments, one VPU row per step
    def body(r, state):
        z_prev, acc = state                       # z_prev [1, LANES]
        z_new = one_m_k * xt[r, :][None, :] + k_ * z_prev
        acc = jax.lax.dynamic_update_slice(acc, z_new, (r, 0))
        return z_new, acc

    z0 = jnp.zeros((1, LANES), jnp.float32)
    acc0 = jnp.zeros((ROWS, LANES), jnp.float32)
    z_last, local = jax.lax.fori_loop(0, ROWS, body, (z0, acc0))
    z_last = z_last[0]                            # [LANES]

    # 2) lane-prefix: offset_l = z-state entering lane l, seeded by the
    # inter-block carry; decay per whole lane segment is k^ROWS.
    kR = jnp.float32(k ** ROWS)

    def lane_body(l, state):
        prev, offs = state
        offs = jax.lax.dynamic_update_slice(offs, prev[None, None], (0, l))
        nxt = z_last[l] + kR * prev
        return nxt, offs

    block_carry, offsets = jax.lax.fori_loop(
        0, LANES, lane_body,
        (carry_ref[0], jnp.zeros((1, LANES), jnp.float32)))
    carry_ref[0] = block_carry

    # 3) rank-1 correction: z[r, l] += offset_l * k^(r+1)
    r_idx = jax.lax.broadcasted_iota(jnp.float32, (ROWS, 1), 0)
    powers = k_ * jnp.exp(r_idx * jnp.log(k_))
    z = local + offsets * powers                  # [ROWS, LANES]
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

    def one_channel(xc):
        return pl.pallas_call(
            functools.partial(_iir_block_kernel, k=float(k)),
            out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            grid=(grid,),
            in_specs=[pl.BlockSpec((1, BLOCK), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, BLOCK), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SMEM((1,), jnp.float32)],
        )(xc[None, :])[0]

    out = jnp.stack([one_channel(xp[i]) for i in range(c)])
    return out[:, :n]
