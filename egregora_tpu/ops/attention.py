"""Scaled-dot-product attention engines for the FlashSR stack.

The full-config FlashSR stack runs attention in two places: the LDM
UNet's AttentionBlocks (8 heads, 2048/512 tokens, head dim 32/64) and
the AudioLDM VAE's mid-block AttnBlock2D (single head, 8192 tokens,
dim 256) — the layouts ``student_ldm.pth``/``vae.pth`` convert into
(reference ``egregora_audio_super_resolution.py:319-344`` imports the
torch modules; these are the TPU-native equivalents).

Engine verdicts, measured in-context on v5e at the real bench geometry
(tools/attn_lab.py, B=26 UNet forward, over-null walls):

  no attention       27.1 ms   (UNet convs alone run at ~67% MFU)
  unrolled blocks    47.6 ms   <- ships on TPU
  lax.map chunked    55.5 ms   <- ships elsewhere (compile-lean)
  4d (no B*H merge)  59.3 ms
  4d bf16 scores     54.5 ms
  pallas flash      180.6 ms   (removed: d=32 pads 4x into the MXU
                                lanes and the kernel grid overhead
                                swamps the online-softmax win at
                                N <= 8192; jax's tpu flash_attention
                                measured 2.8x WORSE than plain XLA
                                at every shape this stack runs)

All engines are numerically identical (same matmuls, f32 scores and
softmax; the lab pins |sum d| = 0 between chunked and unroll).  The
q-dimension is processed in blocks so the [N, N] score matrix never
materializes — each block's [block, N] f32 score rows are the
dominant HBM transient either way; unrolling simply lets XLA overlap
block matmuls instead of serializing them through a loop carry.

True attention FLOPs in the UNet are ~642 G per 120 s bench program
(5 ds=2 calls x 112 G + 6 ds=4 x 14 G).  Beware: XLA cost_analysis
counts a ``lax.map`` body ONCE, not times the trip count, so the
chunked engine under-reports by ~8x — the unrolled engine also fixes
the program's MFU accounting.

``EGREGORA_ATTN_PATH`` ∈ {auto, chunked, unroll} forces an engine for
A/B (auto = unroll on TPU, chunked elsewhere).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def _scores_dtype():
    """HBM dtype of the pre-softmax score blocks.  The [block, N] score
    transient is the dominant HBM traffic of every attention call in
    this stack (3.5 GB/call at the UNet ds=2 geometry, 7 GB at the VAE
    mid-block) — ``EGREGORA_ATTN_SCORES=bf16`` halves it by writing the
    QK product in bf16 (softmax still subtracts the row max and
    exponentiates in f32, so only the logits themselves round: |err| <=
    2^-8 relative, ~0.4% on softmax weights)."""
    return (jnp.bfloat16
            if os.environ.get("EGREGORA_ATTN_SCORES", "") == "bf16"
            else jnp.float32)


def chunked_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                      block: int = 256) -> jnp.ndarray:
    """Exact single-head attention ``[B, N, C]`` with query chunking.

    Each query block's full score row [block, N] is materialized (so the
    softmax is exact, no online rescaling) but never the [N, N] matrix;
    ``lax.map`` serializes blocks so the transient is O(B*block*N) and
    the compiled body is one block (compile-lean for the CPU suite)."""
    b, n, c = q.shape
    scale = c ** -0.5
    sd = _scores_dtype()
    nb = -(-n // block)
    qp = jnp.pad(q * scale, ((0, 0), (0, nb * block - n), (0, 0)))
    qp = qp.reshape(b, nb, block, c).swapaxes(0, 1)       # [nb, B, block, C]

    def one(qblk):
        s = jnp.einsum("bqc,bkc->bqk", qblk, k,
                       preferred_element_type=sd)
        w = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(v.dtype)
        return jnp.einsum("bqk,bkc->bqc", w, v)

    out = jax.lax.map(one, qp)                            # [nb, B, block, C]
    return out.swapaxes(0, 1).reshape(b, nb * block, c)[:, :n]


def unrolled_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                       block: int = 256) -> jnp.ndarray:
    """Same math as ``chunked_attention`` with the q blocks unrolled at
    trace time: XLA schedules the (independent) block matmuls without a
    loop carry — measured 7.9 ms faster across the UNet's 11 calls —
    and cost_analysis sees every FLOP."""
    b, n, c = q.shape
    q = q * (c ** -0.5)
    sd = _scores_dtype()
    outs = []
    for i in range(0, n, block):
        s = jnp.einsum("bqc,bkc->bqk", q[:, i:i + block], k,
                       preferred_element_type=sd)
        w = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(v.dtype)
        outs.append(jnp.einsum("bqk,bkc->bqc", w, v))
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)


def mha(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Multi-head attention ``[B, H, N, D] -> [B, H, N, D]``.

    TPU: unrolled engine.  Other backends: the lax.map engine (same
    numerics, one-block compile).  ``EGREGORA_ATTN_PATH`` forces."""
    b, h, n, d = q.shape
    path = os.environ.get("EGREGORA_ATTN_PATH", "auto")
    if path == "auto":
        # pallas is the TPU default: whole-row VMEM-resident kernel,
        # confirmed in-context (unet_lab: -14.4 ms on the LDM UNet;
        # vae-mid N=8192: 59.8 vs 69.1 ms unrolled, max |delta| one
        # bf16 ulp).  EGREGORA_ATTN_PATH=unroll restores the old engine.
        path = "pallas" if jax.default_backend() == "tpu" else "chunked"
    if path == "pallas":
        from .attn_pallas import flash_rows
        fn = flash_rows
    else:
        fn = unrolled_attention if path == "unroll" else chunked_attention
    kw = {}
    blk = os.environ.get("EGREGORA_ATTN_BLOCK", "")
    if blk:
        kw["block_q" if path == "pallas" else "block"] = int(blk)
    o = fn(q.reshape(b * h, n, d), k.reshape(b * h, n, d),
           v.reshape(b * h, n, d), **kw)
    return o.reshape(b, h, n, d)
