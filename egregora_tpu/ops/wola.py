"""Chunking + Hann weighted overlap-add (WOLA) stitching — batched.

TPU-native redesign of the reference's strictly sequential chunk loop
(``egregora_audio_super_resolution.py:210-251, 399-420``): instead of
iterating chunks one at a time through the model, we materialize ALL
chunks as one batch ``[K, C, win]`` (static shape), run the model over
the batch (optionally sharded across a device mesh on the chunk axis —
this domain's "sequence parallelism", SURVEY.md §5), and stitch with a
single device-side scatter-add.

Semantics match the reference exactly:
* spans cover ``[0, total)`` with window ``win`` and hop ``hop``; the
  last span may be short and is zero-padded to ``win`` before the model
  (sr node :213-225, :413-416).
* stitching weights only the valid (unpadded) region of each chunk with
  a symmetric Hann window, then normalizes by the accumulated weight
  with a zero-guard (sr node :227-251).
"""
from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from .stft import hann_symmetric


def iter_chunks(total_samples: int, win: int, hop: int) -> List[Tuple[int, int]]:
    """(start, length) spans covering [0, total) — reference ``_iter_chunks``."""
    spans: List[Tuple[int, int]] = []
    i = 0
    while i < total_samples:
        length = min(win, total_samples - i)
        spans.append((i, length))
        if i + length >= total_samples:
            break
        i += hop
    return spans


def num_chunks(total_samples: int, win: int, hop: int) -> int:
    return len(iter_chunks(total_samples, win, hop))


def chunk_batch(x_cs: jnp.ndarray, win: int, hop: int,
                pad_to_multiple: int = 1) -> Tuple[jnp.ndarray, np.ndarray, np.ndarray]:
    """Slice ``[C, S]`` into a zero-padded chunk batch ``[K, C, win]``.

    Returns (chunks, starts[K], lengths[K]).  ``pad_to_multiple`` rounds
    K up with all-zero dummy chunks (length 0 => zero stitch weight) so
    the batch divides evenly across a device mesh.
    """
    c, total = x_cs.shape
    spans = iter_chunks(total, win, hop)
    k = len(spans)
    k_pad = -(-k // pad_to_multiple) * pad_to_multiple

    # Dummy (padding) rows CONTINUE the regular i*hop grid — zero-filled
    # starts would fail _regular_hop's grid check and silently demote
    # wola_stitch to the scalar-slow scatter path whenever pad_to_multiple
    # adds rows (the normal mesh case).  Lengths stay 0, so dummy rows
    # contribute nothing in either stitch path.
    starts = (np.arange(k_pad, dtype=np.int64) * hop).astype(np.int32)
    lengths = np.zeros(k_pad, dtype=np.int32)
    for i, (s, l) in enumerate(spans):
        starts[i], lengths[i] = s, l

    # Spans sit on the regular hop grid (starts[i] = i*hop by
    # construction), so framing is gather-free strided slicing — an
    # arbitrary-index jnp.take lowers scalar-slow on TPU.
    from .stft import frame_strided
    x_pad = jnp.pad(x_cs, ((0, 0), (0, (k_pad - 1) * hop + win - total)))
    chunks = frame_strided(x_pad, win, hop)[:, :k_pad]                 # [C, K, win]
    chunks = jnp.swapaxes(chunks, 0, 1)                                # [K, C, win]
    # zero out samples beyond each span's valid length (incl. dummy chunks)
    mask = (jnp.arange(win)[None, :] < jnp.asarray(lengths)[:, None])  # [K, win]
    chunks = chunks * mask[:, None, :]
    return chunks.astype(jnp.float32), starts, lengths


def wola_accumulate(preds: jnp.ndarray, starts: jnp.ndarray, lengths: jnp.ndarray,
                    acc: jnp.ndarray, wsum: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scatter-add one chunk batch's Hann-weighted contributions into a
    running ``(acc [C, total], wsum [total])`` pair.

    This is the O(batch)-memory streaming primitive: long inputs fold
    batch after batch into the same two accumulators instead of
    concatenating every prediction.  Jittable (static shapes: batch,
    win, total); ``wola_stitch`` is the one-shot wrapper.
    """
    k, c, win = preds.shape
    total_len = acc.shape[-1]
    starts = jnp.asarray(starts, dtype=jnp.int32)
    lengths = jnp.asarray(lengths, dtype=jnp.int32)
    hann = jnp.asarray(hann_symmetric(win))

    tap = jnp.arange(win)[None, :]
    valid = tap < lengths[:, None]                                     # [K, win]
    wgt = jnp.where(valid, hann[None, :], 0.0)                         # [K, win]
    pos = starts[:, None] + tap                                        # [K, win]
    # send invalid taps out of range; scatter 'drop' mode ignores them
    pos = jnp.where(valid, pos, total_len)

    flat_pos = pos.reshape(-1)
    weighted = (preds * wgt[:, None, :]).swapaxes(0, 1).reshape(c, -1)  # [C, K*win]

    acc = acc.at[:, flat_pos].add(weighted, mode="drop")
    wsum = wsum.at[flat_pos].add(wgt.reshape(-1), mode="drop")
    return acc, wsum


def wola_finalize(acc: jnp.ndarray, wsum: jnp.ndarray) -> jnp.ndarray:
    """Normalize accumulated sums; zero weight guards to 1 (sr node :247-250)."""
    wsum = jnp.where(wsum == 0.0, 1.0, wsum)
    return (acc / wsum[None, :]).astype(jnp.float32)


def _regular_hop(starts: np.ndarray, win: int):
    """The chunk grid's hop if ``starts`` is the regular ``i*hop`` grid
    with ``win <= 2*hop`` (always true for ``chunk_batch`` output at the
    FlashSR geometry), else None."""
    s = np.asarray(starts)
    if s.ndim != 1 or s.size == 0 or s[0] != 0:
        return None
    if s.size == 1:
        return int(win)
    hop = int(s[1] - s[0])
    if hop <= 0 or win > 2 * hop:
        return None
    if not np.array_equal(s, np.arange(s.size, dtype=np.int64) * hop):
        return None
    return hop


def _wola_dense_tracks(preds: jnp.ndarray, lengths: jnp.ndarray, hop: int
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scatter-free OLA of a contiguous regular-grid chunk batch: with
    ``win <= 2*hop`` each output sample receives at most two chunks'
    contributions, so the overlap-add decomposes into TWO dense shifted
    tracks (reshapes + pads) — TPU scatter-add over arbitrary indices
    runs scalar-slow (measured ~0.7 s of a 1.06 s fused FlashSR node
    program).  Returns ``(acc [C, (K+1)*hop], wsum [(K+1)*hop])``
    covering offsets [0, (K+1)*hop) relative to chunk 0's start."""
    k, c, w = preds.shape
    hann = jnp.asarray(hann_symmetric(w))
    tap = jnp.arange(w)[None, :]
    wgt = jnp.where(tap < jnp.asarray(lengths, jnp.int32)[:, None],
                    hann[None, :], 0.0)                       # [K, w]
    weighted = preds * wgt[:, None, :]                        # [K, C, w]

    pad_w = 2 * hop - w
    weighted = jnp.pad(weighted, ((0, 0), (0, 0), (0, pad_w)))
    wgt2 = jnp.pad(wgt, ((0, 0), (0, pad_w)))
    a, b = weighted[:, :, :hop], weighted[:, :, hop:]
    ta = a.swapaxes(0, 1).reshape(c, k * hop)
    tb = b.swapaxes(0, 1).reshape(c, k * hop)
    acc = jnp.pad(ta, ((0, 0), (0, hop))) + jnp.pad(tb, ((0, 0), (hop, 0)))
    wa, wb = wgt2[:, :hop].reshape(-1), wgt2[:, hop:].reshape(-1)
    wsum = jnp.pad(wa, (0, hop)) + jnp.pad(wb, (hop, 0))
    return acc, wsum


def _wola_dense(preds: jnp.ndarray, lengths: jnp.ndarray, hop: int,
                total_len: int) -> jnp.ndarray:
    acc, wsum = _wola_dense_tracks(preds, lengths, hop)
    return wola_finalize(acc[:, :total_len], wsum[:total_len])


def wola_accumulate_dense(preds: jnp.ndarray, lengths: jnp.ndarray, hop: int,
                          acc: jnp.ndarray, wsum: jnp.ndarray,
                          offset) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fold one CONTIGUOUS regular-grid chunk batch (first chunk starts
    at ``offset``, a traced int) into running ``(acc, wsum)``.

    The accumulators must carry ``(K+1)*hop`` samples of tail margin so
    the fixed-size dynamic-slice add never clips (jittable: one program
    serves every batch offset).  Streaming analog of ``_wola_dense``."""
    import jax.lax as lax

    k, c, w = preds.shape
    seg_a, seg_w = _wola_dense_tracks(preds, lengths, hop)
    seg = seg_a.shape[-1]
    offset = jnp.asarray(offset, jnp.int32)
    cur_a = lax.dynamic_slice(acc, (0, offset), (c, seg))
    acc = lax.dynamic_update_slice(acc, cur_a + seg_a, (0, offset))
    cur_w = lax.dynamic_slice(wsum, (offset,), (seg,))
    wsum = lax.dynamic_update_slice(wsum, cur_w + seg_w, (offset,))
    return acc, wsum


def wola_stitch(preds: jnp.ndarray, starts: jnp.ndarray, lengths: jnp.ndarray,
                total_len: int, win: int) -> jnp.ndarray:
    """Hann-weighted overlap-add of ``[K, C, win]`` chunk outputs -> ``[C, total]``.

    Only the valid (unpadded) first ``lengths[k]`` samples of each chunk
    contribute, each weighted by the first ``lengths[k]`` taps of a
    symmetric Hann(win); weight sums of zero are guarded to 1 — the
    exact semantics of the reference ``_wola_stitch`` (sr node :227-251).

    Regular-grid inputs (chunk_batch's always are) take the dense
    two-track path; arbitrary ``starts`` fall back to the scatter-add.
    """
    k, c, w = preds.shape
    hop = _regular_hop(np.asarray(starts), w)
    if hop is not None:
        return _wola_dense(preds, lengths, hop, total_len)
    acc = jnp.zeros((c, total_len), preds.dtype)
    wsum = jnp.zeros((total_len,), jnp.float32)
    acc, wsum = wola_accumulate(preds, starts, lengths, acc, wsum)
    return wola_finalize(acc, wsum)
