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

    starts = np.zeros(k_pad, dtype=np.int32)
    lengths = np.zeros(k_pad, dtype=np.int32)
    for i, (s, l) in enumerate(spans):
        starts[i], lengths[i] = s, l

    # Gather with right zero-padding: pad the signal by `win` so every
    # start+win slice is in range, then take a strided gather.
    x_pad = jnp.pad(x_cs, ((0, 0), (0, win)))
    idx = jnp.asarray(starts)[:, None] + jnp.arange(win)[None, :]      # [K, win]
    chunks = jnp.take(x_pad, idx, axis=1)                              # [C, K, win]
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


def wola_stitch(preds: jnp.ndarray, starts: jnp.ndarray, lengths: jnp.ndarray,
                total_len: int, win: int) -> jnp.ndarray:
    """Hann-weighted overlap-add of ``[K, C, win]`` chunk outputs -> ``[C, total]``.

    Only the valid (unpadded) first ``lengths[k]`` samples of each chunk
    contribute, each weighted by the first ``lengths[k]`` taps of a
    symmetric Hann(win); weight sums of zero are guarded to 1 — the
    exact semantics of the reference ``_wola_stitch`` (sr node :227-251).
    """
    k, c, w = preds.shape
    acc = jnp.zeros((c, total_len), preds.dtype)
    wsum = jnp.zeros((total_len,), jnp.float32)
    acc, wsum = wola_accumulate(preds, starts, lengths, acc, wsum)
    return wola_finalize(acc, wsum)
