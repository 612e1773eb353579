"""Batched evaluation programs: a whole [P, T] pair batch per dispatch.

The reference evaluates one pair per node call (sequential NumPy,
``egregora_audio_eval_pack.py:414-470``); the per-pair engines here are
already jitted single programs, but through a remote-accelerator relay
each dispatch costs ~50-60 ms fixed — with device work in the
microseconds, per-pair dispatch caps throughput at ~16 pairs/s no
matter how fast the math is (BENCH r2-r4).  These wrappers vmap the
fused per-pair programs over a leading pair axis so P pairs ride ONE
dispatch: eval-pack and null-suite throughput scale with P until
compute actually shows up.

All metric outputs come back as dicts of ``[P]`` arrays (one value per
pair), matching the per-pair report keys.
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .align import apply_frac_delay, xcorr_delay
from .loudness import loudness_report
from .metrics import lsd_sisdr_report
from .nulltest import gain_match, null_test


@functools.partial(jax.jit, static_argnames=("sr", "n_fft", "hop",
                                             "compute_true_peak"))
def evalpack_report_batch(a: jnp.ndarray, b: jnp.ndarray, sr: int,
                          n_fft: int = 2048, hop: int = 512,
                          compute_true_peak: bool = True
                          ) -> Dict[str, jnp.ndarray]:
    """SI-SDR/LSD + full BS.1770 loudness for ``[P, T]`` mono pairs.

    One program evaluates every pair; returns the union of the
    ``lsd_sisdr_report`` and ``loudness_report`` keys as [P] arrays
    (loudness is measured on ``b``, the processed side, as in the
    reference meter node ``egregora_audio_eval_pack.py:306-333``).
    """
    def one(ai, bi):
        rep = dict(lsd_sisdr_report(ai, bi, n_fft=n_fft, hop=hop))
        loud = loudness_report(bi[None], sr, compute_true_peak=compute_true_peak)
        rep.update(loud)
        return rep

    return jax.vmap(one)(a, b)


@functools.partial(jax.jit, static_argnames=("sr", "max_shift", "gain_mode",
                                             "least_squares_scale"))
def nullsuite_batch(a: jnp.ndarray, b: jnp.ndarray, sr: int,
                    max_shift: int = 9600, gain_mode: str = "RMS",
                    least_squares_scale: bool = False
                    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """GCC-PHAT align + gain match + null test for ``[P, T]`` mono pairs.

    The full ``Null_Test_Full`` compute chain (reference
    ``egregora_null_test_suite.py:616-657``) on every pair in one
    program.  Returns ``(null [P, T], metrics {key: [P]})`` including
    ``delay_samples`` and ``gain_db`` from the align/match stages.
    """
    def one(ai, bi):
        lag = xcorr_delay(ai, bi, max_shift=max_shift)
        aligned = apply_frac_delay(bi[None], -lag)
        matched, gain_db, _, _ = gain_match(ai[None], aligned, sr,
                                            mode=gain_mode)
        null, metrics = null_test(ai[None], matched, sr,
                                  least_squares_scale=least_squares_scale)
        metrics = dict(metrics)
        metrics["delay_samples"] = lag
        metrics["gain_db"] = gain_db
        return null[0], metrics

    return jax.vmap(one)(a, b)
