"""Benchmark: FlashSR real-time factor (audio-sec / wall-sec / chip) @48 kHz.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the driver's north-star target of
100x real time per chip (BASELINE.json / BASELINE.md).

Runs on whatever backend jax selects (the real TPU under the driver).
Random-init weights — identical compute graph to converted weights.
"""
from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from egregora_tpu.models.flashsr.pipeline import (CHUNK_S, CHUNK_SAMPLES,
                                                      FlashSRConfig, FlashSRPipeline)

    pipe = FlashSRPipeline(FlashSRConfig(), seed=0)
    fwd = jax.jit(lambda p, x: pipe.chunk_forward(p, x, lowpass_input=False))

    rng = np.random.default_rng(0)

    def batch_input(b: int) -> jnp.ndarray:
        return jnp.asarray(
            rng.standard_normal((b, CHUNK_SAMPLES)).astype(np.float32) * 0.1)

    def sync(arr) -> float:
        """Force completion.  On the remote-TPU relay block_until_ready
        can return at enqueue time; a host transfer of a slice cannot."""
        arr.block_until_ready()
        return float(np.asarray(arr[0, :4]).sum())

    batch = 32
    while batch >= 1:
        try:
            y = fwd(pipe.params, batch_input(batch))
            sync(y)  # compile + settle
            break
        except Exception:
            batch //= 2
    if batch < 1:
        print(json.dumps({"metric": "flashsr_rtf_48k", "value": 0.0,
                          "unit": "x_realtime_per_chip", "vs_baseline": 0.0}))
        return

    # warmed; time steady state on fresh inputs, syncing via host reads
    trials = 3
    xs = [batch_input(batch) for _ in range(trials)]
    sync(fwd(pipe.params, xs[0]))

    t0 = time.time()
    outs = [fwd(pipe.params, x) for x in xs]
    for o in outs:
        sync(o)
    dt = time.time() - t0

    audio_seconds = trials * batch * CHUNK_S
    rtf = audio_seconds / dt
    print(json.dumps({
        "metric": "flashsr_rtf_48k",
        "value": round(rtf, 2),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(rtf / 100.0, 3),
    }))


if __name__ == "__main__":
    main()
