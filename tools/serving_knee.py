"""Serving-path utilization knee (VERDICT r4 #8): does a longer window
(= larger chunk batch) lift audio-seconds/s-per-chip on the SERVED
compact istft trio, or is the path latency-thin past the dispatch
amortization point?

Times the fused device-resident pipeline (the flagship bench program,
bench.py::bench_serving_pipeline discipline: jitted sum-reduction sync,
best of 3) at several window lengths.  Each window is one compile
through the relay (~5-15 min cold), so run in a quiet window with at
most one trainer sharing the relay.

  PYTHONPATH=/root/repo:/root/.axon_site python tools/serving_knee.py [secs ...]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def _sync(a):
    a.block_until_ready()
    return float(np.asarray(jax.device_get(a)))


def main():
    from egregora_tpu.models.flashsr.distill import resolve_flashsr
    from egregora_tpu.models.flashsr.pipeline import FlashSRPipeline

    windows = [int(s) for s in sys.argv[1:]] or [120, 240, 480, 960]
    print("devices:", jax.devices(), flush=True)
    cfg, params, src = resolve_flashsr()
    pipe = FlashSRPipeline(cfg, params=params)
    print(f"weights: {src}", flush=True)

    in_sr = 16000
    rng = np.random.default_rng(4)
    rows = []
    for secs in windows:
        x = jnp.asarray((rng.standard_normal((1, in_sr * secs)) * 0.1)
                        .astype(np.float32))
        fn = pipe._fused_process(None, False, in_sr, 48000, 1)
        red = jax.jit(lambda p, xx: fn(p, xx).sum())
        t0 = time.time()
        _sync(red(pipe.params, x))
        compile_s = time.time() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            _sync(red(pipe.params, x))
            best = min(best, time.time() - t0)
        rtf = secs / best
        try:
            ca = red.lower(pipe.params, x).compile().cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            fl = float(ca.get("flops", 0.0))
        except Exception:
            fl = 0.0
        mfu = 100.0 * fl / best / 197e12
        rows.append((secs, best, rtf, mfu))
        print(f"window {secs:4d} s: wall {best*1e3:8.1f} ms  RTF {rtf:8.1f}x"
              f"  MFU {mfu:5.2f}%  (compile {compile_s:.0f} s)", flush=True)

    print("\n| window s | wall ms | RTF | MFU % |")
    print("|---|---|---|---|")
    for secs, best, rtf, mfu in rows:
        print(f"| {secs} | {best*1e3:.1f} | {rtf:.1f} | {mfu:.2f} |")


if __name__ == "__main__":
    main()
