"""Decompose the istft trio's SI-SDR deficit vs passthrough (VERDICT r5 #3).

The shipped istft trio monitors at sisdr_model 7.55 vs sisdr_passthrough
9.81 (pretrained_istft.json).  Where do the 2.3 dB go?  Candidates:

  * low-band damage: the adaptive crossover reconstructs the input's
    low band through an STFT->mask->iSTFT round trip (pipeline
    _postprocess) — if that path is lossy, alpha=0 (no model HF at all)
    will already sit below passthrough;
  * uncorrelated HF phase: the vocoder's high band has good magnitude
    (LSD ~5) but random phase — adding it then RAISES the error energy
    vs simply missing it, and SI-SDR drops as alpha -> 1;
  * a beatable bar at all: the oracle line blends the TRUE high band
    through the same mask — the ceiling any vocoder can reach through
    this merge.

One jitted program sweeps alpha over the high-band branch and prints
SI-SDR/LSD per alpha plus the oracle.  Run on CPU (keeps the TPU free):

  PYTHONPATH=/root/repo:/root/.axon_site python tools/sisdr_diag.py --cpu
"""
import sys

sys.path.insert(0, "/root/repo")

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
    sys.argv.remove("--cpu")

import jax.numpy as jnp  # noqa: E402

ALPHAS = (0.0, 0.25, 0.5, 0.75, 1.0)


def main():
    from egregora_tpu.eval.metrics import lsd_sisdr_report
    from egregora_tpu.models.flashsr.distill import (PRETRAINED_ISTFT,
                                                     load_pretrained_with_cfg,
                                                     synth_pair_batch)
    from egregora_tpu.models.flashsr.mel import envelope_gain
    from egregora_tpu.models.flashsr.pipeline import (CHUNK_SAMPLES, REQ_SR,
                                                      FlashSRPipeline,
                                                      _bandwidth_mask_vs_pred)
    from egregora_tpu.ops.stft import istft_dense, stft_conv

    path = sys.argv[1] if len(sys.argv) > 1 else PRETRAINED_ISTFT
    print("devices:", jax.devices(), flush=True)
    cfg, params = load_pretrained_with_cfg(path)

    captured = {}

    class DiagPipe(FlashSRPipeline):
        def _postprocess(self, x, wav, mel_hr):
            captured["x"], captured["wav"], captured["mel"] = x, wav, mel_hr
            return wav

    pipe = DiagPipe(cfg, params=params)

    def blend(x, wav, mel_hr, hr, alpha):
        n_fft, hop = 2048, 512
        t = x.shape[-1]
        pad = n_fft // 2
        padw = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
        rl, il = stft_conv(jnp.pad(x, padw, mode="reflect"), n_fft, hop)
        rh, ih = stft_conv(jnp.pad(wav, padw, mode="reflect"), n_fft, hop)
        if cfg.envelope_match:
            g = envelope_gain(rh, ih, mel_hr, sr=REQ_SR, n_fft=n_fft, hop=hop,
                              replace=cfg.envelope_match == "replace")
            rh, ih = rh * g, ih * g
        w = _bandwidth_mask_vs_pred(rl, il, mel_hr, REQ_SR,
                                    cfg.crossover_hz, n_fft)
        a = 1.0 - alpha * (1.0 - w)   # alpha=1 -> w; alpha=0 -> all-input
        y = istft_dense(rl * a + rh * (1.0 - a), il * a + ih * (1.0 - a),
                        n_fft, hop)
        return y[..., pad: pad + t]

    cp = 0.0
    for a in list(sys.argv[1:]):
        if a.startswith("--coherent="):
            cp = float(a.split("=")[1])
            sys.argv.remove(a)
    print(f"coherent_p={cp}", flush=True)

    @jax.jit
    def run(params, key):
        lr, hr = synth_pair_batch(key, 4, CHUNK_SAMPLES, coherent_p=cp)
        wav = pipe.chunk_forward(params, lr, lowpass_input=False)
        x, mel_hr = captured["x"], captured["mel"]
        rep = jax.vmap(lambda a, b: lsd_sisdr_report(a, b))

        def score(est):
            r = rep(hr, est)
            return jnp.mean(r["si_sdr_db"]), jnp.mean(r["lsd_mean_db"])

        out = {"passthrough": score(lr)}
        for alpha in ALPHAS:
            out[f"alpha={alpha}"] = score(blend(x, wav, mel_hr, hr, alpha))
        out["oracle-hf"] = score(blend(x, hr, mel_hr, hr, 1.0))
        # ceiling probe: TRUE HF magnitude with RANDOM phase — the best
        # any model can do when the synth draws' per-harmonic phase
        # offsets are i.i.d. (unrecoverable from the LR band)
        n_fft, hop = 2048, 512
        pad = n_fft // 2
        padw = [(0, 0)] * (hr.ndim - 1) + [(pad, pad)]
        rt, it = stft_conv(jnp.pad(hr, padw, mode="reflect"), n_fft, hop)
        th = jax.random.uniform(jax.random.PRNGKey(1), rt.shape,
                                maxval=2 * jnp.pi)
        mag = jnp.sqrt(rt * rt + it * it)
        from egregora_tpu.ops.stft import istft_dense as _ist
        hr_rp = _ist(mag * jnp.cos(th), mag * jnp.sin(th),
                     n_fft, hop)[..., pad: pad + hr.shape[-1]]
        out["truemag-randphase"] = score(blend(x, hr_rp, mel_hr, hr, 1.0))
        return out

    res = run(params, jax.random.PRNGKey(7))
    for k, (s, l) in res.items():
        print(f"{k:12s} SI-SDR {float(s):7.2f} dB   LSD {float(l):6.2f}",
              flush=True)


if __name__ == "__main__":
    main()
