"""Phase-alignment bisect for the exciter istft-head candidates.

Question (r5): on a phase-COHERENT harmonic stack, how well do the
stft(x^2)/stft(x^3) exciter phasors (vocoder.py exciter features) track
the TRUE high-band phase, and which generator component (AM, gate,
vibrato, noise, soft cutoff) decorrelates them?

Alignment metric per bin b (within the candidate's coverage band):
    A(b) = |mean_t  u_cand(t,b) * conj(u_true(t,b))|
i.e. invariance to a per-bin constant rotation (the head's complex gate
absorbs those).  We report the magnitude-weighted mean over bins in
[cutoff, min(2*cutoff, nyq)] for x^2 and [cutoff, min(3*cutoff, nyq)]
for x^3, masked to bins where the true magnitude is above a floor
(leakage-only bins carry no SI-SDR mass).

Run on CPU: PYTHONPATH=/root/repo:/root/.axon_site python tools/exc_align_probe.py
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

SR = 48000
N_FFT, HOP = 1920, 480
LEN = SR * 2


def make_pair(seed, *, am=False, gate=False, vibrato=False, noise=0.0,
              soft_cut=False, f0=None, cut=8000.0, nharm=352,
              rolloff=0.7):
    rng = np.random.default_rng(seed)
    t = np.arange(LEN, dtype=np.float64) / SR
    if f0 is None:
        f0 = float(np.exp(rng.uniform(np.log(150.0), np.log(900.0))))
    c = rng.uniform(0, 2 * np.pi)
    n = np.arange(1, nharm + 1, dtype=np.float64)
    amps = n ** (-rolloff) * (f0 * n < 0.98 * SR / 2)
    if vibrato:
        vr, vd = 5.0, 0.006
        base = 2 * np.pi * f0 * (t - vd * np.cos(2 * np.pi * vr * t)
                                 / (2 * np.pi * vr))
    else:
        base = 2 * np.pi * f0 * t
    x = np.sum(amps[:, None] * np.sin(n[:, None] * base[None, :]
                                      + (n * c)[:, None]), axis=0)
    x /= np.sqrt(np.mean(x ** 2)) + 1e-9
    if am:
        x = x * (0.6 + 0.4 * np.sin(2 * np.pi * 1.3 * t + 0.5)
                 * np.sin(2 * np.pi * 2.1 * t + 1.7))
    if gate:
        x = x * (1 / (1 + np.exp(-(6 * np.sin(2 * np.pi * 1.1 * t + 0.3)
                                   + 2))))
    if noise > 0:
        w = rng.standard_normal(LEN)
        x = x + noise * w / np.sqrt(np.mean(w ** 2))
    hr = x.astype(np.float32)
    spec = np.fft.rfft(hr)
    f = np.fft.rfftfreq(LEN, 1.0 / SR)
    if soft_cut:
        mask = 1 / (1 + np.exp(-(cut - f) / 200.0))
    else:
        mask = (f < cut).astype(np.float64)
    lr = np.fft.irfft(spec * mask, n=LEN).astype(np.float32)
    return lr, hr, f0


def phasors(x):
    # numpy mirror of ops.stft.stft_conv's grid (center-pad n_fft//2,
    # Hann window, frame f at sample f*hop) — the alignment metric only
    # needs candidate and true to share one convention
    xp = np.pad(x, (N_FFT // 2, N_FFT // 2), mode="reflect")
    nfr = 1 + (len(xp) - N_FFT) // HOP
    idx = np.arange(N_FFT)[None, :] + HOP * np.arange(nfr)[:, None]
    frames = xp[idx] * np.hanning(N_FFT)[None, :]
    z = np.fft.rfft(frames, axis=-1)
    m = np.abs(z)
    return z / (m + 1e-9), m


def align(lr, hr, cut, order):
    xn = lr / (np.sqrt(np.mean(lr ** 2)) + 1e-9)
    e = xn ** order
    uc, _ = phasors(e)
    ut, mt = phasors(hr)
    freqs = np.arange(N_FFT // 2 + 1) * SR / N_FFT
    lo, hi = cut, min(order * cut, 0.98 * SR / 2)
    band = (freqs >= lo) & (freqs <= hi)
    if not band.any():
        return float("nan"), 0
    # per-bin alignment, true-magnitude weighted, leakage bins masked
    w = mt.mean(axis=0)
    floor = w[band].max() * 1e-3
    sel = band & (w > floor)
    if not sel.any():
        return float("nan"), 0, float("nan")
    a = np.abs((uc[:, sel] * np.conj(ut[:, sel])).mean(axis=0))
    # energy-weighted variant: weight each (frame, bin) by the true
    # magnitude there — decorrelation in quiet frames carries no
    # SI-SDR mass
    rot = uc[:, sel] * np.conj(ut[:, sel])
    aw = np.abs((rot * mt[:, sel]).sum(axis=0) / mt[:, sel].sum(axis=0))
    return (float((a * w[sel]).sum() / w[sel].sum()), int(sel.sum()),
            float((aw * w[sel]).sum() / w[sel].sum()))


def main():
    cases = [
        ("pristine", dict()),
        ("+am", dict(am=True)),
        ("+gate", dict(gate=True)),
        ("+vibrato", dict(vibrato=True)),
        ("+noise.05", dict(noise=0.05)),
        ("+softcut", dict(soft_cut=True)),
        ("all", dict(am=True, gate=True, vibrato=True, noise=0.05,
                     soft_cut=True)),
    ]
    for name, kw in cases:
        a2s, a3s, w2s, w3s = [], [], [], []
        for seed in range(4):
            lr, hr, f0 = make_pair(seed, **kw)
            a2, n2, w2 = align(lr, hr, kw.get("cut", 8000.0), 2)
            a3, n3, w3 = align(lr, hr, kw.get("cut", 8000.0), 3)
            a2s.append(a2)
            a3s.append(a3)
            w2s.append(w2)
            w3s.append(w3)
        print(f"{name:10s}  x^2 align {np.nanmean(a2s):.3f} "
              f"(E-wtd {np.nanmean(w2s):.3f})   "
              f"x^3 align {np.nanmean(a3s):.3f} "
              f"(E-wtd {np.nanmean(w3s):.3f})", flush=True)


if __name__ == "__main__":
    main()
