"""The restructured RNNoise engine (batched pitch xcorr + two tiny
scans + batched comb filter, models/rnnoise/model.py) must match the
straightforward monolithic per-frame scan it replaced.

The monolithic step below is the semantic reference: one scan carrying
ALL recurrent state, running the full pitch search, pitch spectrum
FFT, features, GRUs, and comb filter per frame — exactly denoise.c's
per-frame order of operations (and exactly the engine shipped before
the restructure).  The production engine hoists every frame-parallel
piece out of the scan for TPU throughput; this test pins the
equivalence so perf work cannot silently change the semantics.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import egregora_tpu.models.rnnoise.model as M


def _denoise_channel_monolithic(params, x):
    """Reference: the single-scan engine (per-frame pitch search/FFT)."""
    from egregora_tpu.ops.iir import biquad
    from egregora_tpu.ops.stft import frame_strided

    n_frames = x.shape[0] // M.FRAME
    xs = biquad(x[: n_frames * M.FRAME] * M.PCM_SCALE,
                b=(-1.99599, 0.99600), a=(-1.98989, 0.98990))
    win = jnp.asarray(M._vorbis_window())
    bm_e = jnp.asarray(M._band_matrix_energy())
    bm_i = jnp.asarray(M._band_matrix_interp())
    dct = jnp.asarray(M._dct_matrix())
    cfg = M.RNNoiseConfig()
    sqmag = lambda z: z.real * z.real + z.imag * z.imag

    bufs = frame_strided(jnp.concatenate([jnp.zeros(M.FRAME), xs]),
                         M.WINDOW, M.FRAME)[:n_frames] * win
    spec_all = jnp.fft.rfft(bufs, axis=-1) / M.WINDOW
    ex_all = sqmag(spec_all) @ bm_e
    silence_all = jnp.sum(ex_all, axis=-1) < M.SILENCE_E
    ly_all = jax.vmap(M._log_band_follow)(ex_all)
    bfcc_all = ly_all @ dct
    bfcc_all = bfcc_all.at[:, 0].add(-12.0).at[:, 1].add(-4.0)
    pitch_bufs = frame_strided(
        jnp.concatenate([jnp.zeros(M.PITCH_BUF - M.FRAME), xs]),
        M.PITCH_BUF, M.FRAME)[:n_frames]

    def step(carry, inp):
        (cep_mem, h_vad, h_noise, h_den, lastg,
         prev_period, prev_gain) = carry
        spec, ex, silence, bfcc, pitch_buf = inp

        period, pgain = M._pitch_search(pitch_buf, prev_period, prev_gain)
        start = (M.PITCH_BUF - M.WINDOW) - period.astype(jnp.int32)
        p_wave = jax.lax.dynamic_slice(pitch_buf, (start,), (M.WINDOW,)) * win
        p_spec = jnp.fft.rfft(p_wave) / M.WINDOW
        ep = sqmag(p_spec) @ bm_e
        exp_num = (spec.real * p_spec.real + spec.imag * p_spec.imag) @ bm_e
        exp = exp_num / jnp.sqrt(1e-3 + ex * ep)

        ceps_1, ceps_2 = cep_mem[0], cep_mem[1]
        f_head = bfcc.at[:M.NB_DELTA].set(
            bfcc[:M.NB_DELTA] + ceps_1[:M.NB_DELTA] + ceps_2[:M.NB_DELTA])
        d1 = (bfcc - ceps_2)[:M.NB_DELTA]
        d2 = (bfcc - 2 * ceps_1 + ceps_2)[:M.NB_DELTA]
        pitch_cep = (exp @ dct)[:M.NB_DELTA]
        pitch_cep = pitch_cep.at[0].add(-1.3).at[1].add(-0.9)
        new_mem = jnp.concatenate([bfcc[None], cep_mem[:-1]], axis=0)
        dists = jnp.sum((new_mem[:, None, :] - new_mem[None, :, :]) ** 2,
                        axis=-1)
        dists = dists + jnp.eye(M.CEPS_MEM) * 1e15
        spec_var = jnp.sum(jnp.min(dists, axis=1)) / M.CEPS_MEM - 2.1

        feats = jnp.concatenate([
            f_head, d1, d2, pitch_cep,
            (0.01 * (period - 300.0))[None], spec_var[None]])
        feats = jnp.where(silence, jnp.zeros_like(feats), feats)

        dense = jnp.tanh(feats @ params["input_dense"]["kernel"]
                         + params["input_dense"]["bias"])
        h_vad_n = M._gru_step(params["vad_gru"], h_vad, dense)
        vad = jax.nn.sigmoid(h_vad_n @ params["vad_output"]["kernel"]
                             + params["vad_output"]["bias"])[0]
        noise_in = jnp.concatenate([dense, h_vad_n, feats])
        h_noise_n = M._gru_step(params["noise_gru"], h_noise, noise_in)
        den_in = jnp.concatenate([h_vad_n, h_noise_n, feats])
        h_den_n = M._gru_step(params["denoise_gru"], h_den, den_in)
        gains = jax.nn.sigmoid(h_den_n @ params["denoise_output"]["kernel"]
                               + params["denoise_output"]["bias"])

        g2 = gains * gains
        exp2 = exp * exp
        rr = jnp.where(exp > gains, 1.0,
                       exp2 * (1.0 - g2) / (1e-3 + g2 * (1.0 - exp2)))
        rr = jnp.sqrt(jnp.clip(rr, 0.0, 1.0) + 1e-9) * jnp.sqrt(
            (ex + 1e-9) / (1e-8 + ep))
        spec_f = spec + (bm_i @ rr) * p_spec
        new_e = sqmag(spec_f) @ bm_e
        norm = jnp.sqrt((ex + 1e-9) / (1e-8 + new_e))
        spec_f = spec_f * (bm_i @ norm)

        gains_s = jnp.maximum(gains, 0.6 * lastg)
        spec_out = spec_f * (bm_i @ gains_s)
        spec_out = jnp.where(silence, spec, spec_out)

        sel = lambda new, old: jnp.where(silence, old, new)
        carry = (sel(new_mem, cep_mem),
                 sel(h_vad_n, h_vad), sel(h_noise_n, h_noise),
                 sel(h_den_n, h_den), sel(gains_s, lastg),
                 sel(period, prev_period), sel(pgain, prev_gain))
        return carry, (spec_out, jnp.where(silence, 0.0, vad), gains)

    carry0 = (
        jnp.zeros((M.CEPS_MEM, M.NB_BANDS)),
        jnp.zeros(cfg.vad_gru), jnp.zeros(cfg.noise_gru),
        jnp.zeros(cfg.denoise_gru), jnp.zeros(M.NB_BANDS),
        jnp.float32(300.0), jnp.float32(0.0),
    )
    _, (spec_outs, vads, gains) = jax.lax.scan(
        step, carry0, (spec_all, ex_all, silence_all, bfcc_all, pitch_bufs))

    yfr = jnp.fft.irfft(spec_outs * M.WINDOW, n=M.WINDOW, axis=-1) * win
    outs = yfr[:, :M.FRAME] + jnp.concatenate(
        [jnp.zeros((1, M.FRAME)), yfr[:-1, M.FRAME:]], axis=0)
    return outs.reshape(-1)[: x.shape[0]] / M.PCM_SCALE, vads, gains, ex_all


@pytest.mark.parametrize("seed,scale", [(0, 0.1), (3, 0.003)])
def test_restructured_engine_matches_monolithic(seed, scale):
    # scale 0.003 drives some frames under the silence gate, exercising
    # the state-freeze semantics across both scans
    rng = np.random.default_rng(seed)
    t = np.arange(M.SR) / M.SR                     # 1 s = 100 frames
    x = (scale * (np.sin(2 * np.pi * 150 * t)
                  + 0.4 * rng.standard_normal(M.SR))).astype(np.float32)
    params = M.init_params(seed=1)
    out_a, vad_a, g_a, ex_a = M.denoise_channel_full(params, jnp.asarray(x))
    out_b, vad_b, g_b, ex_b = jax.jit(_denoise_channel_monolithic)(
        params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(vad_a), np.asarray(vad_b),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_a), np.asarray(g_b), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ex_a), np.asarray(ex_b),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               atol=2e-5)


def test_segmented_scan_matches_sequential():
    """Throughput mode (segments>1, models/rnnoise/model._segment_scan):
    segment 0 must be EXACT (silence halo holds carry0 through the
    warm-up), and every later segment must converge to the sequential
    result within its 1 s warm-up (diff SNR >= 40 dB — far below any
    audible or gate-relevant level)."""
    rng = np.random.default_rng(7)
    secs = 5
    t = np.arange(M.SR * secs) / M.SR
    speech = 0.3 * np.sin(2 * np.pi * 220 * t) * (np.sin(2 * np.pi * 3 * t) > 0)
    x = (speech + 0.05 * rng.standard_normal(M.SR * secs)).astype(np.float32)
    x = x[: (len(x) // M.FRAME) * M.FRAME]
    params = M.init_params(seed=2)
    y1, v1, g1, _ = M.denoise_channel_full(params, jnp.asarray(x))
    y4, v4, g4, _ = M.denoise_channel_full(params, jnp.asarray(x), segments=4)
    y1, y4 = np.asarray(y1), np.asarray(y4)
    f = np.asarray(v1).shape[0]
    seg_len = -(-f // 4)
    # segment 0 bit-identical (its halo is pure silence frames)
    n0 = seg_len * M.FRAME
    np.testing.assert_allclose(y4[:n0], y1[:n0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(v4)[:seg_len],
                               np.asarray(v1)[:seg_len], atol=1e-6)
    # later segments: warm-up approximation stays inaudibly small
    err = np.mean(np.square(y4[n0:] - y1[n0:]))
    sig = np.mean(np.square(y1[n0:])) + 1e-20
    assert 10 * np.log10(sig / (err + 1e-20)) >= 40.0
    assert np.max(np.abs(np.asarray(v4) - np.asarray(v1))) < 0.05
