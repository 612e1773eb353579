"""Native C++ wavcodec + wavio fallback-chain tests."""
import numpy as np
import pytest

from egregora_tpu.utils import native, wavio


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("g++/toolchain unavailable; native codec not built")
    return lib


def _sig(ch=2, n=12345, seed=0):
    rng = np.random.default_rng(seed)
    return np.clip(rng.standard_normal((ch, n)).astype(np.float32) * 0.3, -1, 1)


def test_native_roundtrip_pcm16(lib, tmp_path):
    x = _sig()
    p = tmp_path / "a.wav"
    native.write_wav(p, x, 48000, bits=16)
    y, sr = native.read_wav(p)
    assert sr == 48000 and y.shape == x.shape
    np.testing.assert_allclose(y, x, atol=1.0 / 16000)


def test_native_roundtrip_float32(lib, tmp_path):
    x = _sig(1, 999)
    p = tmp_path / "f.wav"
    native.write_wav(p, x, 44100, bits=32)
    y, sr = native.read_wav(p)
    assert sr == 44100
    np.testing.assert_allclose(y, x, atol=1e-7)


def test_native_matches_stdlib_decoder(lib, tmp_path):
    """Cross-check the C++ decoder against the stdlib wave module."""
    import wave
    x = _sig(2, 4001, seed=3)
    p = tmp_path / "s.wav"
    pcm = (np.clip(x.T, -1, 1) * 32767.0).astype("<i2")
    with wave.open(str(p), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())
    y, sr = native.read_wav(p)
    assert sr == 16000
    np.testing.assert_allclose(y, pcm.T.astype(np.float32) / 32768.0, atol=1e-6)


def test_native_error_reporting(lib, tmp_path):
    with pytest.raises(RuntimeError, match="wavcodec read failed"):
        native.read_wav(tmp_path / "missing.wav")
    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"not a wav file at all")
    with pytest.raises(RuntimeError):
        native.read_wav(bad)


def test_batch_decode(lib, tmp_path):
    paths = []
    sigs = []
    for i in range(6):
        x = _sig(1, 2000 + i, seed=i)
        p = tmp_path / f"b{i}.wav"
        native.write_wav(p, x, 24000)
        paths.append(str(p))
        sigs.append(x)
    paths.append(str(tmp_path / "nope.wav"))  # one failure
    out = native.read_wav_batch(paths, n_threads=3)
    assert out[-1] is None
    for i in range(6):
        y, sr = out[i]
        assert sr == 24000
        np.testing.assert_allclose(y, sigs[i], atol=1.0 / 16000)


def test_wavio_prefers_native(lib, tmp_path):
    x = _sig(2, 5000)
    p = tmp_path / "w.wav"
    wavio.write_audio(p, x, 48000)
    y, sr = wavio.read_audio(p)
    assert sr == 48000
    np.testing.assert_allclose(y, x, atol=1.0 / 16000)


def test_native_flac_roundtrip(lib, tmp_path):
    """Native FLAC encode (fixed predictors + rice) -> decode roundtrip
    at 16-bit quantization accuracy, through the wavio front door."""
    import numpy as np
    from egregora_tpu.utils.wavio import read_audio, write_audio

    rng = np.random.default_rng(3)
    t = np.arange(48000) / 48000.0
    x = np.stack([
        0.5 * np.sin(2 * np.pi * 440 * t),
        0.2 * np.sin(2 * np.pi * 220 * t) + 0.02 * rng.standard_normal(len(t)),
    ]).astype(np.float32)
    p = tmp_path / "clip.flac"
    write_audio(p, x, 48000)
    assert p.stat().st_size < x.nbytes / 2   # actually compressed
    y, sr = read_audio(p)
    assert sr == 48000 and y.shape == x.shape
    assert np.abs(y - x).max() < 1e-3        # 16-bit quantization bound


def test_native_flac_lpc_exact_and_compresses(lib, tmp_path):
    """The order-8 LPC subframe path: tonal content must (a) decode
    BIT-EXACTLY (flac is lossless at the int16 level; reference
    convention is lround(x*32768) clamped, symmetric with the reader's
    1/32768) and (b) compress far below what fixed predictors reach
    (~0.17 vs ~0.5 on a two-tone)."""
    import numpy as np
    from egregora_tpu.utils.native import read_flac, write_flac

    t = np.arange(48000 * 2) / 48000.0
    x = (0.5 * np.sin(2 * np.pi * 441.3 * t)
         + 0.2 * np.sin(2 * np.pi * 927.7 * t)).astype(np.float32)[None]
    p = tmp_path / "tonal.flac"
    write_flac(str(p), x, 48000)
    assert p.stat().st_size < 0.25 * x.size * 2   # LPC-level compression
    y, sr = read_flac(str(p))
    v = x.astype(np.float64) * 32768.0
    q = np.clip(np.trunc(v + np.copysign(0.5, v)), -32768, 32767) / 32768
    assert np.array_equal(y, q.astype(np.float32))
    # constant subframes: silence is near-free and exact
    z = np.zeros((1, 48000), np.float32)
    pz = tmp_path / "zero.flac"
    write_flac(str(pz), z, 48000)
    assert pz.stat().st_size < 2000
    yz, _ = read_flac(str(pz))
    assert np.array_equal(yz, z)


def test_native_flac_stereo_decorrelation_exact(lib, tmp_path):
    """Stereo frames price all four channel assignments (independent /
    left-side / right-side / mid-side) and must stay bit-exact through
    every reconstruction path; correlated channels must compress
    better than independent coding of the same content."""
    import numpy as np
    from egregora_tpu.utils.native import read_flac, write_flac

    rng = np.random.default_rng(5)
    t = np.arange(48000 * 2) / 48000.0
    base = 0.4 * np.sin(2 * np.pi * 220.7 * t) + 0.03 * rng.standard_normal(len(t))

    def q(x):
        v = x.astype(np.float64) * 32768.0
        return (np.clip(np.trunc(v + np.copysign(0.5, v)), -32768, 32767)
                / 32768).astype(np.float32)

    cases = {
        "corr": np.stack([base, base + 0.005 * rng.standard_normal(len(t))]),
        "panned": np.stack([base, 0.01 * rng.standard_normal(len(t))]),
        "indep": rng.standard_normal((2, len(t))) * 0.3,
    }
    sizes = {}
    for name, x in cases.items():
        x = x.clip(-1, 1).astype(np.float32)
        p = tmp_path / f"{name}.flac"
        write_flac(str(p), x, 48000)
        y, sr = read_flac(str(p))
        assert sr == 48000
        assert np.array_equal(y, q(x)), name
        sizes[name] = p.stat().st_size
    # the near-duplicate channel pair must beat independent coding
    # (2x the mono cost); the saving is bounded by the side channel's
    # own noise entropy, not zero, so assert < 1.9x
    pm = tmp_path / "mono.flac"
    write_flac(str(pm), cases["corr"][:1].clip(-1, 1).astype(np.float32),
               48000)
    assert sizes["corr"] < 1.9 * pm.stat().st_size


def test_native_flac_mono_and_short(lib, tmp_path):
    import numpy as np
    from egregora_tpu.utils.native import read_flac, write_flac

    x = (0.1 * np.sin(np.arange(1000) * 0.05)).astype(np.float32)[None]
    write_flac(str(tmp_path / "m.flac"), x, 16000)   # sub-blocksize tail frame
    y, sr = read_flac(str(tmp_path / "m.flac"))
    assert sr == 16000 and y.shape == (1, 1000)
    assert np.abs(y - x).max() < 1e-3


def test_native_flac_malformed_inputs_error_cleanly(lib, tmp_path):
    """Crafted corrupt FLAC files must raise RuntimeError, never crash:
    (a) a metadata block whose declared length runs past EOF (was a
    heap overread), (b) an LPC subframe whose order exceeds the frame
    blocksize (was a heap overflow write into the sample vector)."""
    import numpy as np
    from egregora_tpu.utils.native import read_flac
    import pytest

    # (a) metadata block claims 100 bytes, file ends after 50
    trunc = tmp_path / "trunc.flac"
    trunc.write_bytes(b"fLaC" + bytes([0x80, 0, 0, 100]) + b"\x00" * 42)
    with pytest.raises(RuntimeError):
        read_flac(str(trunc))

    # (b) valid STREAMINFO (48 kHz mono 16-bit), then a frame with
    # blocksize 1 carrying an LPC subframe of order 32
    info = bytearray(34)
    info[0:2] = (4096).to_bytes(2, "big")      # min blocksize
    info[2:4] = (4096).to_bytes(2, "big")      # max blocksize
    info[10] = 48000 >> 12
    info[11] = (48000 >> 4) & 0xFF
    info[12] = ((48000 & 0xF) << 4) | (0 << 1) | 0   # nch=1, bps hi bit
    info[13] = 0xF0                                   # bps=16, total hi=0
    frame = bytes([
        0xFF, 0xF8,        # sync + reserved + fixed blocking
        0x60,              # bs_code=6 (8-bit blocksize follows), sr_code=0
        0x00,              # ch_asgn=0 (mono), ss_code=0, reserved
        0x00,              # UTF-8 frame number 0
        0x00,              # blocksize-1 = 0 -> blocksize 1
        0x00,              # header CRC-8 (unchecked)
        0x7E,              # subframe: pad 0, type 0b111111 (LPC order 32)
    ]) + b"\x00" * 8       # a few bytes of "warmup", then EOF
    bad = tmp_path / "order.flac"
    bad.write_bytes(b"fLaC" + bytes([0x80, 0, 0, 34]) + bytes(info) + frame)
    with pytest.raises(RuntimeError, match="order|truncated|residual"):
        read_flac(str(bad))

    # (c) reserved channel-assignment code 11 is rejected, not decoded
    # as independent stereo
    frame_ca = bytes([0xFF, 0xF8, 0x60, 0xB0, 0x00, 0x00, 0x00]) + b"\x00" * 8
    badca = tmp_path / "chasgn.flac"
    badca.write_bytes(b"fLaC" + bytes([0x80, 0, 0, 34]) + bytes(info)
                      + frame_ca)
    with pytest.raises(RuntimeError, match="channel|reserved"):
        read_flac(str(badca))


def test_native_flac_tiny_noise_block_bounded(lib, tmp_path):
    """A tail block too short for the LPC candidate (<= 16 samples)
    still takes the VERBATIM escape when rice coding would exceed raw
    size — the early-return paths used to skip that bound."""
    import numpy as np
    from egregora_tpu.utils.native import read_flac, write_flac

    rng = np.random.default_rng(11)
    x = rng.uniform(-1, 1, size=(1, 10)).astype(np.float32)
    p = tmp_path / "tiny.flac"
    write_flac(str(p), x, 48000)
    # headers: 4 magic + 38 STREAMINFO + ~8 frame header/CRC; raw
    # payload is 10*2 bytes + subframe header — anything near raw+headers
    # passes; a rice blowup (~2x raw) fails
    assert p.stat().st_size <= 4 + 38 + 16 + 24
    y, sr = read_flac(str(p))
    q = np.clip(np.round(x * 32768.0), -32768, 32767) / 32768.0
    assert np.array_equal(y, q.astype(np.float32))


def test_native_flac_bytefuzz_never_crashes(lib, tmp_path):
    """Seeded byte-flip fuzz over a real encoded stream: every mutant
    must either decode (possibly to garbage samples) or raise
    RuntimeError through the ctypes error channel — never crash the
    process or return out-of-range shapes.  Exercises the bounds added
    for metadata length, subframe order, reserved channel assignments,
    and rice-partition reads."""
    from egregora_tpu.utils.native import read_flac, write_flac

    rng = np.random.default_rng(2026)
    x = np.clip(rng.standard_normal((2, 4000)).astype(np.float32) * 0.4,
                -1, 1)
    # mix in a tonal half so the encoder emits LPC + rice partitions,
    # not just verbatim escapes
    t = np.arange(4000) / 48000.0
    x[0, :] = 0.5 * np.sin(2 * np.pi * 440 * t).astype(np.float32)
    p = tmp_path / "seed.flac"
    write_flac(str(p), x, 48000)
    blob = bytearray(p.read_bytes())

    def assert_sane(y):
        # the actual safety invariant: a mutated stream may decode to
        # garbage-but-valid audio (e.g. a flipped blocksize code yields
        # frames up to the FLAC max of 65535 samples), so bound shapes
        # by the format's limits, not by the original payload size
        assert y.ndim == 2 and 1 <= y.shape[0] <= 8
        n_frames = 1 + x.shape[1] // 4096  # encoder block size is 4096
        assert 0 <= y.shape[1] <= n_frames * 65535

    mut = tmp_path / "mut.flac"
    for trial in range(150):
        b = bytearray(blob)
        for _ in range(int(rng.integers(1, 9))):
            b[int(rng.integers(4, len(b)))] ^= int(rng.integers(1, 256))
        mut.write_bytes(bytes(b))
        try:
            y, sr = read_flac(str(mut))
        except RuntimeError:
            continue
        assert_sane(y)

    # truncation sweep: every prefix length must error or decode cleanly
    for n in range(4, len(blob), max(1, len(blob) // 64)):
        mut.write_bytes(bytes(blob[:n]))
        try:
            y, sr = read_flac(str(mut))
        except RuntimeError:
            continue
        assert_sane(y)
