"""Weight-fetch chain against a LOCAL HTTP fixture (VERDICT r3 next #4).

The reference downloads its checkpoints from GitHub/HF with fallback
chains (``egregora_audio_super_resolution.py:37-113, 282-317``,
``install.py:64-101``).  This environment has zero egress, so the fetch
layer is exercised against an in-process http.server with Range
support: success, resume of an interrupted transfer, checksum mismatch,
idempotence marker, and offline fallback to shipped weights.
"""
import hashlib
import threading
from functools import partial
from http.server import HTTPServer, SimpleHTTPRequestHandler
from pathlib import Path

import numpy as np
import pytest

from egregora_tpu.utils.fetch import (ChecksumError, auto_fetch_flashsr,
                                      download, fetch_flashsr_weights,
                                      flashsr_weight_urls)


class _RangeHandler(SimpleHTTPRequestHandler):
    """SimpleHTTPRequestHandler + minimal HTTP Range (resume) support."""

    def log_message(self, *a):          # quiet
        pass

    def send_head(self):
        rng = self.headers.get("Range")
        if not rng or not rng.startswith("bytes="):
            return super().send_head()
        path = Path(self.translate_path(self.path))
        if not path.is_file():
            self.send_error(404)
            return None
        data = path.read_bytes()
        start = int(rng.split("=")[1].split("-")[0])
        self.send_response(206)
        self.send_header("Content-Type", "application/octet-stream")
        self.send_header("Content-Range", f"bytes {start}-{len(data)-1}/{len(data)}")
        self.send_header("Content-Length", str(len(data) - start))
        self.end_headers()
        import io
        return io.BytesIO(data[start:])


@pytest.fixture()
def http_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("srv")
    handler = partial(_RangeHandler, directory=str(root))
    srv = HTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield root, f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _put(root: Path, name: str, size: int = 40000, seed: int = 0) -> bytes:
    data = np.random.default_rng(seed).integers(0, 256, size, dtype=np.uint8).tobytes()
    (root / name).write_bytes(data)
    return data


def test_download_success_and_checksum(http_root, tmp_path):
    root, base = http_root
    data = _put(root, "w.bin")
    dest = tmp_path / "w.bin"
    sha = hashlib.sha256(data).hexdigest()
    out = download(f"{base}/w.bin", dest, sha256=sha)
    assert out.read_bytes() == data
    # idempotent: re-download of a checksum-valid file is a no-op
    (root / "w.bin").write_bytes(b"changed on server")
    assert download(f"{base}/w.bin", dest, sha256=sha).read_bytes() == data


def test_download_checksum_mismatch_rejects(http_root, tmp_path):
    root, base = http_root
    _put(root, "bad.bin")
    dest = tmp_path / "bad.bin"
    with pytest.raises(ChecksumError):
        download(f"{base}/bad.bin", dest, sha256="0" * 64)
    assert not dest.exists()            # corrupt artifact removed
    assert not dest.with_suffix(".bin.part").exists()


def test_download_resumes_partial(http_root, tmp_path):
    """A leftover .part file resumes via Range instead of refetching."""
    root, base = http_root
    data = _put(root, "big.bin", size=100_000)
    dest = tmp_path / "big.bin"
    part = tmp_path / "big.bin.part"
    part.write_bytes(data[:37_000])     # interrupted transfer
    out = download(f"{base}/big.bin", dest,
                   sha256=hashlib.sha256(data).hexdigest())
    assert out.read_bytes() == data
    assert not part.exists()


def test_fetch_flashsr_trio_and_marker(http_root, tmp_path, monkeypatch):
    """Full trio fetch honoring the reference's env override; marker
    makes the second call free; missing file on the server degrades to
    a missing-list, never an exception."""
    from egregora_tpu.utils.fetch import FLASHSR_FILES, MARKER

    root, base = http_root
    monkeypatch.setenv("EGREGORA_FLASHSR_HF_REPO", base)
    urls = flashsr_weight_urls()
    assert urls["vae.pth"] == f"{base}/vae.pth"

    for i, f in enumerate(FLASHSR_FILES[:2]):
        _put(root, f, seed=i)
    missing = fetch_flashsr_weights(ckpt_dir=tmp_path, timeout=5)
    assert missing == ("vae.pth",)      # degraded, not raised
    assert not (tmp_path / MARKER).exists()

    _put(root, "vae.pth", seed=9)
    assert fetch_flashsr_weights(ckpt_dir=tmp_path, timeout=5) == ()
    assert (tmp_path / MARKER).exists()
    # marker short-circuits (delete server files to prove no refetch)
    for f in FLASHSR_FILES:
        (root / f).unlink()
    assert fetch_flashsr_weights(ckpt_dir=tmp_path, timeout=5) == ()


def test_offline_resolver_falls_back_to_shipped(tmp_path, monkeypatch):
    """With no network (conftest sets EGREGORA_TPU_OFFLINE=1) and no
    checkpoints, resolve_flashsr still serves the shipped distilled
    weights — the reference's degrade-and-instruct contract."""
    from egregora_tpu.models.flashsr.distill import PRETRAINED, resolve_flashsr

    monkeypatch.setenv("EGREGORA_TPU_WEIGHTS", str(tmp_path))
    assert not auto_fetch_flashsr(tmp_path / "flashsr")
    if PRETRAINED.exists():
        cfg, params, source = resolve_flashsr()
        assert source in ("distilled", "distilled-istft")


def test_auto_fetch_attempts_once_per_process(http_root, tmp_path, monkeypatch):
    """auto_fetch honors the offline env, fetches when pointed at the
    fixture, and memoizes failed directories."""
    from egregora_tpu.utils import fetch as fmod

    root, base = http_root
    monkeypatch.setenv("EGREGORA_FLASHSR_HF_REPO", base)
    monkeypatch.delenv("EGREGORA_TPU_OFFLINE", raising=False)
    for i, f in enumerate(fmod.FLASHSR_FILES):
        _put(root, f, seed=i)
    d = tmp_path / "a"
    assert auto_fetch_flashsr(d) is True
    assert all((d / f).exists() for f in fmod.FLASHSR_FILES)

    # empty server dir -> failure memoized: second call doesn't retry
    for f in fmod.FLASHSR_FILES:
        (root / f).unlink()
    d2 = tmp_path / "b"
    assert auto_fetch_flashsr(d2) is False
    calls = []
    monkeypatch.setattr(fmod, "fetch_flashsr_weights",
                        lambda *a, **k: calls.append(1) or ("x",))
    assert auto_fetch_flashsr(d2) is False
    assert calls == []                  # memoized, no second attempt


# ---------------- installer dependency-ensure analog ----------------

def test_install_ensure_no_deps_chain(monkeypatch):
    """The reference's _ensure semantics (install.py:35-61, 117-119):
    importable module -> no pip call; missing module with
    try_no_deps -> pip install --no-deps first, plain install second;
    install=False never shells out."""
    import sys as _sys

    sys_path = str(Path(__file__).resolve().parents[1])
    if sys_path not in _sys.path:
        _sys.path.insert(0, sys_path)
    import install as inst

    calls = []

    def runner(args):
        calls.append(args)
        return 0

    # importable: no pip call
    assert inst._ensure("json", "json", install=True, runner=runner)
    assert calls == []

    # missing, check-only: no pip call, returns False
    assert not inst._ensure("definitely_not_a_module_xyz", "pkg-xyz",
                            install=False, runner=runner)
    assert calls == []

    # missing, install + try_no_deps: --no-deps attempt then plain
    assert not inst._ensure("definitely_not_a_module_xyz", "pkg-xyz",
                            try_no_deps=True, install=True, runner=runner)
    assert len(calls) == 2
    assert calls[0][-2:] == ["--no-deps", "pkg-xyz"]
    assert calls[1][-1] == "pkg-xyz" and "--no-deps" not in calls[1]
