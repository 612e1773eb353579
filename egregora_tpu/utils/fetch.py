"""Weight/asset fetch chain — the reference's download bootstrap, rebuilt.

The reference auto-downloads its FlashSR weights from the HF dataset
with an hf_hub -> streaming-HTTP fallback honoring
``EGREGORA_FLASHSR_HF_REPO`` (``egregora_audio_super_resolution.py:
282-317``, ``install.py:64-101``) and marks completed fetches with an
idempotence file (``.egregora_repo_ok``, sr node :43-53).  This module
is the framework's one download layer:

* ``download`` — streaming HTTP with Range resume, optional sha256
  verification, atomic ``.part`` -> final rename.
* ``fetch_flashsr_weights`` — the three reference checkpoints into the
  weight store, hf_hub library first (when installed), plain HTTP
  stream second, with the reference's env override and idempotence
  marker.

Network failures NEVER raise out of the resolver path: callers get the
file list that is still missing and fall back to shipped distilled
weights (the same graceful-degradation contract the reference's
``try_fetch_weights`` prints, install.py:78-101).  Tested against a
local HTTP server fixture (tests/test_fetch.py) — this environment has
zero egress, so no live URL is ever contacted by the test suite.
"""
from __future__ import annotations

import hashlib
import os
import sys
import urllib.error
import urllib.request
from pathlib import Path
from typing import Dict, Optional, Sequence, Tuple

HF_DATASET = "jakeoneijk/FlashSR_weights"          # reference :260
FLASHSR_FILES = ("student_ldm.pth", "sr_vocoder.pth", "vae.pth")
MARKER = ".egregora_weights_ok"                    # reference :43-53 analog

_CHUNK = 1 << 20


class ChecksumError(ValueError):
    """Downloaded bytes do not match the expected sha256."""


def _sha256(path: Path) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while chunk := f.read(_CHUNK):
            h.update(chunk)
    return h.hexdigest()


def download(url: str, dest: Path, *, sha256: Optional[str] = None,
             resume: bool = True, timeout: float = 30.0,
             progress: bool = False) -> Path:
    """Stream ``url`` to ``dest`` atomically.

    * Partial transfers land in ``dest.part``; an interrupted download
      resumes with an HTTP Range request when ``resume`` (servers that
      ignore Range get a clean restart — detected via the 200-vs-206
      status, so bytes are never double-appended).
    * ``sha256`` (hex) verifies the finished file before the rename;
      mismatch deletes the artifact and raises ``ChecksumError`` — a
      truncated or corrupted fetch can never be mistaken for weights.
    * Re-downloading an existing, checksum-valid ``dest`` is a no-op.
    """
    dest = Path(dest)
    if dest.exists():
        if sha256 is None or _sha256(dest) == sha256.lower():
            return dest
        dest.unlink()                        # stale/corrupt: refetch
    dest.parent.mkdir(parents=True, exist_ok=True)
    part = dest.with_suffix(dest.suffix + ".part")

    offset = part.stat().st_size if (resume and part.exists()) else 0
    req = urllib.request.Request(url)
    if offset:
        req.add_header("Range", f"bytes={offset}-")
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        status = getattr(resp, "status", 200)
        mode = "ab" if (offset and status == 206) else "wb"
        done = offset if mode == "ab" else 0
        with open(part, mode) as f:
            while chunk := resp.read(_CHUNK):
                f.write(chunk)
                done += len(chunk)
                if progress:
                    # stderr: callers like bench.py reserve stdout for
                    # machine-readable JSON lines
                    print(f"\r[egregora_tpu] {dest.name}: {done / 1e6:.1f} MB",
                          end="", flush=True, file=sys.stderr)
    if progress:
        print(flush=True, file=sys.stderr)
    if sha256 is not None and _sha256(part) != sha256.lower():
        part.unlink()
        raise ChecksumError(
            f"{dest.name}: sha256 mismatch after download from {url} — "
            "refusing to install corrupt weights")
    part.replace(dest)
    return dest


def flashsr_weight_urls(repo: Optional[str] = None) -> Dict[str, str]:
    """Filename -> URL map for the three reference checkpoints.

    ``EGREGORA_FLASHSR_HF_REPO`` overrides the dataset repo exactly like
    the reference (install.py:81); a full ``http(s)://`` base URL is
    also accepted there, enabling mirrors (and the local test fixture).
    """
    repo = repo or os.environ.get("EGREGORA_FLASHSR_HF_REPO", HF_DATASET)
    if repo.startswith(("http://", "https://")):
        base = repo.rstrip("/")
        return {f: f"{base}/{f}" for f in FLASHSR_FILES}
    return {f: f"https://huggingface.co/datasets/{repo}/resolve/main/{f}"
            for f in FLASHSR_FILES}


def _try_hf_hub(repo: str, fname: str, dest_dir: Path) -> Optional[Path]:
    """hf_hub download path (first choice when the library is present,
    reference :286-300); None on any failure -> caller streams HTTP."""
    try:
        from huggingface_hub import hf_hub_download  # optional dep
    except Exception:
        return None
    try:
        p = hf_hub_download(repo_id=repo, filename=fname,
                            repo_type="dataset", local_dir=str(dest_dir))
        return Path(p)
    except Exception:
        return None


def fetch_flashsr_weights(ckpt_dir: Optional[Path] = None,
                          checksums: Optional[Dict[str, str]] = None,
                          timeout: float = 30.0,
                          use_hf: bool = True) -> Tuple[str, ...]:
    """Ensure the three FlashSR checkpoints exist in the weight store.

    Returns the tuple of filenames STILL missing afterwards (empty on
    full success) — never raises on network failure, matching the
    reference's degrade-and-instruct behavior (install.py:93-101).
    An ``.egregora_weights_ok`` marker makes repeat calls free.
    """
    from .weights import flashsr_ckpt_dir

    d = Path(ckpt_dir) if ckpt_dir else flashsr_ckpt_dir()
    marker = d / MARKER
    missing = tuple(f for f in FLASHSR_FILES if not (d / f).exists())
    if not missing:
        marker.touch()
        return ()
    if marker.exists():                     # fetched before; user removed files
        marker.unlink()

    repo = os.environ.get("EGREGORA_FLASHSR_HF_REPO", HF_DATASET)
    urls = flashsr_weight_urls(repo)
    still = []
    for fname in missing:
        got = None
        if use_hf and not repo.startswith(("http://", "https://")):
            got = _try_hf_hub(repo, fname, d)
        if got is None:
            try:
                got = download(urls[fname], d / fname,
                               sha256=(checksums or {}).get(fname),
                               timeout=timeout)
            except ChecksumError:
                raise                       # corrupt bytes are a hard error
            except Exception as e:          # offline / 404 / DNS: degrade
                print(f"[egregora_tpu] fetch {fname} failed "
                      f"({type(e).__name__}: {e}); place it manually in {d} "
                      f"(source: HF dataset {repo})", file=sys.stderr)
                still.append(fname)
                continue
    if not still:
        marker.touch()
    return tuple(still)


_AUTO_TRIED: set = set()


def auto_fetch_flashsr(ckpt_dir: Optional[Path] = None) -> bool:
    """First-use fetch hook for the weight resolver (the reference
    downloads at runner init, sr node :282-317).  Attempts AT MOST once
    per directory per process with a short timeout, honors
    ``EGREGORA_TPU_OFFLINE=1`` (set by the test suite and hermetic
    deployments), and returns True iff the trio is complete afterwards.
    """
    from .weights import flashsr_ckpt_dir, missing_flashsr_files

    d = Path(ckpt_dir) if ckpt_dir else flashsr_ckpt_dir()
    if not missing_flashsr_files(d):
        return True
    if os.environ.get("EGREGORA_TPU_OFFLINE") or str(d) in _AUTO_TRIED:
        return False
    _AUTO_TRIED.add(str(d))
    # direct HTTP only on the first-use path: hf_hub's internal retry
    # backoff costs ~25 s/file of log spam in offline environments,
    # while urllib's DNS failure is immediate.  install.py's explicit
    # bootstrap keeps the hf_hub-first chain (reference :286-300).
    return not fetch_flashsr_weights(d, timeout=5.0, use_hf=False)
