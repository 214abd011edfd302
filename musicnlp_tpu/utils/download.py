"""Artifact fetching: converted corpora, processed datasets, tokenizers.

Reference counterpart: ``musicnlp/chore/download.py:21-49`` -- hard-coded
gdown Google-Drive fetchers run from a ``__main__`` block (skip-if-exists
download + unzip into the path registry's dirs).  Rebuilt here as a
declarative artifact registry over a stdlib ``urllib`` fetcher:

- ``ARTIFACTS`` mirrors the reference's inventory (per-backend converted
  corpora incl. the 3-way LMD/MuseScore split, full/melody processed
  datasets, the trained tokenizer bundle) with the same public Drive ids.
- ``fetch``/``fetch_and_extract`` are egress-gated: any network failure
  raises ``EgressUnavailable`` with a clear message instead of a raw
  urllib traceback (this build environment has zero egress, and HPC TPU
  workers commonly do too).  ``file://`` URLs go through the exact same
  fetch -> checksum -> atomic-rename -> extract path, so the component is
  fully testable offline (tests/test_download.py).
- Downloads are atomic (``.tmp`` + rename, matching utils/checkpoint.py)
  and resumable by skip-if-exists, like the reference's
  ``download_n_unzip``; optional sha256 pinning is first-party (the
  reference verifies nothing).
"""
from __future__ import annotations

import hashlib
import os
import shutil
import urllib.error
import urllib.parse
import urllib.request
import zipfile
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

from .config import PathRegistry

__all__ = [
    'Artifact', 'ARTIFACTS', 'EgressUnavailable', 'gdrive_url',
    'fetch', 'fetch_and_extract', 'download_artifact', 'list_artifacts',
]


class EgressUnavailable(RuntimeError):
    """Raised when an artifact URL cannot be reached (no network egress)."""


def gdrive_url(file_id: str) -> str:
    """Direct-download URL for a public Google Drive file id.

    The reference stores ``https://drive.google.com/uc?id=<id>`` and lets
    gdown handle the large-file confirmation page; plain urllib gets the
    same bytes from the ``uc?export=download&confirm=t`` form for files
    shared as anyone-with-link.
    """
    return ('https://drive.google.com/uc?export=download&confirm=t'
            f'&id={file_id}')


@dataclass(frozen=True)
class Artifact:
    """One downloadable bundle: n part URLs -> one extraction dir."""
    name: str                       # registry key, e.g. 'converted/POP909-MS'
    urls: Tuple[str, ...]           # 1+ zip parts, fetched in order
    kind: str                       # 'converted' | 'hf' | 'tokenizer'
    subdir: str = ''                # extraction subdir under the kind dir
    sha256: Tuple[Optional[str], ...] = ()   # optional per-part pins
    note: str = ''

    def dest_dir(self, paths: PathRegistry) -> str:
        base = {
            'converted': os.path.join(paths.dataset_path, 'converted'),
            'hf': os.path.join(paths.dataset_path, 'processed', 'hf'),
            'tokenizer': paths.tokenizer_path,
        }[self.kind]
        return os.path.join(base, self.subdir) if self.subdir else base


def _art(name, kind, ids, subdir='', note=''):
    return Artifact(name=name, kind=kind, subdir=subdir, note=note,
                    urls=tuple(gdrive_url(i) for i in ids))


#: The reference's shipped-artifact inventory (chore/download.py:21-49):
#: converted (MuseScore / Logic Pro rendered) corpora, extracted+processed
#: HF-layout datasets per extraction mode, and the trained tokenizer bundle.
ARTIFACTS: Dict[str, Artifact] = {a.name: a for a in [
    _art('converted/LMD-all', 'converted',
         ['1CyfKiVX83YdS4p7_4npk2xbDVJ68L0tg'],
         note='MuseScore+Logic Pro renders, one bundle (UMich mirror)'),
    _art('converted/LMD-MS', 'converted',
         ['1-ISc2u6Sxvs3LES4byx0KcNGGVYDZnxV',
          '1-QuDFxv9chnSJPNVwOG--p2ZpGx403qu',
          '1gX7nrT--MjLsdHuUQ58O8RHTgCFD9Gk7'],
         subdir='LMD, MS', note='3-way split (Drive quota)'),
    _art('converted/LMD-LP', 'converted',
         ['1arBNznnWo3EFw4e0NdHi4Hih37Qex7Hl']),
    _art('converted/MAESTRO-MS', 'converted',
         ['1fzmfS65BN84O_bF1v8dN2uFlrrpOzYaZ']),
    _art('converted/POP909-MS', 'converted',
         ['1XobTD6x88PIEKfrZ6IAzXjMaZmBZ0XqR']),
    _art('hf/full-LMD', 'hf', ['16qDj2SJ8CoT4Tqacc3OZfsVZ6_6CDs1s']),
    _art('hf/full-MAESTRO', 'hf', ['1UaXtvqloFojNc1RnZ8ZqqqeKuSAbCjOC']),
    _art('hf/full-POP909', 'hf', ['1dSxBi8Z1If-HuiHP9eWaRQAjYiRUPgnN']),
    _art('hf/melody-LMD', 'hf', ['1l5v_KN3-d-i7lP0Xo-Ifj1ZEJbYCwUbO']),
    _art('hf/melody-MAESTRO', 'hf', ['1oiujQaeMUnd2-PmO7KIIsppVRo_eZtXz']),
    _art('hf/melody-POP909', 'hf', ['1F07h0JGTSYZSpzrGm9wP1pA2tB-6phsL']),
    _art('tokenizer/full-all', 'tokenizer',
         ['1rbQccozpAMjRWkjtKConka_DkCusxZsF'],
         note='trained WordPiece bundle'),
]}


def fetch(url: str, out_path: str, *, sha256: Optional[str] = None,
          force: bool = False, timeout: float = 60.0,
          chunk_bytes: int = 1 << 20) -> str:
    """Fetch ``url`` to ``out_path`` (atomic tmp+rename; skip if exists).

    Any unreachable URL -- DNS failure, refused connection, missing
    ``file://`` source, HTTP error -- raises ``EgressUnavailable``.
    """
    if os.path.exists(out_path) and not force:
        if sha256:
            _verify(out_path, sha256)
        return out_path
    os.makedirs(os.path.dirname(out_path) or '.', exist_ok=True)
    tmp = out_path + '.tmp'
    try:
        with urllib.request.urlopen(url, timeout=timeout) as r, \
                open(tmp, 'wb') as f:
            shutil.copyfileobj(r, f, chunk_bytes)
    except (urllib.error.URLError, OSError, ValueError) as e:
        if os.path.exists(tmp):
            os.remove(tmp)
        raise EgressUnavailable(
            f'cannot fetch {url!r}: {e}. This environment may have no '
            f'network egress; place the file at {out_path!r} manually '
            f'(or pass a file:// URL) and re-run.') from e
    if sha256:
        try:
            _verify(tmp, sha256)
        except Exception:
            os.remove(tmp)
            raise
    os.replace(tmp, out_path)
    return out_path


def _verify(path: str, want: str) -> None:
    h = hashlib.sha256()
    with open(path, 'rb') as f:
        for blk in iter(lambda: f.read(1 << 20), b''):
            h.update(blk)
    got = h.hexdigest()
    if got != want:
        raise ValueError(f'sha256 mismatch for {path}: got {got}, '
                         f'expected {want}')


def fetch_and_extract(url: str, zip_path: str, extract_dir: str = None, *,
                      sha256: Optional[str] = None,
                      force: bool = False) -> str:
    """The reference's ``download_n_unzip``: fetch a zip, extract next to it."""
    fetch(url, zip_path, sha256=sha256, force=force)
    ext = extract_dir or os.path.dirname(zip_path)
    os.makedirs(ext, exist_ok=True)
    with zipfile.ZipFile(zip_path) as zf:
        zf.extractall(ext)
    return ext


def download_artifact(name: str, *, paths: PathRegistry = None,
                      registry: Dict[str, Artifact] = None,
                      force: bool = False) -> str:
    """Fetch + extract every part of a registered artifact; returns the
    extraction dir.  Multi-part artifacts (LMD-MS) land in one dir, the
    reference's split handling."""
    registry = ARTIFACTS if registry is None else registry
    if name not in registry:
        known = ', '.join(sorted(registry))
        raise KeyError(f'unknown artifact {name!r}; known: {known}')
    art = registry[name]
    paths = paths or PathRegistry()
    dest = art.dest_dir(paths)
    safe = art.name.replace('/', '_')
    for i, url in enumerate(art.urls):
        part = f'{safe}_part{i + 1}.zip' if len(art.urls) > 1 else f'{safe}.zip'
        sha = art.sha256[i] if i < len(art.sha256) else None
        fetch_and_extract(url, os.path.join(dest, part), dest,
                          sha256=sha, force=force)
    return dest


def list_artifacts(registry: Dict[str, Artifact] = None) -> str:
    registry = ARTIFACTS if registry is None else registry
    lines = []
    for name in sorted(registry):
        a = registry[name]
        parts = f'{len(a.urls)} parts' if len(a.urls) > 1 else '1 part'
        note = f'  ({a.note})' if a.note else ''
        lines.append(f'{name:28s} [{a.kind}] {parts}{note}')
    return '\n'.join(lines)
