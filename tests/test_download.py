"""Artifact download registry (utils/download.py; reference
chore/download.py:21-49).  Exercised fully offline through file:// URLs --
the same fetch -> checksum -> atomic rename -> unzip path real URLs take.
"""
import hashlib
import os
import pathlib
import urllib.parse
import zipfile

import pytest

from musicnlp_tpu.utils.config import PathRegistry
from musicnlp_tpu.utils.download import (
    ARTIFACTS, Artifact, EgressUnavailable, _gdrive_confirm_url,
    download_artifact, fetch, fetch_and_extract, gdrive_url,
    list_artifacts,
)


def _make_zip(path, members):
    with zipfile.ZipFile(path, 'w') as zf:
        for name, text in members.items():
            zf.writestr(name, text)
    return pathlib.Path(path).as_uri()


def test_fetch_and_extract_roundtrip(tmp_path):
    url = _make_zip(tmp_path / 'src.zip',
                    {'a.json': '{"x": 1}', 'sub/b.mid': 'MThd'})
    dest = tmp_path / 'dl'
    out = fetch_and_extract(url, str(dest / 'bundle.zip'))
    assert out == str(dest)
    assert (dest / 'bundle.zip.extracted').exists()
    assert (dest / 'a.json').read_text() == '{"x": 1}'
    assert (dest / 'sub' / 'b.mid').exists()
    assert not (dest / 'bundle.zip.tmp').exists()     # atomic rename


def test_fetch_skips_existing(tmp_path):
    src = tmp_path / 'f.bin'
    src.write_bytes(b'v1')
    out = tmp_path / 'out.bin'
    fetch(src.as_uri(), str(out))
    src.write_bytes(b'v2-changed')
    fetch(src.as_uri(), str(out))                     # skip: not re-fetched
    assert out.read_bytes() == b'v1'
    fetch(src.as_uri(), str(out), force=True)
    assert out.read_bytes() == b'v2-changed'


def test_fetch_checksum(tmp_path):
    src = tmp_path / 'f.bin'
    src.write_bytes(b'payload')
    good = hashlib.sha256(b'payload').hexdigest()
    out = tmp_path / 'ok.bin'
    fetch(src.as_uri(), str(out), sha256=good)
    with pytest.raises(ValueError, match='sha256 mismatch'):
        fetch(src.as_uri(), str(tmp_path / 'bad.bin'), sha256='0' * 64)
    assert not (tmp_path / 'bad.bin').exists()        # rejected atomically
    assert not (tmp_path / 'bad.bin.tmp').exists()


def test_unreachable_raises_egress_error(tmp_path):
    missing = (tmp_path / 'nope.zip').as_uri()
    with pytest.raises(EgressUnavailable, match='no.*egress|cannot fetch'):
        fetch(missing, str(tmp_path / 'out.zip'))
    assert not (tmp_path / 'out.zip.tmp').exists()


def test_stale_pin_refetches(tmp_path):
    # an existing file failing its sha256 pin is discarded and re-fetched
    src = tmp_path / 'f.bin'
    src.write_bytes(b'good')
    out = tmp_path / 'out.bin'
    out.write_bytes(b'corrupt leftover')
    fetch(src.as_uri(), str(out),
          sha256=hashlib.sha256(b'good').hexdigest())
    assert out.read_bytes() == b'good'


def test_corrupt_zip_removed_and_recoverable(tmp_path):
    # a non-zip download (e.g. an HTML error page saved as .zip) must not
    # poison skip-if-exists: it is removed with a clear error, and the
    # next run re-fetches a good copy
    bad = tmp_path / 'bad.bin'
    bad.write_bytes(b'this is not a zip')
    zp = tmp_path / 'dl' / 'bundle.zip'
    with pytest.raises(EgressUnavailable, match='not a zip'):
        fetch_and_extract(bad.as_uri(), str(zp))
    assert not zp.exists()
    good_url = _make_zip(tmp_path / 'good.zip', {'ok.txt': 'yes'})
    fetch_and_extract(good_url, str(zp))
    assert (tmp_path / 'dl' / 'ok.txt').read_text() == 'yes'


def test_reextract_skipped_when_unchanged(tmp_path):
    # resume must not re-unzip: the .extracted marker gates extraction
    url = _make_zip(tmp_path / 'src.zip', {'a.txt': 'v'})
    zp = tmp_path / 'dl' / 'bundle.zip'
    out = pathlib.Path(fetch_and_extract(url, str(zp)))
    extracted = out / 'a.txt'
    extracted.write_text('user-modified')
    fetch_and_extract(url, str(zp))                   # no-op resume
    assert extracted.read_text() == 'user-modified'   # not overwritten
    fetch_and_extract(url, str(zp), force=True)       # force re-extracts
    assert extracted.read_text() == 'v'


def test_gdrive_confirm_url_parsing():
    html = (b'<!DOCTYPE html><html><body><form id="download-form" '
            b'action="https://drive.usercontent.google.com/download" '
            b'method="get">'
            b'<input type="hidden" name="id" value="FILEID">'
            b'<input type="hidden" name="export" value="download">'
            b'<input type="hidden" name="confirm" value="t">'
            b'<input type="hidden" name="uuid" value="u-1">'
            b'</form></body></html>')
    url = _gdrive_confirm_url(html)
    assert url.startswith('https://drive.usercontent.google.com/download?')
    q = dict(urllib.parse.parse_qsl(urllib.parse.urlsplit(url).query))
    assert q == {'id': 'FILEID', 'export': 'download', 'confirm': 't',
                 'uuid': 'u-1'}
    # quota/permission page: no download form -> None
    assert _gdrive_confirm_url(b'<html><body>Quota exceeded</body>') is None


def test_download_artifact_multipart(tmp_path):
    # 2-part artifact (the LMD-MS split shape) landing in one dir
    u1 = _make_zip(tmp_path / 'p1.zip', {'one.json': '1'})
    u2 = _make_zip(tmp_path / 'p2.zip', {'two.json': '2'})
    reg = {'converted/FAKE': Artifact(
        name='converted/FAKE', urls=(u1, u2), kind='converted',
        subdir='FAKE, MS')}
    paths = PathRegistry(str(tmp_path / 'base'))
    dest = download_artifact('converted/FAKE', paths=paths, registry=reg)
    assert dest == str(tmp_path / 'base' / 'datasets' / 'converted' /
                       'FAKE, MS')
    assert sorted(os.listdir(dest)) == [
        'converted_FAKE_part1.zip', 'converted_FAKE_part1.zip.extracted',
        'converted_FAKE_part2.zip', 'converted_FAKE_part2.zip.extracted',
        'one.json', 'two.json']
    with pytest.raises(LookupError, match='unknown artifact'):
        download_artifact('nope', paths=paths, registry=reg)


def test_registry_inventory_matches_reference():
    # the reference ships 5 converted bundles, 6 processed datasets, and 1
    # tokenizer bundle (chore/download.py:21-49); LMD-MS is a 3-way split
    kinds = {}
    for a in ARTIFACTS.values():
        kinds[a.kind] = kinds.get(a.kind, 0) + 1
        assert all(u.startswith('https://drive.google.com/') for u in a.urls)
    assert kinds == {'converted': 5, 'hf': 6, 'tokenizer': 1}
    assert len(ARTIFACTS['converted/LMD-MS'].urls) == 3
    assert 'id=abc' in gdrive_url('abc')
    listing = list_artifacts()
    assert 'converted/POP909-MS' in listing and '[tokenizer]' in listing


def test_cli_download_list_and_unknown(tmp_path, capsys):
    from musicnlp_tpu.cli import main
    assert main(['download']) == 0
    assert 'converted/LMD-MS' in capsys.readouterr().out
    assert main(['download', 'no-such-artifact',
                 '--base', str(tmp_path)]) == 1
    assert 'unknown artifact' in capsys.readouterr().err
