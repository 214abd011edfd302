"""Cross-extraction parity: this repo's extractor vs the reference's SHIPPED
extractions.

For every pair
    /root/reference/generated-samples/original/<title>.mxl
    /root/reference/generated-samples/extracted/<date>_<title>_{md=f}.mxl
extract the original with THIS repo's MusicExtractor (mode='full') and diff
token-for-token against mxl2str of the reference's extraction (the exact
inverse the reference itself uses for prompts, reference
musicnlp/preprocess/music_converter.py:162-215).

Usage:
    python scripts/xextract_parity.py                # all pairs, summary table
    python scripts/xextract_parity.py 'Pachelbel'    # filter + first-diff dump
    python scripts/xextract_parity.py 'Adele' --ndiff 8
"""
import difflib
import glob
import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from musicnlp_tpu.preprocess.music_converter import MusicConverter
from musicnlp_tpu.preprocess.music_extractor import MusicExtractor
from musicnlp_tpu.preprocess.warning_logger import WarnLog

REF = '/root/reference/generated-samples'


def pairs():
    out = []
    for f in sorted(glob.glob(os.path.join(REF, 'extracted', '*.mxl'))):
        b = os.path.basename(f)
        m = re.match(r'^(\d\d-\d\d-\d\d)_(.*)_\{md=f\}\.mxl(\.mxl)?$', b)
        if not m:
            continue
        title = m.group(2)
        orig = os.path.join(REF, 'original', title + '.mxl')
        if os.path.exists(orig):
            out.append((title, orig, f, m.group(1)))
    return out


def artifact_threshold(date: str) -> int:
    """The reference's toy_example (music_extractor.py:1157-1247) made the
    artifacts with greedy_tuplet_pitch_threshold=16 from 22-11 on; the two
    22-10-28 artifacts predate that edit (Mozart bar 99's 24-variant run is
    uncapped there) and use the 3**9 constructor default."""
    return 16 if date >= '22-11' else 3 ** 9


def similarity(a, b):
    return difflib.SequenceMatcher(a=a, b=b, autojunk=False).ratio()


def first_diffs(a, b, n=4, ctx=10):
    sm = difflib.SequenceMatcher(a=a, b=b, autojunk=False)
    shown = 0
    for tag, i1, i2, j1, j2 in sm.get_opcodes():
        if tag == 'equal':
            continue
        print(f'  @tok {i1} [{tag}]')
        print('    ref : ' + ' '.join(b[max(0, j1 - ctx):j2 + ctx]))
        print('    ours: ' + ' '.join(a[max(0, i1 - ctx):i2 + ctx]))
        shown += 1
        if shown >= n:
            break


def split_bars(toks):
    """[global toks], then one list per <bar>."""
    bars, cur = [], []
    for t in toks:
        if t == '<bar>':
            bars.append(cur)
            cur = [t]
        else:
            cur.append(t)
    bars.append(cur)
    return bars


def bar_diff(ours, ref, max_show=12):
    ob, rb = split_bars(ours), split_bars(ref)
    n = min(len(ob), len(rb))
    if len(ob) != len(rb):
        print(f'  BAR COUNT differs: ours={len(ob) - 1} ref={len(rb) - 1}')
    shown = 0
    for i in range(n):
        if ob[i] != rb[i]:
            print(f'  bar {i - 1}:')
            print('    ref : ' + ' '.join(rb[i]))
            print('    ours: ' + ' '.join(ob[i]))
            shown += 1
            if shown >= max_show:
                print('  ... (more bars differ)')
                break
    print(f'  {sum(1 for i in range(n) if ob[i] != rb[i])}/{n - 1} bars differ')


def main():
    filt = None
    ndiff = 0
    by_bar = '--bars' in sys.argv
    args = [a for a in sys.argv[1:] if a != '--bars']
    if '--ndiff' in args:
        i = args.index('--ndiff')
        ndiff = int(args[i + 1])
        del args[i:i + 2]
    if args:
        filt = args[0]
        if ndiff == 0 and not by_bar:
            ndiff = 4

    mc = MusicConverter(mode='full')
    rows = []
    for title, orig, extracted, date in pairs():
        if filt and filt.lower() not in title.lower():
            continue
        t0 = time.time()
        ref_toks = mc.mxl2str(extracted, pitch_kind='step').split()
        me = MusicExtractor(mode='full', with_pitch_step=True,
                            warn_logger=WarnLog(verbose=False),
                            greedy_tuplet_pitch_threshold=artifact_threshold(date))
        try:
            ours = me(orig, exp='str_join').split()
        except Exception as e:  # noqa: BLE001
            rows.append((title, 0.0, 0, len(ref_toks), f'CRASH {e!r:.60}'))
            continue
        sim = similarity(ours, ref_toks)
        dt = time.time() - t0
        rows.append((title, sim, len(ours), len(ref_toks), f'{dt:.1f}s'))
        if (ndiff or by_bar) and sim < 1.0:
            print(f'--- {title} sim={sim:.4f} ours={len(ours)} ref={len(ref_toks)}')
            if by_bar:
                bar_diff(ours, ref_toks)
            else:
                first_diffs(ours, ref_toks, n=ndiff)

    rows.sort(key=lambda r: r[1])
    print()
    print(f'{"sim":>7}  {"ours":>6} {"ref":>6}  title')
    for title, sim, no, nr, note in rows:
        print(f'{sim:7.4f}  {no:6d} {nr:6d}  {title}  {note}')
    sims = [r[1] for r in rows]
    if sims:
        exact = sum(1 for s in sims if s == 1.0)
        print(f'\nn={len(sims)} mean={sum(sims)/len(sims):.4f} '
              f'min={min(sims):.4f} exact={exact}/{len(sims)}')


if __name__ == '__main__':
    main()
