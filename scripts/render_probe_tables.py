#!/usr/bin/env python3
"""Render the r9 scaleprobe JSON artifacts as SCALE.md markdown tables."""
import json, glob, sys

for f in sorted(glob.glob('bench_results/scaleprobe-r9*.json')):
    d = json.load(open(f))
    factors = d['factors']
    res = d['results']
    queries = list(next(iter(res.values())).keys())
    print(f"\n### {f.split('/')[-1]}  (stat: {d['stat']})\n")
    hdr = '| query | ' + ' | '.join(f'x{x}' for x in factors) + ' | x-ratio/decade |'
    print(hdr)
    print('|' + '---|' * (len(factors) + 2))
    for q in queries:
        cells = []
        for x in factors:
            v = res.get(f'x{x}', {}).get(q, {}).get('sec')
            cells.append('DNF' if v is None or v < 0 else f'{v:.1f} s')
        # last-decade growth ratio if both ends measured
        try:
            a = res[f'x{factors[-2]}'][q]['sec']; b = res[f'x{factors[-1]}'][q]['sec']
            ratio = f'{b/a:.1f}x' if a > 0 and b > 0 else 'n/a'
        except Exception:
            ratio = 'n/a'
        print(f'| {q} | ' + ' | '.join(cells) + f' | {ratio} |')
