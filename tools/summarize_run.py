"""Print the best val metrics of a run from its metrics.csv.

    python tools/summarize_run.py runs/v11_r2 [more runs...]
"""
import csv
import sys

for run in sys.argv[1:]:
    with open(f'{run}/metrics.csv') as f:
        rows = list(csv.DictReader(f))
    def best(key, rows=rows):
        vals = [(float(r[key]), int(r['epoch'])) for r in rows if r.get(key)]
        v, e = min(vals)
        return f'{v:.4f} @ep{e}'
    rot = [(max(float(r['val/rot_err_x']), float(r['val/rot_err_y']),
                float(r['val/rot_err_z'])), int(r['epoch']))
           for r in rows if r.get('val/rot_err_x')]
    tr = [(max(float(r['val/trans_err_x']), float(r['val/trans_err_y']),
               float(r['val/trans_err_z'])), int(r['epoch']))
          for r in rows if r.get('val/trans_err_x')]
    print(f'== {run} ({len(rows)} epochs)')
    print('  val rre      ', best('val/rre'))
    print('  val rte      ', best('val/rte'))
    print('  val rot max-axis', '%.4f @ep%d' % min(rot))
    print('  val trans max-axis', '%.4f @ep%d' % min(tr))
    last = rows[-1]
    print('  last epoch   ', {k.split("/")[-1]: round(float(last[k]), 4)
                              for k in ('val/rre', 'val/rte')})
