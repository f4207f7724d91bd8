"""Compare training runs' val curves: epochs-to-threshold + final/best.

  python tools/compare_runs.py out.json label1=runs/a label2=runs/b ...

Emits one JSON with, per run: final/best val RRE & RTE, and the first
epoch at which val RRE crosses a set of thresholds — the
convergence-speed evidence for warm-vs-cold (VERDICT r4 #4) and the
CPE verdict (VERDICT r4 #5).  Also writes a val-RRE-vs-epoch PNG beside
the JSON when matplotlib is importable.
"""
from __future__ import annotations

import csv
import json
import sys

THRESHOLDS = (1.0, 0.5, 0.3, 0.2, 0.15, 0.12, 0.1)


def read_curve(run_dir):
    epochs, rre, rte = [], [], []
    with open(f'{run_dir}/metrics.csv') as f:
        for row in csv.DictReader(f):
            if row.get('val/rre'):
                epochs.append(int(row['epoch']))
                rre.append(float(row['val/rre']))
                rte.append(float(row['val/rte']))
    return epochs, rre, rte


def main():
    out_path, pairs = sys.argv[1], sys.argv[2:]
    runs = {}
    curves = {}
    for pair in pairs:
        label, run_dir = pair.split('=', 1)
        epochs, rre, rte = read_curve(run_dir)
        curves[label] = (epochs, rre)
        cross = {}
        for th in THRESHOLDS:
            hit = next((e for e, v in zip(epochs, rre) if v <= th), None)
            cross[str(th)] = hit
        best_i = min(range(len(rre)), key=rre.__getitem__)
        runs[label] = {
            'run_dir': run_dir,
            'epochs': len(epochs),
            'final_val_rre': round(rre[-1], 4),
            'final_val_rte': round(rte[-1], 4),
            'best_val_rre': round(rre[best_i], 4),
            'best_val_rre_epoch': epochs[best_i],
            'best_val_rte': round(min(rte), 4),
            'first_epoch_rre_below': cross,
        }
    with open(out_path, 'w') as f:
        json.dump(runs, f, indent=2)
    print(json.dumps(runs, indent=2))

    try:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(7, 4.2))
        for label, (epochs, rre) in curves.items():
            ax.plot(epochs, rre, label=label, linewidth=1.6)
        ax.set_yscale('log')
        ax.set_xlabel('epoch')
        ax.set_ylabel('val RRE [deg]')
        ax.legend(frameon=False)
        ax.grid(True, alpha=0.25)
        fig.tight_layout()
        png = out_path.rsplit('.', 1)[0] + '.png'
        fig.savefig(png, dpi=130)
        print('wrote', png)
    except Exception as e:  # matplotlib optional
        print('no plot:', e)


if __name__ == '__main__':
    main()
