"""Collect the full-length synthetic realworld pipeline runs
(benchmarks/run_realworld_synthetic.sh) into RESULTS_realworld_synthetic.json.

Each run used the REFERENCE config settings (epochs/batch/plateau/min-LR
stop) through the real CLI pipeline (config merge, avg_d, collate, trainer)
— the evidence VERDICT r4 task 3b asks for while the real datasets stay
unreachable (no egress)."""

from __future__ import annotations

import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNS = os.path.join(REPO, 'benchmarks', 'runs')
OUT = os.path.join(REPO, 'RESULTS_realworld_synthetic.json')

SPECS = [
    ('zinc_noedge', 'main_molecules (reference ZINC config, README.md:61 '
                    'no-edge recipe)', 'mae', 'min'),
    ('zinc_edge', 'main_molecules (README.md:62 0.188-MAE edge recipe)',
     'mae', 'min'),
    ('hiv', 'main_HIV (reference MolHIV config, README.md:43-45)',
     'roc_auc', 'max'),
    ('mnist', 'main_superpixels MNIST (reference config, README.md:64-70)',
     'accuracy', 'max'),
    ('cifar10', 'main_superpixels CIFAR10 (reference config, '
                'README.md:79-85)', 'accuracy', 'max'),
]


def collect():
    out = {'what': 'Full-length synthetic training through every realworld '
                   'CLI pipeline at the reference config settings (epochs, '
                   'batch size, ReduceLROnPlateau, min-LR stop). Real '
                   'datasets are unreachable (no egress; '
                   'data/download_datasets.sh); these runs prove every step '
                   'of the pipeline except file parsing, which '
                   'tests/test_data_fixtures.py proves on reference-derived '
                   'byte-level fixtures.'}
    for name, desc, metric, mode in SPECS:
        entry = {'pipeline': desc, 'metric': metric}
        log = os.path.join(RUNS, f'realworld_{name}.log')
        curve = os.path.join(RUNS, f'realworld_{name}.jsonl')
        if os.path.exists(log):
            txt = open(log).read()
            m = re.search(r'Best val [^\n]*', txt)
            if m:
                entry['final_line'] = m.group(0)
            m = re.search(r'Total parameters: (\d+)', txt)
            if m:
                entry['params'] = int(m.group(1))
        if os.path.exists(curve):
            rows = [json.loads(l) for l in open(curve) if l.strip()]
            entry['epochs_run'] = len(rows)
            if rows:
                entry['first'] = rows[0]
                entry['last'] = rows[-1]
                vals = [r['val_metric'] for r in rows if 'val_metric' in r]
                if vals:
                    entry['best_val_metric'] = (min(vals) if mode == 'min'
                                                else max(vals))
            entry['curve_file'] = os.path.relpath(curve, REPO)
        out[name] = entry
    with open(OUT, 'w') as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != 'what'},
                     indent=1))


if __name__ == '__main__':
    collect()
