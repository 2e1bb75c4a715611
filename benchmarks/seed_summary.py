"""Print the multi-seed ladder table (RESULTS_multitask.json) vs targets."""
import json, os, sys
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
r = json.load(open(os.path.join(REPO, 'RESULTS_multitask.json')))
t = r['reference_targets']
print(f"{'model':10} {'target':>7} {'best':>7} {'seeds':>5} "
      f"{'mean':>7} {'std':>6} {'worst':>7}")
for m in ('pna', 'mpnn_sum', 'mpnn_max', 'gat', 'gcn', 'gin'):
    e = r.get(m)
    if not e:
        continue
    ss = e.get('seed_stats', {})
    runs = e.get('runs', [])
    print(f"{m:10} {t[m]:7.2f} {e['mean_log10_mse']:7.2f} "
          f"{ss.get('n', 1):5d} {ss.get('mean', e['mean_log10_mse']):7.2f} "
          f"{ss.get('std', 0.0):6.3f} "
          f"{ss.get('worst', e['mean_log10_mse']):7.2f}  "
          f"{[(x['seed'], x['mean_log10_mse']) for x in runs]}")
