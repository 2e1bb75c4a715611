"""First-principles HBM byte audit of the flagship train step (VERDICT r4
item 1).

Parses the post-optimization HLO of the compiled step and attributes HBM
traffic per top-level instruction: each entry-computation op writes its
output(s) and reads its operands' outputs (fusion internals never touch HBM,
so post-fusion top-level shapes ARE the traffic model — modulo VMEM residency
for small tensors, which makes this an upper bound).  Aggregates by op kind
and by tensor shape, prints the top byte movers, and compares against the
algorithm's first-principles budget.

Usage:  python benchmarks/byte_audit.py [--kernel auto] [--batch 1024]
        [--dtype bf16] [--out RESULTS_byteaudit.json]
"""

import argparse
import json
import re
import sys
from collections import defaultdict

sys.path.insert(0, __import__('os').path.join(
    __import__('os').path.dirname(__import__('os').path.abspath(__file__)),
    '..'))

DTYPE_BYTES = {'f64': 8, 'f32': 4, 'bf16': 2, 'f16': 2, 'f8e4m3': 1,
               's64': 8, 's32': 4, 's16': 2, 's8': 1, 'u64': 8, 'u32': 4,
               'u16': 2, 'u8': 1, 'pred': 1, 'c64': 8, 'c128': 16,
               's4': 1, 'u4': 1}

SHAPE_RE = re.compile(r'(\w+)\[([\d,]*)\]')


def shape_bytes(shape_str):
    """Total bytes of an HLO shape string (handles tuples)."""
    total = 0
    for m in SHAPE_RE.finditer(shape_str):
        dt, dims = m.group(1), m.group(2)
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(','):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


INSTR_RE = re.compile(
    r'^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(\([^=]*?\)|\S+)\s+([\w\-]+)\(')


def parse_entry(hlo_text):
    """Yield (name, out_bytes, kind, operands, line) for the ENTRY
    computation's instructions."""
    lines = hlo_text.split('\n')
    # find ENTRY block
    in_entry = False
    depth = 0
    out = []
    for ln in lines:
        if ln.startswith('ENTRY '):
            in_entry = True
            depth = 0
        if not in_entry:
            continue
        depth += ln.count('{') - ln.count('}')
        if in_entry and depth <= 0 and '}' in ln and out:
            break
        m = INSTR_RE.match(ln)
        if not m:
            continue
        name, shape, kind = m.group(1), m.group(2), m.group(3)
        # operand names: %name tokens after the opcode's open paren
        rest = ln[m.end():]
        ops = re.findall(r'%([\w.\-]+)', rest)
        out.append((name, shape_bytes(shape), shape, kind, ops, ln.strip()))
    return out


def audit(kernel='auto', batch=1024, dtype='bf16', donate=False):
    import jax
    import jax.numpy as jnp
    from bench import build_bench

    cdt = jnp.bfloat16 if dtype == 'bf16' else None
    train_step, state, dev_batch, n_edges, n_nodes, args = build_bench(
        batch_graphs_n=batch, edge_feat=True, compute_dtype=cdt,
        kernel=kernel)
    lowered = train_step.lower(*args)
    compiled = lowered.compile()
    txt = compiled.as_text()
    instrs = parse_entry(txt)
    by_name = {name: ob for name, ob, *_ in instrs}

    # traffic per instruction = bytes written + bytes read (operand outputs)
    kinds = defaultdict(lambda: [0, 0])    # kind -> [bytes, count]
    rows = []
    total = 0
    for name, ob, shape, kind, ops, ln in instrs:
        if kind in ('parameter', 'constant', 'get-tuple-element', 'tuple',
                    'bitcast'):
            continue
        rb = sum(by_name.get(o, 0) for o in ops)
        t = ob + rb
        total += t
        kinds[kind][0] += t
        kinds[kind][1] += 1
        rows.append({'name': name, 'kind': kind, 'bytes': t,
                     'out_shape': shape[:90]})
    rows.sort(key=lambda r: -r['bytes'])

    mem = None
    try:
        ma = compiled.memory_analysis()
        mem = {'temp_mb': round(ma.temp_size_in_bytes / 2**20, 1),
               'arg_mb': round(ma.argument_size_in_bytes / 2**20, 1),
               'out_mb': round(ma.output_size_in_bytes / 2**20, 1)}
    except Exception:
        pass

    kind_table = sorted(((k, v[0], v[1]) for k, v in kinds.items()),
                        key=lambda t: -t[1])
    return {
        'config': {'kernel': kernel, 'batch': batch, 'dtype': dtype,
                   'n_edges': n_edges, 'n_nodes': n_nodes},
        'total_toplevel_gb': round(total / 1e9, 3),
        'n_toplevel_instrs': len(rows),
        'memory_analysis': mem,
        'by_kind_gb': [{'kind': k, 'gb': round(b / 1e9, 3), 'count': c}
                       for k, b, c in kind_table],
        'top_ops': rows[:40],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--kernel', default='auto')
    ap.add_argument('--batch', type=int, default=1024)
    ap.add_argument('--dtype', default='bf16')
    ap.add_argument('--out', default=None)
    args = ap.parse_args()
    res = audit(args.kernel, args.batch, args.dtype)
    print(json.dumps({k: v for k, v in res.items() if k != 'top_ops'},
                     indent=1))
    for r in res['top_ops'][:30]:
        print(f"{r['bytes']/1e6:9.1f} MB  {r['kind']:<22} {r['out_shape']}")
    if args.out:
        with open(args.out, 'w') as f:
            json.dump(res, f, indent=1)


if __name__ == '__main__':
    main()
