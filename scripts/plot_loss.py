"""Plot training losses from the JSON-lines log.

Equivalent of reference ``scripts/plot_loss.py`` (which regex-parses console
logs) — ours reads the structured log directly.

Usage: python scripts/plot_loss.py logs/STMask_plus_resnet50.log [-o out.png]
"""

import argparse
import json


def load_entries(path):
    entries = []
    with open(path) as f:
        for line in f:
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                continue
            if e.get('type') == 'train':
                entries.append(e)
    return entries


def main():
    p = argparse.ArgumentParser()
    p.add_argument('log')
    p.add_argument('-o', '--out', default=None)
    p.add_argument('--keys', default=None,
                   help='comma-separated loss keys (default: all)')
    args = p.parse_args()

    entries = load_entries(args.log)
    if not entries:
        print('no train entries found')
        return
    iters = [e['data'].get('iter', i) for i, e in enumerate(entries)]
    keys = args.keys.split(',') if args.keys else sorted(
        k for k in entries[0]['data'] if k not in ('iter', 'epoch', 'lr'))

    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(10, 6))
    for k in keys:
        ys = [e['data'].get(k) for e in entries]
        ax.plot(iters, ys, label=k)
    ax.set_xlabel('iteration')
    ax.set_ylabel('loss')
    ax.legend()
    ax.set_yscale('log')
    out = args.out or args.log.replace('.log', '_loss.png')
    fig.savefig(out, dpi=120, bbox_inches='tight')
    print('wrote', out)


if __name__ == '__main__':
    main()
