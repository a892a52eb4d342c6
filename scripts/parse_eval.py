"""Summarize eval metric outputs across runs.

Equivalent of reference ``scripts/parse_eval.py``: collect mAP numbers from
eval JSON outputs / metric dumps and print a table.

Usage: python scripts/parse_eval.py results/*.metrics.json
"""

import argparse
import json
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument('files', nargs='+')
    args = p.parse_args()

    rows = []
    for path in args.files:
        try:
            with open(path) as f:
                stats = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        if isinstance(stats, dict) and 'mAP' in stats:
            rows.append((os.path.basename(path), stats))
    if not rows:
        print('no metric files parsed')
        return
    keys = ['mAP', 'AP50', 'AP75', 'AR']
    print(f'{"run":40s} ' + ' '.join(f'{k:>7s}' for k in keys))
    for name, stats in rows:
        print(f'{name:40s} '
              + ' '.join(f'{stats.get(k, 0.0):7.3f}' for k in keys))


if __name__ == '__main__':
    main()
