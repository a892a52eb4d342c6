"""JSON-lines training log (reference ``utils/logger.py:22-120``).

One file per config name; a session header with static host/device info,
then one entry per logged iteration.  The nvidia-smi GPU scraping of the
reference (``utils/nvinfo.py``) becomes JAX device memory stats.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


def device_info() -> Dict[str, Any]:
    try:
        import jax
        devs = jax.devices()
        out = {'platform': devs[0].platform, 'count': len(devs),
               'kinds': sorted({d.device_kind for d in devs})}
        try:
            stats = devs[0].memory_stats()
            if stats:
                out['bytes_in_use'] = stats.get('bytes_in_use')
                out['bytes_limit'] = stats.get('bytes_limit')
        except Exception:
            pass
        return out
    except Exception:
        return {}


class Log:
    def __init__(self, config_name: str, log_dir: str = 'logs',
                 session_data: Optional[dict] = None,
                 log_device_stats: bool = False):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, f'{config_name}.log')
        self.log_device_stats = log_device_stats
        self.session_start = time.time()
        self._write({'type': 'session', 'data': session_data or {},
                     'devices': device_info()})

    def _write(self, entry: dict):
        entry['time'] = time.time()
        entry['elapsed'] = entry['time'] - self.session_start
        with open(self.path, 'a') as f:
            f.write(json.dumps(entry, default=float) + '\n')

    def log(self, type_: str, data: Optional[dict] = None, **kw):
        entry = {'type': type_, 'data': {**(data or {}), **kw}}
        if self.log_device_stats:
            entry['devices'] = device_info()
        self._write(entry)


class MovingAverage:
    """Finite-window moving average rejecting non-finite values
    (reference utils/functions.py:9-45)."""

    def __init__(self, max_window_size: int = 1000):
        self.max_window_size = max_window_size
        self.window = []
        self.sum = 0.0

    def append(self, elem: float):
        import math
        if not math.isfinite(elem):
            return
        self.window.append(elem)
        self.sum += elem
        if len(self.window) > self.max_window_size:
            self.sum -= self.window.pop(0)

    def get_avg(self) -> float:
        if not self.window:
            return 0.0
        return self.sum / len(self.window)

    def reset(self):
        self.window = []
        self.sum = 0.0

    def __len__(self):
        return len(self.window)


class ProgressBar:
    """Console progress bar (reference utils/functions.py:48-84)."""

    def __init__(self, length: int = 30, max_val: int = 100):
        self.length = length
        self.max_val = max(max_val, 1)

    def get_bar(self, val: int) -> str:
        fill = int(self.length * min(val, self.max_val) / self.max_val)
        return '█' * fill + '░' * (self.length - fill)

    def set_val(self, val: int) -> str:
        return self.get_bar(val)


class StageTimer:
    """Host-side named-stage wall timer for the benchmark table (reference
    ``utils/timer.py``).  Under jit, XLA fuses stages, so the per-stage table
    is only meaningful around separately-dispatched program sections; use
    ``jax.profiler`` traces for intra-program attribution."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.calls: Dict[str, int] = {}

    class _Env:
        def __init__(self, timer, name):
            self.timer = timer
            self.name = name

        def __enter__(self):
            self.t0 = time.perf_counter()

        def __exit__(self, *a):
            dt = time.perf_counter() - self.t0
            self.timer.totals[self.name] = \
                self.timer.totals.get(self.name, 0.0) + dt
            self.timer.calls[self.name] = \
                self.timer.calls.get(self.name, 0) + 1
            return False

    def env(self, name: str) -> '_Env':
        return self._Env(self, name)

    def print_stats(self):
        if not self.totals:
            return
        width = max(len(k) for k in self.totals)
        print(f'{"stage".ljust(width)}  total_s   calls   avg_ms')
        for k in sorted(self.totals, key=lambda k: -self.totals[k]):
            n = self.calls[k]
            print(f'{k.ljust(width)}  {self.totals[k]:7.3f}  {n:6d}  '
                  f'{1000 * self.totals[k] / n:7.2f}')
