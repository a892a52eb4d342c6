"""Checkpointing: orbax-backed atomic save/restore + interrupt semantics.

Mirrors the reference checkpoint lifecycle (``utils/functions.py:96-159``
SavePath name codec ``<config>_<epoch>_<iter>``, ``train.py:353-363``
periodic save with ``--keep_latest`` pruning, ``train.py:382-389`` Ctrl-C
interrupt save, ``train.py:198-208`` resume with iteration recovered from
the name).
"""

from __future__ import annotations

import os
import re
import shutil
import signal
from typing import Any, Optional, Tuple

import orbax.checkpoint as ocp


_NAME_RE = re.compile(r'^(.*)_(\d+)_(\d+)(_interrupt)?$')


def ckpt_name(config_name: str, epoch: int, iteration: int,
              interrupt: bool = False) -> str:
    suffix = '_interrupt' if interrupt else ''
    return f'{config_name}_{epoch}_{iteration}{suffix}'


def parse_ckpt_name(name: str) -> Optional[Tuple[str, int, int, bool]]:
    m = _NAME_RE.match(os.path.basename(name.rstrip('/')))
    if not m:
        return None
    return m.group(1), int(m.group(2)), int(m.group(3)), bool(m.group(4))


class CheckpointManager:
    def __init__(self, save_dir: str, config_name: str,
                 keep_latest: int = 0):
        self.save_dir = os.path.abspath(save_dir)
        self.config_name = config_name
        self.keep_latest = keep_latest
        os.makedirs(self.save_dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def save(self, state: Any, epoch: int, iteration: int,
             interrupt: bool = False) -> str:
        path = os.path.join(self.save_dir,
                            ckpt_name(self.config_name, epoch, iteration,
                                      interrupt))
        self._ckptr.save(path, state, force=True)
        self._ckptr.wait_until_finished()
        if self.keep_latest > 0 and not interrupt:
            self._prune()
        return path

    def restore(self, path: str, target: Any) -> Any:
        return self._ckptr.restore(os.path.abspath(path), target)

    def _list(self):
        out = []
        for name in os.listdir(self.save_dir):
            parsed = parse_ckpt_name(name)
            if parsed and parsed[0] == self.config_name:
                out.append((parsed[2], parsed[3], name))
        return sorted(out)

    def _prune(self):
        ckpts = [c for c in self._list() if not c[1]]
        for _, _, name in ckpts[:-self.keep_latest]:
            shutil.rmtree(os.path.join(self.save_dir, name),
                          ignore_errors=True)

    def get_latest(self) -> Optional[str]:
        ckpts = [c for c in self._list() if not c[1]]
        if not ckpts:
            return None
        return os.path.join(self.save_dir, ckpts[-1][2])

    def get_interrupt(self) -> Optional[str]:
        ckpts = [c for c in self._list() if c[1]]
        if not ckpts:
            return None
        return os.path.join(self.save_dir, ckpts[-1][2])


class InterruptSaver:
    """SIGINT handler that checkpoints before exiting
    (reference train.py:382-389)."""

    def __init__(self, manager: CheckpointManager):
        self.manager = manager
        self.state = None
        self.epoch = 0
        self.iteration = 0
        self._orig = None

    def update(self, state, epoch: int, iteration: int):
        self.state = state
        self.epoch = epoch
        self.iteration = iteration

    def __enter__(self):
        def handler(signum, frame):
            if self.state is not None:
                print('Stopping early. Saving interrupt checkpoint...')
                self.manager.save(self.state, self.epoch, self.iteration,
                                  interrupt=True)
            raise SystemExit(0)

        self._orig = signal.signal(signal.SIGINT, handler)
        return self

    def __exit__(self, *a):
        signal.signal(signal.SIGINT, self._orig)
        return False
