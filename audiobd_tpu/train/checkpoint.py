"""Orbax checkpointing with the reference's path contract.

The reference pickles the whole nn.Module to ``record/<result>/checkpoint.pt``
(utils/training_tools.py:44-50) and every defense reloads that path
(fp.py:125, ft_reg.py:238, tsbd.py:256). Here the contract is
``record/<result>/checkpoint/`` — an Orbax directory holding
{params, batch_stats, opt_state, step} plus a model-spec JSON so defenses
can rebuild the model without re-specifying flags.
"""

from __future__ import annotations

import json
import os
from typing import Any


import numpy as np
import orbax.checkpoint as ocp

from audiobd_tpu.train.state import TrainState

_SPEC_FILE = "model_spec.json"


def checkpoint_dir(record_dir: str) -> str:
    return os.path.join(record_dir, "checkpoint")


def save_checkpoint(record_dir: str, state: TrainState, model_spec: dict[str, Any]) -> None:
    from audiobd_tpu.utils.transfer import bulk_device_get

    path = os.path.abspath(checkpoint_dir(record_dir))
    tree = bulk_device_get(
        {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
    )
    tree["step"] = np.asarray(tree["step"])
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    with open(os.path.join(path, _SPEC_FILE), "w") as f:
        json.dump(model_spec, f)


class AsyncCheckpointWriter:
    """Latest-wins background checkpoint writer.

    ``submit`` replaces any still-pending state and returns immediately, so
    an improving-most-epochs phase never blocks the epoch loop on the
    device→host transfer + Orbax write (seconds over a tunneled backend).
    The writer thread drains at its own pace; ``flush`` guarantees the most
    recently submitted state is on disk. One write is in flight at a time.
    """

    def __init__(self, min_interval: float = 30.0):
        import threading
        import time

        self._time = time.monotonic
        self._min_interval = min_interval
        self._last_write = -float("inf")
        self._cond = threading.Condition()
        self._pending = None  # (record_dir, state, model_spec)
        self._writing = False
        self._closed = False
        self._rush = False
        self._error: BaseException | None = None
        self._thread = threading.Thread(target=self._run, daemon=True, name="ckpt-writer")
        self._thread.start()

    def submit(self, record_dir: str, state: TrainState, model_spec: dict[str, Any]) -> None:
        with self._cond:
            if self._closed:
                raise RuntimeError("writer closed")
            self._pending = (record_dir, state, model_spec)
            self._cond.notify_all()

    def flush(self) -> None:
        """Block until everything submitted so far is durably written
        (overrides the min-interval pacing)."""
        with self._cond:
            self._rush = True
            self._cond.notify_all()
            while self._pending is not None or self._writing:
                self._cond.wait()
            self._rush = False
            if self._error is not None:
                err, self._error = self._error, None
                raise err

    def close(self) -> None:
        try:
            self.flush()
        finally:
            # Always stop the thread, even when flush() re-raises a write
            # error — otherwise _closed stays unset and the thread leaks.
            with self._cond:
                self._closed = True
                self._cond.notify_all()
            self._thread.join(timeout=60)

    def _run(self) -> None:
        while True:
            with self._cond:
                while self._pending is None and not self._closed:
                    self._cond.wait()
                if self._pending is None and self._closed:
                    return
                # Pace writes so a rapidly-improving phase doesn't hog the
                # device↔host link; flush()/close() skip the pacing.
                while not self._rush and not self._closed:
                    remaining = self._last_write + self._min_interval - self._time()
                    if remaining <= 0:
                        break
                    self._cond.wait(timeout=remaining)
                job, self._pending = self._pending, None
                self._writing = True
            try:
                save_checkpoint(*job)
                with self._cond:
                    # A durable write supersedes any earlier transient
                    # failure (latest-wins): don't raise a stale error from
                    # flush() after training has in fact checkpointed.
                    self._error = None
            except BaseException as e:  # surfaced on the next flush()
                with self._cond:
                    self._error = e
            finally:
                self._last_write = self._time()
                with self._cond:
                    self._writing = False
                    self._cond.notify_all()


def load_checkpoint(record_dir: str, abstract_tree=None) -> tuple[dict[str, Any], dict[str, Any]]:
    """Returns (state_tree, model_spec)."""
    path = os.path.abspath(checkpoint_dir(record_dir))
    ckptr = ocp.StandardCheckpointer()
    tree = ckptr.restore(path, abstract_tree) if abstract_tree is not None else ckptr.restore(path)
    with open(os.path.join(path, _SPEC_FILE)) as f:
        spec = json.load(f)
    return tree, spec
