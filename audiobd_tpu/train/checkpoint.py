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


def load_checkpoint(record_dir: str, abstract_tree=None) -> tuple[dict[str, Any], dict[str, Any]]:
    """Returns (state_tree, model_spec)."""
    path = os.path.abspath(checkpoint_dir(record_dir))
    ckptr = ocp.StandardCheckpointer()
    tree = ckptr.restore(path, abstract_tree) if abstract_tree is not None else ckptr.restore(path)
    with open(os.path.join(path, _SPEC_FILE)) as f:
        spec = json.load(f)
    return tree, spec
