"""Shared preamble + resumable-JSONL helpers for the flowmur study scripts.

Importing this module (FIRST, before anything from audiobd_tpu) performs the
fixture preamble every study script needs, in the required order:

  1. puts the repo root on sys.path (scripts run as ``python scripts/x.py``);
  2. enables the persistent XLA compilation cache (works over the axon
     tunnel — CLAUDE.md environment notes);
  3. honors the ``AUDIOBD_PLATFORM`` hatch (the axon sitecustomize pins
     jax_platforms programmatically, so env vars alone do NOT force CPU —
     the config update must happen after ``import jax``, before backend init).

Seven scripts used to copy-paste this block plus a near-identical done-set/
append resume loop (~35 lines each); the copies drifted (the seed study's
lacked the platform hatch until r5). ADVICE r5 consolidation.
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from audiobd_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache("auto")

import jax  # noqa: E402

if os.environ.get("AUDIOBD_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["AUDIOBD_PLATFORM"])


def repo_path(*parts: str) -> str:
    """Absolute path under the repo root (study outputs live in the repo so
    they survive fixture reboots and get committed — /tmp is wiped)."""
    return os.path.join(REPO, *parts)


def done_rows(path: str, key_fields: tuple[str, ...]) -> set:
    """Key tuples of rows already recorded in a resumable JSONL file."""
    done = set()
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                if line.strip():
                    row = json.loads(line)
                    done.add(tuple(row[k] for k in key_fields))
    return done


def append_row(path: str, row: dict) -> None:
    """Append one JSONL row (the resume unit) and echo it to stdout."""
    with open(path, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)
