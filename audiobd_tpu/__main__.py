"""Unified CLI dispatcher: ``python -m audiobd_tpu <command> [flags]``.

Commands mirror the reference's nine entry scripts plus dataset download,
plus a serving entry the reference lacks:
attacks   badnets, jingleback, ultrasonic, daba, flowmur
defenses  fp, ft_reg, tsbd, correlation_analysis
data      get_dataset
serving   infer
"""

from __future__ import annotations

import importlib
import sys

COMMANDS = {
    "badnets": "audiobd_tpu.cli.badnets",
    "jingleback": "audiobd_tpu.cli.jingleback",
    "ultrasonic": "audiobd_tpu.cli.ultrasonic",
    "daba": "audiobd_tpu.cli.daba",
    "flowmur": "audiobd_tpu.cli.flowmur",
    "fp": "audiobd_tpu.cli.fp",
    "ft_reg": "audiobd_tpu.cli.ft_reg",
    "tsbd": "audiobd_tpu.cli.tsbd",
    "correlation_analysis": "audiobd_tpu.cli.correlation_analysis",
    "get_dataset": "audiobd_tpu.cli.get_dataset",
    # beyond-reference: serve a trained checkpoint
    "infer": "audiobd_tpu.cli.infer",
}


def main():
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help") or sys.argv[1] not in COMMANDS:
        print(__doc__)
        print("available commands:", ", ".join(COMMANDS))
        raise SystemExit(0 if len(sys.argv) >= 2 and sys.argv[1] in ("-h", "--help") else 1)
    command = sys.argv.pop(1)
    sys.argv[0] = f"audiobd_tpu {command}"
    # Platform escape hatch: plugin sitecustomize files (e.g. the axon TPU
    # shim) override JAX_PLATFORMS programmatically, so the env var alone
    # cannot force a backend. AUDIOBD_PLATFORM=cpu pins it via jax.config
    # before any backend is initialized — the only reliable way to run a CLI
    # on CPU while a tunneled TPU backend is unreachable.
    import os

    platform = os.environ.get("AUDIOBD_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
    # Multi-host hook: a no-op on single-host runs; under a pod/multi-slice
    # launcher (JAX_COORDINATOR_ADDRESS etc.) this joins the cluster before
    # any backend is touched (parallel/distributed.py policy).
    from audiobd_tpu.parallel.distributed import maybe_initialize_distributed

    maybe_initialize_distributed()
    importlib.import_module(COMMANDS[command]).main()


if __name__ == "__main__":
    main()
