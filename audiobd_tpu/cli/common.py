"""Shared helpers for the defense CLI entry points (fp, ft_reg, tsbd,
correlation_analysis). The reference's defense scripts each take the attack
name by flag; here defenses can also infer it from the attack run's
model_spec.json so --result alone chains stages."""

from __future__ import annotations

import json
import os


def infer_attack(result: str, fallback: str) -> tuple[str, str | None]:
    """Read attack/model from the checkpoint's model_spec.json when present,
    so defenses need only --result (like the reference's scripts)."""
    spec_path = os.path.join("record", result, "checkpoint", "model_spec.json")
    if os.path.exists(spec_path):
        with open(spec_path) as f:
            spec = json.load(f)
        return spec.get("attack", fallback), spec.get("model")
    return fallback, None
