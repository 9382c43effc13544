"""Resolution of the attack trigger assets.

The reference ships real trigger assets (SURVEY.md §1 assets row):
``resources/Ultrasonic/trigger.wav`` — 1 s mono 44.1 kHz with >20 kHz
content, loaded at reference utils/ultra_trigger.py:24 — and
``resources/DABA/trigger_pool/*.wav`` — 60 one-second 16 kHz music clips,
globbed at reference utils/daba_selection_tools.py:89-90 via the hardcoded
pool path at utils/daba_injection_tools.py:127.

This framework prefers those genuine assets whenever a copy is reachable and
synthesizes deterministic stand-ins only as a last resort. Search order:

1. ``$AUDIOBD_RESOURCES`` (a directory laid out like the reference's
   ``resources/``),
2. ``resources/`` under the current working directory (the reference's own
   checkout layout),
3. a read-only reference checkout at ``/root/reference/resources`` (present
   in the validation fixture).
"""

from __future__ import annotations

import os

_KNOWN_ROOTS = (
    "resources",
    "/root/reference/resources",
)


def resource_roots() -> list[str]:
    roots = []
    env = os.environ.get("AUDIOBD_RESOURCES")
    if env:
        roots.append(env)
    roots.extend(_KNOWN_ROOTS)
    return roots


def find_resource(relpath: str) -> str | None:
    """First existing ``<root>/<relpath>`` across the search roots.

    For directories the match must also contain at least one wav (an empty
    pool dir does not count as found).
    """
    for root in resource_roots():
        path = os.path.join(root, relpath)
        if os.path.isfile(path):
            return path
        if os.path.isdir(path) and any(
            name.endswith(".wav") for name in os.listdir(path)
        ):
            return path
    return None
