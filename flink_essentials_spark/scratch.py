"""Fast scratch storage for ephemeral streaming-harness files.

Replay directories and streaming checkpoints (offsets/commit logs +
state-store delta files) are written and fsynced once per micro-batch;
putting them on memory-backed storage removes that disk round-trip
from every batch (guide §6 — I/O off the hot path). This is the
streaming analog of pointing the state store at fast local storage in
production: the files are EPHEMERAL by construction (a replay run
never resumes), so durability buys nothing.

``FES_SCRATCH_DIR`` overrides the root (point it at a local SSD on a
real cluster); the default prefers ``/dev/shm`` when present and
writable, else falls back to the system tempdir. Callers clean up via
their existing atexit hooks (llmdata._STORE_ROOTS) or inline rmtree.
"""

from __future__ import annotations

import os
import tempfile


def scratch_root() -> str:
    env = os.environ.get("FES_SCRATCH_DIR")
    if env:
        return env
    shm = "/dev/shm"
    if os.path.isdir(shm) and os.access(shm, os.W_OK):
        return shm
    return tempfile.gettempdir()


def scratch_dir(prefix: str) -> str:
    """mkdtemp under the scratch root."""
    return tempfile.mkdtemp(prefix=prefix, dir=scratch_root())
