"""Small utilities (parity with the reference's utils/utils.py leftovers:
read_strings_from_txt:29-41, time_limit:150-163, save_yaml_file,
get_available_devices:251-309)."""
from __future__ import annotations

import contextlib
import signal
from typing import Iterator


def read_strings_from_txt(path: str) -> list[str]:
    with open(path) as fh:
        return [line.strip() for line in fh if line.strip()]


class TimeoutException(Exception):
    pass


@contextlib.contextmanager
def time_limit(seconds: float) -> Iterator[None]:
    """SIGALRM-based wall-clock limit (used to bound symmetry-RMSD graph
    matching, reference utils/utils.py:150-163).  Main-thread only."""

    def handler(signum, frame):
        raise TimeoutException(f"timed out after {seconds}s")

    old = signal.signal(signal.SIGALRM, handler)
    signal.setitimer(signal.ITIMER_REAL, seconds)
    try:
        yield
    finally:
        signal.setitimer(signal.ITIMER_REAL, 0)
        signal.signal(signal.SIGALRM, old)


def save_yaml_file(path: str, content: dict) -> None:
    import yaml

    with open(path, "w") as fh:
        yaml.safe_dump(content, fh)


def get_available_devices():
    """Accelerator inventory (the reference's device fan-out helper maps to
    jax.devices() here — sharding replaces per-process device assignment)."""
    import jax

    return jax.devices()
