"""Filesystem + misc helpers.

Equivalent of the reference's CommonUtil (atomic tmp+rename+fsync writes as in
/root/reference/engine/db/table_segment_mvp.cpp:939-1010, name validation as
in utils/common_util.cpp:312-315).
"""
from __future__ import annotations

import os
import re
import threading

_NAME_RE = re.compile(r"^[A-Za-z_][A-Za-z_0-9]*$")


def is_valid_name(name: str) -> bool:
    """Names start with a letter or '_' and contain only letters, digits, '_'."""
    return bool(_NAME_RE.match(name))


def ensure_dir(path: str) -> None:
    os.makedirs(path, exist_ok=True)


def atomic_write_bytes(path: str, data: bytes) -> None:
    """Write via tmp file + fsync + rename so readers never see partial data."""
    tmp = path + ".tmp"
    ensure_dir(os.path.dirname(path) or ".")
    with open(tmp, "wb") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def atomic_write_text(path: str, text: str) -> None:
    atomic_write_bytes(path, text.encode("utf-8"))


def fetch_to_host(arr, chunk_bytes: int = 16 << 20):
    """Device->host fetch chunked along axis 0.

    The tunneled-relay transport collapses on large single transfers
    (measured: one 64 MB d2h moves at ~1.1 MB/s while the same data in
    4-17 MB row-slices sustains 12-43 MB/s — a 10-40x difference), so any
    fetch that can exceed ~32 MB must be sliced. No-op passthrough for
    numpy inputs and small arrays.
    """
    import numpy as np

    if isinstance(arr, np.ndarray):
        return arr
    nbytes = int(np.prod(arr.shape)) * arr.dtype.itemsize
    if nbytes <= 2 * chunk_bytes or arr.ndim == 0 or arr.shape[0] <= 1:
        return np.asarray(arr)
    row_bytes = max(1, nbytes // arr.shape[0])
    rows = max(1, chunk_bytes // row_bytes)
    n = arr.shape[0]
    out = np.empty(arr.shape, dtype=arr.dtype)
    for s in range(0, n, rows):
        out[s:s + rows] = np.asarray(arr[s:s + rows])
    return out


def device_hbm_stats(device=None):
    """(bytes_in_use, bytes_limit) for a device, or None when the backend
    doesn't report memory stats (CPU / some plugin backends)."""
    import jax

    d = device if device is not None else jax.devices()[0]
    try:
        stats = d.memory_stats()
    except Exception:
        return None
    if not stats:
        return None
    used = stats.get("bytes_in_use")
    limit = stats.get("bytes_limit") or stats.get("bytes_reservable_limit")
    if used is None or not limit:
        return None
    return int(used), int(limit)


def require_hbm(bytes_needed: int, label: str = "",
                headroom: float = 0.9) -> bool:
    """HBM pre-check before a phase that uploads large buffers.

    Round-2 postmortem: HBM pressure near capacity on this backend WEDGES
    the device instead of raising (a 16M-row query phase hung on an
    adjacency upload with an 8.2 GB oracle table still resident), and
    hard-killing the wedged process took the tunneled backend down for
    90+ minutes. Raising here turns that outage into a catchable error.

    Returns True when the allocation fits (or stats are unavailable —
    can't block on unknown); raises MemoryError when it would exceed
    `headroom` x free HBM.
    """
    from ..logger import logger

    stats = device_hbm_stats()
    if stats is None:
        logger.debug(f"HBM pre-check ({label}): no memory stats; "
                     f"proceeding with {bytes_needed / 1e9:.2f} GB request")
        return True
    used, limit = stats
    free = limit - used
    logger.info(f"HBM pre-check ({label}): need {bytes_needed / 1e9:.2f} GB,"
                f" free {free / 1e9:.2f} GB of {limit / 1e9:.2f} GB")
    if bytes_needed > headroom * free:
        raise MemoryError(
            f"HBM pre-check failed ({label}): need "
            f"{bytes_needed / 1e9:.2f} GB but only {free / 1e9:.2f} GB free "
            f"({limit / 1e9:.2f} GB total); refusing to wedge the device")
    return True


class AtomicCounter:
    """Monotonic counter with a lock (reference utils/atomic_counter.hpp)."""

    def __init__(self, value: int = 0):
        self._value = value
        self._lock = threading.Lock()

    def get(self) -> int:
        with self._lock:
            return self._value

    def set_value(self, value: int) -> None:
        with self._lock:
            self._value = value

    def increment_and_get(self) -> int:
        with self._lock:
            self._value += 1
            return self._value

    def set_if_greater(self, value: int) -> None:
        with self._lock:
            if value > self._value:
                self._value = value


class BuildPauseGate:
    """Global build pause gate (reference utils/builder_suspend.*, checked
    inside NSG Link loops at nsg.cpp:499,534,693): foreground work can
    suspend background index builds between batches."""

    def __init__(self):
        self._resume = threading.Event()
        self._resume.set()

    def suspend(self) -> None:
        self._resume.clear()

    def resume(self) -> None:
        self._resume.set()

    def check_wait(self, timeout: float = None) -> None:
        self._resume.wait(timeout)


build_pause_gate = BuildPauseGate()
