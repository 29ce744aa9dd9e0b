"""Content-hash-keyed builder for the native extensions in native/.

Both native artifacts (libvdbnative.so — ctypes IO runtime; and
vdb_fastjson.so — CPython JSON encoder) are built from source on first
use and cached under native/build/<name>-<sha12>.so, keyed on a sha256
of the SOURCE content rather than mtimes: after a fresh `git clone`
every mtime is checkout time, so an out-of-sync prebuilt binary next to
newer source would silently win an mtime race (advisor finding r4).
Binaries are never committed — only source ships; a failed build (or a
missing toolchain) returns None and callers fall back to pure Python.
"""
from __future__ import annotations

import hashlib
import os
import subprocess
from typing import Optional

from .logger import logger

NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_BUILD_DIR = os.path.join(NATIVE_DIR, "build")


def ensure_built(target: str, sources: list[str],
                 timeout: int = 120) -> Optional[str]:
    """Return the path of an up-to-date build of `target` (a Makefile
    target in native/, e.g. "vdb_fastjson.so"), building it if the cache
    has no artifact for the current source content. None on any failure
    (missing toolchain, compile error, timeout) — callers must degrade
    gracefully."""
    h = hashlib.sha256()
    for s in sources:
        p = os.path.join(NATIVE_DIR, s)
        try:
            with open(p, "rb") as f:
                h.update(f.read())
        except OSError as e:
            logger.debug(f"native source unreadable ({p}): {e}")
            return None
    stem = target.rsplit(".", 1)[0]
    cached = os.path.join(_BUILD_DIR, f"{stem}-{h.hexdigest()[:12]}.so")
    if os.path.exists(cached):
        return cached
    try:
        # -B forces the rebuild: a stale same-named artifact in native/
        # (e.g. from an older checkout) must never satisfy the rule.
        proc = subprocess.run(["make", "-B", "-C", NATIVE_DIR, target],
                              capture_output=True, timeout=timeout)
        if proc.returncode != 0:
            logger.debug(f"native build of {target} failed (rc="
                         f"{proc.returncode}): "
                         + proc.stderr.decode(errors="replace")[-500:])
            return None
    except (OSError, subprocess.TimeoutExpired) as e:
        logger.debug(f"native build unavailable: {e}")
        return None
    built = os.path.join(NATIVE_DIR, target)
    if not os.path.exists(built):
        return None
    os.makedirs(_BUILD_DIR, exist_ok=True)
    tmp = f"{cached}.tmp.{os.getpid()}"
    with open(built, "rb") as fsrc, open(tmp, "wb") as fdst:
        fdst.write(fsrc.read())
    os.replace(tmp, cached)  # atomic: concurrent importers race the build
    return cached
