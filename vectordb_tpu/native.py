"""ctypes loader for the native C++ IO runtime (native/libvdbnative.so).

The library is built on first use with `make -C native` (g++). All call
sites fall back to pure-Python implementations when the library is missing
or the build fails, so the engine never hard-depends on the toolchain.
Disable with VECTORDB_TPU_NATIVE=off.
"""
from __future__ import annotations

import ctypes
import os
import threading
from typing import List, Optional

from ._native_build import ensure_built
from .logger import logger

_lock = threading.Lock()
_native = None
_tried = False


class Native:
    def __init__(self, lib: ctypes.CDLL):
        self.lib = lib
        lib.vdb_wal_append.argtypes = [
            ctypes.c_int, ctypes.c_uint64, ctypes.c_uint8,
            ctypes.c_char_p, ctypes.c_uint64, ctypes.c_int]
        lib.vdb_wal_append.restype = ctypes.c_int
        lib.vdb_snapshot_write.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_int]
        lib.vdb_snapshot_write.restype = ctypes.c_int64
        lib.vdb_crc32.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
        lib.vdb_crc32.restype = ctypes.c_uint32
        lib.vdb_reverse_edges.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p]
        lib.vdb_reverse_edges.restype = None
        try:  # symbol may be absent in a stale pre-built library
            lib.vdb_bfs_reach.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_void_p]
            lib.vdb_bfs_reach.restype = ctypes.c_int64
            self.has_bfs = True
        except AttributeError:
            self.has_bfs = False

    def wal_append(self, fd: int, entry_id: int, entry_type: int,
                   payload: bytes, do_fsync: bool = False) -> None:
        rc = self.lib.vdb_wal_append(fd, entry_id, entry_type, payload,
                                     len(payload), 1 if do_fsync else 0)
        if rc != 0:
            raise OSError(-rc, os.strerror(-rc))

    def snapshot_write(self, path: str, header: bytes,
                       sections: List[bytes]) -> int:
        arr_t = ctypes.c_char_p * len(sections)
        len_t = ctypes.c_uint64 * len(sections)
        ptrs = arr_t(*sections)
        lens = len_t(*[len(s) for s in sections])
        rc = self.lib.vdb_snapshot_write(path.encode(), header, len(header),
                                         ptrs, lens, len(sections))
        if rc < 0:
            raise OSError(int(-rc), os.strerror(int(-rc)))
        return int(rc)

    def crc32(self, data: bytes) -> int:
        return int(self.lib.vdb_crc32(data, len(data)))

    def reverse_edges(self, fwd, adjacency, degree: int, r_total: int):
        """In-place reverse-edge insertion (see vdb_reverse_edges).

        fwd: contiguous int32 [n, degree]; adjacency: contiguous int32
        [n, r_total] with forward edges in the first columns. Returns the
        per-node fill counts [n] int64.
        """
        import numpy as np

        n = fwd.shape[0]
        fill = np.zeros(n, dtype=np.int32)
        self.lib.vdb_reverse_edges(
            fwd.ctypes.data_as(ctypes.c_void_p), n, degree, r_total,
            adjacency.ctypes.data_as(ctypes.c_void_p),
            fill.ctypes.data_as(ctypes.c_void_p))
        return fill.astype(np.int64)

    def bfs_reach(self, adjacency, seeds, reached, queue) -> int:
        """Incremental BFS over contiguous int32 [n, r_total] adjacency:
        marks rows reachable from `seeds` (int32 [m]) in `reached`
        (uint8 [n], already-1 rows are not re-expanded); `queue` is int32
        [n] scratch. Returns the count of newly reached rows."""
        return int(self.lib.vdb_bfs_reach(
            adjacency.ctypes.data_as(ctypes.c_void_p), adjacency.shape[0],
            adjacency.shape[1], seeds.ctypes.data_as(ctypes.c_void_p),
            seeds.shape[0], reached.ctypes.data_as(ctypes.c_void_p),
            queue.ctypes.data_as(ctypes.c_void_p)))


def get_native() -> Optional[Native]:
    """The loaded native runtime, or None (pure-Python fallbacks apply)."""
    global _native, _tried
    if _tried:
        return _native
    with _lock:
        if _tried:
            return _native
        _tried = True
        if os.environ.get("VECTORDB_TPU_NATIVE", "").lower() == "off":
            return None
        # Content-hash-keyed build (see _native_build.ensure_built): no
        # committed binary, no mtime race after a fresh clone.
        lib_path = ensure_built("libvdbnative.so", ["vdbnative.cpp"])
        if lib_path is None:
            return None
        try:
            _native = Native(ctypes.CDLL(lib_path))
            logger.debug("native IO runtime loaded")
        except OSError as e:
            logger.debug(f"native library load failed: {e}")
            _native = None
    return _native
