"""Timestamped logger (reference engine/logger/logger.cpp:16-53).

Writes to stderr so programmatic stdout (bench JSON, piped module output)
stays clean; set VECTORDB_LOG_STREAM=stdout for the reference's behavior.
"""
from __future__ import annotations

import datetime
import os
import sys
import threading

_LEVELS = {"DEBUG": 10, "INFO": 20, "WARNING": 30, "ERROR": 40}
_lock = threading.Lock()


class Logger:
    def __init__(self, name: str = "vectordb_tpu"):
        self.name = name
        self.level = _LEVELS.get(os.environ.get("VECTORDB_LOG_LEVEL", "INFO"), 20)

    def _log(self, level: str, msg: str) -> None:
        if _LEVELS[level] < self.level:
            return
        ts = datetime.datetime.now().strftime("%Y-%m-%d %H:%M:%S.%f")[:-3]
        stream = (sys.stdout if os.environ.get("VECTORDB_LOG_STREAM")
                  == "stdout" else sys.stderr)
        with _lock:
            stream.write(f"[{ts}] [{level}] {msg}\n")
            stream.flush()

    def debug(self, msg: str) -> None:
        self._log("DEBUG", msg)

    def info(self, msg: str) -> None:
        self._log("INFO", msg)

    def warning(self, msg: str) -> None:
        self._log("WARNING", msg)

    def error(self, msg: str) -> None:
        self._log("ERROR", msg)


logger = Logger()
