"""Write-ahead log with the reference's on-disk format.

Matches /root/reference/engine/db/wal/write_ahead_log.hpp: per-table append-only
text logs at `{base}/{table_id}/wal/<epoch-seconds>.log`, each line
`"<global_id> <type> <json>\n"` with types INSERT=1 DELETE=2 UPSERT=3; 600 s
rotation, 7-day retention, `last_id.txt` persists the counter; leader-only
writes; replay applies entries with id > the segment's consumed wal_global_id.
WAL files written by the reference engine replay here unchanged.
"""
from __future__ import annotations

import json
import os
import time
from typing import Callable, List, Optional

from .logger import logger
from .utils import AtomicCounter, ensure_dir

ROTATION_INTERVAL_S = 600
LOG_RETENTION_S = 3600 * 24 * 7

INSERT = 1
DELETE = 2
UPSERT = 3


class WriteAheadLog:
    def __init__(self, base_path: str, table_id: int, is_leader: bool):
        self.logs_folder = os.path.join(base_path, str(table_id), "wal")
        self.is_leader = is_leader
        self.enabled = True
        self.counter = AtomicCounter()
        self._file = None
        self._last_rotation = time.time()

        id_path = os.path.join(self.logs_folder, "last_id.txt")
        if os.path.exists(id_path):
            try:
                with open(id_path, "r") as f:
                    self.counter.set_value(int(f.read().strip()))
            except (ValueError, OSError):
                pass
        if is_leader:
            ensure_dir(self.logs_folder)
            self._rotate()

    def close(self) -> None:
        if self._file is not None:
            self._file.close()
            self._file = None
        if self.is_leader:
            self._save_last_id()

    def _save_last_id(self) -> None:
        ensure_dir(self.logs_folder)
        with open(os.path.join(self.logs_folder, "last_id.txt"), "w") as f:
            f.write(str(self.counter.get()))

    def _rotate(self) -> None:
        if self._file is not None:
            self._file.close()
        ensure_dir(self.logs_folder)
        name = os.path.join(self.logs_folder, f"{int(time.time())}.log")
        self._file = open(name, "a", encoding="utf-8")
        self._last_rotation = time.time()

    def set_enabled(self, enabled: bool) -> None:
        self.enabled = enabled

    def set_leader(self, leader: bool) -> None:
        self.is_leader = leader
        if leader:
            self._rotate()

    def write_entry(self, entry_type: int, entry: str) -> int:
        """Append one entry; returns its global id (WriteEntry, wal:71-91)."""
        if not self.enabled or not self.is_leader:
            return self.counter.get()
        if time.time() - self._last_rotation > ROTATION_INTERVAL_S:
            self._rotate()
        next_id = self.counter.increment_and_get()
        self._file.write(f"{next_id} {entry_type} {entry}\n")
        self._file.flush()
        return next_id

    def _sorted_log_files(self) -> List[str]:
        if not os.path.isdir(self.logs_folder):
            return []
        files = [os.path.join(self.logs_folder, f)
                 for f in os.listdir(self.logs_folder) if f.endswith(".log")]
        return sorted(files)

    def replay(self, apply_entry: Callable[[int, int, str], None],
               consumed_id: int) -> None:
        """Re-apply entries with id > consumed_id (Replay, wal:93-142).

        apply_entry(global_id, entry_type, content_json_str).
        """
        files = self._sorted_log_files()
        for pt, path in enumerate(files):
            update = False
            try:
                with open(path, "r", encoding="utf-8") as f:
                    for line in f:
                        line = line.rstrip("\n")
                        if not line:
                            continue
                        first = line.find(" ")
                        second = line.find(" ", first + 1)
                        if first < 0 or second < 0:
                            continue
                        global_id = int(line[:first])
                        self.counter.set_if_greater(global_id)
                        if global_id <= consumed_id:
                            continue
                        update = True
                        entry_type = int(line[first + 1:second])
                        content = line[second + 1:]
                        try:
                            apply_entry(global_id, entry_type, content)
                        except Exception as e:  # match reference: log & go on
                            logger.error("Fail to apply wal entry: " + str(e))
            except OSError as e:
                logger.error("Error reading WAL file " + path + ": " + str(e))
                continue
            if self.is_leader and not update and pt < len(files) - 1:
                try:
                    os.remove(path)
                except OSError:
                    pass
        if self.is_leader:
            self._save_last_id()

    def clean_up_old_files(self) -> None:
        now = time.time()
        for path in self._sorted_log_files():
            stem = os.path.splitext(os.path.basename(path))[0]
            try:
                ts = int(stem)
            except ValueError:
                continue
            if now - ts > LOG_RETENTION_S:
                try:
                    os.remove(path)
                except OSError:
                    pass
            else:
                break


def encode_delete_entry(pks: List, filter_str: str) -> str:
    return json.dumps({"pk": pks, "filter": filter_str})


def decode_delete_entry(content: str):
    """DELETE entries: new format {'pk': [...], 'filter': '...'} or legacy
    bare pk array (ApplyEntry, wal:187-237)."""
    obj = json.loads(content)
    if isinstance(obj, dict):
        return obj.get("pk", []), obj.get("filter", "")
    return obj, ""
