from .common import (atomic_write_bytes, atomic_write_text, is_valid_name,
                     ensure_dir, fetch_to_host, AtomicCounter,
                     BuildPauseGate, build_pause_gate, device_hbm_stats,
                     require_hbm)

__all__ = ["atomic_write_bytes", "atomic_write_text", "is_valid_name",
           "ensure_dir", "fetch_to_host", "AtomicCounter", "BuildPauseGate",
           "build_pause_gate", "device_hbm_stats", "require_hbm"]
