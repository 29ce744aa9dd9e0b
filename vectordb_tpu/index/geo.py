"""Geospatial point index: uniform lat/lon grid with haversine search.

Equivalent of the reference's Boost.Geometry R-tree GeospatialIndex
(/root/reference/engine/db/index/spatial/geoindex.{hpp,cpp}): insert/delete
points keyed by row id, radius search in kilometers via haversine distance
(geoindex.cpp:41-59). A uniform grid replaces the R-tree — candidate cells
are pruned by bounding box, candidates verified with vectorized numpy
haversine, which suits the columnar store better than per-node trees.
"""
from __future__ import annotations

import math
import threading
from typing import Dict, List, Set, Tuple

import numpy as np

from ..expr.evaluator import haversine_km

EARTH_RADIUS_KM = 6371.0


class GeospatialIndex:
    def __init__(self, cell_deg: float = 1.0):
        self.cell_deg = cell_deg
        self._cells: Dict[Tuple[int, int], Set[int]] = {}
        self._points: Dict[int, Tuple[float, float]] = {}
        self._lock = threading.Lock()

    def _cell(self, lat: float, lon: float) -> Tuple[int, int]:
        return (int(math.floor(lat / self.cell_deg)),
                int(math.floor(lon / self.cell_deg)))

    def insert_point(self, lat: float, lon: float, row_id: int) -> None:
        with self._lock:
            self._points[row_id] = (lat, lon)
            self._cells.setdefault(self._cell(lat, lon), set()).add(row_id)

    def bulk_insert(self, lats: np.ndarray, lons: np.ndarray,
                    row_ids: np.ndarray) -> None:
        """Vectorized batch insert: one numpy pass computes every cell key,
        rows are grouped per cell with a single sort (replaces per-point
        insert_point calls on snapshot load / bulk ingest)."""
        n = len(row_ids)
        if n == 0:
            return
        lats = np.asarray(lats, dtype=np.float64)
        lons = np.asarray(lons, dtype=np.float64)
        row_ids = np.asarray(row_ids, dtype=np.int64)
        ci = np.floor(lats / self.cell_deg).astype(np.int64)
        cj = np.floor(lons / self.cell_deg).astype(np.int64)
        # Composite key for grouping (lon cells fit comfortably in 2^32).
        key = ci * (1 << 32) + cj
        order = np.argsort(key, kind="stable")
        keys_sorted = key[order]
        boundaries = np.nonzero(np.diff(keys_sorted))[0] + 1
        groups = np.split(order, boundaries)
        with self._lock:
            self._points.update(
                zip(row_ids.tolist(), zip(lats.tolist(), lons.tolist())))
            for grp in groups:
                r0 = int(grp[0])
                cell = (int(ci[r0]), int(cj[r0]))
                self._cells.setdefault(cell, set()).update(
                    row_ids[grp].tolist())

    def delete_point(self, row_id: int) -> None:
        with self._lock:
            pt = self._points.pop(row_id, None)
            if pt is None:
                return
            cell = self._cell(*pt)
            bucket = self._cells.get(cell)
            if bucket is not None:
                bucket.discard(row_id)
                if not bucket:
                    del self._cells[cell]

    def __len__(self) -> int:
        return len(self._points)

    @staticmethod
    def distance_km(lat1, lon1, lat2, lon2) -> float:
        return float(haversine_km(lat1, lon1, lat2, lon2))

    def search_within_radius(self, lat: float, lon: float,
                             radius_km: float) -> List[int]:
        """Row ids within radius_km of (lat, lon), nearest first."""
        # Bounding box in grid cells (lon span widens toward the poles).
        dlat = math.degrees(radius_km / EARTH_RADIUS_KM)
        cos_lat = max(math.cos(math.radians(lat)), 1e-6)
        dlon = math.degrees(radius_km / (EARTH_RADIUS_KM * cos_lat))
        lat0, lat1 = lat - dlat, lat + dlat
        lon0, lon1 = lon - dlon, lon + dlon
        ci0 = int(math.floor(lat0 / self.cell_deg))
        ci1 = int(math.floor(lat1 / self.cell_deg))
        # Longitude cell range, wrapping across the antimeridian: a box
        # crossing lon=±180 becomes the union of two lon-cell intervals
        # (the reference's R-tree has no such hole because it haversine-
        # checks every point; the grid must produce the wrapped candidates).
        cj_set: Set[int] = set()
        if lon1 - lon0 >= 360.0:
            intervals = [(-180.0, 180.0)]
        elif lon0 < -180.0:
            intervals = [(lon0 + 360.0, 180.0), (-180.0, lon1)]
        elif lon1 > 180.0:
            intervals = [(lon0, 180.0), (-180.0, lon1 - 360.0)]
        else:
            intervals = [(lon0, lon1)]
        for a, b in intervals:
            cj_set.update(range(int(math.floor(a / self.cell_deg)),
                                int(math.floor(b / self.cell_deg)) + 1))
        cand: List[int] = []
        with self._lock:
            for ci in range(ci0, ci1 + 1):
                for cj in cj_set:
                    cand.extend(self._cells.get((ci, cj), ()))
            if not cand:
                return []
            pts = np.asarray([self._points[r] for r in cand])
        d = haversine_km(pts[:, 0], pts[:, 1], lat, lon)
        order = np.argsort(d, kind="stable")
        cand_arr = np.asarray(cand)
        keep = d[order] <= radius_km
        return cand_arr[order][keep].tolist()
