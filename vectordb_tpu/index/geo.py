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
        c0 = self._cell(lat0, lon0)
        c1 = self._cell(lat1, lon1)
        cand: List[int] = []
        with self._lock:
            for ci in range(c0[0], c1[0] + 1):
                for cj in range(c0[1], c1[1] + 1):
                    cand.extend(self._cells.get((ci, cj), ()))
            if not cand:
                return []
            pts = np.asarray([self._points[r] for r in cand])
        d = haversine_km(pts[:, 0], pts[:, 1], lat, lon)
        order = np.argsort(d, kind="stable")
        cand_arr = np.asarray(cand)
        keep = d[order] <= radius_km
        return cand_arr[order][keep].tolist()
