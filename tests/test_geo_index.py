"""GeospatialIndex grid: insert/delete/radius semantics
(reference db/index/spatial/geoindex.cpp)."""
import numpy as np

from vectordb_tpu.index.geo import GeospatialIndex


def test_radius_search_sorted_by_distance():
    idx = GeospatialIndex()
    idx.insert_point(37.0, -122.0, 1)
    idx.insert_point(37.01, -122.0, 2)    # ~1.1 km north
    idx.insert_point(37.1, -122.0, 3)     # ~11 km north
    idx.insert_point(48.0, 2.0, 4)        # Paris
    got = idx.search_within_radius(37.0, -122.0, 5)
    assert got == [1, 2]
    got = idx.search_within_radius(37.0, -122.0, 20)
    assert got == [1, 2, 3]


def test_delete_point():
    idx = GeospatialIndex()
    idx.insert_point(10.0, 10.0, 7)
    assert idx.search_within_radius(10.0, 10.0, 1) == [7]
    idx.delete_point(7)
    assert idx.search_within_radius(10.0, 10.0, 1) == []
    assert len(idx) == 0


def test_cross_cell_boundary():
    idx = GeospatialIndex(cell_deg=1.0)
    idx.insert_point(0.999, 0.999, 1)
    idx.insert_point(1.001, 1.001, 2)  # adjacent cell
    got = idx.search_within_radius(1.0, 1.0, 5)
    assert sorted(got) == [1, 2]


def test_pole_longitude_widening():
    idx = GeospatialIndex(cell_deg=1.0)
    idx.insert_point(80.0, 10.0, 1)
    idx.insert_point(80.0, 12.0, 2)  # ~39 km away at this latitude
    got = idx.search_within_radius(80.0, 10.0, 50)
    assert sorted(got) == [1, 2]


def test_antimeridian_wrap():
    # A 44 km neighbor across the date line must be found (ADVICE r1).
    idx = GeospatialIndex(cell_deg=1.0)
    idx.insert_point(0.0, -179.8, 1)
    idx.insert_point(0.0, 179.9, 2)
    got = idx.search_within_radius(0.0, 179.8, 60)
    assert sorted(got) == [1, 2]
    got = idx.search_within_radius(0.0, -179.9, 60)
    assert sorted(got) == [1, 2]
    # And a tight radius still excludes the far side.
    assert idx.search_within_radius(0.0, 179.8, 5) == []
