// Boost-free stand-in for the reference GeospatialIndex (the image has no
// Boost; the reference header pulls boost::geometry's R-tree). Same public
// API and the same haversine-km semantics (geoindex.cpp:38-59); the R-tree
// is replaced by a linear scan — the reader-smoke / bench fixtures hold at
// most a handful of geo points. Header-only so no extra TU is needed.
#pragma once
#include <cmath>
#include <cstdint>
#include <mutex>
#include <shared_mutex>
#include <utility>
#include <vector>

namespace vectordb {
namespace engine {
namespace index {

class GeospatialIndex {
 public:
  struct point_t {
    double lat = 0.0, lon = 0.0;
    point_t() = default;
    point_t(double la, double lo) : lat(la), lon(lo) {}
    template <int I>
    double get() const { return I == 0 ? lat : lon; }
  };
  typedef std::pair<point_t, int64_t> value_t;

  GeospatialIndex() = default;
  ~GeospatialIndex() = default;

  void insertPoint(double lat, double lon, int64_t id) {
    std::unique_lock<std::shared_mutex> lock(mutex_);
    points_.emplace_back(point_t(lat, lon), id);
  }

  void deletePoint(double lat, double lon, int64_t id) {
    std::unique_lock<std::shared_mutex> lock(mutex_);
    for (auto it = points_.begin(); it != points_.end(); ++it) {
      if (it->second == id && it->first.lat == lat && it->first.lon == lon) {
        points_.erase(it);
        return;
      }
    }
  }

  void searchWithinRadius(double lat, double lon, double radius_km,
                          std::vector<value_t>& results) const {
    std::shared_lock<std::shared_mutex> lock(mutex_);
    point_t q(lat, lon);
    for (const auto& v : points_) {
      if (distance(q, v.first) <= radius_km) results.push_back(v);
    }
  }

  static double distance(const point_t& p1, const point_t& p2) {
    // Same haversine as the reference (earth radius 6371 km).
    double earth_radius = 6371.0;
    double lat1 = degToRad(p1.lat), lon1 = degToRad(p1.lon);
    double lat2 = degToRad(p2.lat), lon2 = degToRad(p2.lon);
    double dlat = lat2 - lat1, dlon = lon2 - lon1;
    double a = std::sin(dlat / 2) * std::sin(dlat / 2) +
               std::cos(lat1) * std::cos(lat2) *
               std::sin(dlon / 2) * std::sin(dlon / 2);
    return earth_radius * 2 * std::atan2(std::sqrt(a), std::sqrt(1 - a));
  }

 private:
  static double degToRad(double deg) { return deg * (M_PI / 180.0); }
  mutable std::shared_mutex mutex_;
  std::vector<value_t> points_;
};

}  // namespace index
}  // namespace engine
}  // namespace vectordb
