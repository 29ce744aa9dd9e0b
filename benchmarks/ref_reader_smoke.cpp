// Reader-smoke: open artifacts EXPORTED BY vectordb_tpu with the reference
// engine's OWN loaders (unmodified sources at /root/reference/engine):
//   - TableSegmentMVP's load constructor (db/table_segment_mvp.cpp:133-295)
//   - ANNGraphSegment's disk constructor  (db/ann_graph_segment.cpp:39-98)
// and verify the loaded state against expectation files written by the
// exporter's test. This makes the "drop-in rollback to the C++ engine"
// claim real: the reference's readers — not our re-implementation of their
// format — accept the exported bytes.
//
// Usage:
//   ref_reader_smoke <db_dir> <table_id> <n> <dim> <vec_field_id>
//                    <expected_vectors.f32> <expected_pks.i64>
//                    <first_record_id> [deleted_row ...]
// Exits 0 on success; prints the first mismatch and exits 1 otherwise.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <queue>
#include <set>
#include <string>
#include <vector>

#include "db/ann_graph_segment.hpp"
#include "db/catalog/meta_types.hpp"
#include "db/table_segment_mvp.hpp"

using vectordb::engine::ANNGraphSegment;
using vectordb::engine::TableSegmentMVP;
namespace meta = vectordb::engine::meta;

static bool fail(const char* what) {
  std::fprintf(stderr, "SMOKE FAIL: %s\n", what);
  return false;
}

template <typename T>
static std::vector<T> read_raw(const std::string& path) {
  std::ifstream f(path, std::ios::binary | std::ios::ate);
  if (!f) { std::fprintf(stderr, "cannot open %s\n", path.c_str()); exit(2); }
  size_t bytes = f.tellg();
  f.seekg(0);
  std::vector<T> out(bytes / sizeof(T));
  f.read(reinterpret_cast<char*>(out.data()), bytes);
  return out;
}

int main(int argc, char** argv) {
  if (argc < 9) { std::fprintf(stderr, "bad args\n"); return 2; }
  std::string db_dir = argv[1];
  int64_t table_id = std::atoll(argv[2]);
  int64_t n = std::atoll(argv[3]);
  int64_t dim = std::atoll(argv[4]);
  int64_t vec_field_id = std::atoll(argv[5]);
  auto exp_vecs = read_raw<float>(argv[6]);
  auto exp_pks = read_raw<int64_t>(argv[7]);
  int64_t first_record_id = std::atoll(argv[8]);
  std::set<int64_t> deleted_rows;
  for (int i = 9; i < argc; ++i) deleted_rows.insert(std::atoll(argv[i]));

  // The fixture schema: ID BIGINT primary key + V VECTOR_FLOAT(dim).
  meta::TableSchema schema;
  schema.id_ = table_id;
  schema.name_ = "smoke";
  meta::FieldSchema fid;
  fid.id_ = 0; fid.name_ = "ID"; fid.is_primary_key_ = true;
  fid.field_type_ = meta::FieldType::INT8;
  meta::FieldSchema fv;
  fv.id_ = vec_field_id; fv.name_ = "V";
  fv.field_type_ = meta::FieldType::VECTOR_FLOAT;
  fv.vector_dimension_ = dim;
  fv.metric_type_ = meta::MetricType::EUCLIDEAN;
  schema.fields_ = {fid, fv};

  // --- 1. the reference's segment loader on our data_mvp.bin ----------
  TableSegmentMVP seg(schema, db_dir, n + 16, nullptr);
  if ((int64_t)seg.record_number_.load() != n) return !fail("record_number");
  if ((int64_t)seg.first_record_id_ != first_record_id)
    return !fail("first_record_id");
  // Attribute column: ID BIGINT at its mem offset, row stride
  // primitive_offset_ (table_segment_mvp.cpp:52-115 layout rules).
  size_t id_off = seg.field_id_mem_offset_map_[0];
  for (int64_t r = 0; r < n; ++r) {
    int64_t got;
    std::memcpy(&got,
                seg.attribute_table_ + r * seg.primitive_offset_ + id_off,
                sizeof(int64_t));
    if (got != exp_pks[r]) return !fail("pk column mismatch");
  }
  // Dense vectors must be bit-exact f32.
  float* vecs = seg.vector_tables_[seg.field_id_mem_offset_map_[vec_field_id]];
  if (std::memcmp(vecs, exp_vecs.data(), sizeof(float) * n * dim) != 0)
    return !fail("vector table bytes mismatch");
  // Deleted bitset round-trips.
  for (int64_t r = 0; r < n; ++r) {
    bool want = deleted_rows.count(r) > 0;
    if (seg.deleted_->test(r) != want) return !fail("deleted bitset");
  }

  // --- 2. the reference's graph loader on our ann_graph_<id>.bin ------
  ANNGraphSegment g(db_dir, table_id, vec_field_id);
  if ((int64_t)g.record_number_ != n) return !fail("graph record_number");
  if ((int64_t)g.first_record_id_ != first_record_id)
    return !fail("graph first_record_id");
  if (g.navigation_point_ < 0 || g.navigation_point_ >= n)
    return !fail("navigation point range");
  int64_t edges = g.offset_table_[n];
  for (int64_t r = 0; r < n; ++r)
    if (g.offset_table_[r] > g.offset_table_[r + 1])
      return !fail("offset table not monotonic");
  for (int64_t e = 0; e < edges; ++e)
    if (g.neighbor_list_[e] < 0 || g.neighbor_list_[e] >= n)
      return !fail("neighbor id out of range");

  // --- 3. drive a greedy best-first search over the LOADED graph ------
  // (CSR exactly as the reference's VecSearchExecutor consumes it): a
  // self-query from every 97th row must reach itself. Proves the exported
  // topology is navigable, not just parseable.
  auto dist2 = [&](int64_t a, const float* q) {
    const float* x = vecs + a * dim;
    double s = 0;
    for (int64_t d = 0; d < dim; ++d) { double t = x[d] - q[d]; s += t * t; }
    return s;
  };
  for (int64_t probe = 0; probe < n; probe += 97) {
    if (deleted_rows.count(probe)) continue;
    const float* q = exp_vecs.data() + probe * dim;
    std::set<int64_t> visited;
    // (distance, id) min-heap beam of width 64
    std::priority_queue<std::pair<double, int64_t>,
                        std::vector<std::pair<double, int64_t>>,
                        std::greater<>> cand;
    cand.emplace(dist2(g.navigation_point_, q), g.navigation_point_);
    bool found = probe == g.navigation_point_;
    for (int steps = 0; steps < 512 && !cand.empty() && !found; ++steps) {
      auto [d, u] = cand.top();
      cand.pop();
      if (!visited.insert(u).second) continue;
      if (u == probe) { found = true; break; }
      for (int64_t e = g.offset_table_[u]; e < g.offset_table_[u + 1]; ++e) {
        int64_t v = g.neighbor_list_[e];
        if (!visited.count(v)) cand.emplace(dist2(v, q), v);
      }
    }
    if (!found) return !fail("graph walk could not reach self-query row");
  }

  std::printf("ref_reader_smoke OK: n=%lld dim=%lld edges=%lld nav=%d\n",
              (long long)n, (long long)dim, (long long)edges,
              (int)g.navigation_point_);
  return 0;
}
