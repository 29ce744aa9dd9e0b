// WAL-replay smoke: replay a TEXT write-ahead log WRITTEN BY vectordb_tpu
// (config WalTextFormat=true) through the reference engine's OWN
// WriteAheadLog::Replay (db/wal/write_ahead_log.hpp:93-142, unmodified
// sources at /root/reference/engine) into a FRESH in-memory
// TableSegmentMVP, then verify the reconstructed state. Together with
// ref_reader_smoke (segment/graph files) this closes the two-way
// migration loop: both the snapshot artifacts AND the log tail that this
// engine writes are consumed by the reference's code, not by our
// re-implementation of its formats.
//
// Usage:
//   ref_wal_smoke <db_dir> <table_id> <n> <dim>
//                 <expected_vectors.f32> <expected_pks.i64>
//                 [deleted_row ...]
// n/expected files describe the segment AFTER replay in insertion order
// (upserts update in place). Exits 0 on success.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <memory>
#include <set>
#include <string>
#include <unordered_map>
#include <vector>

#include "db/catalog/meta_types.hpp"
#include "db/table_segment_mvp.hpp"
#include "db/wal/write_ahead_log.hpp"

using vectordb::engine::TableSegmentMVP;
using vectordb::engine::WriteAheadLog;
namespace meta = vectordb::engine::meta;

static bool fail(const char* what) {
  std::fprintf(stderr, "WAL SMOKE FAIL: %s\n", what);
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
  if (argc < 7) { std::fprintf(stderr, "bad args\n"); return 2; }
  std::string db_dir = argv[1];
  int64_t table_id = std::atoll(argv[2]);
  int64_t n = std::atoll(argv[3]);
  int64_t dim = std::atoll(argv[4]);
  auto exp_vecs = read_raw<float>(argv[5]);
  auto exp_pks = read_raw<int64_t>(argv[6]);
  std::set<int64_t> deleted_rows;
  for (int i = 7; i < argc; ++i) deleted_rows.insert(std::atoll(argv[i]));

  // Fixture schema: ID BIGINT primary key + V VECTOR_FLOAT(dim) — the
  // same shape the exporter smoke uses.
  meta::TableSchema schema;
  schema.id_ = table_id;
  schema.name_ = "walsmoke";
  meta::FieldSchema fid;
  fid.id_ = 0; fid.name_ = "ID"; fid.is_primary_key_ = true;
  fid.field_type_ = meta::FieldType::INT8;
  meta::FieldSchema fv;
  fv.id_ = 1; fv.name_ = "V";
  fv.field_type_ = meta::FieldType::VECTOR_FLOAT;
  fv.vector_dimension_ = dim;
  fv.metric_type_ = meta::MetricType::EUCLIDEAN;
  schema.fields_ = {fid, fv};
  std::unordered_map<std::string, meta::FieldType> ftm = {
      {"ID", meta::FieldType::INT8}, {"V", meta::FieldType::VECTOR_FLOAT}};

  // Fresh empty segment (the no-disk constructor). Its wal_global_id_ is
  // NOT in that constructor's init list (only the disk-loading one sets
  // -1, table_segment_mvp.cpp:145), so set it explicitly: replay applies
  // entries with id > wal_global_id_.
  auto segment = std::make_shared<TableSegmentMVP>(schema, n + 64, nullptr);
  segment->wal_global_id_ = -1;

  // Follower-mode WAL (never rotates, deletes, or rewrites last_id.txt —
  // the replay must be non-destructive on the fixture directory).
  WriteAheadLog wal(db_dir, table_id, /*is_leader=*/false);
  std::unordered_map<std::string, std::string> headers;
  wal.Replay(schema, ftm, segment, headers);

  if ((int64_t)segment->record_number_.load() != n)
    return !fail("record_number after replay");
  size_t id_off = segment->field_id_mem_offset_map_[0];
  for (int64_t r = 0; r < n; ++r) {
    int64_t got;
    std::memcpy(&got,
                segment->attribute_table_ + r * segment->primitive_offset_
                    + id_off,
                sizeof(int64_t));
    if (got != exp_pks[r]) return !fail("pk column mismatch");
  }
  float* vecs =
      segment->vector_tables_[segment->field_id_mem_offset_map_[1]];
  for (int64_t r = 0; r < n; ++r) {
    for (int64_t d = 0; d < dim; ++d) {
      float got = vecs[r * dim + d];
      float want = exp_vecs[r * dim + d];
      // Bit-exact: the WAL carries decimal JSON but both sides parse it
      // with shortest-round-trip semantics, so f32 values survive.
      if (std::memcmp(&got, &want, sizeof(float)) != 0)
        return !fail("vector bytes mismatch after replay");
    }
  }
  for (int64_t r = 0; r < n; ++r) {
    bool want = deleted_rows.count(r) > 0;
    if (segment->deleted_->test(r) != want)
      return !fail("deleted bitset after replay");
  }

  std::printf("ref_wal_smoke OK: n=%lld dim=%lld deleted=%zu\n",
              (long long)n, (long long)dim, deleted_rows.size());
  return 0;
}
