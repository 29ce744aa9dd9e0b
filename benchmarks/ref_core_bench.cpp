// Reference-engine core benchmark: drives the *actual* EpsillaDB index
// code (NN-Descent KNN graph -> NSG build -> graph search) compiled from
// /root/reference/engine sources, on the same dataset bench.py uses, to
// produce the measured C++ CPU baseline that BASELINE.md requires.
//
// The full reference server cannot be built here (no Boost headers, no
// oatpp, zero egress); benchmarks/refshim/ supplies minimal header shims
// for the handful of Boost pieces the index core uses. The code being
// measured is the reference's own, unmodified:
//   - KNNGraph / NNDescent      (db/index/knn/knn.hpp:90-135, nndescent.hpp)
//   - NsgIndex::Build           (db/index/nsg/nsg.cpp:45-99)
//   - NsgIndex::Search          (db/index/nsg/nsg.cpp:777-812, OpenMP batch)
// Build driver mirrors ANNGraphSegment::BuildFromVectorTable
// (db/ann_graph_segment.cpp:201-242) with its default NSGConfig
// (45, 50, 300, knng K=100).
//
// Inputs are raw little-endian files produced by make_bench_data.py:
//   data.bin    float32 [N, D]
//   queries.bin float32 [Q, D]
//   gt.bin      int64   [Q, K]   exact top-K ids (EUCLIDEAN)
// Output: one JSON line on stdout.
#include <omp.h>

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <iostream>
#include <string>
#include <unordered_set>
#include <vector>

#include "db/index/knn/knn.hpp"
#include "db/index/nsg/nsg.hpp"

using vectordb::engine::index::Graph;
using vectordb::engine::index::NsgIndex;
using vectordb::engine::index::SearchParams;

static std::vector<char> ReadFile(const std::string& path) {
  std::ifstream f(path, std::ios::binary | std::ios::ate);
  if (!f) {
    std::cerr << "cannot open " << path << "\n";
    std::exit(1);
  }
  std::streamsize sz = f.tellg();
  f.seekg(0);
  std::vector<char> buf(sz);
  f.read(buf.data(), sz);
  return buf;
}

int main(int argc, char** argv) {
  if (argc < 5) {
    std::cerr << "usage: ref_core_bench <dir> <N> <D> <K> [search_length...]\n";
    return 1;
  }
  const std::string dir = argv[1];
  const size_t n = std::strtoull(argv[2], nullptr, 10);
  const size_t dim = std::strtoull(argv[3], nullptr, 10);
  const size_t k = std::strtoull(argv[4], nullptr, 10);
  std::vector<size_t> search_lengths;
  for (int i = 5; i < argc; ++i)
    search_lengths.push_back(std::strtoull(argv[i], nullptr, 10));
  if (search_lengths.empty()) search_lengths = {45, 60, 80, 100, 150};

  auto data_buf = ReadFile(dir + "/data.bin");
  auto query_buf = ReadFile(dir + "/queries.bin");
  auto gt_buf = ReadFile(dir + "/gt.bin");
  float* data = reinterpret_cast<float*>(data_buf.data());
  float* queries = reinterpret_cast<float*>(query_buf.data());
  int64_t* gt = reinterpret_cast<int64_t*>(gt_buf.data());
  const size_t nq = query_buf.size() / (sizeof(float) * dim);
  if (data_buf.size() != n * dim * sizeof(float) ||
      gt_buf.size() != nq * k * sizeof(int64_t)) {
    std::cerr << "size mismatch\n";
    return 1;
  }
  std::cerr << "loaded n=" << n << " d=" << dim << " nq=" << nq
            << " threads=" << omp_get_max_threads() << "\n";

  // ---- Build: mirrors ANNGraphSegment::BuildFromVectorTable -------------
  auto t0 = std::chrono::steady_clock::now();
  Graph knng(n);
  {
    vectordb::engine::index::KNNGraph g(
        n, dim, 100, vectordb::engine::VectorColumnData(data), knng,
        vectordb::engine::meta::MetricType::EUCLIDEAN);
  }
  auto t1 = std::chrono::steady_clock::now();
  double knn_s = std::chrono::duration<double>(t1 - t0).count();
  std::cerr << "nn-descent: " << knn_s << "s\n";

  NsgIndex index(dim, n, NsgIndex::Metric_Type::Metric_Type_L2);
  index.SetKnnGraph(knng);
  vectordb::engine::index::BuildParams params;
  params.search_length = 45;   // Default_NSG_Config, ann_graph_segment.cpp:29
  params.out_degree = 50;
  params.candidate_pool_size = 300;
  std::vector<int64_t> ids(n);
  for (size_t i = 0; i < n; ++i) ids[i] = (int64_t)i;
  index.Build(n, data, ids.data(), params);
  auto t2 = std::chrono::steady_clock::now();
  double nsg_s = std::chrono::duration<double>(t2 - t1).count();
  double build_s = std::chrono::duration<double>(t2 - t0).count();
  std::cerr << "nsg build: " << nsg_s << "s (total " << build_s << "s)\n";

  // ---- Search: NsgIndex::Search, OpenMP over the query batch ------------
  std::vector<float> out_dist(nq * k);
  std::vector<int64_t> out_ids(nq * k);
  double best_qps = 0.0, best_recall = 0.0;
  size_t best_sl = 0;
  for (size_t sl : search_lengths) {
    SearchParams sp;
    sp.search_length = sl;
    sp.k = k;
    // warmup + timed run
    index.Search(queries, nq, dim, k, out_dist.data(), out_ids.data(), sp,
                 nullptr);
    auto s0 = std::chrono::steady_clock::now();
    index.Search(queries, nq, dim, k, out_dist.data(), out_ids.data(), sp,
                 nullptr);
    auto s1 = std::chrono::steady_clock::now();
    double qps = nq / std::chrono::duration<double>(s1 - s0).count();
    size_t hits = 0;
    for (size_t i = 0; i < nq; ++i) {
      std::unordered_set<int64_t> truth(gt + i * k, gt + (i + 1) * k);
      for (size_t j = 0; j < k; ++j)
        if (truth.count(out_ids[i * k + j])) ++hits;
    }
    double recall = double(hits) / double(nq * k);
    std::cerr << "search_length=" << sl << ": " << qps << " qps, recall@"
              << k << "=" << recall << "\n";
    if (recall >= 0.99 && best_sl == 0) {
      best_qps = qps;
      best_recall = recall;
      best_sl = sl;
    }
    if (recall > best_recall && best_sl == 0) {
      best_qps = qps;
      best_recall = recall;
    }
  }
  if (best_sl == 0) {
    // never reached 0.99: report the last (widest) setting
    best_sl = search_lengths.back();
  }
  printf(
      "{\"engine\": \"epsilla_ref_core\", \"n\": %zu, \"dim\": %zu, "
      "\"build_seconds\": %.1f, \"knn_seconds\": %.1f, \"nsg_seconds\": %.1f, "
      "\"qps\": %.1f, \"recall_at_%zu\": %.4f, \"search_length\": %zu, "
      "\"threads\": %d}\n",
      n, dim, build_s, knn_s, nsg_s, best_qps, k, best_recall, best_sl,
      omp_get_max_threads());
  return 0;
}
