// Stub for the reference's oatpp-curl EmbeddingService (oatpp is not
// available in this image). The benchmark and reader-smoke never touch
// embeddings; compiled reference code (table_segment_mvp.cpp:746-762)
// only needs the type and the denseEmbed* signatures to exist. Calls
// return an error Status — any test fixture that actually routed through
// embeddings would fail loudly instead of silently producing zeros.
#pragma once
#include <string>
#include <unordered_map>
#include <vector>

#include "db/vector.hpp"
#include "utils/status.hpp"

namespace vectordb {
namespace engine {

struct EmbeddingModel {
  std::string model;
  size_t dim = 0;
};

class EmbeddingService {
 public:
  explicit EmbeddingService(const std::string& = "") {}

  Status getSupportedModels(std::vector<EmbeddingModel>&) {
    return Status(INFRA_UNEXPECTED_ERROR, "embedding service stubbed out");
  }

  Status denseEmbedDocuments(const std::string&,
                             VariableLenAttrColumnContainer&, float*,
                             size_t, size_t, size_t,
                             std::unordered_map<std::string, std::string>&,
                             bool) {
    return Status(INFRA_UNEXPECTED_ERROR, "embedding service stubbed out");
  }

  Status denseEmbedQuery(const std::string&, const std::string&,
                         std::vector<engine::DenseVectorElement>&, size_t,
                         std::unordered_map<std::string, std::string>&,
                         bool) {
    return Status(INFRA_UNEXPECTED_ERROR, "embedding service stubbed out");
  }
};

}  // namespace engine
}  // namespace vectordb
