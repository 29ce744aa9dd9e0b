// Stub for the reference's oatpp-curl EmbeddingService (oatpp is not
// available in this image). The benchmark never touches embeddings; the
// catalog header only needs the type to exist for a shared_ptr parameter.
#pragma once
#include <string>
#include <vector>

namespace vectordb {
namespace engine {

class EmbeddingService {
 public:
  explicit EmbeddingService(const std::string& = "") {}
};

}  // namespace engine
}  // namespace vectordb
