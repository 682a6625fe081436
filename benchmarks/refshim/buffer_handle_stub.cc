// Stub for the three BufferHandle symbols core_interface::Index references.
// The real implementation (src/ailego/buffer/buffer_manager.cc) is the Arrow/
// Parquet-backed buffer-pool storage path; the head-to-head tools only use
// MMapFileStorage, so these are never reached. Abort loudly if they ever are.
#include <cstdio>
#include <cstdlib>
#include <zvec/ailego/buffer/buffer_manager.h>

namespace zvec {
namespace ailego {

BufferHandle::~BufferHandle() {}

void *BufferHandle::pin_vector_data() {
  std::fprintf(stderr, "BufferHandle stub reached (buffer-pool storage is not built)\n");
  std::abort();
}

bool BufferHandle::unpin_vector_data() {
  std::fprintf(stderr, "BufferHandle stub reached (buffer-pool storage is not built)\n");
  std::abort();
}

}  // namespace ailego
}  // namespace zvec
