// Roaring bitmap C-API shim backed by std::unordered_set — just the five
// calls tools/core/filter_result_cache.h makes. Only used for filtered
// recall/bench runs; capacity hints are ignored.
#pragma once
#include <cstdint>
#include <unordered_set>

struct roaring_bitmap_t {
  std::unordered_set<uint32_t> s;
};

inline roaring_bitmap_t *roaring_bitmap_create() {
  return new roaring_bitmap_t();
}

inline roaring_bitmap_t *roaring_bitmap_create_with_capacity(uint32_t cap) {
  auto *b = new roaring_bitmap_t();
  b->s.reserve(cap);
  return b;
}

inline void roaring_bitmap_free(roaring_bitmap_t *b) {
  delete b;
}

inline bool roaring_bitmap_contains(const roaring_bitmap_t *b, uint32_t key) {
  return b->s.count(key) != 0;
}

inline void roaring_bitmap_add(roaring_bitmap_t *b, uint32_t key) {
  b->s.insert(key);
}
