// zvec_tpu native host library: durability hot path.
//
// The TPU-native framework keeps compute on-device (JAX/Pallas); the runtime
// around it runs on the TPU-VM host. This library implements the write-path
// pieces the reference keeps in C++ (`src/ailego/hash/crc32c.cc`,
// `src/db/index/storage/wal/local_wal_file.cc`):
//   - CRC32C (Castagnoli, slicing-by-8) record checksums
//   - WAL batch append: frame N payloads as [u32 len][u32 crc][bytes] and
//     make them durable with a single fsync
//   - WAL scan: validate frames, stop at a torn/corrupt tail, return offsets
//
// C ABI only; bound from Python via ctypes (no pybind11 in the image).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <unistd.h>
#include <vector>

namespace {

uint32_t g_crc_table[8][256];
bool g_crc_init = false;

void crc32c_init() {
  if (g_crc_init) return;
  const uint32_t poly = 0x82F63B78u;  // reversed Castagnoli
  for (uint32_t i = 0; i < 256; ++i) {
    uint32_t crc = i;
    for (int j = 0; j < 8; ++j)
      crc = (crc >> 1) ^ ((crc & 1) ? poly : 0);
    g_crc_table[0][i] = crc;
  }
  for (uint32_t i = 0; i < 256; ++i) {
    uint32_t crc = g_crc_table[0][i];
    for (int k = 1; k < 8; ++k) {
      crc = g_crc_table[0][crc & 0xFF] ^ (crc >> 8);
      g_crc_table[k][i] = crc;
    }
  }
  g_crc_init = true;
}

uint32_t crc32c_impl(const uint8_t* data, size_t len, uint32_t crc) {
  crc32c_init();
  crc = ~crc;
  while (len >= 8) {
    uint64_t word;
    memcpy(&word, data, 8);
    crc ^= static_cast<uint32_t>(word);
    uint32_t high = static_cast<uint32_t>(word >> 32);
    crc = g_crc_table[7][crc & 0xFF] ^ g_crc_table[6][(crc >> 8) & 0xFF] ^
          g_crc_table[5][(crc >> 16) & 0xFF] ^ g_crc_table[4][crc >> 24] ^
          g_crc_table[3][high & 0xFF] ^ g_crc_table[2][(high >> 8) & 0xFF] ^
          g_crc_table[1][(high >> 16) & 0xFF] ^ g_crc_table[0][high >> 24];
    data += 8;
    len -= 8;
  }
  while (len--) {
    crc = g_crc_table[0][(crc ^ *data++) & 0xFF] ^ (crc >> 8);
  }
  return ~crc;
}

}  // namespace

extern "C" {

uint32_t zvec_crc32c(const uint8_t* data, uint64_t len) {
  return crc32c_impl(data, len, 0);
}

// Append a batch of framed records to an open file descriptor with one fsync.
// payloads: concatenated payload bytes; lengths: per-record lengths.
// Returns 0 on success, negative errno on failure.
int zvec_wal_append_batch(int fd, const uint8_t* payloads,
                          const uint64_t* lengths, uint64_t n_records,
                          int do_sync) {
  std::vector<uint8_t> frame;
  uint64_t total = 0;
  for (uint64_t i = 0; i < n_records; ++i) total += lengths[i];
  frame.reserve(total + n_records * 8);
  const uint8_t* p = payloads;
  for (uint64_t i = 0; i < n_records; ++i) {
    uint32_t len = static_cast<uint32_t>(lengths[i]);
    uint32_t crc = crc32c_impl(p, len, 0);
    uint8_t hdr[8];
    memcpy(hdr, &len, 4);
    memcpy(hdr + 4, &crc, 4);
    frame.insert(frame.end(), hdr, hdr + 8);
    frame.insert(frame.end(), p, p + len);
    p += len;
  }
  size_t off = 0;
  while (off < frame.size()) {
    ssize_t w = write(fd, frame.data() + off, frame.size() - off);
    if (w < 0) return -1;
    off += static_cast<size_t>(w);
  }
  if (do_sync && fsync(fd) != 0) return -2;
  return 0;
}

// Scan a WAL region (after the magic header) and return the number of intact
// records; offsets/lengths arrays (caller-allocated, capacity max_records)
// receive each record's payload offset and length. A torn or corrupt tail
// terminates the scan silently (crash-recovery semantics).
int64_t zvec_wal_scan(const uint8_t* data, uint64_t size, uint64_t* offsets,
                      uint64_t* lengths, uint64_t max_records) {
  uint64_t pos = 0;
  int64_t count = 0;
  while (pos + 8 <= size && static_cast<uint64_t>(count) < max_records) {
    uint32_t len, crc;
    memcpy(&len, data + pos, 4);
    memcpy(&crc, data + pos + 4, 4);
    if (pos + 8 + len > size) break;              // torn write
    if (crc32c_impl(data + pos + 8, len, 0) != crc) break;  // corrupt tail
    offsets[count] = pos + 8;
    lengths[count] = len;
    ++count;
    pos += 8 + len;
  }
  return count;
}

}  // extern "C"
