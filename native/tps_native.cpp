// First-party native runtime pieces (C++, loaded via ctypes).
//
// The reference leans on C/C++ dependencies for its host-side hot paths
// (SURVEY §2.9): rapidfuzz's C++ levenshtein for the 1-NED metric
// (ocr_metric.py:5,65) and liblmdb for annotation/image stores
// (loader.py:107-115). This library provides first-party equivalents:
//
//   * levenshtein_u32 — banded DP edit distance over UTF-32 codepoints.
//   * packed dataset  — an mmap'd indexed record file ("TPSPACK1"):
//       header:  8-byte magic, uint64 count
//       index:   (count+1) uint64 offsets (record i spans [off[i], off[i+1]))
//       records: raw bytes (label line or encoded image)
//     Readers share pages via mmap across dataloader workers — the same
//     zero-copy property that motivated LMDB in the reference.
//
// Build: g++ -O3 -shared -fPIC -o libtps_native.so tps_native.cpp
#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

// ---------------------------------------------------------------- metric
int64_t levenshtein_u32(const uint32_t* a, int64_t la, const uint32_t* b,
                        int64_t lb) {
  if (la == 0) return lb;
  if (lb == 0) return la;
  std::vector<int64_t> prev(lb + 1), cur(lb + 1);
  for (int64_t j = 0; j <= lb; ++j) prev[j] = j;
  for (int64_t i = 1; i <= la; ++i) {
    cur[0] = i;
    const uint32_t ca = a[i - 1];
    for (int64_t j = 1; j <= lb; ++j) {
      const int64_t sub = prev[j - 1] + (ca != b[j - 1]);
      cur[j] = std::min({prev[j] + 1, cur[j - 1] + 1, sub});
    }
    std::swap(prev, cur);
  }
  return prev[lb];
}

// ---------------------------------------------------- packed dataset
struct PackedFile {
  int fd = -1;
  const uint8_t* base = nullptr;
  size_t size = 0;
  uint64_t count = 0;
  const uint64_t* offsets = nullptr;  // count+1 entries
};

static const char kMagic[8] = {'T', 'P', 'S', 'P', 'A', 'C', 'K', '1'};

void* packed_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size < 16) {
    ::close(fd);
    return nullptr;
  }
  void* mem = mmap(nullptr, st.st_size, PROT_READ, MAP_SHARED, fd, 0);
  if (mem == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  auto* pf = new PackedFile();
  pf->fd = fd;
  pf->base = static_cast<const uint8_t*>(mem);
  pf->size = st.st_size;
  if (memcmp(pf->base, kMagic, 8) != 0) {
    munmap(mem, st.st_size);
    ::close(fd);
    delete pf;
    return nullptr;
  }
  memcpy(&pf->count, pf->base + 8, 8);
  pf->offsets = reinterpret_cast<const uint64_t*>(pf->base + 16);
  return pf;
}

int64_t packed_count(void* handle) {
  return handle ? static_cast<PackedFile*>(handle)->count : -1;
}

// returns pointer to record bytes; writes length to *len
const uint8_t* packed_get(void* handle, int64_t index, int64_t* len) {
  auto* pf = static_cast<PackedFile*>(handle);
  if (!pf || index < 0 || static_cast<uint64_t>(index) >= pf->count) {
    *len = -1;
    return nullptr;
  }
  const uint64_t start = pf->offsets[index];
  const uint64_t end = pf->offsets[index + 1];
  if (end > pf->size || start > end) {
    *len = -1;
    return nullptr;
  }
  *len = static_cast<int64_t>(end - start);
  return pf->base + start;
}

void packed_close(void* handle) {
  auto* pf = static_cast<PackedFile*>(handle);
  if (!pf) return;
  if (pf->base) munmap(const_cast<uint8_t*>(pf->base), pf->size);
  if (pf->fd >= 0) ::close(pf->fd);
  delete pf;
}

// ------------------------------------------------- ctc greedy collapse
// Greedy CTC collapse of argmax indices: drop blanks and repeats
// (host-side decode companion to convertors/ctc.py tensor2idx).
int64_t ctc_collapse(const int32_t* pred, int64_t len, int32_t blank,
                     int32_t* out) {
  int64_t n = 0;
  int32_t prev = blank;
  for (int64_t t = 0; t < len; ++t) {
    const int32_t v = pred[t];
    if (v != prev && v != blank) out[n++] = v;
    prev = v;
  }
  return n;
}

}  // extern "C"
