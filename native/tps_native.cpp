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
  // validate the header count against the mapped size BEFORE trusting the
  // offset table: a truncated/corrupt file would otherwise SIGBUS on the
  // first offsets[] read (the per-record end>size check runs too late)
  const uint64_t max_count = (pf->size - 16) / 8;
  if (max_count == 0 || pf->count > max_count - 1) {
    munmap(mem, st.st_size);
    ::close(fd);
    delete pf;
    return nullptr;
  }
  pf->offsets = reinterpret_cast<const uint64_t*>(pf->base + 16);
  if (pf->offsets[pf->count] > pf->size) {  // trailing offset = data end
    munmap(mem, st.st_size);
    ::close(fd);
    delete pf;
    return nullptr;
  }
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

// ------------------------------------- text-det postprocessing kernels
// First-party equivalents of mmcv.ops.contour_expand (PSENet progressive
// scale expansion, reference pse_postprocessor.py:6,69) and
// mmcv.ops.pixel_group (PANet pixel aggregation, pan_postprocessor.py:5,63).

// Progressive scale expansion: BFS-grow `labels` (seeded from the smallest
// kernel's connected components) outward through successively larger kernel
// masks. kernels: (K, H, W) uint8 with index 0 = largest (full text mask)
// and K-1 = smallest; labels: (H, W) int32, modified in place.
void contour_expand(const uint8_t* kernels, int64_t num_kernels, int64_t h,
                    int64_t w, int64_t min_kernel_area, int64_t region_num,
                    int32_t* labels) {
  const int64_t n = h * w;
  // drop seed regions smaller than min_kernel_area
  if (min_kernel_area > 0) {
    std::vector<int64_t> area(region_num + 1, 0);
    for (int64_t i = 0; i < n; ++i)
      if (labels[i] > 0 && labels[i] <= region_num) area[labels[i]]++;
    for (int64_t i = 0; i < n; ++i)
      // same bound as the counting loop: a stale/foreign labels map with
      // values past region_num must not read past the area vector
      if (labels[i] > 0 && labels[i] <= region_num &&
          area[labels[i]] < min_kernel_area)
        labels[i] = 0;
  }
  const int64_t dx[4] = {-1, 1, 0, 0};
  const int64_t dy[4] = {0, 0, -1, 1};
  std::vector<int64_t> queue;
  queue.reserve(n);
  for (int64_t k = num_kernels - 2; k >= 0; --k) {
    const uint8_t* kmask = kernels + k * n;
    queue.clear();
    for (int64_t i = 0; i < n; ++i)
      if (labels[i] > 0) queue.push_back(i);
    size_t head = 0;
    while (head < queue.size()) {
      const int64_t p = queue[head++];
      const int64_t y = p / w, x = p % w;
      const int32_t lab = labels[p];
      for (int d = 0; d < 4; ++d) {
        const int64_t ny = y + dy[d], nx = x + dx[d];
        if (ny < 0 || ny >= h || nx < 0 || nx >= w) continue;
        const int64_t q = ny * w + nx;
        if (labels[q] > 0 || !kmask[q]) continue;
        labels[q] = lab;
        queue.push_back(q);
      }
    }
  }
}

// Pixel aggregation: assign unlabeled text pixels to kernel regions by BFS
// when the pixel embedding is within dist_threshold of the kernel's mean
// embedding (PAN paper Eq. 4). labels: (H, W) int32 seeded with kernel CC
// labels, expanded in place; out_scores: per-region [0..region_num] mean
// text score (filled by caller-side reduction helpers below).
void pixel_group(const float* score, const uint8_t* mask,
                 const float* embedding, int64_t emb_dim,
                 const uint8_t* kernel_contour, int64_t h, int64_t w,
                 int64_t region_num, float dist_threshold, int32_t* labels) {
  const int64_t n = h * w;
  (void)kernel_contour;  // the distance test below subsumes the mmcv
                         // contour-crossing special case
  // mean embedding per kernel region
  std::vector<double> sums((region_num + 1) * emb_dim, 0.0);
  std::vector<int64_t> counts(region_num + 1, 0);
  for (int64_t i = 0; i < n; ++i) {
    const int32_t lab = labels[i];
    if (lab <= 0 || lab > region_num) continue;
    counts[lab]++;
    for (int64_t c = 0; c < emb_dim; ++c)
      sums[lab * emb_dim + c] += embedding[i * emb_dim + c];
  }
  std::vector<float> means((region_num + 1) * emb_dim, 0.f);
  for (int64_t r = 1; r <= region_num; ++r)
    if (counts[r] > 0)
      for (int64_t c = 0; c < emb_dim; ++c)
        means[r * emb_dim + c] =
            static_cast<float>(sums[r * emb_dim + c] / counts[r]);

  std::vector<int64_t> queue;
  queue.reserve(n);
  for (int64_t i = 0; i < n; ++i)
    if (labels[i] > 0) queue.push_back(i);
  const int64_t dx[4] = {-1, 1, 0, 0};
  const int64_t dy[4] = {0, 0, -1, 1};
  const float thr2 = dist_threshold * dist_threshold;
  size_t head = 0;
  while (head < queue.size()) {
    const int64_t p = queue[head++];
    const int64_t y = p / w, x = p % w;
    const int32_t lab = labels[p];
    const float* mean = &means[lab * emb_dim];
    for (int d = 0; d < 4; ++d) {
      const int64_t ny = y + dy[d], nx = x + dx[d];
      if (ny < 0 || ny >= h || nx < 0 || nx >= w) continue;
      const int64_t q = ny * w + nx;
      if (labels[q] != 0 || !mask[q]) continue;
      float dist2 = 0.f;
      for (int64_t c = 0; c < emb_dim; ++c) {
        const float diff = embedding[q * emb_dim + c] - mean[c];
        dist2 += diff * diff;
      }
      if (dist2 > thr2) continue;
      labels[q] = lab;
      queue.push_back(q);
    }
  }
  (void)score;
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
