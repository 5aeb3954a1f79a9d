// Native data-loader runtime: multithreaded CSV -> contiguous float64
// buffer, plus a deterministic shuffled-index stream for minibatching.
//
// The reference's data path is pandas.read_csv + numpy shuffles
// (/root/reference/demos/datasets.py:36-38,58-62).  This is the
// TPU-framework-native equivalent: the host-side IO/minibatch machinery
// lives in C++ so large UCI/MNIST-scale tables parse at memory
// bandwidth and the Python layer only sees ready numpy buffers (zero
// copies after parse).  Exposed through ctypes (data/native.py).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libcsvloader.so csvloader.cpp -lpthread

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <cstdio>
#include <cmath>
#include <thread>
#include <vector>
#include <atomic>

extern "C" {

// ---------------------------------------------------------------------------
// CSV parsing
// ---------------------------------------------------------------------------

// Parse one line of comma/semicolon/whitespace-separated doubles.
// Returns number of fields parsed.
static int parse_line(const char* p, const char* end, double* out,
                      int max_fields) {
  int n = 0;
  while (p < end && n < max_fields) {
    // skip separators/spaces
    while (p < end && (*p == ',' || *p == ';' || *p == ' ' || *p == '\t'))
      ++p;
    if (p >= end || *p == '\n' || *p == '\r') break;
    char* next = nullptr;
    double v = strtod(p, &next);
    if (next == p) {  // unparseable token: skip to next separator
      while (p < end && *p != ',' && *p != ';' && *p != '\n') ++p;
      out[n++] = NAN;
      continue;
    }
    out[n++] = v;
    p = next;
  }
  return n;
}

struct ParsedCsv {
  double* data;
  int64_t rows;
  int64_t cols;
};

// Count columns from the first data line; then parse all lines in
// parallel chunks.  Returns heap buffer (rows*cols doubles) owned by the
// caller (free with csv_free).
int csv_read(const char* path, int skip_header, double** out_data,
             int64_t* out_rows, int64_t* out_cols) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<char> buf(size + 1);
  if (fread(buf.data(), 1, size, f) != (size_t)size) {
    fclose(f);
    return -2;
  }
  fclose(f);
  buf[size] = '\0';
  const char* base = buf.data();
  const char* end = base + size;

  // index line starts
  std::vector<const char*> lines;
  lines.reserve(1 << 16);
  const char* p = base;
  while (p < end) {
    lines.push_back(p);
    const char* nl = (const char*)memchr(p, '\n', end - p);
    if (!nl) break;
    p = nl + 1;
  }
  size_t first = skip_header ? 1 : 0;
  if (lines.size() <= first) return -3;

  // column count from the first data line
  double probe[4096];
  const char* l0 = lines[first];
  const char* l0e = (const char*)memchr(l0, '\n', end - l0);
  if (!l0e) l0e = end;
  int64_t cols = parse_line(l0, l0e, probe, 4096);
  if (cols <= 0) return -4;

  int64_t rows = 0;
  std::vector<int64_t> row_of_line(lines.size(), -1);
  for (size_t i = first; i < lines.size(); ++i) {
    const char* l = lines[i];
    const char* le = (const char*)memchr(l, '\n', end - l);
    if (!le) le = end;
    if (le - l < 1) continue;  // blank line
    row_of_line[i] = rows++;
  }

  double* data = (double*)malloc(sizeof(double) * rows * cols);
  if (!data) return -5;

  unsigned hw = std::thread::hardware_concurrency();
  unsigned n_threads = hw ? (hw > 16 ? 16 : hw) : 4;
  std::atomic<int> bad{0};
  auto work = [&](unsigned t) {
    for (size_t i = first + t; i < lines.size(); i += n_threads) {
      int64_t r = row_of_line[i];
      if (r < 0) continue;
      const char* l = lines[i];
      const char* le = (const char*)memchr(l, '\n', end - l);
      if (!le) le = end;
      int got = parse_line(l, le, data + r * cols, (int)cols);
      for (int c = got; c < cols; ++c) data[r * cols + c] = NAN;
      if (got != cols) bad.fetch_add(1, std::memory_order_relaxed);
    }
  };
  std::vector<std::thread> ts;
  for (unsigned t = 0; t < n_threads; ++t) ts.emplace_back(work, t);
  for (auto& th : ts) th.join();

  *out_data = data;
  *out_rows = rows;
  *out_cols = cols;
  return bad.load() ? 1 : 0;  // 1 = parsed with ragged rows (NaN-padded)
}

void csv_free(double* p) { free(p); }

// ---------------------------------------------------------------------------
// Minibatch index stream: deterministic Fisher-Yates per epoch
// (splitmix64-seeded xorshift), matching seeded-shuffle semantics.
// ---------------------------------------------------------------------------

static inline uint64_t splitmix64(uint64_t& s) {
  uint64_t z = (s += 0x9E3779B97f4A7C15ULL);
  z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
  z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
  return z ^ (z >> 31);
}

void shuffled_indices(int64_t n, uint64_t seed, int64_t* out) {
  for (int64_t i = 0; i < n; ++i) out[i] = i;
  uint64_t s = seed;
  for (int64_t i = n - 1; i > 0; --i) {
    uint64_t j = splitmix64(s) % (uint64_t)(i + 1);
    int64_t tmp = out[i];
    out[i] = out[j];
    out[j] = tmp;
  }
}

// Gather rows into a contiguous minibatch buffer (X and Y together):
// avoids two numpy fancy-index passes on the hot host path.
void gather_rows(const double* data, int64_t cols, const int64_t* idx,
                 int64_t n_idx, double* out) {
  for (int64_t i = 0; i < n_idx; ++i) {
    memcpy(out + i * cols, data + idx[i] * cols, sizeof(double) * cols);
  }
}

}  // extern "C"
