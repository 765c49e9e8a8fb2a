// Native I/O runtime for is3d2_tpu.
//
// Fast whitespace-separated numeric table parser (the freezeout-surface
// files are 100s of MB of text for production MUSIC surfaces; this replaces
// numpy.loadtxt on the hot ingest path, ~20x faster).  Exposed to Python via
// ctypes (io/fastio.py); threaded chunk parsing with a final stitch.
//
// API:
//   i3d_count_rows(path, n_cols_out) -> n_rows (also reports column count of
//                                       the first row)
//   i3d_parse(path, out, capacity)   -> n_values parsed into out (row-major)

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cerrno>
#include <cstdint>
#include <vector>
#include <thread>

extern "C" {

// read whole file into a malloc'd buffer (returns size, buffer via out)
static char *read_file(const char *path, size_t *size_out) {
  FILE *f = fopen(path, "rb");
  if (!f) return nullptr;
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  char *buf = (char *)malloc((size_t)sz + 1);
  if (!buf) { fclose(f); return nullptr; }
  size_t rd = fread(buf, 1, (size_t)sz, f);
  fclose(f);
  buf[rd] = '\0';
  *size_out = rd;
  return buf;
}

static inline bool is_ws(char c) {
  return c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' || c == '\v';
}

// parse one chunk [begin, end) of the buffer into vals.
// '#' starts a comment running to end-of-line (numpy.loadtxt semantics) —
// numerals inside comments must not be parsed as data.
static void parse_chunk(const char *begin, const char *end,
                        std::vector<double> *vals) {
  const char *p = begin;
  while (p < end) {
    while (p < end && is_ws(*p)) p++;
    if (p >= end) break;
    if (*p == '#') {  // comment: skip to end of line
      while (p < end && *p != '\n') p++;
      continue;
    }
    char *next = nullptr;
    double v = strtod(p, &next);
    if (next == p) { p++; continue; }  // skip unparsable byte
    vals->push_back(v);
    p = next;
  }
}

long long i3d_count_rows(const char *path, long long *n_cols_out) {
  size_t size;
  char *buf = read_file(path, &size);
  if (!buf) return -1;
  long long rows = 0, cols = 0;
  bool counted_cols = false;
  const char *p = buf;
  const char *end = buf + size;
  while (p < end) {
    // skip leading whitespace of the line (but not the newline logic below)
    const char *line_start = p;
    bool has_token = false;
    long long line_cols = 0;
    while (p < end && *p != '\n') {
      if (*p == '#') {  // comment: rest of line is not data
        while (p < end && *p != '\n') p++;
        break;
      }
      if (!is_ws(*p)) {
        has_token = true;
        line_cols++;
        while (p < end && *p != '\n' && !is_ws(*p) && *p != '#') p++;
      } else {
        p++;
      }
    }
    if (p < end) p++;  // consume newline
    if (has_token) {
      rows++;
      if (!counted_cols) { cols = line_cols; counted_cols = true; }
    }
    (void)line_start;
  }
  free(buf);
  if (n_cols_out) *n_cols_out = cols;
  return rows;
}

long long i3d_parse(const char *path, double *out, long long capacity) {
  size_t size;
  char *buf = read_file(path, &size);
  if (!buf) return -1;

  unsigned n_threads = std::thread::hardware_concurrency();
  if (n_threads == 0) n_threads = 1;
  if (n_threads > 16) n_threads = 16;
  if (size < (size_t)1 << 20) n_threads = 1;

  // split at LINE boundaries: a comment runs to end-of-line, so chunk
  // boundaries must never fall inside a line or a '#'-comment's tail would
  // be parsed as data by the next thread
  std::vector<const char *> splits(n_threads + 1);
  splits[0] = buf;
  splits[n_threads] = buf + size;
  for (unsigned t = 1; t < n_threads; t++) {
    const char *p = buf + (size * t) / n_threads;
    while (p < buf + size && *p != '\n') p++;
    splits[t] = p;
  }

  std::vector<std::vector<double>> parts(n_threads);
  std::vector<std::thread> threads;
  for (unsigned t = 0; t < n_threads; t++) {
    parts[t].reserve(size / (12 * n_threads) + 16);
    threads.emplace_back(parse_chunk, splits[t], splits[t + 1], &parts[t]);
  }
  for (auto &th : threads) th.join();
  free(buf);

  long long total = 0;
  for (auto &part : parts) total += (long long)part.size();
  if (total > capacity) return -2;

  long long off = 0;
  for (auto &part : parts) {
    memcpy(out + off, part.data(), part.size() * sizeof(double));
    off += (long long)part.size();
  }
  return total;
}

// ----------------------------------------------------------------------
// Threaded per-event particle-list writer (the reverse hot path: a
// production oversampling run exports ~1e7 hadrons across up to 1e3 event
// files; Python-side row formatting is ~100x slower).
//
//   path_pattern     printf pattern with one %lld for the 1-based event id
//   header           first line of every file (newline appended)
//   sep              column separator (' ' or ',')
//   precision        digits for %.Ne formatting
//   include_counter  1 -> per-file row counter as the first column (OSCAR)
//   offsets          (n_events+1) row offsets; event e owns [off[e], off[e+1])
//   mcid             per-row particle id column
//   cols/n_cols      column-major double arrays, all of length offsets[n_events]
//
// Rows must be pre-sorted by event (Python does one argsort).  Returns the
// number of rows written, or -1 on I/O failure.
long long i3d_write_events(const char *path_pattern, const char *header,
                           char sep, int precision, int include_counter,
                           long long n_events, const long long *offsets,
                           const long long *mcid,
                           const double *const *cols, int n_cols) {
  unsigned n_threads = std::thread::hardware_concurrency();
  if (n_threads == 0) n_threads = 1;
  if (n_threads > 16) n_threads = 16;
  if ((unsigned long long)n_events < n_threads) n_threads = (unsigned)n_events;
  if (n_threads == 0) n_threads = 1;

  std::vector<long long> written(n_threads, 0);
  std::vector<int> failed(n_threads, 0);

  auto work = [&](unsigned t) {
    std::vector<char> buf;
    buf.reserve(1 << 20);
    char tmp[64];
    char path[4096];
    for (long long e = t; e < n_events; e += n_threads) {
      snprintf(path, sizeof path, path_pattern, e + 1);
      FILE *f = fopen(path, "wb");
      if (!f) { failed[t] = 1; return; }
      buf.clear();
      buf.insert(buf.end(), header, header + strlen(header));
      buf.push_back('\n');
      long long row_in_file = 0;
      for (long long r = offsets[e]; r < offsets[e + 1]; r++) {
        if (include_counter) {
          int k = snprintf(tmp, sizeof tmp, "%lld", row_in_file);
          buf.insert(buf.end(), tmp, tmp + k);
          buf.push_back(sep);
        }
        int k = snprintf(tmp, sizeof tmp, "%lld", mcid[r]);
        buf.insert(buf.end(), tmp, tmp + k);
        for (int c = 0; c < n_cols; c++) {
          buf.push_back(sep);
          k = snprintf(tmp, sizeof tmp, "%.*e", precision, cols[c][r]);
          buf.insert(buf.end(), tmp, tmp + k);
        }
        buf.push_back('\n');
        row_in_file++;
        if (buf.size() > (1u << 20)) {
          if (fwrite(buf.data(), 1, buf.size(), f) != buf.size()) {
            failed[t] = 1; fclose(f); return;
          }
          buf.clear();
        }
      }
      if (!buf.empty() &&
          fwrite(buf.data(), 1, buf.size(), f) != buf.size()) {
        failed[t] = 1; fclose(f); return;
      }
      fclose(f);
      written[t] += offsets[e + 1] - offsets[e];
    }
  };

  std::vector<std::thread> threads;
  for (unsigned t = 0; t < n_threads; t++) threads.emplace_back(work, t);
  for (auto &th : threads) th.join();

  long long total = 0;
  for (unsigned t = 0; t < n_threads; t++) {
    if (failed[t]) return -1;
    total += written[t];
  }
  return total;
}

}  // extern "C"
