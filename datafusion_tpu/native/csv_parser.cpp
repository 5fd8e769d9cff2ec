// Native CSV parser — the engine's host-side data loader.
//
// Plays the role the arrow::csv::Reader (native Rust) played for the
// reference (reference: src/execution/datasource.rs:33-58), feeding the
// columnar ingest path: typed numeric columns parsed straight into
// caller-allocated buffers, string columns returned as (offset, length)
// pairs into the input buffer for zero-copy extraction, with validity
// tracking for empty fields.
//
// Parallelism: pass 1 locates row boundaries (quote-aware) and splits
// them across threads; pass 2 parses fields into the output buffers.
// Embedded newlines inside quoted fields are supported (boundary scan is
// fully quote-aware and single-pass).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libdftpu_csv.so csv_parser.cpp -lpthread

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <charconv>
#include <string_view>
#include <thread>
#include <unordered_map>
#include <vector>
#include <algorithm>

namespace {

// dtype codes shared with Python (datafusion_tpu/io/native.py)
enum DType : int32_t {
  DT_BOOL = 0,
  DT_I8 = 1,
  DT_I16 = 2,
  DT_I32 = 3,
  DT_I64 = 4,
  DT_U8 = 5,
  DT_U16 = 6,
  DT_U32 = 7,
  DT_U64 = 8,
  DT_F32 = 9,
  DT_F64 = 10,
  DT_UTF8 = 11,
};

struct Field {
  const char* ptr;
  int64_t len;
};

// Scan the buffer once, recording the start offset of every row
// (quote-aware: separators and newlines inside double quotes don't
// count; "" is an escaped quote).
void find_rows(const char* buf, int64_t len, std::vector<int64_t>& row_starts) {
  bool in_quotes = false;
  int64_t i = 0;
  if (len > 0) row_starts.push_back(0);
  while (i < len) {
    char c = buf[i];
    if (in_quotes) {
      if (c == '"') {
        if (i + 1 < len && buf[i + 1] == '"') {
          i += 2;
          continue;
        }
        in_quotes = false;
      }
      i++;
      continue;
    }
    if (c == '"') {
      in_quotes = true;
      i++;
      continue;
    }
    if (c == '\n') {
      if (i + 1 < len) row_starts.push_back(i + 1);
      i++;
      continue;
    }
    i++;
  }
  // drop a trailing empty line
  if (!row_starts.empty()) {
    int64_t last = row_starts.back();
    bool empty = true;
    for (int64_t j = last; j < len; j++) {
      if (buf[j] != '\r' && buf[j] != '\n') {
        empty = false;
        break;
      }
    }
    if (empty) row_starts.pop_back();
  }
}

// Split one row into fields (quote-aware). Returns number parsed.
int split_row(const char* buf, int64_t start, int64_t buf_len, Field* fields,
              int max_fields) {
  int nf = 0;
  int64_t i = start;
  while (nf < max_fields) {
    // one field
    if (i < buf_len && buf[i] == '"') {
      // quoted field: contents between quotes ("" stays; Python unescapes)
      int64_t fstart = ++i;
      while (i < buf_len) {
        if (buf[i] == '"') {
          if (i + 1 < buf_len && buf[i + 1] == '"') {
            i += 2;
            continue;
          }
          break;
        }
        i++;
      }
      fields[nf].ptr = buf + fstart;
      fields[nf].len = i - fstart;
      nf++;
      if (i < buf_len) i++;  // closing quote
    } else {
      int64_t fstart = i;
      while (i < buf_len && buf[i] != ',' && buf[i] != '\n' && buf[i] != '\r') i++;
      fields[nf].ptr = buf + fstart;
      fields[nf].len = i - fstart;
      nf++;
    }
    if (i >= buf_len || buf[i] == '\n' || buf[i] == '\r') break;
    if (buf[i] == ',') i++;
  }
  return nf;
}

template <typename T>
bool parse_int(const Field& f, T* out) {
  const char* b = f.ptr;
  const char* e = f.ptr + f.len;
  auto res = std::from_chars(b, e, *out);
  return res.ec == std::errc();
}

bool parse_f64(const Field& f, double* out) {
  auto res = std::from_chars(f.ptr, f.ptr + f.len, *out);
  return res.ec == std::errc();
}

void parse_rows(const char* buf, int64_t buf_len,
                const std::vector<int64_t>& row_starts, int64_t row_begin,
                int64_t row_end, int ncols, const int32_t* dtypes,
                void** out_bufs, uint8_t** valid_bufs) {
  std::vector<Field> fields(ncols);
  for (int64_t r = row_begin; r < row_end; r++) {
    int nf = split_row(buf, row_starts[r], buf_len, fields.data(), ncols);
    for (int c = 0; c < ncols; c++) {
      Field f = (c < nf) ? fields[c] : Field{buf, 0};
      bool ok = f.len > 0;
      switch (dtypes[c]) {
        case DT_BOOL: {
          bool v = ok && (f.len >= 1) && (f.ptr[0] == 't' || f.ptr[0] == 'T' || f.ptr[0] == '1');
          ((uint8_t*)out_bufs[c])[r] = v ? 1 : 0;
          break;
        }
        case DT_I8: { int8_t v = 0; ok = ok && parse_int(f, &v); ((int8_t*)out_bufs[c])[r] = v; break; }
        case DT_I16: { int16_t v = 0; ok = ok && parse_int(f, &v); ((int16_t*)out_bufs[c])[r] = v; break; }
        case DT_I32: { int32_t v = 0; ok = ok && parse_int(f, &v); ((int32_t*)out_bufs[c])[r] = v; break; }
        case DT_I64: { int64_t v = 0; ok = ok && parse_int(f, &v); ((int64_t*)out_bufs[c])[r] = v; break; }
        case DT_U8: { uint8_t v = 0; ok = ok && parse_int(f, &v); ((uint8_t*)out_bufs[c])[r] = v; break; }
        case DT_U16: { uint16_t v = 0; ok = ok && parse_int(f, &v); ((uint16_t*)out_bufs[c])[r] = v; break; }
        case DT_U32: { uint32_t v = 0; ok = ok && parse_int(f, &v); ((uint32_t*)out_bufs[c])[r] = v; break; }
        case DT_U64: { uint64_t v = 0; ok = ok && parse_int(f, &v); ((uint64_t*)out_bufs[c])[r] = v; break; }
        case DT_F32: { double v = 0; ok = ok && parse_f64(f, &v); ((float*)out_bufs[c])[r] = (float)v; break; }
        case DT_F64: { double v = 0; ok = ok && parse_f64(f, &v); ((double*)out_bufs[c])[r] = v; break; }
        case DT_UTF8: {
          // (offset, length) pair into the input buffer
          int64_t* dst = (int64_t*)out_bufs[c];
          dst[2 * r] = f.ptr - buf;
          dst[2 * r + 1] = f.len;
          ok = true;  // empty string is a valid string
          break;
        }
      }
      if (valid_bufs[c] != nullptr) valid_bufs[c][r] = ok ? 1 : 0;
    }
  }
}

}  // namespace

extern "C" {

// Pass 1: count data rows (after optional header).
int64_t dftpu_csv_count_rows(const char* buf, int64_t len, int has_header) {
  std::vector<int64_t> row_starts;
  find_rows(buf, len, row_starts);
  int64_t n = (int64_t)row_starts.size();
  if (has_header && n > 0) n -= 1;
  return n;
}

// Pass 2: parse into caller-allocated buffers.
//   out_bufs[c]: numeric → typed array [nrows]; UTF8 → int64 array
//                [nrows*2] receiving (offset, length) into `buf`
//   valid_bufs[c]: uint8 [nrows] or null
// Returns parsed row count (== dftpu_csv_count_rows) or -1 on error.
int64_t dftpu_csv_parse(const char* buf, int64_t len, int has_header,
                        int ncols, const int32_t* dtypes, void** out_bufs,
                        uint8_t** valid_bufs, int num_threads) {
  std::vector<int64_t> row_starts;
  find_rows(buf, len, row_starts);
  if (has_header && !row_starts.empty()) row_starts.erase(row_starts.begin());
  int64_t nrows = (int64_t)row_starts.size();
  if (nrows == 0) return 0;

  int nt = num_threads > 0 ? num_threads : (int)std::thread::hardware_concurrency();
  if (nt < 1) nt = 1;
  if (nt > nrows) nt = (int)nrows;
  std::vector<std::thread> threads;
  int64_t chunk = (nrows + nt - 1) / nt;
  for (int t = 0; t < nt; t++) {
    int64_t b = t * chunk;
    int64_t e = std::min(nrows, b + chunk);
    if (b >= e) break;
    threads.emplace_back(parse_rows, buf, len, std::cref(row_starts), b, e,
                         ncols, dtypes, out_bufs, valid_bufs);
  }
  for (auto& th : threads) th.join();
  return nrows;
}

// Dictionary-encode a UTF8 column parsed to (offset, length) pairs:
// codes[r] gets the byte-order-sorted vocab code (UTF-8 byte order ==
// Unicode code-point order, matching Python str comparison); vocab_pairs
// gets (offset, length) per unique string in sorted order (caller
// allocates nrows*2 worst case). Returns the unique count. Replaces a
// per-row Python decode loop + np.unique over object strings (the 5M-row
// ingest hotspot).
int64_t dftpu_csv_dict_encode(const char* buf, const int64_t* pairs,
                              int64_t n, int32_t* codes,
                              int64_t* vocab_pairs) {
  std::unordered_map<std::string_view, int32_t> map;
  map.reserve(4096);
  std::vector<std::string_view> uniq;
  for (int64_t r = 0; r < n; r++) {
    std::string_view sv(buf + pairs[2 * r], (size_t)pairs[2 * r + 1]);
    auto it = map.find(sv);
    int32_t code;
    if (it == map.end()) {
      code = (int32_t)uniq.size();
      map.emplace(sv, code);
      uniq.push_back(sv);
    } else {
      code = it->second;
    }
    codes[r] = code;
  }
  int64_t k = (int64_t)uniq.size();
  std::vector<int32_t> order((size_t)k);
  for (int64_t i = 0; i < k; i++) order[(size_t)i] = (int32_t)i;
  std::sort(order.begin(), order.end(),
            [&](int32_t a, int32_t b) { return uniq[(size_t)a] < uniq[(size_t)b]; });
  std::vector<int32_t> remap((size_t)k);
  for (int64_t i = 0; i < k; i++) remap[(size_t)order[(size_t)i]] = (int32_t)i;
  for (int64_t r = 0; r < n; r++) codes[r] = remap[(size_t)codes[r]];
  for (int64_t i = 0; i < k; i++) {
    std::string_view sv = uniq[(size_t)order[(size_t)i]];
    vocab_pairs[2 * i] = (int64_t)(sv.data() - buf);
    vocab_pairs[2 * i + 1] = (int64_t)sv.size();
  }
  return k;
}

}  // extern "C"
