// Native LETOR/SVMLight parser — the data-loading hot path.
//
// The reference parses with java.lang.String splits per line
// (ref: learning/DataPoint.java:~120 via FeatureManager.readInput,
// features/FeatureManager.java:~60); at MSLR scale (723K lines x 136
// features) an interpreted per-token loop costs minutes. This two-pass
// C parser fills caller-allocated dense numpy buffers directly:
//
//   pass 1 (letor_stat): doc count, query count (consecutive-qid
//     grouping, exactly like FeatureManager), global max fid;
//   pass 2 (letor_fill): labels, dense feature matrix (missing fids
//     stay 0 — "missing zero" semantics), query offsets, qid strings,
//     optional '#' descriptions. Tokens that exceed the fixed buffer
//     widths are NEVER truncated — the pass reports capacity (-4) and
//     the loader re-parses in Python.
//
// C ABI only — loaded from Python via ctypes (no pybind11 in this image).
// Gzip inputs and malformed files fall back to the Python parser.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

namespace {

constexpr int64_t QID_MAX = 63;

struct LineView {
  char* p;
  char* end;
};

inline char* skip_ws(char* p, char* end) {
  while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
  return p;
}

// Parse one line. Returns: 1 = data line, 0 = skip (blank/comment),
// -1 = malformed, -2 = capacity exceeded (qid longer than QID_MAX or a
// wanted '#' description longer than desc_stride-1 — NEVER silently
// truncated: the caller surfaces -2 so the loader re-parses the file in
// Python, which handles arbitrary lengths). On success: *label_out, qid
// copied into qid_out (NUL-terminated), features forwarded to the
// callback, desc_out (may be null) gets the '#...' remainder.
template <bool kParseVals, typename FeatFn>
int parse_line(char* p, char* end, float* label_out, char* qid_out,
               FeatFn&& on_feat, char* desc_out, int64_t desc_stride) {
  p = skip_ws(p, end);
  if (p >= end || *p == '#') return 0;
  char* q;
  *label_out = strtof(p, &q);
  if (q == p || *label_out < 0.0f) return -1;
  p = skip_ws(q, end);
  if (end - p < 4 || strncmp(p, "qid:", 4) != 0) return -1;
  p += 4;
  int64_t n = 0;
  bool qid_over = false;
  while (p < end && *p != ' ' && *p != '\t' && *p != '\r') {
    if (n < QID_MAX) qid_out[n++] = *p;
    else qid_over = true;
    ++p;
  }
  if (n == 0) return -1;
  qid_out[n] = '\0';
  if (qid_over) return -2;
  for (;;) {
    p = skip_ws(p, end);
    if (p >= end) break;
    if (*p == '#') {
      if (desc_out != nullptr && desc_stride > 0) {
        int64_t m = end - p;
        // trim trailing whitespace
        while (m > 0 && (p[m - 1] == ' ' || p[m - 1] == '\t' ||
                         p[m - 1] == '\r'))
          --m;
        if (m > desc_stride - 1) return -2;
        memcpy(desc_out, p, static_cast<size_t>(m));
        desc_out[m] = '\0';
      }
      break;
    }
    long fid = strtol(p, &q, 10);
    if (q == p || *q != ':' || fid <= 0) return -1;
    p = q + 1;
    if (kParseVals) {
      float val = strtof(p, &q);
      if (q == p) return -1;
      p = q;
      on_feat(static_cast<int64_t>(fid), val);
    } else {
      // stat pass: only fids matter — skip the value token
      char* v = p;
      while (p < end && *p != ' ' && *p != '\t' && *p != '\r') ++p;
      if (p == v) return -1;
      on_feat(static_cast<int64_t>(fid), 0.0f);
    }
  }
  return 1;
}

// Read a whole file into memory. Returns nullptr on failure.
char* read_file(const char* path, int64_t* size_out) {
  FILE* f = fopen(path, "rb");
  if (f == nullptr) return nullptr;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (size < 0) {
    fclose(f);
    return nullptr;
  }
  char* buf = static_cast<char*>(malloc(static_cast<size_t>(size) + 1));
  if (buf == nullptr) {
    fclose(f);
    return nullptr;
  }
  size_t got = fread(buf, 1, static_cast<size_t>(size), f);
  fclose(f);
  if (got != static_cast<size_t>(size)) {
    free(buf);
    return nullptr;
  }
  buf[size] = '\0';
  *size_out = size;
  return buf;
}

}  // namespace

extern "C" {

// Pass 1. Returns 0 ok, -1 io error, -2 malformed line, -4 capacity
// (oversized qid — caller falls back to the Python parser).
int letor_stat(const char* path, int64_t* n_docs, int64_t* n_queries,
               int64_t* max_fid) {
  int64_t size = 0;
  char* buf = read_file(path, &size);
  if (buf == nullptr) return -1;
  int64_t docs = 0, queries = 0, maxf = 0;
  char prev_qid[QID_MAX + 1] = {0};
  char qid[QID_MAX + 1];
  char* p = buf;
  char* fend = buf + size;
  int rc = 0;
  while (p < fend) {
    char* nl = static_cast<char*>(memchr(p, '\n', fend - p));
    char* lend = (nl != nullptr) ? nl : fend;
    float label;
    int r = parse_line<false>(
        p, lend, &label, qid,
        [&](int64_t fid, float) {
          if (fid > maxf) maxf = fid;
        },
        nullptr, 0);
    if (r < 0) {
      rc = (r == -2) ? -4 : -2;
      break;
    }
    if (r == 1) {
      if (docs == 0 || strcmp(qid, prev_qid) != 0) {
        ++queries;
        strcpy(prev_qid, qid);
      }
      ++docs;
    }
    p = lend + 1;
  }
  free(buf);
  if (rc != 0) return rc;
  *n_docs = docs;
  *n_queries = queries;
  *max_fid = maxf;
  return 0;
}

// Pass 2: fill caller-allocated buffers (feats pre-zeroed [n_docs, n_feat]).
// qidbuf: n_queries * qid_stride chars; descbuf: optional, n_docs *
// desc_stride; counts: optional [n_docs] int32 — number of fid:val pairs
// per line, for the strict missing-feature check (the reference errors on
// an unspecified fid unless -missingZero: learning/DataPoint.java:~120).
// Returns 0 ok, -1 io, -2 malformed, -3 overflow vs stat,
// -4 capacity (oversized qid/desc — caller falls back to Python).
int letor_fill(const char* path, float* labels, float* feats, int64_t n_docs,
               int64_t n_feat, int64_t* qptr, int64_t n_queries, char* qidbuf,
               int64_t qid_stride, char* descbuf, int64_t desc_stride,
               int32_t* counts) {
  int64_t size = 0;
  char* buf = read_file(path, &size);
  if (buf == nullptr) return -1;
  int64_t doc = 0, query = 0;
  char prev_qid[QID_MAX + 1] = {0};
  char qid[QID_MAX + 1];
  char* p = buf;
  char* fend = buf + size;
  int rc = 0;
  while (p < fend) {
    char* nl = static_cast<char*>(memchr(p, '\n', fend - p));
    char* lend = (nl != nullptr) ? nl : fend;
    float label;
    if (doc > n_docs) {
      rc = -3;
      break;
    }
    float* row = feats + doc * n_feat;
    char* desc = (descbuf != nullptr && doc < n_docs)
                     ? descbuf + doc * desc_stride
                     : nullptr;
    int64_t npairs = 0;
    int r = parse_line<true>(
        p, lend, &label, qid,
        [&](int64_t fid, float val) {
          if (fid >= 1 && fid <= n_feat && doc < n_docs) row[fid - 1] = val;
          ++npairs;
        },
        desc, desc_stride);
    if (r < 0) {
      rc = (r == -2) ? -4 : -2;
      break;
    }
    if (r == 1) {
      if (doc >= n_docs) {
        rc = -3;
        break;
      }
      if (counts != nullptr) counts[doc] = static_cast<int32_t>(npairs);
      labels[doc] = label;
      if (doc == 0 || strcmp(qid, prev_qid) != 0) {
        if (query >= n_queries) {
          rc = -3;
          break;
        }
        qptr[query] = doc;
        strncpy(qidbuf + query * qid_stride, qid,
                static_cast<size_t>(qid_stride - 1));
        qidbuf[query * qid_stride + qid_stride - 1] = '\0';
        ++query;
        strcpy(prev_qid, qid);
      }
      ++doc;
    }
    p = lend + 1;
  }
  free(buf);
  if (rc != 0) return rc;
  if (doc != n_docs || query != n_queries) return -3;
  qptr[n_queries] = n_docs;
  return 0;
}

}  // extern "C"
