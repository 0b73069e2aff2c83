// Native FASTQ/FASTA parser — the data-loader fast path behind
// hylight_tpu/io/fastx.py. Semantics mirror the Python fallback exactly:
// names truncated at first whitespace, bases mapped A/C/G/T->0..3 (case
// insensitive), everything else -> 4, FASTQ phred stored without +33 offset.
// (Replaces the reference's per-stage Python FASTQ loops, e.g.
// utils.py:81 filter_non_atcg and FastqStorage.h:57-100.)
//
// C ABI consumed via ctypes from hylight_tpu/native.py.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct FastxResult {
  std::vector<uint8_t> seq;
  std::vector<uint8_t> qual;
  std::vector<int64_t> offsets;  // n+1
  std::string names;             // '\n'-joined
};

inline const char* find_nl(const char* p, const char* end) {
  const void* q = memchr(p, '\n', end - p);
  return q ? static_cast<const char*>(q) : end;
}

uint8_t g_code[256];
struct CodeInit {
  CodeInit() {
    memset(g_code, 4, sizeof(g_code));
    const char* b = "ACGT";
    for (int i = 0; i < 4; i++) {
      g_code[(unsigned char)b[i]] = i;
      g_code[(unsigned char)(b[i] + 32)] = i;
    }
  }
} g_code_init;

void append_name(FastxResult* r, const char* p, const char* end) {
  const char* e = p;
  while (e < end && *e != ' ' && *e != '\t' && *e != '\r') e++;
  if (!r->names.empty()) r->names.push_back('\n');
  r->names.append(p, e - p);
}

void append_seq(FastxResult* r, const char* p, const char* end) {
  size_t old = r->seq.size();
  size_t n = end - p;
  r->seq.resize(old + n);
  uint8_t* dst = r->seq.data() + old;
  for (size_t i = 0; i < n; i++) dst[i] = g_code[(unsigned char)p[i]];
}

}  // namespace

extern "C" {

void* hl_fastx_parse(const char* path, int is_fastq, int keep_qual) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size == 0) {
    close(fd);
    return nullptr;
  }
  size_t sz = st.st_size;
  const char* base =
      static_cast<const char*>(mmap(nullptr, sz, PROT_READ, MAP_PRIVATE, fd, 0));
  close(fd);
  if (base == MAP_FAILED) return nullptr;

  auto* r = new FastxResult();
  r->offsets.push_back(0);
  const char* p = base;
  const char* end = base + sz;
  bool ok = true;

  if (is_fastq) {
    while (p < end) {
      // header
      while (p < end && (*p == '\n' || *p == '\r')) p++;
      if (p >= end) break;
      if (*p != '@') { ok = false; break; }
      const char* nl = find_nl(p, end);
      append_name(r, p + 1, nl);
      p = nl + 1;
      // sequence (single line per FASTQ convention)
      const char* snl = find_nl(p, end);
      const char* se = snl;
      while (se > p && se[-1] == '\r') se--;
      append_seq(r, p, se);
      size_t slen = se - p;
      p = snl + 1;
      // plus
      if (p >= end || *p != '+') { ok = false; break; }
      p = find_nl(p, end) + 1;
      // qual
      const char* qnl = find_nl(p, end);
      const char* qe = qnl;
      while (qe > p && qe[-1] == '\r') qe--;
      if ((size_t)(qe - p) != slen) { ok = false; break; }
      if (keep_qual) {
        size_t old = r->qual.size();
        r->qual.resize(old + slen);
        uint8_t* dst = r->qual.data() + old;
        for (size_t i = 0; i < slen; i++) dst[i] = (uint8_t)(p[i] - 33);
      }
      p = qnl + 1;
      r->offsets.push_back((int64_t)r->seq.size());
    }
  } else {
    bool have = false;
    while (p < end) {
      const char* nl = find_nl(p, end);
      const char* le = nl;
      while (le > p && le[-1] == '\r') le--;
      if (le > p) {
        if (*p == '>') {
          if (have) r->offsets.push_back((int64_t)r->seq.size());
          append_name(r, p + 1, le);
          have = true;
        } else if (have) {
          append_seq(r, p, le);
        }
      }
      p = nl + 1;
    }
    if (have) r->offsets.push_back((int64_t)r->seq.size());
  }

  munmap(const_cast<char*>(base), sz);
  if (!ok) {
    delete r;
    return nullptr;
  }
  return r;
}

long long hl_fastx_nreads(void* h) {
  return (long long)static_cast<FastxResult*>(h)->offsets.size() - 1;
}

long long hl_fastx_total(void* h) {
  return (long long)static_cast<FastxResult*>(h)->seq.size();
}

void hl_fastx_fill(void* h, void* seq_out, void* off_out, void* qual_out) {
  auto* r = static_cast<FastxResult*>(h);
  memcpy(seq_out, r->seq.data(), r->seq.size());
  memcpy(off_out, r->offsets.data(), r->offsets.size() * sizeof(int64_t));
  if (!r->qual.empty()) memcpy(qual_out, r->qual.data(), r->qual.size());
}

const char* hl_fastx_names(void* h) {
  return static_cast<FastxResult*>(h)->names.c_str();
}

void hl_fastx_free(void* h) { delete static_cast<FastxResult*>(h); }

}  // extern "C"
