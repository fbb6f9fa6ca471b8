// vcfc_host: native host runtime for the TPU codec engine.
//
// The device kernels (vcfc_tpu.ops.rle) produce/consume dense flag
// matrices; this library provides the thread-parallel byte plumbing around
// them:
//
//   * vcfc_scan      — walk a .vcfc stream: per-line offsets, header values,
//                      escape detection, flag extraction into a dense matrix
//   * vcfc_measure / vcfc_write — two-pass encode assembly: compute per-line
//                      output sizes, then scatter-write all regular lines
//                      into a single output buffer at precomputed offsets
//                      (embarrassingly line-parallel)
//   * vcfc_render    — decode assembly: required blob + rendered sample text
//                      rows -> final VCF bytes
//   * vcfc_classify  — VCF sample fields -> genotype code matrix (fast path
//                      for 3-byte-wide fields)
//
// Exposed as a plain C ABI for ctypes.  No Python.h dependency.

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>
#include <algorithm>

static inline void put_len_header(uint8_t* p, uint32_t len) {
  p[0] = static_cast<uint8_t>(((len >> 24) & 0x3F) | 0xC0);
  p[1] = static_cast<uint8_t>(len >> 16);
  p[2] = static_cast<uint8_t>(len >> 8);
  p[3] = static_cast<uint8_t>(len);
}

static inline int64_t get_len_header(const uint8_t* p) {
  if ((p[0] >> 6) != 3) return -1;
  return (static_cast<int64_t>(p[0] & 0x3F) << 24) |
         (static_cast<int64_t>(p[1]) << 16) |
         (static_cast<int64_t>(p[2]) << 8) | p[3];
}

static int n_workers(int64_t items) {
  unsigned hw = std::thread::hardware_concurrency();
  if (hw == 0) hw = 4;
  int64_t w = std::min<int64_t>(hw, (items + 1023) / 1024);
  return static_cast<int>(std::max<int64_t>(w, 1));
}

template <typename F>
static void parallel_for(int64_t n, F&& body) {
  int workers = n_workers(n);
  if (workers <= 1) {
    body(0, n);
    return;
  }
  std::vector<std::thread> ts;
  int64_t chunk = (n + workers - 1) / workers;
  for (int w = 0; w < workers; ++w) {
    int64_t lo = w * chunk, hi = std::min<int64_t>(lo + chunk, n);
    if (lo >= hi) break;
    ts.emplace_back([&body, lo, hi] { body(lo, hi); });
  }
  for (auto& t : ts) t.join();
}

// ---------------------------------------------------------------------------
// Pass A: walk a .vcfc stream, record line geometry.  Sequential (offsets
// chain), but touches only 8 header bytes per line.
// Returns number of lines, or negative on error (-2 = out capacity, -3 =
// malformed header).
extern "C" int64_t vcfc_scan(const uint8_t* raw, int64_t n, int64_t data_off,
                  int64_t max_lines, int64_t* line_off, int32_t* line_len,
                  int32_t* req_len) {
  int64_t off = data_off;
  int64_t count = 0;
  while (off < n) {
    if (off + 8 > n) return -3;
    int64_t ll = get_len_header(raw + off);
    int64_t rl = get_len_header(raw + off + 4);
    if (ll < 0 || rl < 0 || off + 4 + ll > n) return -3;
    if (count >= max_lines) return -2;
    line_off[count] = off;
    line_len[count] = static_cast<int32_t>(ll);
    req_len[count] = static_cast<int32_t>(rl);
    ++count;
    off += 4 + ll;
  }
  return count;
}

// Pass B: extract flag bytes into a dense (L, W) matrix; detect escape
// lines (any byte >= 0xE0 in the sample region).  Line-parallel.
// For escape lines nflags[i] = -1 and the row is left zeroed.
// Returns max sample-region length seen (<= W required), or -2 if W too
// small for some escape-free line.
extern "C" int64_t vcfc_extract_flags(const uint8_t* raw, const int64_t* line_off,
                           const int32_t* line_len, const int32_t* req_len,
                           int64_t L, int64_t W, uint8_t* flags,
                           int32_t* nflags) {
  std::vector<int64_t> maxes(n_workers(L), 0);
  std::vector<int64_t> errs(n_workers(L), 0);
  int64_t widx = 0;
  (void)widx;
  int64_t global_max = 0;
  bool overflow = false;
  parallel_for(L, [&](int64_t lo, int64_t hi) {
    int64_t local_max = 0;
    for (int64_t i = lo; i < hi; ++i) {
      const uint8_t* body = raw + line_off[i] + 8 + req_len[i];
      int64_t blen = static_cast<int64_t>(line_len[i]) - 4 - req_len[i] - 1;
      bool esc = false;
      for (int64_t j = 0; j < blen; ++j) {
        if (body[j] >= 0xE0) {
          esc = true;
          break;
        }
      }
      if (esc) {
        nflags[i] = -1;
        continue;
      }
      if (blen > W) {
        overflow = true;
        continue;
      }
      std::memcpy(flags + i * W, body, static_cast<size_t>(blen));
      nflags[i] = static_cast<int32_t>(blen);
      if (blen > local_max) local_max = blen;
    }
    // benign race on global_max: guarded by join + re-reduce below
    if (local_max > global_max) global_max = local_max;
  });
  if (overflow) return -2;
  return global_max;
}

// ---------------------------------------------------------------------------
// Encode assembly.
//
// Inputs per line i (regular lines only; irregular lines have sizes[i]
// preset by the caller and are skipped via the irregular mask):
//   required blob = body[line_start[i] .. sample_start[i])
//   flags row     = flags[i*W .. i*W + nseg[i])
//   escape splice: a flag 0xE1 at packed slot k consumes sample
//     seg_start[i*W+k]; its ASCII lives at body[sample_start[i] + 4*j .. +3]
//     (3-byte fast layout), followed by '\t' unless it is the last sample.
//
// Pass 1: vcfc_measure fills sizes[i] for regular lines.
// Pass 2 (after the caller prefix-sums offsets): vcfc_write emits bytes.

extern "C" void vcfc_measure(const uint8_t* body, const int64_t* line_start,
                  const int64_t* sample_start, const uint8_t* flags,
                  const int32_t* nseg, const uint8_t* irregular, int64_t L,
                  int64_t W, int64_t S, int64_t* sizes) {
  parallel_for(L, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      if (irregular[i]) continue;  // caller preset
      int64_t req = sample_start[i] - line_start[i];
      int64_t n = nseg[i];
      const uint8_t* row = flags + i * W;
      int64_t extra = 0;
      // escapes are rare; count them and their splice bytes
      for (int64_t k = 0; k < n; ++k) {
        if ((row[k] & 0xE0) == 0xE0) extra += 3;  // 3-byte field
      }
      if (extra) {
        // each escape but a line-final one carries a '\t'
        for (int64_t k = 0; k < n; ++k) {
          if ((row[k] & 0xE0) == 0xE0) extra += 1;
        }
        // line-final escape has no tab; detect via last slot
        if ((row[n - 1] & 0xE0) == 0xE0) extra -= 1;
      }
      sizes[i] = 8 + req + n + extra + 1;
    }
  });
}

extern "C" void vcfc_write(const uint8_t* body, const int64_t* line_start,
                const int64_t* sample_start, const uint8_t* flags,
                const int32_t* seg_start, const int32_t* nseg,
                const uint8_t* irregular, const int64_t* out_off,
                const int64_t* sizes, int64_t L, int64_t W, int64_t S,
                uint8_t* out) {
  parallel_for(L, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      if (irregular[i]) continue;  // caller splices these
      uint8_t* p = out + out_off[i];
      int64_t req = sample_start[i] - line_start[i];
      put_len_header(p, static_cast<uint32_t>(sizes[i] - 4));
      put_len_header(p + 4, static_cast<uint32_t>(req));
      p += 8;
      std::memcpy(p, body + line_start[i], static_cast<size_t>(req));
      p += req;
      const uint8_t* row = flags + i * W;
      const int32_t* starts = seg_start + i * W;
      int64_t n = nseg[i];
      for (int64_t k = 0; k < n; ++k) {
        uint8_t f = row[k];
        *p++ = f;
        if ((f & 0xE0) == 0xE0) {
          int64_t j = starts[k];
          const uint8_t* field = body + sample_start[i] + 4 * j;
          *p++ = field[0];
          *p++ = field[1];
          *p++ = field[2];
          if (j < S - 1) *p++ = '\t';
        }
      }
      *p++ = '\n';
    }
  });
}

// ---------------------------------------------------------------------------
// Decode assembly: per line, required blob + text row (4 bytes per sample,
// trailing tab dropped) + newline at precomputed offsets.
extern "C" void vcfc_render(const uint8_t* raw, const int64_t* line_off,
                 const int32_t* req_len, const uint8_t* text,
                 const uint8_t* escape_line, const int64_t* out_off,
                 int64_t L, int64_t TW, int64_t S, uint8_t* out) {
  int64_t sample_bytes = 4 * S - 1;
  parallel_for(L, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      if (escape_line[i]) continue;  // caller splices these
      uint8_t* p = out + out_off[i];
      int64_t req = req_len[i];
      std::memcpy(p, raw + line_off[i] + 8, static_cast<size_t>(req));
      p += req;
      std::memcpy(p, text + i * TW, static_cast<size_t>(sample_bytes));
      p += sample_bytes;
      *p = '\n';
    }
  });
}

// ---------------------------------------------------------------------------
// VCF sample-field classification (encode parse fast path): for each line,
// sample fields at sample_start[i] + 4*j (3-byte layout).  Emits code 0..3
// for the biallelic phased GTs, 4 otherwise.  Verifies the 4-byte layout
// (separators must be tabs); sets regular[i] = 0 on mismatch.
extern "C" void vcfc_classify(const uint8_t* body, const int64_t* sample_start,
                   const int64_t* line_end, int64_t L, int64_t S,
                   uint8_t* codes, uint8_t* regular) {
  parallel_for(L, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      if (!regular[i]) continue;
      if (line_end[i] - sample_start[i] != 4 * S - 1) {
        regular[i] = 0;
        continue;
      }
      const uint8_t* base = body + sample_start[i];
      uint8_t* crow = codes + i * S;
      bool ok = true;
      for (int64_t j = 0; j < S; ++j) {
        const uint8_t* f = base + 4 * j;
        uint8_t b0 = f[0], b1 = f[1], b2 = f[2];
        if (j < S - 1 && f[3] != '\t') {
          ok = false;
          break;
        }
        if (b1 == '|' && (b0 == '0' || b0 == '1') && (b2 == '0' || b2 == '1')) {
          crow[j] = static_cast<uint8_t>((b0 - '0') * 2 + (b2 - '0'));
        } else {
          crow[j] = 4;
        }
      }
      if (!ok) regular[i] = 0;
    }
  });
}

