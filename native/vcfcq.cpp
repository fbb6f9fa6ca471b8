// vcfcq — low-latency native front-end for the .vcfc random-access paths.
//
// The Python CLI is the full framework surface, but on this machine every
// interpreter start pays ~2 s of site initialisation, which would swamp
// the p50 of single-region queries (the workload the reference's
// evaluation harness measures per-process).  This binary implements the
// latency-critical verbs natively, mirroring the framework's Python
// modules byte-for-byte:
//
//   compress <input.vcf> <output.vcfc>        (format/vcf.py, format/lines.py)
//   decompress <input.vcfc> <output.vcf>      (format/vcf.py)
//   query <input.vcfc> <region>               (query/engine.py)
//   create-binned-index <bin-size> <in.vcfc>  (index/binned.py)
//   query-binned-index <input.vcfc> <region>  (index/binned.py)
//
// Byte-format parity targets in the reference implementation are cited as
// file:line of /root/reference (format spec only — this is an original
// implementation of the framework's design, not a port):
// headers utils.hpp:141-247; RLE flags utils.hpp:44-56, caps
// compress.cpp:126-127; escape path compress.cpp:171-185; binned index
// gen-4 semantics main.cpp:1284-1637; range compare main.cpp:110-137.
//
// TIMING probes (reference label taxonomy, command.py:135-158) print to
// stdout when VCFC_TIMING is set, like the reference's main_timing build.

#include <algorithm>
#include <chrono>
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

// ---------------------------------------------------------------- timing
bool g_timing = false;
struct TimingProbe {
  const char* label;
  std::chrono::steady_clock::time_point t0;
  explicit TimingProbe(const char* l) : label(l), t0(std::chrono::steady_clock::now()) {}
  ~TimingProbe() {
    if (!g_timing) return;
    auto ns = std::chrono::duration_cast<std::chrono::nanoseconds>(
                  std::chrono::steady_clock::now() - t0)
                  .count();
    printf("TIMING %s: %lld\n", label, static_cast<long long>(ns));
  }
};

// ------------------------------------------------------------------- io
struct Mapped {
  const uint8_t* data = nullptr;
  size_t size = 0;
  int fd = -1;
  ~Mapped() {
    if (data) munmap(const_cast<uint8_t*>(data), size);
    if (fd >= 0) close(fd);
  }
};

bool map_file(const char* path, Mapped* out) {
  out->fd = open(path, O_RDONLY);
  if (out->fd < 0) return false;
  struct stat st;
  if (fstat(out->fd, &st) != 0) return false;
  out->size = static_cast<size_t>(st.st_size);
  if (out->size == 0) {
    out->data = nullptr;
    return true;
  }
  void* p = mmap(nullptr, out->size, PROT_READ, MAP_PRIVATE, out->fd, 0);
  if (p == MAP_FAILED) return false;
  out->data = static_cast<const uint8_t*>(p);
  return true;
}

bool write_file(const char* path, const std::string& bytes) {
  FILE* f = fopen(path, "wb");
  if (!f) return false;
  bool ok = fwrite(bytes.data(), 1, bytes.size(), f) == bytes.size();
  return fclose(f) == 0 && ok;
}

[[noreturn]] void die(const std::string& msg) {
  fprintf(stderr, "vcfcq: %s\n", msg.c_str());
  exit(1);
}

// ------------------------------------------------------------ refmap
// "1".."22","X","Y","M" -> 1..25, unknown -> 0 (utils/refmap.py;
// reference utils.cpp:16-25 with the map-default quirk preserved).
int ref_ordinal(const std::string& name) {
  if (name.size() == 1) {
    if (name[0] == 'X') return 23;
    if (name[0] == 'Y') return 24;
    if (name[0] == 'M') return 25;
  }
  if (name.empty() || name.size() > 2) return 0;
  for (char c : name)
    if (c < '0' || c > '9') return 0;
  if (name[0] == '0') return 0;  // "07"/"0" are not map keys
  int v = atoi(name.c_str());
  return (v >= 1 && v <= 22) ? v : 0;
}

// ------------------------------------------------------------ query model
// query/coordinate.py (reference main.cpp:35-178, 3993-4026)
struct Query {
  std::string ref;
  long long start = 0, end = 0;
  bool has_start = false, has_end = false;

  bool matches(const std::string& chrom, long long pos) const {
    if (!ref.empty() && ref != chrom) return false;
    if (has_start && pos < start) return false;
    if (has_end && pos > end) return false;
    return true;
  }
  // 1: query after the interval; -1: before; 0: overlap (main.cpp:110-137)
  int compare_to_range(const std::string& chrom, long long s, long long e) const {
    int a = ref_ordinal(chrom), b = ref_ordinal(ref);
    if (a < b || (a == b && e < start)) return 1;
    if (a > b || (a == b && s > end)) return -1;
    return 0;
  }
};

Query parse_region(const std::string& s) {
  Query q;
  auto colon = s.find(':');
  if (colon == std::string::npos) {
    q.ref = s;
    return q;
  }
  q.ref = s.substr(0, colon);
  std::string rest = s.substr(colon + 1);
  auto dash = rest.find('-');
  if (dash == std::string::npos)
    die("Query must contain a dash character: <ref>:<start>-<end>");
  q.start = atoll(rest.substr(0, dash).c_str());
  q.end = atoll(rest.substr(dash + 1).c_str());
  q.has_start = q.has_end = true;
  return q;
}

// ------------------------------------------------------------ line format
// format/headers.py: 4-byte BE header, top 2 bits must be 3 (ext count),
// low 30 bits = length (utils.hpp:141-247)
int64_t read_len_header(const uint8_t* p) {
  if ((p[0] & 0xC0) != 0xC0) die("Extension count not implemented, must be 3");
  return (int64_t(p[0] & 0x3F) << 24) | (int64_t(p[1]) << 16) | (int64_t(p[2]) << 8) | p[3];
}

void put_len_header(std::string* out, size_t at, uint32_t len) {
  (*out)[at] = char(0xC0 | ((len >> 24) & 0x3F));
  (*out)[at + 1] = char((len >> 16) & 0xFF);
  (*out)[at + 2] = char((len >> 8) & 0xFF);
  (*out)[at + 3] = char(len & 0xFF);
}

struct Header {
  size_t data_offset = 0;
  long long sample_count = 0;
};

// format/vcf.py::parse_metadata_headers (compress.cpp:995-1098 state machine)
Header parse_meta(const uint8_t* buf, size_t n) {
  TimingProbe probe("decompress2_metadata_headers");
  Header h;
  size_t off = 0;
  bool got_meta = false, got_header = false;
  while (true) {
    if (off >= n) {
      if (!got_header || !got_meta) die("File ended before a header or metadata line");
      break;
    }
    if (buf[off] != '#') {
      if (!got_meta || !got_header) die("File was missing headers or metadata");
      break;
    }
    if (got_header) die("Read a metadata or header row after already reading a header");
    const uint8_t* nl = static_cast<const uint8_t*>(memchr(buf + off, '\n', n - off));
    if (!nl) die("Failed to read the rest of the metadata or header row!");
    size_t end = size_t(nl - buf);
    if (off + 1 >= n) die("Invalid format, empty header row");
    if (buf[off + 1] == '#') {
      got_meta = true;
    } else {
      if (!got_meta) die("Got a header line but no metadata lines");
      got_header = true;
      long long tabs = std::count(buf + off, buf + end, '\t');
      if (tabs > 8) h.sample_count = tabs - 8;
    }
    off = end + 1;
  }
  h.data_offset = off;
  return h;
}

// format/lines.py::decode_data_line (compress.cpp:741-986).  Appends the
// decoded VCF line (incl. newline) to *out; returns bytes consumed.
size_t decode_data_line(const uint8_t* buf, size_t n, size_t offset, long long sample_count,
                        std::string* out) {
  size_t start = offset;
  if (offset + 8 > n) die("Truncated line length headers");
  int64_t line_length = read_len_header(buf + offset);
  int64_t required_length = read_len_header(buf + offset + 4);
  (void)line_length;
  offset += 8;
  if (offset + size_t(required_length) > n) die("Truncated required columns");
  const uint8_t* req = buf + offset;
  long long tabs = std::count(req, req + required_length, '\t');
  if (tabs != 9 && !(tabs == 8 && sample_count == 0))
    die("Did not read all uncompressed columns");
  out->append(reinterpret_cast<const char*>(req), size_t(required_length));
  offset += size_t(required_length);

  long long produced = 0;
  while (produced < sample_count) {
    if (offset >= n) die("Missing samples");
    uint8_t b = buf[offset++];
    if ((b & 0x80) == 0) {  // run of 0|0, 7-bit count (compress.cpp:126)
      int count = b & 0x7F;
      for (int i = 0; i < count; i++) out->append("0|0\t", 4);
      produced += count;
      if (produced >= sample_count) out->pop_back();  // compress.cpp:865-868
    } else if ((b & 0xE0) == 0xE0) {  // escape: raw ASCII cols follow
      int ucount = b & 0x1F;
      int seen = 0;
      while (seen < ucount) {
        if (offset >= n) die("Truncated escape column");
        uint8_t c = buf[offset++];
        if (c == '\n') {
          seen++;
          produced++;
          if (seen != ucount)
            die("Reached end of line before reading all decompressed columns");
          offset--;  // final newline handled below (compress.cpp:891)
        } else if (c == '\t') {
          seen++;
          produced++;
          if (produced < sample_count) out->push_back('\t');
        } else {
          out->push_back(char(c));
        }
      }
    } else {  // 0|1 / 1|0 / 1|1 runs, 5-bit count
      uint8_t masked = b & 0xE0;
      const char* gt;
      if (masked == 0xA0)
        gt = "0|1";
      else if (masked == 0xC0)
        gt = "1|0";
      else if (masked == 0x80)
        gt = "1|1";
      else
        die("unrecognized bitmask during decompression");
      int count = b & 0x1F;
      for (int i = 0; i < count; i++) {
        out->append(gt, 3);
        produced++;
        if (produced < sample_count) out->push_back('\t');
      }
    }
  }
  if (offset >= n || buf[offset] != '\n') die("Sample line did not end in a newline");
  out->push_back('\n');
  return offset + 1 - start;
}

// ---------------------------------------------------- line skeleton scan
// index/scan.py: walk compressed lines reading only CHROM..INFO.
struct LineView {
  size_t offset;
  int64_t line_length;
  std::string chrom;
  long long pos;
  const uint8_t* ref;  // spans into the mapped file
  size_t ref_len;
  const uint8_t* alt;
  size_t alt_len;
  const uint8_t* info;
  size_t info_len;
};

// Parse the required-columns region into a LineView. Returns false at EOF.
bool next_line(const uint8_t* buf, size_t n, size_t offset, LineView* lv) {
  if (offset >= n) return false;
  if (offset + 8 > n) die("Truncated line length headers");
  lv->offset = offset;
  lv->line_length = read_len_header(buf + offset);
  int64_t required_length = read_len_header(buf + offset + 4);
  const uint8_t* req = buf + offset + 8;
  if (offset + 8 + size_t(required_length) > n) die("Truncated required columns");
  // cols: CHROM POS ID REF ALT QUAL FILTER INFO [FORMAT]
  const uint8_t* p = req;
  const uint8_t* end = req + required_length;
  const uint8_t* f[9];
  size_t flen[9];
  for (int i = 0; i < 8; i++) {
    const uint8_t* tab = static_cast<const uint8_t*>(memchr(p, '\t', size_t(end - p)));
    if (!tab) {
      if (i < 7) die("line missing required columns");
      tab = end;
    }
    f[i] = p;
    flen[i] = size_t(tab - p);
    p = tab < end ? tab + 1 : end;
  }
  lv->chrom.assign(reinterpret_cast<const char*>(f[0]), flen[0]);
  lv->pos = atoll(std::string(reinterpret_cast<const char*>(f[1]), flen[1]).c_str());
  lv->ref = f[3];
  lv->ref_len = flen[3];
  lv->alt = f[4];
  lv->alt_len = flen[4];
  lv->info = f[7];
  lv->info_len = flen[7];
  return true;
}

// query/coordinate.py::compute_end_position (main.cpp:763-852)
long long end_position(const LineView& lv) {
  bool structural = memchr(lv.alt, '<', lv.alt_len) != nullptr;
  if (structural) {
    // parse_info_kvp semantics (query/coordinate.py; main.cpp:737-757):
    // split on ';', then each pair on '=' dropping empty parts — one part
    // means a flag key with empty value; duplicate keys keep the last.
    std::string info(reinterpret_cast<const char*>(lv.info), lv.info_len);
    auto lookup = [&](const char* key, bool* present) -> std::string {
      *present = false;
      std::string last;
      size_t pos = 0;
      while (pos <= info.size()) {
        size_t semi = info.find(';', pos);
        if (semi == std::string::npos) semi = info.size();
        std::string pair = info.substr(pos, semi - pos);
        std::vector<std::string> parts;
        size_t p2 = 0;
        while (p2 <= pair.size()) {
          size_t eq = pair.find('=', p2);
          if (eq == std::string::npos) eq = pair.size();
          if (eq > p2) parts.push_back(pair.substr(p2, eq - p2));
          p2 = eq + 1;
        }
        if (!parts.empty() && parts[0] == key) {
          *present = true;
          last = parts.size() >= 2 ? parts[1] : "";
        }
        pos = semi + 1;
      }
      return last;
    };
    auto split_ints = [](const std::string& s) {
      std::vector<long long> vals;
      size_t p2 = 0;
      while (p2 <= s.size() && !s.empty()) {
        size_t comma = s.find(',', p2);
        if (comma == std::string::npos) comma = s.size();
        std::string v = s.substr(p2, comma - p2);
        if (!v.empty()) vals.push_back(atoll(v.c_str()));
        p2 = comma + 1;
      }
      return vals;
    };
    bool has_end = false, has_svlen = false;
    std::string end_val = lookup("END", &has_end);
    if (has_end) {
      auto ends = split_ints(end_val);
      if (ends.empty()) return lv.pos;
      return llabs(*std::max_element(ends.begin(), ends.end()));
    }
    std::string svlen_val = lookup("SVLEN", &has_svlen);
    if (has_svlen) {
      auto svlens = split_ints(svlen_val);
      if (svlens.empty()) return lv.pos;
      long long m = 0;
      for (long long v : svlens) m = std::max(m, llabs(v));
      return lv.pos + m - 1;
    }
    return lv.pos;
  }
  // non-structural: pos + max(len(REF), longest comma-separated ALT) - 1
  size_t max_alt = 0, cur = 0;
  for (size_t i = 0; i <= lv.alt_len; i++) {
    if (i == lv.alt_len || lv.alt[i] == ',') {
      max_alt = std::max(max_alt, cur);
      cur = 0;
    } else {
      cur++;
    }
  }
  return lv.pos + (long long)std::max(lv.ref_len, max_alt) - 1;
}

// ---------------------------------------------------------------- verbs

int do_query(const char* path, const std::string& region) {
  Mapped m;
  if (!map_file(path, &m)) die(std::string("cannot open ") + path);
  Query q = parse_region(region);
  Header h = parse_meta(m.data, m.size);
  std::string out;
  out.reserve(1 << 20);
  LineView lv;
  size_t off = h.data_offset;
  {
    TimingProbe probe("decompress_iteration");
    while (next_line(m.data, m.size, off, &lv)) {
      if (q.matches(lv.chrom, lv.pos))
        decode_data_line(m.data, m.size, lv.offset, h.sample_count, &out);
      off = lv.offset + 4 + size_t(lv.line_length);
    }
  }
  fwrite(out.data(), 1, out.size(), stdout);
  return 0;
}

#pragma pack(push, 1)
struct IndexEntry {  // 13-byte little-endian entry (index/entry.py)
  uint8_t ref_idx;
  uint32_t position;
  uint64_t byte_offset;
};
#pragma pack(pop)
static_assert(sizeof(IndexEntry) == 13, "packed entry must be 13 bytes");

int do_create_binned_index(const char* bin_str, const char* path) {
  long long bin = atoll(bin_str);
  if (bin <= 0) {
    printf("bin size must be a positive integer\n");
    return 1;
  }
  Mapped m;
  if (!map_file(path, &m)) die(std::string("cannot open ") + path);
  Header h = parse_meta(m.data, m.size);
  std::vector<IndexEntry> entries;
  LineView lv;
  size_t off = h.data_offset;
  long long line_no = 0;
  while (next_line(m.data, m.size, off, &lv)) {
    long long end = end_position(lv);
    int ridx = ref_ordinal(lv.chrom);
    // gen-4 semantics (index/binned.py; reference main.cpp:1430-1547)
    if (entries.empty()) {
      entries.push_back({uint8_t(ridx), uint32_t(end), uint64_t(lv.offset)});
    } else if (line_no % bin == 0) {
      if (end > (long long)entries.back().position)
        entries.push_back({uint8_t(ridx), uint32_t(end), uint64_t(lv.offset)});
    } else if (end > (long long)entries.back().position) {
      entries.back().position = uint32_t(end);
    }
    line_no++;
    off = lv.offset + 4 + size_t(lv.line_length);
  }
  std::string bytes(reinterpret_cast<const char*>(entries.data()),
                    entries.size() * sizeof(IndexEntry));
  std::string out_path = std::string(path) + ".vcfci";
  if (!write_file(out_path.c_str(), bytes)) die("cannot write " + out_path);
  return 0;
}

int do_query_binned_index(const char* path, const std::string& region) {
  Mapped m;
  if (!map_file(path, &m)) die(std::string("cannot open ") + path);
  std::string index_path = std::string(path) + ".vcfci";
  Mapped mi;
  if (!map_file(index_path.c_str(), &mi)) die("cannot open " + index_path);
  if (mi.size % sizeof(IndexEntry) != 0) die("index size not a multiple of 13");

  Query q = parse_region(region);
  Header h = parse_meta(m.data, m.size);

  size_t n_entries = mi.size / sizeof(IndexEntry);
  const IndexEntry* ents = reinterpret_cast<const IndexEntry*>(mi.data);
  size_t start_off;
  {
    TimingProbe probe("index_search");
    if (n_entries == 0) return 0;
    // bisect_right over (ref_idx, position) for (q_ref, q_start), then
    // back up one (index/binned.py::find_start_entry)
    int q_ref = ref_ordinal(q.ref);
    size_t lo = 0, hi = n_entries;
    while (lo < hi) {
      size_t mid = (lo + hi) / 2;
      IndexEntry e;
      memcpy(&e, &ents[mid], sizeof e);  // mapped data may be unaligned
      bool le = (e.ref_idx < q_ref) ||
                (e.ref_idx == q_ref && (long long)e.position <= q.start);
      if (le)
        lo = mid + 1;
      else
        hi = mid;
    }
    IndexEntry e;
    memcpy(&e, &ents[lo > 0 ? lo - 1 : 0], sizeof e);
    start_off = size_t(e.byte_offset);
  }

  std::string out;
  out.reserve(1 << 20);
  LineView lv;
  size_t off = start_off;
  {
    TimingProbe probe("decompress_iteration");
    while (next_line(m.data, m.size, off, &lv)) {
      int cmp = q.compare_to_range(lv.chrom, lv.pos, end_position(lv));
      if (cmp == 0)
        decode_data_line(m.data, m.size, lv.offset, h.sample_count, &out);
      else if (cmp < 0)
        break;
      off = lv.offset + 4 + size_t(lv.line_length);
    }
  }
  fwrite(out.data(), 1, out.size(), stdout);
  return 0;
}

int do_decompress(const char* in_path, const char* out_path) {
  Mapped m;
  if (!map_file(in_path, &m)) die(std::string("cannot open ") + in_path);
  Header h = parse_meta(m.data, m.size);
  std::string out;
  out.reserve(m.size * 8);
  out.append(reinterpret_cast<const char*>(m.data), h.data_offset);  // verbatim
  size_t off = h.data_offset;
  while (off < m.size) off += decode_data_line(m.data, m.size, off, h.sample_count, &out);
  if (!write_file(out_path, out)) die(std::string("cannot write ") + out_path);
  return 0;
}

// format/lines.py::encode_data_line (compress.cpp:5-203)
void encode_data_line(const uint8_t* line, size_t len, std::string* out) {
  // split on tabs, dropping empty terms (utils.cpp:82-112 semantics)
  std::vector<std::pair<const uint8_t*, size_t>> terms;
  size_t i = 0;
  while (i < len) {
    size_t j = i;
    while (j < len && line[j] != '\t') j++;
    if (j > i) terms.emplace_back(line + i, j - i);
    i = j + 1;
  }
  if (terms.size() < 8) die("VCF data line did not contain at least 8 terms");

  size_t base = out->size();
  out->append(8, '\0');  // two header placeholders
  int64_t required_length = 7;
  for (int k = 0; k < 8; k++) {
    if (k) out->push_back('\t');
    out->append(reinterpret_cast<const char*>(terms[k].first), terms[k].second);
    required_length += int64_t(terms[k].second);
  }
  if (terms.size() > 8) {
    out->push_back('\t');
    out->append(reinterpret_cast<const char*>(terms[8].first), terms[8].second);
    required_length += int64_t(terms[8].second) + 1;
  }
  size_t n_samples = terms.size() > 9 ? terms.size() - 9 : 0;
  if (n_samples) {
    out->push_back('\t');
    required_length += 1;
  }
  put_len_header(out, base + 4, uint32_t(required_length));

  auto is_gt = [&](size_t t, const char* g) {
    return terms[t].second == 3 && memcmp(terms[t].first, g, 3) == 0;
  };
  size_t s = 9;
  const size_t n = terms.size();
  while (s < n) {
    if (is_gt(s, "0|0")) {
      int count = 1;
      s++;
      while (count < 127 && s < n && is_gt(s, "0|0")) count++, s++;
      out->push_back(char(count));
    } else if (is_gt(s, "0|1") || is_gt(s, "1|0") || is_gt(s, "1|1")) {
      uint8_t basef = terms[s].first[0] == '0' ? 0xA0
                      : terms[s].first[2] == '0' ? 0xC0
                                                 : 0x80;
      const uint8_t* v = terms[s].first;
      int count = 1;
      s++;
      while (count < 31 && s < n && terms[s].second == 3 && memcmp(terms[s].first, v, 3) == 0)
        count++, s++;
      out->push_back(char(basef | count));
    } else {
      // escape: count always 1, raw ASCII, '\t' unless last sample
      // (compress.cpp:171-185 "TODO lookahead")
      out->push_back(char(0xE0 | 1));
      out->append(reinterpret_cast<const char*>(terms[s].first), terms[s].second);
      if (s < n - 1) out->push_back('\t');
      s++;
    }
  }
  out->push_back('\n');
  put_len_header(out, base, uint32_t(out->size() - base - 4));
}

int do_compress(const char* in_path, const char* out_path) {
  Mapped m;
  if (!map_file(in_path, &m)) die(std::string("cannot open ") + in_path);
  std::string out;
  out.reserve(m.size / 4);
  size_t off = 0;
  while (off < m.size) {
    const uint8_t* nl =
        static_cast<const uint8_t*>(memchr(m.data + off, '\n', m.size - off));
    size_t end = nl ? size_t(nl - m.data) : m.size;
    size_t len = end - off;
    if (len == 0) {  // empty lines ignored (compress.cpp:219-221)
      off = end + 1;
      continue;
    }
    if (m.data[off] == '#') {
      out.append(reinterpret_cast<const char*>(m.data + off), len);
      out.push_back('\n');
    } else {
      encode_data_line(m.data + off, len, &out);
    }
    off = end + 1;
  }
  if (!write_file(out_path, out)) die(std::string("cannot write ") + out_path);
  return 0;
}

}  // namespace

int main(int argc, char** argv) {
  const char* t = getenv("VCFC_TIMING");
  g_timing = t && *t && strcmp(t, "0") != 0 && strcmp(t, "false") != 0;
  if (argc < 2) {
    fprintf(stderr,
            "usage: vcfcq <compress|decompress|query|create-binned-index|"
            "query-binned-index> ...\n");
    return 1;
  }
  std::string action = argv[1];
  if (action == "compress" && argc == 4) return do_compress(argv[2], argv[3]);
  if (action == "decompress" && argc == 4) return do_decompress(argv[2], argv[3]);
  if (action == "query" && argc == 4) return do_query(argv[2], argv[3]);
  if (action == "create-binned-index" && argc == 4)
    return do_create_binned_index(argv[2], argv[3]);
  if (action == "query-binned-index" && argc == 4)
    return do_query_binned_index(argv[2], argv[3]);
  fprintf(stderr, "vcfcq: bad arguments for action '%s'\n", action.c_str());
  return 1;
}
