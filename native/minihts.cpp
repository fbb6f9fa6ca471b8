// minihts — self-contained BGZF / tabix / BCF tooling for the evaluation
// harness (VERDICT r1 #1).
//
// The reference's headline comparison runs VCFC against `tabix` over
// bgzip-compressed VCF and against BCF (evaluation/command.py:53-132,
// evaluation_main.py:409-494).  This machine has no htslib/bcftools and
// no network, so this file implements the on-disk formats those tools
// use — BGZF (SAMv1 spec §4.1), the .tbi tabix index (tabix.pdf /
// SAMv1 §5.1.3 binning), BCF2.2 records and the .csi index — with the
// same I/O structure htslib uses (zlib deflate per 64KB block, binned
// chunk lists, virtual-offset seeks), so its latency is representative
// of the real tools.  One binary, busybox-style: invoked as bgzip /
// tabix / bcftools (argv[0] basename or first argument).
//
// Supported surface (exactly what the eval schemes invoke,
// vcfc_tpu/eval/schemes.py:191-240):
//   bgzip -c FILE            BGZF-compress to stdout
//   tabix -p vcf GZ | -f GZ  build GZ.tbi
//   tabix GZ REGION          query, print matching records
//   bcftools view -O b -o OUT.bcf IN.vcf
//   bcftools index BCF       build BCF.csi
//   bcftools view -H BCF REGION
//
// NOT copied from htslib: written from the published format
// specifications (SAMv1.pdf, CSIv1.pdf, BCF2.2 spec).

#include <zlib.h>

#include <algorithm>
#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <map>
#include <string>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

[[noreturn]] void die(const std::string& msg) {
  fprintf(stderr, "minihts: %s\n", msg.c_str());
  exit(1);
}

// ------------------------------------------------------------------ BGZF
// Block size cap: htslib uses 0xff00 uncompressed bytes per block.
constexpr size_t kBgzfBlock = 0xff00;

// 18-byte BGZF member header with the BC extra subfield (BSIZE patched in)
const uint8_t kBgzfHdr[18] = {0x1f, 0x8b, 8,    4,    0, 0, 0, 0, 0, 0xff,
                              6,    0,    'B', 'C',  2, 0, 0, 0};
// canonical 28-byte BGZF EOF marker (SAMv1 §4.1.2)
const uint8_t kBgzfEof[28] = {0x1f, 0x8b, 8,    4,    0,    0,    0,    0,
                              0,    0xff, 6,    0,    'B',  'C',  2,    0,
                              0x1b, 0,    3,    0,    0,    0,    0,    0,
                              0,    0,    0,    0};

struct BgzfWriter {
  FILE* f;
  std::string buf;  // pending uncompressed bytes
  uint64_t coffset = 0;

  explicit BgzfWriter(FILE* out) : f(out) { buf.reserve(kBgzfBlock); }

  uint64_t voffset() const { return (coffset << 16) | uint64_t(buf.size()); }

  void flush_block() {
    if (buf.empty()) return;
    static std::vector<uint8_t> comp;
    comp.resize(kBgzfBlock + 1024);
    z_stream zs{};
    if (deflateInit2(&zs, Z_DEFAULT_COMPRESSION, Z_DEFLATED, -15, 8,
                     Z_DEFAULT_STRATEGY) != Z_OK)
      die("deflateInit2 failed");
    zs.next_in = reinterpret_cast<Bytef*>(buf.data());
    zs.avail_in = uInt(buf.size());
    zs.next_out = comp.data();
    zs.avail_out = uInt(comp.size());
    if (deflate(&zs, Z_FINISH) != Z_STREAM_END) die("deflate failed");
    size_t clen = comp.size() - zs.avail_out;
    deflateEnd(&zs);

    uint32_t crc = uint32_t(crc32(0, reinterpret_cast<Bytef*>(buf.data()),
                                  uInt(buf.size())));
    size_t bsize = 18 + clen + 8;  // header + cdata + crc + isize
    if (bsize > 0x10000) die("bgzf block overflow");
    uint8_t hdr[18];
    memcpy(hdr, kBgzfHdr, 18);
    hdr[16] = uint8_t((bsize - 1) & 0xff);
    hdr[17] = uint8_t(((bsize - 1) >> 8) & 0xff);
    uint8_t tail[8];
    uint32_t isize = uint32_t(buf.size());
    memcpy(tail, &crc, 4);
    memcpy(tail + 4, &isize, 4);
    if (fwrite(hdr, 1, 18, f) != 18 || fwrite(comp.data(), 1, clen, f) != clen ||
        fwrite(tail, 1, 8, f) != 8)
      die("bgzf write failed");
    coffset += bsize;
    buf.clear();
  }

  void write(const void* p, size_t n) {
    const char* c = static_cast<const char*>(p);
    while (n) {
      size_t take = std::min(n, kBgzfBlock - buf.size());
      buf.append(c, take);
      c += take;
      n -= take;
      if (buf.size() == kBgzfBlock) flush_block();
    }
  }

  void close() {
    flush_block();
    if (fwrite(kBgzfEof, 1, 28, f) != 28) die("bgzf eof write failed");
  }
};

struct Mapped {
  const uint8_t* data = nullptr;
  size_t size = 0;
};

bool map_file(const char* path, Mapped* m) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return false;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    close(fd);
    return false;
  }
  m->size = size_t(st.st_size);
  if (m->size == 0) {
    m->data = nullptr;
    close(fd);
    return true;
  }
  void* p = mmap(nullptr, m->size, PROT_READ, MAP_PRIVATE, fd, 0);
  close(fd);
  if (p == MAP_FAILED) return false;
  m->data = static_cast<const uint8_t*>(p);
  return true;
}

// Random-access BGZF reader over a mapped file: inflate one block at a
// compressed offset (htslib's bgzf_read_block equivalent).
struct BgzfReader {
  Mapped m;

  // returns the compressed size of the block; fills `out`
  size_t read_block(uint64_t coffset, std::string* out) const {
    if (coffset + 18 > m.size) die("truncated bgzf block header");
    const uint8_t* h = m.data + coffset;
    if (h[0] != 0x1f || h[1] != 0x8b) die("not a bgzf stream");
    uint16_t xlen;
    memcpy(&xlen, h + 10, 2);
    // the extra-field walk reads untrusted lengths: bound it by the file
    if (coffset + 12 + size_t(xlen) > m.size) die("truncated bgzf extra field");
    size_t bsize = 0;
    size_t xoff = 12;
    size_t xend = 12 + size_t(xlen);
    while (xoff + 4 <= xend) {
      uint8_t si1 = h[xoff], si2 = h[xoff + 1];
      uint16_t slen;
      memcpy(&slen, h + xoff + 2, 2);
      if (si1 == 'B' && si2 == 'C' && slen == 2 && xoff + 6 <= xend) {
        uint16_t bs;
        memcpy(&bs, h + xoff + 4, 2);
        bsize = size_t(bs) + 1;
        break;
      }
      xoff += 4 + size_t(slen);
    }
    if (!bsize) die("bgzf block missing BC subfield");
    if (bsize < 12 + size_t(xlen) + 8) die("corrupt bgzf block size");
    if (coffset + bsize > m.size) die("truncated bgzf block");
    size_t cdata_off = 12 + xlen;
    size_t cdata_len = bsize - cdata_off - 8;
    uint32_t isize;
    memcpy(&isize, h + bsize - 4, 4);
    if (isize > 0x10000) die("bgzf block claims > 64KB uncompressed");
    out->resize(isize);
    if (isize) {
      z_stream zs{};
      if (inflateInit2(&zs, -15) != Z_OK) die("inflateInit2 failed");
      zs.next_in = const_cast<Bytef*>(h + cdata_off);
      zs.avail_in = uInt(cdata_len);
      zs.next_out = reinterpret_cast<Bytef*>(out->data());
      zs.avail_out = uInt(isize);
      int r = inflate(&zs, Z_FINISH);
      inflateEnd(&zs);
      if (r != Z_STREAM_END) die("bgzf inflate failed");
    }
    return bsize;
  }

  // inflate the whole stream (index build / header reads)
  std::string read_all() const {
    std::string out;
    uint64_t off = 0;
    std::string block;
    while (off < m.size) {
      size_t bs = read_block(off, &block);
      if (block.empty() && off + bs >= m.size) break;  // EOF marker
      out += block;
      off += bs;
    }
    return out;
  }
};

// Sequential reader that tracks virtual offsets per consumed byte range
// (index building needs the voffset of every record start/end).
struct BgzfScanner {
  const BgzfReader& r;
  uint64_t coffset = 0;       // compressed offset of current block
  size_t next_csize = 0;      // compressed size of current block
  std::string block;          // current uncompressed block
  size_t upos = 0;            // position within block

  explicit BgzfScanner(const BgzfReader& rd) : r(rd) {
    if (r.m.size) next_csize = r.read_block(0, &block);
  }

  bool at_eof() {
    while (upos >= block.size()) {
      uint64_t next = coffset + next_csize;
      if (next >= r.m.size) return true;
      coffset = next;
      next_csize = r.read_block(coffset, &block);
      upos = 0;
      if (block.empty() && coffset + next_csize >= r.m.size) return true;
    }
    return false;
  }

  uint64_t voffset() { return (coffset << 16) | uint64_t(upos); }

  // read one text line (without trailing newline); false at EOF
  bool getline(std::string* line) {
    line->clear();
    if (at_eof()) return false;
    while (true) {
      const char* p = block.data() + upos;
      const char* nl =
          static_cast<const char*>(memchr(p, '\n', block.size() - upos));
      if (nl) {
        line->append(p, size_t(nl - p));
        upos = size_t(nl - block.data()) + 1;
        return true;
      }
      line->append(p, block.size() - upos);
      upos = block.size();
      if (at_eof()) return true;  // last line without newline
    }
  }

  // read exactly n bytes; false at EOF before any byte
  bool read(void* dst, size_t n) {
    uint8_t* d = static_cast<uint8_t*>(dst);
    while (n) {
      if (at_eof()) return false;
      size_t take = std::min(n, block.size() - upos);
      memcpy(d, block.data() + upos, take);
      upos += take;
      d += take;
      n -= take;
    }
    return true;
  }
};

// ------------------------------------------------- binning (SAMv1 §5.3)
int reg2bin(int64_t beg, int64_t end) {
  --end;
  if (beg >> 14 == end >> 14) return int(((1 << 15) - 1) / 7 + (beg >> 14));
  if (beg >> 17 == end >> 17) return int(((1 << 12) - 1) / 7 + (beg >> 17));
  if (beg >> 20 == end >> 20) return int(((1 << 9) - 1) / 7 + (beg >> 20));
  if (beg >> 23 == end >> 23) return int(((1 << 6) - 1) / 7 + (beg >> 23));
  if (beg >> 26 == end >> 26) return int(((1 << 3) - 1) / 7 + (beg >> 26));
  return 0;
}

int reg2bins(int64_t beg, int64_t end, uint16_t* list) {
  int i = 0, k;
  --end;
  list[i++] = 0;
  for (k = 1 + (int)(beg >> 26); k <= 1 + (int)(end >> 26); ++k) list[i++] = uint16_t(k);
  for (k = 9 + (int)(beg >> 23); k <= 9 + (int)(end >> 23); ++k) list[i++] = uint16_t(k);
  for (k = 73 + (int)(beg >> 20); k <= 73 + (int)(end >> 20); ++k) list[i++] = uint16_t(k);
  for (k = 585 + (int)(beg >> 17); k <= 585 + (int)(end >> 17); ++k) list[i++] = uint16_t(k);
  for (k = 4681 + (int)(beg >> 14); k <= 4681 + (int)(end >> 14); ++k) list[i++] = uint16_t(k);
  return i;
}

struct Chunk {
  uint64_t beg, end;
};

struct RefIndex {
  std::map<uint32_t, std::vector<Chunk>> bins;
  std::vector<uint64_t> linear;  // 16kb intervals -> min voffset
  uint64_t n_mapped = 0;
  uint64_t off_first = ~0ull, off_last = 0;

  void add(int64_t beg, int64_t end, uint64_t voff_beg, uint64_t voff_end) {
    if (end > (int64_t(1) << 29) || beg < 0)
      die("record coordinate beyond the binning scheme's 2^29 range");
    uint32_t bin = uint32_t(reg2bin(beg, end));
    auto& chunks = bins[bin];
    // merge with the previous chunk of this bin when contiguous
    if (!chunks.empty() && chunks.back().end == voff_beg)
      chunks.back().end = voff_end;
    else
      chunks.push_back({voff_beg, voff_end});
    size_t lbeg = size_t(beg >> 14), lend = size_t((end - 1) >> 14);
    if (linear.size() <= lend) linear.resize(lend + 1, 0);
    for (size_t w = lbeg; w <= lend; w++)
      if (!linear[w] || voff_beg < linear[w]) linear[w] = voff_beg;
    n_mapped++;
    if (voff_beg < off_first) off_first = voff_beg;
    if (voff_end > off_last) off_last = voff_end;
  }
};

// fill empty linear slots with the following value (htslib behavior)
void finalize_linear(std::vector<uint64_t>* linear) {
  uint64_t last = 0;
  for (auto& v : *linear) {
    if (!v)
      v = last;
    else
      last = v;
  }
}

// ------------------------------------------------------ region parsing
struct Region {
  std::string ref;
  int64_t beg = 0;           // 0-based inclusive
  int64_t end = INT64_MAX;   // 0-based exclusive
};

Region parse_region(const std::string& s) {
  Region r;
  size_t colon = s.rfind(':');
  if (colon == std::string::npos) {
    r.ref = s;
    return r;
  }
  r.ref = s.substr(0, colon);
  std::string rest = s.substr(colon + 1);
  size_t dash = rest.find('-');
  if (dash == std::string::npos) {
    r.beg = atoll(rest.c_str()) - 1;
    r.end = r.beg + 1;
  } else {
    r.beg = atoll(rest.substr(0, dash).c_str()) - 1;
    r.end = atoll(rest.substr(dash + 1).c_str());
  }
  if (r.beg < 0) r.beg = 0;
  return r;
}

// VCF record interval for indexing: 0-based [POS-1, POS-1+rlen) where
// rlen = max(len(REF), END-POS+1) when INFO carries END (htslib
// tbx_parse1 / vcf.c hts_set_rlen semantics).
void vcf_interval(const std::string& line, std::string* chrom, int64_t* beg,
                  int64_t* end) {
  // cols: CHROM POS ID REF ALT QUAL FILTER INFO ...
  const char* p = line.c_str();
  const char* f[8];
  size_t flen[8];
  for (int i = 0; i < 8; i++) {
    const char* tab = strchr(p, '\t');
    f[i] = p;
    flen[i] = tab ? size_t(tab - p) : strlen(p);
    if (!tab) {
      if (i < 7) die("VCF record with fewer than 8 columns");
      p += flen[i];
    } else {
      p = tab + 1;
    }
  }
  chrom->assign(f[0], flen[0]);
  int64_t pos = atoll(std::string(f[1], flen[1]).c_str()) - 1;
  int64_t rlen = int64_t(flen[3]);  // len(REF)
  // INFO END=
  std::string info(f[7], flen[7]);
  size_t e = 0;
  while ((e = info.find("END=", e)) != std::string::npos) {
    if (e == 0 || info[e - 1] == ';') {
      int64_t iend = atoll(info.c_str() + e + 4);
      if (iend - pos > rlen) rlen = iend - pos;
      break;
    }
    e += 4;
  }
  if (rlen < 1) rlen = 1;
  *beg = pos;
  *end = pos + rlen;
}

// little-endian write helpers
template <typename T>
void put(std::string* s, T v) {
  s->append(reinterpret_cast<const char*>(&v), sizeof v);
}

// --------------------------------------------------------------- bgzip
int cmd_bgzip(int argc, char** argv) {
  const char* path = nullptr;
  bool to_stdout = false;
  for (int i = 1; i < argc; i++) {
    if (!strcmp(argv[i], "-c"))
      to_stdout = true;
    else
      path = argv[i];
  }
  if (!path) die("usage: bgzip -c FILE");
  Mapped m;
  if (!map_file(path, &m)) die(std::string("cannot open ") + path);
  FILE* out = stdout;
  std::string tmp;
  if (!to_stdout) {
    tmp = std::string(path) + ".gz";
    out = fopen(tmp.c_str(), "wb");
    if (!out) die("cannot write " + tmp);
  }
  BgzfWriter w(out);
  w.write(m.data, m.size);
  w.close();
  if (to_stdout)
    fflush(out);
  else
    fclose(out);
  return 0;
}

// ------------------------------------------------------- tabix (.tbi)
struct TbiIndex {
  std::vector<std::string> names;
  std::vector<RefIndex> refs;
  uint64_t n_no_coor = 0;
};

void tbi_write(const TbiIndex& idx, const std::string& path) {
  std::string u;  // uncompressed index payload
  u += "TBI\1";
  put<int32_t>(&u, int32_t(idx.refs.size()));
  put<int32_t>(&u, 2);    // format: VCF
  put<int32_t>(&u, 1);    // col_seq
  put<int32_t>(&u, 2);    // col_beg
  put<int32_t>(&u, 0);    // col_end (VCF: derived)
  put<int32_t>(&u, '#');  // meta char
  put<int32_t>(&u, 0);    // skip
  std::string nm;
  for (auto& n : idx.names) {
    nm += n;
    nm.push_back('\0');
  }
  put<int32_t>(&u, int32_t(nm.size()));
  u += nm;
  for (auto& r : idx.refs) {
    put<int32_t>(&u, int32_t(r.bins.size() + (r.n_mapped ? 1 : 0)));
    for (auto& [bin, chunks] : r.bins) {
      put<uint32_t>(&u, bin);
      put<int32_t>(&u, int32_t(chunks.size()));
      for (auto& c : chunks) {
        put<uint64_t>(&u, c.beg);
        put<uint64_t>(&u, c.end);
      }
    }
    if (r.n_mapped) {  // pseudo-bin 37450: file range + mapped counts
      put<uint32_t>(&u, 37450);
      put<int32_t>(&u, 2);
      put<uint64_t>(&u, r.off_first);
      put<uint64_t>(&u, r.off_last);
      put<uint64_t>(&u, r.n_mapped);
      put<uint64_t>(&u, 0);
    }
    put<int32_t>(&u, int32_t(r.linear.size()));
    for (auto v : r.linear) put<uint64_t>(&u, v);
  }
  put<uint64_t>(&u, idx.n_no_coor);

  FILE* f = fopen(path.c_str(), "wb");
  if (!f) die("cannot write " + path);
  BgzfWriter w(f);
  w.write(u.data(), u.size());
  w.close();
  fclose(f);
}

TbiIndex tbi_read(const std::string& path) {
  Mapped m;
  if (!map_file(path.c_str(), &m)) die("cannot open " + path);
  BgzfReader r{m};
  std::string u = r.read_all();
  if (u.size() < 36 || memcmp(u.data(), "TBI\1", 4) != 0)
    die("not a .tbi index");
  size_t off = 4;
  // every read bounds-checks: the index is untrusted on-disk input
  auto rd_i32 = [&]() {
    if (off + 4 > u.size()) die("truncated .tbi index");
    int32_t v;
    memcpy(&v, u.data() + off, 4);
    off += 4;
    return v;
  };
  auto rd_u64 = [&]() {
    if (off + 8 > u.size()) die("truncated .tbi index");
    uint64_t v;
    memcpy(&v, u.data() + off, 8);
    off += 8;
    return v;
  };
  TbiIndex idx;
  int32_t n_ref = rd_i32();
  if (n_ref < 0) die("corrupt .tbi: negative n_ref");
  for (int k = 0; k < 6; k++) rd_i32();  // format..skip
  int32_t l_nm = rd_i32();
  if (l_nm < 0 || off + size_t(l_nm) > u.size()) die("truncated .tbi names");
  size_t nm_end = off + size_t(l_nm);
  while (off < nm_end) {
    size_t len = strnlen(u.data() + off, nm_end - off);
    idx.names.emplace_back(u.data() + off, len);
    off += len + 1;
  }
  idx.refs.resize(size_t(n_ref));
  for (auto& ref : idx.refs) {
    int32_t n_bin = rd_i32();
    if (n_bin < 0) die("corrupt .tbi: negative n_bin");
    for (int b = 0; b < n_bin; b++) {
      uint32_t bin = uint32_t(rd_i32());
      int32_t n_chunk = rd_i32();
      if (n_chunk < 0) die("corrupt .tbi: negative n_chunk");
      auto& chunks = ref.bins[bin];
      for (int c = 0; c < n_chunk; c++) {
        uint64_t beg = rd_u64(), end = rd_u64();
        chunks.push_back({beg, end});
      }
    }
    int32_t n_intv = rd_i32();
    if (n_intv < 0 || size_t(n_intv) * 8 > u.size())
      die("corrupt .tbi: bad linear index size");
    ref.linear.resize(size_t(n_intv));
    for (auto& v : ref.linear) v = rd_u64();
  }
  return idx;
}

int cmd_tabix_build(const char* gz_path) {
  Mapped m;
  if (!map_file(gz_path, &m)) die(std::string("cannot open ") + gz_path);
  BgzfReader r{m};
  BgzfScanner sc(r);
  TbiIndex idx;
  std::map<std::string, int> name_id;
  std::string line, chrom;
  int64_t prev_beg = -1;
  int prev_tid = -1;
  while (true) {
    uint64_t voff_beg = sc.voffset();
    if (!sc.getline(&line)) break;
    uint64_t voff_end = sc.voffset();
    if (line.empty()) continue;
    if (line[0] == '#') continue;
    int64_t beg, end;
    vcf_interval(line, &chrom, &beg, &end);
    auto [it, inserted] = name_id.try_emplace(chrom, int(idx.names.size()));
    if (inserted) {
      idx.names.push_back(chrom);
      idx.refs.emplace_back();
    }
    int tid = it->second;
    if (tid == prev_tid && beg < prev_beg)
      die("file is not position-sorted: " + chrom);
    prev_tid = tid;
    prev_beg = beg;
    idx.refs[size_t(tid)].add(beg, end, voff_beg, voff_end);
  }
  for (auto& ref : idx.refs) finalize_linear(&ref.linear);
  tbi_write(idx, std::string(gz_path) + ".tbi");
  return 0;
}

// candidate chunks for a region: binned chunks, pruned by the linear
// index floor, sorted and merged (htslib hts_itr_query equivalent)
std::vector<Chunk> query_chunks(const RefIndex& ref, int64_t beg, int64_t end) {
  // the 5-level binning scheme addresses [0, 2^29): clamp before the
  // level loops — an unclamped end (ref-only regions use INT64_MAX)
  // would attempt ~end>>14 writes into the fixed bin list (htslib
  // likewise rejects coordinates beyond the scheme's range)
  const int64_t kMaxCoord = int64_t(1) << 29;
  if (beg >= kMaxCoord) return {};
  if (end > kMaxCoord) end = kMaxCoord;
  if (end <= beg) return {};
  uint16_t bins[37449];
  int n = reg2bins(beg, end, bins);
  uint64_t min_off = 0;
  size_t w = size_t(beg >> 14);
  if (!ref.linear.empty())
    min_off = ref.linear[std::min(w, ref.linear.size() - 1)];
  std::vector<Chunk> out;
  for (int i = 0; i < n; i++) {
    auto it = ref.bins.find(bins[i]);
    if (it == ref.bins.end()) continue;
    for (auto& c : it->second)
      if (c.end > min_off) out.push_back({std::max(c.beg, min_off), c.end});
  }
  std::sort(out.begin(), out.end(),
            [](const Chunk& a, const Chunk& b) { return a.beg < b.beg; });
  // merge overlapping/adjacent
  std::vector<Chunk> merged;
  for (auto& c : out) {
    if (!merged.empty() && c.beg <= merged.back().end)
      merged.back().end = std::max(merged.back().end, c.end);
    else
      merged.push_back(c);
  }
  return merged;
}

int cmd_tabix_query(const char* gz_path, const std::string& region) {
  Region q = parse_region(region);
  TbiIndex idx = tbi_read(std::string(gz_path) + ".tbi");
  int tid = -1;
  for (size_t i = 0; i < idx.names.size(); i++)
    if (idx.names[i] == q.ref) tid = int(i);
  if (tid < 0) return 0;  // unknown reference: no output (tabix behavior)
  Mapped m;
  if (!map_file(gz_path, &m)) die(std::string("cannot open ") + gz_path);
  BgzfReader r{m};
  std::string out;
  std::string chrom, line;
  for (auto& c : query_chunks(idx.refs[size_t(tid)], q.beg, q.end)) {
    BgzfScanner sc(r);
    // position the scanner at the chunk's virtual offset
    sc.coffset = c.beg >> 16;
    sc.next_csize = r.read_block(sc.coffset, &sc.block);
    sc.upos = size_t(c.beg & 0xffff);
    bool done = false;
    while (sc.voffset() < c.end && sc.getline(&line)) {
      if (line.empty() || line[0] == '#') continue;
      int64_t beg, end;
      vcf_interval(line, &chrom, &beg, &end);
      if (chrom != q.ref) {
        done = true;
        break;
      }
      if (beg >= q.end) {
        done = true;  // sorted: nothing later overlaps
        break;
      }
      if (end > q.beg) {
        out += line;
        out.push_back('\n');
      }
    }
    if (done) break;
  }
  fwrite(out.data(), 1, out.size(), stdout);
  return 0;
}

}  // namespace

// BCF implementation in minihts_bcf.inc (same TU: shares the helpers)
#include "minihts_bcf.inc"

namespace {

int dispatch(const std::string& tool, int argc, char** argv) {
  if (tool == "bgzip") return cmd_bgzip(argc, argv);
  if (tool == "tabix") {
    // tabix -p vcf GZ | tabix -f GZ -> build; tabix GZ REGION -> query
    std::vector<std::string> pos;
    bool build = false;
    for (int i = 1; i < argc; i++) {
      std::string a = argv[i];
      if (a == "-p") {
        build = true;
        i++;  // preset name
      } else if (a == "-f") {
        build = true;
      } else {
        pos.push_back(a);
      }
    }
    if (build && pos.size() == 1) return cmd_tabix_build(pos[0].c_str());
    if (!build && pos.size() == 2) return cmd_tabix_query(pos[0].c_str(), pos[1]);
    die("usage: tabix -p vcf GZ | tabix GZ REGION");
  }
  if (tool == "bcftools") return cmd_bcftools(argc, argv);
  die("unknown tool: " + tool + " (expected bgzip/tabix/bcftools)");
}

}  // namespace

int main(int argc, char** argv) {
  const char* base = strrchr(argv[0], '/');
  std::string tool = base ? base + 1 : argv[0];
  if (tool == "bgzip" || tool == "tabix" || tool == "bcftools")
    return dispatch(tool, argc, argv);
  // any other argv[0] (minihts, minihts_asan, ...): multiplexer mode
  if (argc < 2) die("usage: minihts <bgzip|tabix|bcftools> ...");
  return dispatch(argv[1], argc - 1, argv + 1);
}
