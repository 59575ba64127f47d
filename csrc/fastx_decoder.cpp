// Native FASTA/FASTQ/BAM batch decoder feeding device buffers.
//
// TPU-native equivalent of the reference's input path: readseq1by1.c's
// per-record parsers (incl. read1seqbam :416 via bundled libbam) plus
// the POSIX-aio double-buffered read-ahead (prlHashReads.c:709-806;
// the read-ahead itself is the Python-side prefetch thread in
// io/fastx.py).  The hot loop — classifying bytes and 2-bit-encoding
// bases — runs here at memory speed; Python only moves filled
// (batch, max_len) buffers to the device.
//
// API (ctypes):
//   void*  fastx_open(const char* path);         // gz, plain, or BAM
//   long   fastx_next_batch(void* h, unsigned char* codes,
//                           int* lengths, long batch, long max_len);
//          -> number of reads written (0 = EOF, -1 = error)
//   void   fastx_close(void* h);
//
// codes: batch*max_len bytes, A=0 C=1 T=2 G=3, N/other=4, pad=4
// (matches src/inc/def.h:39's encoding).
//
// BAM (BGZF = concatenated gzip members; zlib's gzread concatenates
// transparently): secondary/QC-fail/duplicate/supplementary records
// (0x100|0x200|0x400|0x800) are dropped and reverse-strand (0x10)
// sequences are complemented back to as-sequenced orientation —
// matching io/bam.py (see its docstring for the deliberate deltas vs
// read1seqbam, which filters nothing by default and keeps alignment
// orientation).
//
// Build: g++ -O3 -shared -fPIC fastx_decoder.cpp -o libfastx.so -lz

#include <zlib.h>

#include <cstdint>
#include <cstring>
#include <cstdio>

namespace {

constexpr int kBufSize = 1 << 20;
constexpr unsigned kBamSkip = 0x100 | 0x200 | 0x400 | 0x800;

struct Handle {
  gzFile gz = nullptr;
  unsigned char buf[kBufSize];
  int buf_len = 0;
  int buf_pos = 0;
  int fmt = 0;  // 0 unknown, 1 fasta, 2 fastq, 3 bam
  bool eof = false;
  unsigned char* rec = nullptr;  // BAM record scratch
  long rec_cap = 0;
};

unsigned char g_code[256];

struct CodeInit {
  CodeInit() {
    memset(g_code, 4, sizeof(g_code));
    g_code['A'] = g_code['a'] = 0;
    g_code['C'] = g_code['c'] = 1;
    g_code['T'] = g_code['t'] = 2;
    g_code['G'] = g_code['g'] = 3;
  }
} g_code_init;

int fill(Handle* h) {
  if (h->eof) return 0;
  h->buf_len = gzread(h->gz, h->buf, kBufSize);
  h->buf_pos = 0;
  if (h->buf_len <= 0) {
    h->eof = true;
    h->buf_len = 0;
  }
  return h->buf_len;
}

// next byte or -1 at EOF
inline int next_byte(Handle* h) {
  if (h->buf_pos >= h->buf_len && !fill(h)) return -1;
  return h->buf[h->buf_pos++];
}

// skip to end of line (consume the newline)
void skip_line(Handle* h) {
  for (;;) {
    if (h->buf_pos >= h->buf_len && !fill(h)) return;
    unsigned char* nl = static_cast<unsigned char*>(
        memchr(h->buf + h->buf_pos, '\n', h->buf_len - h->buf_pos));
    if (nl) {
      h->buf_pos = static_cast<int>(nl - h->buf) + 1;
      return;
    }
    h->buf_pos = h->buf_len;
  }
}

// read sequence line(s): for FASTQ exactly one line; for FASTA until
// the next '>' or EOF.  Encodes into out (cap max_len; excess bases
// are consumed but dropped, mirroring rd_len_cutoff truncation).
long read_seq(Handle* h, bool fastq, unsigned char* out, long max_len) {
  long n = 0;
  for (;;) {
    if (h->buf_pos >= h->buf_len && !fill(h)) return n;
    int c = h->buf[h->buf_pos];
    if (c == '\n') {
      h->buf_pos++;
      if (fastq) return n;
      continue;
    }
    if (!fastq && c == '>') return n;
    // encode the run up to newline/buffer end
    int end = h->buf_pos;
    while (end < h->buf_len && h->buf[end] != '\n') end++;
    for (int i = h->buf_pos; i < end; i++) {
      if (n < max_len) out[n++] = g_code[h->buf[i]];
      else n++;  // count, drop
    }
    h->buf_pos = end;
  }
}

// --- BAM support -----------------------------------------------------

unsigned char g_nib[16];   // 4-bit BAM code -> 2-bit base code
unsigned char g_comp[5];   // base complement (N stays N)

struct BamInit {
  BamInit() {
    memset(g_nib, 4, sizeof(g_nib));
    g_nib[1] = 0;   // A
    g_nib[2] = 1;   // C
    g_nib[4] = 3;   // G
    g_nib[8] = 2;   // T
    g_comp[0] = 2; g_comp[1] = 3; g_comp[2] = 0; g_comp[3] = 1;
    g_comp[4] = 4;
  }
} g_bam_init;

// read exactly n bytes through the handle buffer; false on short read
bool read_exact(Handle* h, unsigned char* out, long n) {
  long got = 0;
  while (got < n) {
    if (h->buf_pos >= h->buf_len && !fill(h)) return false;
    long take = h->buf_len - h->buf_pos;
    if (take > n - got) take = n - got;
    memcpy(out + got, h->buf + h->buf_pos, take);
    h->buf_pos += static_cast<int>(take);
    got += take;
  }
  return true;
}

bool skip_exact(Handle* h, long n) {
  long got = 0;
  while (got < n) {
    if (h->buf_pos >= h->buf_len && !fill(h)) return false;
    long take = h->buf_len - h->buf_pos;
    if (take > n - got) take = n - got;
    h->buf_pos += static_cast<int>(take);
    got += take;
  }
  return true;
}

bool read_i32(Handle* h, int32_t* out) {
  unsigned char b[4];
  if (!read_exact(h, b, 4)) return false;
  *out = static_cast<int32_t>(
      static_cast<uint32_t>(b[0]) | (static_cast<uint32_t>(b[1]) << 8) |
      (static_cast<uint32_t>(b[2]) << 16) |
      (static_cast<uint32_t>(b[3]) << 24));
  return true;
}

// consume the BAM header after the magic (text + reference list)
bool bam_skip_header(Handle* h) {
  int32_t l_text, n_ref;
  if (!read_i32(h, &l_text) || !skip_exact(h, l_text)) return false;
  if (!read_i32(h, &n_ref)) return false;
  for (int32_t i = 0; i < n_ref; i++) {
    int32_t l_name;
    if (!read_i32(h, &l_name) || !skip_exact(h, l_name + 4)) return false;
  }
  return true;
}

// next kept BAM sequence into out (cap max_len); -1 EOF, else length
long bam_next_seq(Handle* h, unsigned char* out, long max_len) {
  for (;;) {
    int32_t block_size;
    if (!read_i32(h, &block_size) || block_size < 32) return -1;
    if (block_size > h->rec_cap) {
      delete[] h->rec;
      h->rec_cap = block_size * 2;
      h->rec = new unsigned char[h->rec_cap];
    }
    if (!read_exact(h, h->rec, block_size)) return -1;
    const unsigned char* r = h->rec;
    unsigned l_read_name = r[8];
    unsigned n_cigar = r[12] | (r[13] << 8);
    unsigned flag = r[14] | (r[15] << 8);
    int32_t l_seq;
    memcpy(&l_seq, r + 16, 4);
    if (flag & kBamSkip) continue;
    long off = 32 + l_read_name + 4L * n_cigar;
    long n = l_seq < max_len ? l_seq : max_len;
    const unsigned char* seq4 = r + off;
    if (flag & 0x10) {
      // reverse-complement back to as-sequenced orientation
      for (long i = 0; i < n; i++) {
        long j = l_seq - 1 - i;
        unsigned nib = (seq4[j >> 1] >> ((j & 1) ? 0 : 4)) & 0xF;
        out[i] = g_comp[g_nib[nib]];
      }
    } else {
      for (long i = 0; i < n; i++) {
        unsigned nib = (seq4[i >> 1] >> ((i & 1) ? 0 : 4)) & 0xF;
        out[i] = g_nib[nib];
      }
    }
    return n;
  }
}

}  // namespace

extern "C" {

void* fastx_open(const char* path) {
  Handle* h = new Handle();
  h->gz = gzopen(path, "rb");
  if (!h->gz) {
    delete h;
    return nullptr;
  }
  gzbuffer(h->gz, kBufSize);
  // BAM sniff: BGZF decompresses to 'BAM\1'
  if (fill(h) >= 4 && memcmp(h->buf, "BAM\1", 4) == 0) {
    h->buf_pos = 4;
    h->fmt = 3;
    if (!bam_skip_header(h)) {
      gzclose(h->gz);
      delete h;
      return nullptr;
    }
  }
  return h;
}

long fastx_next_batch(void* hv, unsigned char* codes, int* lengths,
                      long batch, long max_len) {
  Handle* h = static_cast<Handle*>(hv);
  long count = 0;
  if (h->fmt == 3) {  // BAM
    while (count < batch) {
      unsigned char* row = codes + count * max_len;
      memset(row, 4, max_len);
      long n = bam_next_seq(h, row, max_len);
      if (n < 0) break;
      lengths[count] = static_cast<int>(n);
      count++;
    }
    return count;
  }
  while (count < batch) {
    int c = next_byte(h);
    while (c == '\n' || c == '\r' || c == ' ') c = next_byte(h);
    if (c < 0) break;
    if (h->fmt == 0) {
      if (c == '>') h->fmt = 1;
      else if (c == '@') h->fmt = 2;
      else return -1;
    }
    if ((h->fmt == 1 && c != '>') || (h->fmt == 2 && c != '@')) return -1;
    skip_line(h);  // header
    unsigned char* row = codes + count * max_len;
    memset(row, 4, max_len);
    long n = read_seq(h, h->fmt == 2, row, max_len);
    long kept = n < max_len ? n : max_len;
    if (n > max_len) memset(row + max_len, 4, 0);
    lengths[count] = static_cast<int>(kept);
    if (h->fmt == 2) {
      skip_line(h);  // '+'
      // qual line: same byte count as the seq (which may exceed max_len)
      long q = 0;
      for (;;) {
        if (h->buf_pos >= h->buf_len && !fill(h)) break;
        unsigned char* nl = static_cast<unsigned char*>(
            memchr(h->buf + h->buf_pos, '\n', h->buf_len - h->buf_pos));
        int avail = (nl ? static_cast<int>(nl - h->buf)
                        : h->buf_len) - h->buf_pos;
        q += avail;
        h->buf_pos += avail;
        if (nl && q >= n) {
          h->buf_pos++;  // consume newline
          break;
        }
        if (nl) h->buf_pos++;  // multi-line qual (rare)
        if (q >= n && !nl) break;
      }
    }
    count++;
  }
  return count;
}

void fastx_close(void* hv) {
  Handle* h = static_cast<Handle*>(hv);
  if (h->gz) gzclose(h->gz);
  delete[] h->rec;
  delete h;
}

// 2-bit pack of a (r, l) base-code matrix: 4 bases/byte LSB-first into
// (r, ceil(l/4)); flat positions (row*l + col) of N bases (code >= 4)
// go into n_flat (capacity ncap).  Returns the N count, or -1 if it
// exceeds ncap (caller falls back to raw u8 upload).
//
// Host side of ops/readpack.py's packed H2D path.  The numpy
// formulation runs at ~90 MB/s on this 2-vCPU host and competes with
// the tunnel relay for cores; this loop packs at memory speed.
long pack2bit(const unsigned char* codes, long r, long l,
              unsigned char* out, int* n_flat, long ncap) {
  const long lp = (l + 3) / 4;
  long n_count = 0;
  for (long i = 0; i < r; i++) {
    const unsigned char* row = codes + i * l;
    unsigned char* orow = out + i * lp;
    long j = 0;
    for (; j + 4 <= l; j += 4) {
      orow[j >> 2] = static_cast<unsigned char>(
          (row[j] & 3) | ((row[j + 1] & 3) << 2) |
          ((row[j + 2] & 3) << 4) | ((row[j + 3] & 3) << 6));
    }
    if (j < l) {
      unsigned v = 0;
      for (long t = j; t < l; t++) v |= (row[t] & 3u) << ((t - j) * 2);
      orow[j >> 2] = static_cast<unsigned char>(v);
    }
    // N scan, 8 bytes at a time: codes are < 8, so bit 2 set <=> >= 4
    long t = 0;
    for (; t + 8 <= l; t += 8) {
      uint64_t chunk;
      memcpy(&chunk, row + t, 8);
      if (chunk & 0x0404040404040404ULL) {
        for (long u = t; u < t + 8; u++) {
          if (row[u] >= 4) {
            if (n_count >= ncap) return -1;
            n_flat[n_count++] = static_cast<int>(i * l + u);
          }
        }
      }
    }
    for (; t < l; t++) {
      if (row[t] >= 4) {
        if (n_count >= ncap) return -1;
        n_flat[n_count++] = static_cast<int>(i * l + t);
      }
    }
  }
  return n_count;
}

}  // extern "C"
