// Native FASTA/FASTQ batch decoder feeding device buffers.
//
// TPU-native equivalent of the reference's input path: readseq1by1.c's
// per-record parsers plus the POSIX-aio double-buffered read-ahead
// (prlHashReads.c:709-806).  The hot loop — classifying bytes and
// 2-bit-encoding bases — runs here at memory speed; Python only moves
// filled (batch, max_len) buffers to the device.
//
// API (ctypes):
//   void*  fastx_open(const char* path);         // gz or plain
//   long   fastx_next_batch(void* h, unsigned char* codes,
//                           int* lengths, long batch, long max_len);
//          -> number of reads written (0 = EOF, -1 = error)
//   void   fastx_close(void* h);
//
// codes: batch*max_len bytes, A=0 C=1 T=2 G=3, N/other=4, pad=4
// (matches src/inc/def.h:39's encoding).
//
// Build: g++ -O3 -shared -fPIC fastx_decoder.cpp -o libfastx.so -lz

#include <zlib.h>

#include <cstdint>
#include <cstring>
#include <cstdio>

namespace {

constexpr int kBufSize = 1 << 20;

struct Handle {
  gzFile gz = nullptr;
  unsigned char buf[kBufSize];
  int buf_len = 0;
  int buf_pos = 0;
  int fmt = 0;  // 0 unknown, 1 fasta, 2 fastq
  bool eof = false;
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
  return h;
}

long fastx_next_batch(void* hv, unsigned char* codes, int* lengths,
                      long batch, long max_len) {
  Handle* h = static_cast<Handle*>(hv);
  long count = 0;
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
  delete h;
}

}  // extern "C"
