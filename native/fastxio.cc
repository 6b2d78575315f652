// Native FASTA/FASTQ reader: single-pass parse into contiguous buffers,
// exposed over a C ABI for ctypes (the counterpart of the reference's
// needletail-based input layer, /root/reference/bin/input_iterator.rs).
//
// Handles multi-line FASTA, FASTQ, gzip (via zlib), and '-' for stdin.
// Build: make -C native

#include <zlib.h>

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

typedef struct {
  uint8_t *seq;        // concatenated sequence bytes
  uint8_t *ids;        // concatenated id bytes
  uint8_t *qual;       // concatenated quality bytes (fastq; else NULL)
  uint64_t *seq_off;   // n + 1 offsets into seq (== qual offsets)
  uint64_t *id_off;    // n + 1 offsets into ids
  uint64_t n;          // number of records
  int has_qual;        // 1 = fastq
} fastx_batch_t;

}  // extern "C"

namespace {

// Read an entire file into memory: plain files via one fread (fast path),
// gzip via zlib streaming (detected by magic bytes).
bool slurp(const char *path, std::vector<uint8_t> &out) {
  if (path && path[0] && strcmp(path, "-") != 0) {
    FILE *f = fopen(path, "rb");
    if (!f) return false;
    unsigned char magic[2] = {0, 0};
    size_t got2 = fread(magic, 1, 2, f);
    if (got2 == 2 && magic[0] == 0x1f && magic[1] == 0x8b) {
      fclose(f);
      gzFile g = gzopen(path, "rb");
      if (!g) return false;
      gzbuffer(g, 1 << 20);
      size_t cap = 1 << 22, len = 0;
      out.resize(cap);
      for (;;) {
        if (len == cap) {
          cap *= 2;
          out.resize(cap);
        }
        int got = gzread(g, out.data() + len, (unsigned)(cap - len));
        if (got < 0) {
          gzclose(g);
          return false;
        }
        if (got == 0) break;
        len += (size_t)got;
      }
      gzclose(g);
      out.resize(len);
      return true;
    }
    fseek(f, 0, SEEK_END);
    long sz = ftell(f);
    fseek(f, 0, SEEK_SET);
    if (sz < 0) {
      fclose(f);
      return false;
    }
    out.resize((size_t)sz);
    size_t len = fread(out.data(), 1, (size_t)sz, f);
    fclose(f);
    out.resize(len);
    return true;
  }
  // stdin
  size_t cap = 1 << 22, len = 0;
  out.resize(cap);
  for (;;) {
    if (len == cap) {
      cap *= 2;
      out.resize(cap);
    }
    size_t got = fread(out.data() + len, 1, cap - len, stdin);
    if (got == 0) break;
    len += got;
  }
  out.resize(len);
  return true;
}

inline const uint8_t *find_nl(const uint8_t *p, const uint8_t *end) {
  const void *q = memchr(p, '\n', (size_t)(end - p));
  return q ? (const uint8_t *)q : end;
}

inline size_t line_len(const uint8_t *p, const uint8_t *nl) {
  size_t len = (size_t)(nl - p);
  if (len && p[len - 1] == '\r') len--;
  return len;
}

}  // namespace

extern "C" int fastx_read(const char *path, fastx_batch_t *out) {
  std::vector<uint8_t> buf;
  if (!slurp(path, buf)) return 1;
  memset(out, 0, sizeof(*out));
  if (buf.empty()) {
    out->seq_off = (uint64_t *)calloc(1, sizeof(uint64_t));
    out->id_off = (uint64_t *)calloc(1, sizeof(uint64_t));
    return 0;
  }

  const uint8_t *p = buf.data();
  const uint8_t *end = p + buf.size();
  bool fastq = (*p == '@');
  if (!fastq && *p != '>') return 2;

  // outputs are bounded by the input size: allocate once, write in place
  uint8_t *seq = (uint8_t *)malloc(buf.size());
  uint8_t *ids = (uint8_t *)malloc(buf.size());
  uint8_t *qual = fastq ? (uint8_t *)malloc(buf.size()) : nullptr;
  size_t seq_len = 0, ids_len = 0;
  std::vector<uint64_t> seq_off{0}, id_off{0};

  while (p < end) {
    if (*p == '\n') {
      p++;
      continue;
    }
    const uint8_t *nl = find_nl(p, end);
    size_t hlen = line_len(p, nl);
    if (hlen == 0) {
      p = nl + 1;
      continue;
    }
    const uint8_t *h = p + 1;
    size_t idlen = hlen > 0 ? hlen - 1 : 0;
    for (size_t i = 0; i < idlen; i++) {
      if (h[i] == ' ' || h[i] == '\t') {
        idlen = i;
        break;
      }
    }
    memcpy(ids + ids_len, h, idlen);
    ids_len += idlen;
    id_off.push_back(ids_len);
    p = nl < end ? nl + 1 : end;

    if (!fastq) {
      while (p < end && *p != '>') {
        nl = find_nl(p, end);
        size_t len = line_len(p, nl);
        memcpy(seq + seq_len, p, len);
        seq_len += len;
        p = nl < end ? nl + 1 : end;
      }
      seq_off.push_back(seq_len);
    } else {
      nl = find_nl(p, end);
      size_t slen = line_len(p, nl);
      memcpy(seq + seq_len, p, slen);
      p = nl < end ? nl + 1 : end;
      if (p >= end || *p != '+') {
        free(seq); free(ids); free(qual);
        return 3;
      }
      nl = find_nl(p, end);
      p = nl < end ? nl + 1 : end;
      nl = find_nl(p, end);
      size_t qlen = line_len(p, nl);
      if (qlen != slen) {
        free(seq); free(ids); free(qual);
        return 4;
      }
      memcpy(qual + seq_len, p, qlen);
      seq_len += slen;
      seq_off.push_back(seq_len);
      p = nl < end ? nl + 1 : end;
    }
  }

  uint64_t n = (uint64_t)seq_off.size() - 1;
  out->n = n;
  out->has_qual = fastq ? 1 : 0;
  out->seq = seq;
  out->ids = ids;
  out->qual = qual;
  out->seq_off = (uint64_t *)malloc((n + 1) * sizeof(uint64_t));
  memcpy(out->seq_off, seq_off.data(), (n + 1) * sizeof(uint64_t));
  out->id_off = (uint64_t *)malloc((n + 1) * sizeof(uint64_t));
  memcpy(out->id_off, id_off.data(), (n + 1) * sizeof(uint64_t));
  return 0;
}

extern "C" void fastx_free(fastx_batch_t *b) {
  if (!b) return;
  free(b->seq);
  free(b->ids);
  free(b->qual);
  free(b->seq_off);
  free(b->id_off);
  memset(b, 0, sizeof(*b));
}
