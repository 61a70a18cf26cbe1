/* fastk_native — host-side hot loops for the TPU k-mer framework.
 *
 * Native equivalents of the reference's C ingest path (io.c:574-759 FASTA/
 * FASTQ scanners; homopolymer compression io.c:284-294; 2-bit packing
 * split.c:864-989), exposed through ctypes. The TPU framework keeps its
 * Python implementations as fallbacks; this library exists because sequence
 * parsing is the one per-byte loop that must run at memory speed on the
 * host before data ever reaches the chip.
 *
 * Build: cc -O2 -shared -fPIC -o fastk_native.so fastk_native.c
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

/* base codes: acgt/ACGT -> 0..3, everything else -> 4 (invalid) */
static uint8_t CODE[256];
static int code_init = 0;

static void init_code(void)
{ int i;
  if (code_init) return;
  for (i = 0; i < 256; i++) CODE[i] = 4;
  CODE['a'] = CODE['A'] = 0;
  CODE['c'] = CODE['C'] = 1;
  CODE['g'] = CODE['G'] = 2;
  CODE['t'] = CODE['T'] = 3;
  code_init = 1;
}

/* Scan a FASTA or FASTQ buffer into a code stream.
 *
 * buf[n]:    whole file contents (uncompressed)
 * fastq:     0 = FASTA, 1 = FASTQ
 * hc:        homopolymer-compress (case-SENSITIVE on raw bytes, like the
 *            reference's ADD macro)
 * bc:        drop this many leading bases of each read (after hc)
 * codes:     out, capacity ccap; reads separated by one sentinel (4);
 *            stream does NOT begin with a sentinel; every read
 *            (including the last) is FOLLOWED by one sentinel
 * boff:      out, capacity rcap+1; boff[r] = code offset of read r;
 *            boff[nreads] = total codes + 1 per read (sentinel slots)
 * rlen:      out, capacity rcap; emitted length of read r
 *
 * Returns number of reads, or -1 if codes overflow ccap, -2 if reads
 * overflow rcap, -3 on malformed input.
 */
long fk_scan_seq(const uint8_t *buf, long n, int fastq, int hc, int bc,
                 uint8_t *codes, long ccap,
                 int64_t *boff, int64_t *rlen, long rcap)
{ long i = 0, o = 0, r = 0;
  init_code();

  while (i < n)
    { /* header line */
      if (fastq)
        { if (buf[i] != '@') return -3;
        }
      else
        { if (buf[i] != '>') return -3;
        }
      while (i < n && buf[i] != '\n') i++;
      i++;                                   /* skip newline */

      if (r >= rcap) return -2;
      boff[r] = o;

      { long start = o;
        int  prev  = -1;                     /* raw byte, for hc */
        long kept  = 0;                      /* bases kept so far (for bc) */

        if (fastq)
          { /* exactly one sequence line */
            while (i < n && buf[i] != '\n')
              { int ch = buf[i++];
                if (ch == '\r') continue;
                if (hc && ch == prev) continue;
                prev = ch;
                if (kept++ < bc) continue;
                if (o >= ccap) return -1;
                codes[o++] = CODE[ch];
              }
            i++;                             /* newline */
            /* '+' line */
            while (i < n && buf[i] != '\n') i++;
            i++;
            /* quality line */
            while (i < n && buf[i] != '\n') i++;
            i++;
          }
        else
          { /* sequence lines until next '>' or EOF */
            while (i < n && buf[i] != '>')
              { int ch = buf[i++];
                if (ch == '\n' || ch == '\r') continue;
                if (hc && ch == prev) continue;
                prev = ch;
                if (kept++ < bc) continue;
                if (o >= ccap) return -1;
                codes[o++] = CODE[ch];
              }
          }

        rlen[r] = o - start;
        r++;
        if (o >= ccap) return -1;
        codes[o++] = 4;                      /* read separator */
      }
    }
  boff[r] = o;
  return r;
}

/* 2-bit pack a code stream: 4 codes/byte, position 0 in the low bits
 * (matching ops/pack.py pack_stream). Sentinels (>=4) pack as 0; their
 * positions are appended to exc (capacity ecap). n must be a multiple of 4
 * (pad with 0..3 codes of value 4 first). Returns the number of exceptions
 * or -1 on exc overflow. */
long fk_pack2(const uint8_t *codes, long n, uint8_t *packed,
              uint32_t *exc, long ecap)
{ long i, b, ne = 0;
  for (i = b = 0; i < n; i += 4, b++)
    { unsigned v = 0;
      int j;
      for (j = 0; j < 4; j++)
        { unsigned c = codes[i + j];
          if (c >= 4)
            { if (ne >= ecap) return -1;
              exc[ne++] = (uint32_t)(i + j);
              c = 0;
            }
          v |= c << (2 * j);
        }
      packed[b] = (uint8_t)v;
    }
  return ne;
}

/* Bulk-encode per-read profiles from a flat per-position counts array
 * (the .prof delta codec; writer analog of the reference's fragment
 * encoder count.c:868-947 / merge.c:394-733, over a whole batch in one
 * call instead of a Python loop per read).
 *
 * cnts:   per-position clipped counts (<= 0x7fff)
 * boff:   read r's counts start at cnts + boff[r]
 * plen:   profile length of read r (rlen - k + 1; <= 0 -> empty blob)
 * out:    concatenated encoded blobs (capacity ocap)
 * offs:   out, offs[r] = byte offset one past read r's blob
 *
 * Returns total bytes written, or -1 if out overflows. Byte-identical to
 * formats/prof.py:encode_profile (zero runs chunk greedily at 63 with the
 * remainder flushed at run end).
 */
long fk_prof_encode_bulk(const uint16_t *cnts, const int64_t *boff,
                         const int64_t *plen, long nreads,
                         uint8_t *out, long ocap, int64_t *offs)
{ long r, o = 0;
  for (r = 0; r < nreads; r++)
    { long n = plen[r];
      const uint16_t *c = cnts + boff[r];
      long i;
      unsigned prev;
      long zrun = 0;
      if (n > 0)
        { unsigned first = c[0] & 0x7fff;
          if (first < 128)
            { if (o >= ocap) return -1;
              out[o++] = (uint8_t)first;
            }
          else
            { if (o + 2 > ocap) return -1;
              out[o++] = (uint8_t)(0x80 | (first >> 8));
              out[o++] = (uint8_t)(first & 0xff);
            }
          prev = first;
          for (i = 1; i < n; i++)
            { unsigned cur = c[i] & 0x7fff;
              int d = (int)cur - (int)prev;
              if (d == 0)
                { if (++zrun == 63)
                    { if (o >= ocap) return -1;
                      out[o++] = 63;
                      zrun = 0;
                    }
                  continue;
                }
              if (zrun > 0)
                { if (o >= ocap) return -1;
                  out[o++] = (uint8_t)zrun;
                  zrun = 0;
                }
              if (d > -32 && d < 32)
                { if (o >= ocap) return -1;
                  out[o++] = (uint8_t)(0x40 | (d & 0x3f));
                }
              else
                { unsigned v = (unsigned)d & 0x7fff;
                  if (o + 2 > ocap) return -1;
                  out[o++] = (uint8_t)(0x80 | (v >> 8));
                  out[o++] = (uint8_t)(v & 0xff);
                }
              prev = cur;
            }
          if (zrun > 0)
            { if (o >= ocap) return -1;
              out[o++] = (uint8_t)zrun;
            }
        }
      offs[r] = o;
    }
  return o;
}

/* ------------------------------------------------------------------------
 * K-way sorted-stream union (the merge engine behind the streamed table
 * tools: logex/vennex window_union, fastmerge window_sum — the role of the
 * reference's equality-aware heap merges, Fastmerge.c:80-450 and
 * Logex.c:972-1215). Each stream is a contiguous (lens[i], kb) array of
 * kb-byte keys, sorted and unique within the stream. Writes the sorted
 * unique union to out_keys and, per stream, each input key's index in the
 * union to slots[i]. Returns the union size.
 *
 * ns is small (tool arguments), so a linear min-scan beats a heap: per
 * union entry the cost is <= 2*ns kb-byte compares.
 */
long fk_union_slots(int kb, int ns, const uint8_t **keys, const int64_t *lens,
                    uint8_t *out_keys, int64_t **slots)
{ int64_t cur[64];
  int     i, mi;
  long    U = 0;
  if (ns > 64) return -1;
  for (i = 0; i < ns; i++) cur[i] = 0;
  for (;;)
    { const uint8_t *m = 0;
      mi = -1;
      for (i = 0; i < ns; i++)
        if (cur[i] < lens[i])
          { const uint8_t *k = keys[i] + cur[i] * kb;
            if (mi < 0 || memcmp(k, m, kb) < 0)
              { m = k; mi = i; }
          }
      if (mi < 0) break;
      memcpy(out_keys + U * kb, m, kb);
      for (i = 0; i < ns; i++)
        if (cur[i] < lens[i] &&
            memcmp(keys[i] + cur[i] * kb, m, kb) == 0)
          { slots[i][cur[i]] = U;
            cur[i] += 1;
          }
      U += 1;
    }
  return U;
}

/* ------------------------------------------------------------------------
 * rANS-4x8 static decoder (the CRAM block codec, orders 0 and 1) — the
 * native fast path behind io/cram_native.py:rans_uncompress, which keeps a
 * pure-Python fallback with identical semantics (both mirror the CRAM 3.0
 * spec; the reference vendors htslib's rans_static.c for this role). SEQ
 * data series are rANS-compressed in practice, so this per-byte loop is
 * the CRAM ingest bottleneck.
 */

#define FK_TF_SHIFT 12
#define FK_TOTFREQ  (1u << FK_TF_SHIFT)
#define FK_RANS_LOW (1u << 23)

typedef struct
{ uint32_t F[256];
  uint32_t C[256];
  uint8_t  L[FK_TOTFREQ];
} FkRansTab;

/* Parse one order-0 frequency table (symbol-RLE; cumulative starts in
 * visit order; historical totals of 4095 repeat the last slot; in order-1
 * context rows a frequency of 0 means the whole table). Returns the new
 * read position or -1 on malformed input. */
static long fk_read_freqs0(const uint8_t *buf, long n, long pos,
                           int zero_is_total, FkRansTab *t)
{ unsigned x = 0, j, rle = 0;
  memset(t->F, 0, sizeof(t->F));
  memset(t->C, 0, sizeof(t->C));
  if (pos >= n) return -1;
  j = buf[pos++];
  for (;;)
    { unsigned f;
      if (pos >= n) return -1;
      f = buf[pos++];
      if (f >= 128)
        { if (pos >= n) return -1;
          f = ((f & 0x7f) << 8) | buf[pos++];
        }
      if (f == 0 && zero_is_total)
        f = FK_TOTFREQ;
      t->F[j] = f;
      t->C[j] = x;
      if (x + f > FK_TOTFREQ) return -1;
      memset(t->L + x, (int)j, f);
      x += f;
      if (rle > 0)
        { rle -= 1;
          j += 1;
          if (j > 255) return -1;   /* symbol RLE past 255: malformed */
        }
      else
        { unsigned nj;
          if (pos >= n) return -1;
          nj = buf[pos++];
          if (nj == j + 1)
            { if (pos >= n) return -1;
              rle = buf[pos++];
            }
          j = nj;
        }
      if (j == 0) break;
    }
  if (x < FK_TOTFREQ - 1 || x > FK_TOTFREQ) return -1;
  if (x < FK_TOTFREQ)
    t->L[x] = t->L[x - 1];
  return pos;
}

/* Decode a whole rANS payload (everything after the 9-byte
 * order/csize/usize header) into out[out_sz]. order is 0 or 1.
 * Returns the number of payload bytes consumed, or -1 on error. */
long fk_rans_decode(const uint8_t *buf, long n, int order,
                    uint8_t *out, long out_sz)
{ uint32_t states[4];
  long pos = 0, i;
  int j;

  if (order == 0)
    { FkRansTab *t = (FkRansTab *)malloc(sizeof(FkRansTab));
      if (t == NULL) return -1;
      pos = fk_read_freqs0(buf, n, 0, 0, t);
      if (pos < 0 || pos + 16 > n)
        { free(t); return -1; }
      for (j = 0; j < 4; j++)
        { states[j] = (uint32_t)buf[pos] | ((uint32_t)buf[pos+1] << 8)
                    | ((uint32_t)buf[pos+2] << 16)
                    | ((uint32_t)buf[pos+3] << 24);
          pos += 4;
        }
      for (i = 0; i < out_sz; i++)
        { uint32_t x = states[i & 3];
          unsigned m = x & (FK_TOTFREQ - 1);
          unsigned s = t->L[m];
          out[i] = (uint8_t)s;
          x = t->F[s] * (x >> FK_TF_SHIFT) + m - t->C[s];
          while (x < FK_RANS_LOW && pos < n)
            x = (x << 8) | buf[pos++];
          states[i & 3] = x;
        }
      free(t);
      return pos;
    }

  if (order == 1)
    { FkRansTab *tabs = (FkRansTab *)malloc(256 * sizeof(FkRansTab));
      uint8_t present[256];
      unsigned ci, rle_i = 0, ctx[4] = {0, 0, 0, 0};
      long isz4 = out_sz >> 2;
      if (tabs == NULL) return -1;
      memset(present, 0, sizeof(present));
      if (n < 1)
        { free(tabs); return -1; }
      ci = buf[pos++];
      for (;;)
        { pos = fk_read_freqs0(buf, n, pos, 1, &tabs[ci]);
          if (pos < 0)
            { free(tabs); return -1; }
          present[ci] = 1;
          if (rle_i > 0)
            { rle_i -= 1;
              ci += 1;
              if (ci > 255)          /* context RLE past 255: malformed */
                { free(tabs); return -1; }
            }
          else
            { unsigned ni;
              if (pos >= n)
                { free(tabs); return -1; }
              ni = buf[pos++];
              if (ni == ci + 1)
                { if (pos >= n)
                    { free(tabs); return -1; }
                  rle_i = buf[pos++];
                }
              ci = ni;
            }
          if (ci == 0) break;
        }
      if (pos + 16 > n)
        { free(tabs); return -1; }
      for (j = 0; j < 4; j++)
        { states[j] = (uint32_t)buf[pos] | ((uint32_t)buf[pos+1] << 8)
                    | ((uint32_t)buf[pos+2] << 16)
                    | ((uint32_t)buf[pos+3] << 24);
          pos += 4;
        }
      for (i = 0; i < isz4; i++)
        for (j = 0; j < 4; j++)
          { uint32_t x = states[j];
            unsigned m = x & (FK_TOTFREQ - 1);
            FkRansTab *t;
            unsigned s;
            if (!present[ctx[j]])
              { free(tabs); return -1; }
            t = &tabs[ctx[j]];
            s = t->L[m];
            out[(long)j * isz4 + i] = (uint8_t)s;
            x = t->F[s] * (x >> FK_TF_SHIFT) + m - t->C[s];
            while (x < FK_RANS_LOW && pos < n)
              x = (x << 8) | buf[pos++];
            states[j] = x;
            ctx[j] = s;
          }
      for (i = 4 * isz4; i < out_sz; i++)   /* remainder rides state 3 */
        { uint32_t x = states[3];
          unsigned m = x & (FK_TOTFREQ - 1);
          FkRansTab *t;
          unsigned s;
          if (!present[ctx[3]])
            { free(tabs); return -1; }
          t = &tabs[ctx[3]];
          s = t->L[m];
          out[i] = (uint8_t)s;
          x = t->F[s] * (x >> FK_TF_SHIFT) + m - t->C[s];
          while (x < FK_RANS_LOW && pos < n)
            x = (x << 8) | buf[pos++];
          states[3] = x;
          ctx[3] = s;
        }
      free(tabs);
      return pos;
    }

  return -1;
}

/* Decode one compressed profile (the .prof delta codec,
 * reference decoder libfastk.c:1710-1805). Returns the count of values
 * written to out (capacity ocap), or -1 on overflow / malformed input. */
long fk_prof_decode(const uint8_t *buf, long n, uint16_t *out, long ocap)
{ long i = 0, m = 0;
  unsigned cur;
  if (n == 0) return 0;
  if (buf[0] & 0x80)
    { if (n < 2) return -1;
      cur = ((unsigned)(buf[0] & 0x7f) << 8) | buf[1];
      i = 2;
    }
  else
    { cur = buf[0];
      i = 1;
    }
  if (m >= ocap) return -1;
  out[m++] = (uint16_t)cur;
  while (i < n)
    { unsigned b = buf[i++];
      if (b & 0x80)
        { unsigned v;
          if (i >= n) return -1;
          v = ((b & 0x7f) << 8) | buf[i++];
          cur = (cur + v) & 0x7fff;
          if (m >= ocap) return -1;
          out[m++] = (uint16_t)cur;
        }
      else if (b & 0x40)
        { int d = b & 0x3f;
          if (d >= 0x20) d -= 0x40;
          cur = (unsigned)(((int)cur + d) & 0x7fff);
          if (m >= ocap) return -1;
          out[m++] = (uint16_t)cur;
        }
      else
        { unsigned j;
          if (b == 0) return -1;
          if (m + b > (unsigned long)ocap) return -1;
          for (j = 0; j < b; j++)
            out[m++] = (uint16_t)cur;
        }
    }
  return m;
}
