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
