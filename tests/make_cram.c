/* Test fixture generator: SAM -> CRAM via the ORACLE's vendored htslib
 * (compiled at test time from /tmp/fastk_oracle/HTSLIB; no reference code
 * enters the repo). Usage:
 *
 *   make_cram <in.sam> <out.cram> [<ref.fa>|-] [embed_ref|no_ref]...
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "htslib/sam.h"
#include "htslib/hts.h"
#include "htslib/faidx.h"

int main(int argc, char **argv)
{ samFile *in, *out;
  sam_hdr_t *h;
  bam1_t *b;
  int i;

  if (argc < 3)
    { fprintf(stderr, "usage: %s in.sam out.cram [ref.fa|-] [opts]\n", argv[0]);
      return 1;
    }
  in = sam_open(argv[1], "r");
  if (in == NULL) { perror(argv[1]); return 1; }
  h = sam_hdr_read(in);
  out = sam_open(argv[2], "wc");
  if (out == NULL) { perror(argv[2]); return 1; }
  if (argc > 3 && strcmp(argv[3], "-") != 0)
    { if (fai_build(argv[3]) != 0)
        { fprintf(stderr, "fai_build failed\n"); return 1; }
      if (hts_set_fai_filename(out, argv[3]) != 0)
        { fprintf(stderr, "set_fai failed\n"); return 1; }
    }
  for (i = 4; i < argc; i++)
    { if (strcmp(argv[i], "embed_ref") == 0)
        hts_set_opt(out, CRAM_OPT_EMBED_REF, 1);
      else if (strcmp(argv[i], "no_ref") == 0)
        hts_set_opt(out, CRAM_OPT_NO_REF, 1);
      else if (strcmp(argv[i], "small_slices") == 0)
        hts_set_opt(out, CRAM_OPT_SEQS_PER_SLICE, 7);
      else if (strcmp(argv[i], "v20") == 0)
        { if (hts_set_opt(out, CRAM_OPT_VERSION, "2.0") != 0)
            { fprintf(stderr, "set version 2.0 failed\n"); return 1; }
        }
      else if (strcmp(argv[i], "v21") == 0)
        { if (hts_set_opt(out, CRAM_OPT_VERSION, "2.1") != 0)
            { fprintf(stderr, "set version 2.1 failed\n"); return 1; }
        }
    }
  if (sam_hdr_write(out, h) < 0) { fprintf(stderr, "hdr write\n"); return 1; }
  b = bam_init1();
  while (sam_read1(in, h, b) >= 0)
    if (sam_write1(out, h, b) < 0) { fprintf(stderr, "write\n"); return 1; }
  bam_destroy1(b);
  sam_hdr_destroy(h);
  sam_close(out);
  sam_close(in);
  return 0;
}
