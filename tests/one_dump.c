/* one_dump — interop harness for binary ONE-code exports.
 *
 * Opens a 1-code file (binary or ASCII) with the REFERENCE ONElib
 * (compiled from the oracle tree at test time; no reference code enters
 * this repo) and dumps every data line as ASCII tokens, one line each:
 *     <type> <field>... ; lists printed as <len> <elt>...
 * Used by tests/test_onecode_binary.py to prove our OneBinaryWriter
 * output is readable by any ONElib-based consumer.
 *
 * Build: gcc -O0 -o one_dump one_dump.c $ORACLE/ONElib.c -I$ORACLE -lm -lpthread
 */
#include <stdio.h>
#include <string.h>
#include "ONElib.h"

int main(int argc, char **argv)
{
  if (argc != 2)
    { fprintf(stderr, "usage: one_dump <file.1code>\n"); return 2; }
  OneFile *vf = oneFileOpenRead(argv[1], 0, 0, 1);
  if (vf == NULL)
    { fprintf(stderr, "one_dump: cannot open %s\n", argv[1]); return 1; }
  printf("TYPE %s\n", vf->fileType);
  char t;
  while ((t = oneReadLine(vf)))
    { OneInfo *li = vf->info[(int) t];
      printf("%c", t);
      int i;
      for (i = 0; i < li->nField; i++)
        switch (li->fieldType[i])
          { case oneINT:
              printf(" %lld", (long long) oneInt(vf, i)); break;
            case oneREAL:
              printf(" %g", oneReal(vf, i)); break;
            case oneCHAR:
              printf(" %c", oneChar(vf, i)); break;
            case oneSTRING:
            case oneDNA:
              { char *s = oneString(vf);
                printf(" %lld %.*s", (long long) oneLen(vf),
                       (int) oneLen(vf), s ? s : "");
                break; }
            case oneINT_LIST:
              { I64 *l = oneIntList(vf);
                long long j, n = oneLen(vf);
                printf(" %lld", n);
                for (j = 0; j < n; j++)
                  printf(" %lld", (long long) l[j]);
                break; }
            default:
              printf(" ?");
          }
      printf("\n");
    }
  oneFileClose(vf);
  return 0;
}
