"""`kmermap` — .bed intervals of a target covered by a table's k-mers
(reference: KmerMap.c:118-257; bed rows `scaffold beg end tabroot`,
write_bed KmerMap.c:32-96). Instead of shelling out to FastK -p:<table>
like the reference, the relative-profile pipeline is called directly."""

from __future__ import annotations

import os
import sys

from fastk_tpu.tools._cli import die, root_name

USAGE = ("Usage: kmermap [-vm] [-T<int(4)>] [-P<dir(/tmp)> <kmers>[.ktab]"
         " <target>[.\"dna\"] <out:bed>")


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    verbose = merge = False
    pos = []
    for a in argv:
        if a.startswith("-") and len(a) > 1 and all(c in "vm" for c in a[1:]):
            verbose |= "v" in a[1:]
            merge |= "m" in a[1:]
        elif a.startswith("-T") or a.startswith("-P"):
            pass
        elif a.startswith("-"):
            die(f"kmermap: {a} is an illegal option\n{USAGE}")
        else:
            pos.append(a)
    if len(pos) != 3:
        die(USAGE)
    ktab, target, outbed = pos

    from fastk_tpu.formats.ktab import read_ktab
    from fastk_tpu.pipeline.count import count_files

    try:
        table = read_ktab(ktab)
    except FileNotFoundError:
        die(f"kmermap: Cannot open {ktab}")
    k = table.kmer
    proot = root_name(ktab, ".ktab")
    troot = root_name(target, "")
    for ext in (".fasta", ".fa", ".fastq", ".fq", ".dna", ".gz"):
        if troot.endswith(ext):
            troot = troot[: -len(ext)]

    out = count_files([target], k, relative_table=table, profiles=True,
                      verbose=verbose)

    suffix = "kmers.merge.bed" if merge else "kmers.bed"
    path = f"{outbed}.{troot}.{suffix}"
    with open(path, "w") as f:
        for p, prof in enumerate(out.profiles):
            if merge:
                beg = end = -1
                for x, v in enumerate(prof):
                    if v > 0:
                        if x > end:
                            if beg >= 0:
                                f.write(f"{p}\t{beg}\t{end}\t{proot}\n")
                            beg = x
                        end = x + k
                if beg >= 0:
                    f.write(f"{p}\t{beg}\t{end}\t{proot}\n")
            else:
                for x, v in enumerate(prof):
                    if v > 0:
                        f.write(f"{p}\t{x}\t{x+k}\t{proot}\n")
    if verbose:
        print(f"  wrote {path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
