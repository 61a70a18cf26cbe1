"""CLI tools mirroring the FastK ecosystem (FastK, Histex, Tabex, Profex,
Logex, Symmex, Fastrm/mv/cp, Fastmerge, Fastcat, KmerMap)."""
