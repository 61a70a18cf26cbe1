#!/bin/sh
# regenerate the host-tool launchers (run from repo root: sh bin/_gen.sh)
set -e
cd "$(dirname "$0")"
for t in histex tabex profex fastrm fastmv fastcp logex symmex \
         fastmerge fastcat vennex haplex homex; do
  cat > "$t" <<SCRIPT
#!/bin/sh
# $t — host-only CLI launcher (no accelerator).
#
# Some environments inject a device runtime into interpreter startup (a
# sitecustomize importing jax/PJRT), which costs seconds per invocation.
# These tools are pure host code (the reference's are standalone C
# binaries), so the hooks are disabled BEFORE python starts: launcher
# startup is ~interpreter+numpy (~0.5s) instead of ~2-4s.
# FASTK_PYTHON overrides the interpreter.
d=\$(CDPATH= cd -- "\$(dirname -- "\$0")/.." && pwd)
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu PYTHONPATH="\$d\${PYTHONPATH:+:\$PYTHONPATH}" \\
  exec "\${FASTK_PYTHON:-python3}" -m fastk_tpu.tools.$t "\$@"
SCRIPT
  chmod +x "$t"
done
# device-path tools keep the environment intact (they need the TPU runtime)
for t in fastk kmermap; do
  cat > "$t" <<SCRIPT
#!/bin/sh
# $t — device-path CLI launcher (uses the TPU runtime; environment kept).
d=\$(CDPATH= cd -- "\$(dirname -- "\$0")/.." && pwd)
PYTHONPATH="\$d\${PYTHONPATH:+:\$PYTHONPATH}" \\
  exec "\${FASTK_PYTHON:-python3}" -m fastk_tpu.tools.$t "\$@"
SCRIPT
  chmod +x "$t"
done
