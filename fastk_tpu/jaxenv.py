"""Make ``JAX_PLATFORMS`` reliable under out-of-tree PJRT plugins.

Some PJRT plugins (e.g. the tunneled TPU plugin on this rig) call
``jax.config.update("jax_platforms", ...)`` while registering at import
time, which silently overrides the user's ``JAX_PLATFORMS`` environment
variable — the env var only seeds the config default. A user (or a
subprocess harness) that sets ``JAX_PLATFORMS=cpu`` then hangs in the
plugin's backend init anyway.

Importing this module re-asserts the environment variable over whatever
the plugin set. Every fastk_tpu module that imports jax imports this
first, so ``JAX_PLATFORMS=cpu python -m fastk_tpu.tools.fastk ...`` does
what it says on any machine.

The env var is treated as the user's declared intent, so it also wins
over a jax.config.update(...) made before fastk_tpu was imported. An
embedding application that wants programmatic control should unset
JAX_PLATFORMS, or set FASTK_TPU_NO_PLATFORM_FIX=1 to disable this shim.
"""

from __future__ import annotations

import os

import jax

_env = os.environ.get("JAX_PLATFORMS")
if (_env and not os.environ.get("FASTK_TPU_NO_PLATFORM_FIX")
        and jax.config.jax_platforms != _env):
    jax.config.update("jax_platforms", _env)

# Persistent compilation cache: the sort kernels (ops/bitsort.py) are large
# unrolled Mosaic programs whose first compile runs minutes on a remote
# compile service; cache compiled executables across processes. Respect an
# explicit user setting; disable with FASTK_TPU_NO_COMPILE_CACHE=1.
if (not os.environ.get("FASTK_TPU_NO_COMPILE_CACHE")
        and jax.config.jax_compilation_cache_dir is None):
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/fastk_tpu_jax"))
    # default min entry size (large) would skip medium kernels; cache all
    # compiles that took real time instead
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
