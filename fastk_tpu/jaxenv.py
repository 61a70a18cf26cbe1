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
"""

from __future__ import annotations

import os

import jax

_env = os.environ.get("JAX_PLATFORMS")
if _env and jax.config.jax_platforms != _env:
    jax.config.update("jax_platforms", _env)
