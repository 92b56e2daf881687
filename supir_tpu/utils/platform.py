"""Make `JAX_PLATFORMS` work from CLI entry points.

Some hosted images inject a sitecustomize that pins `jax_platforms` to a
remote accelerator plugin via `jax.config` at interpreter startup — AHEAD
of the `JAX_PLATFORMS` environment variable, which jax only consults when
no explicit config value was set. On such an image
`JAX_PLATFORMS=cpu python -m supir_tpu.apps.cli ...` would still
initialize the remote backend (and hang forever if its tunnel is down).

`honor_jax_platforms_env()` re-asserts the user's env var through
`jax.config` before the first backend touch. No-op when the variable is
unset or a backend is already initialized.
"""

from __future__ import annotations

import os


def honor_jax_platforms_env() -> None:
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    import jax

    try:
        jax.config.update("jax_platforms", plat)
    except Exception:
        pass  # backend already initialized — too late to switch, keep going
