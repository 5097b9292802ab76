"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding correctness is tested
against XLA's CPU backend with a forced host device count (the pattern the
driver's `dryrun_multichip` also uses).

Note: the session environment registers a remote-TPU PJRT plugin at
interpreter startup and programmatically sets jax_platforms to prefer it —
env vars alone don't override that, so we force the CPU backend through
jax.config here, before any backend is initialised.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
