"""Platform selection helper for CLI apps.

The container's sitecustomize pins JAX_PLATFORMS=axon (the tunnelled TPU).
Set HTS_PLATFORM=cpu to force host CPU (e.g. for quick smoke tests).
"""
import os


def select_platform():
    p = os.environ.get("HTS_PLATFORM")
    if p:
        import jax
        jax.config.update("jax_platforms", p)
