"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The env var alone is not enough in this image (a sitecustomize registers the
TPU backend eagerly), so we also force the platform through jax.config.
"""
import os

os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', False)

assert jax.devices()[0].platform == 'cpu', jax.devices()
assert jax.device_count() == 8, jax.devices()
