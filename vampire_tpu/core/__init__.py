from . import geometry, sampling, rendering  # noqa: F401
