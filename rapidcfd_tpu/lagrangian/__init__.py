from .cloud import ParticleCloud  # noqa: F401
