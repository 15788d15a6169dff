from . import prefilter  # noqa: F401
