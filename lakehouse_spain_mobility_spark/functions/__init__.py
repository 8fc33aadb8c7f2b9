from . import deterministic, scalar  # noqa: F401
