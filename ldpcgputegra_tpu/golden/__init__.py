from .decoder import GoldenParams, decode_golden, syndrome_ok  # noqa: F401
