from .loader import load_table  # noqa: F401
