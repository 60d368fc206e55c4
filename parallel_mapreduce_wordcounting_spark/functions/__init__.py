"""Reusable column-expression helpers (all JVM-side built-ins)."""

from ..operators.similarity import dot  # noqa: F401
from ..operators.wordcount import tokens  # noqa: F401
