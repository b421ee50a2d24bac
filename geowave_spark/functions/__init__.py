"""SQL scalar-function surface (ST predicates, casts) — GWQL analog."""

from .registry import register_all

__all__ = ["register_all"]
