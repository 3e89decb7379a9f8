"""Deterministic synthetic spatial fixtures (seed 42) — see generate.py."""

from .generate import ensure_fixtures, fixture_dir  # noqa: F401
