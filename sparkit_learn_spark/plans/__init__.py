"""Physical-plan introspection helpers (used by tests and tuning)."""

from .inspect import explain_str, plan_has  # noqa: F401
