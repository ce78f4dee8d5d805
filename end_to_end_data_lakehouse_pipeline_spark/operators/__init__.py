"""Reusable scale operators: skew mitigation (salting), two-phase aggs."""

from .skew import salted_aggregate, salted_join  # noqa: F401
