"""Reusable scale operators: skew mitigation (salting), two-phase aggs."""

from .skew import crossproduct_aggregate, salted_aggregate, salted_join  # noqa: F401
