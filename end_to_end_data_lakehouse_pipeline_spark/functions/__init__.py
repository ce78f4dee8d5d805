"""Scalar-function helpers shared across plans (ClickHouse-parity dates,
enum literal maps, surrogate keys)."""
