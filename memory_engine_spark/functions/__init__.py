"""Scalar/vector function library (JVM-side Column expressions only)."""
