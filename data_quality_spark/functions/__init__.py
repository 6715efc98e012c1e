"""Scalar / column-expression building blocks (all JVM-side unless noted)."""
