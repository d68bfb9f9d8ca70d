"""Scalar function packs (pure Column expressions — JVM-side, codegen'd)."""
