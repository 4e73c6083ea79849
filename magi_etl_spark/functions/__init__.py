"""Scalar/array/vector function parity pack (SURVEY.md §2.8).

Pure ``Column``-expression helpers — everything stays JVM-side inside
whole-stage codegen; no Python UDFs in any hot path.
"""
