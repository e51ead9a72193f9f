"""Scalar/column function library (SURVEY §2.H, §2.E ranks).

Everything here is a pure Column-expression builder — JVM-side,
whole-stage-codegen-eligible.  No Python row UDFs.
"""
