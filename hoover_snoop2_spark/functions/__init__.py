"""Scalar building blocks: hashing, MIME sniffing, text decode/normalize,
language identification and text-quality scoring.

Everything here comes in two flavors: a pure-Python kernel (unit-testable,
deterministic) and an Arrow-vectorized pandas-UDF wrapper for use in
DataFrame plans.  Relational logic never lives here.
"""
