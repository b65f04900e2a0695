"""Stage operators: each module exposes pure-Python kernels plus a
DataFrame-level ``apply_*`` entry point built on Arrow-vectorized UDFs."""
