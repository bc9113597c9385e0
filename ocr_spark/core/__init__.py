"""Pure-Python deterministic extraction core.

MUST NOT import pyspark: this package is imported both on the driver (golden
fixture generation, serial) and inside executor Python workers (pandas UDFs).
Determinism contract: every function here is a pure function of its byte/str
inputs — no wall clock, no randomness, no environment lookups.
"""
