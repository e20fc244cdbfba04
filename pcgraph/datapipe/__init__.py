"""Training-data pipeline operators over document/embedding tables.

Everything here is declarative Spark SQL (JVM-side, Catalyst-optimized)
unless a kernel genuinely needs vectorized numpy — then it's a
pandas/Arrow UDF, never per-row Python.
"""
