"""Column-level helper functions (JVM-side built-ins only — the fast path)."""
