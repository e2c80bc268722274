"""Column-level scalar functions (Spark built-in compositions)."""
