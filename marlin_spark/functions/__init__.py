"""Column-level functions: analyzers (Arrow UDFs), block codec, text metrics."""
