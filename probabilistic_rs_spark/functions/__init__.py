"""Vectorized kernel functions (numpy) and Spark column helpers."""
