"""Spark operators: Arrow-vectorized parse UDFs + training-data-pipeline ops."""
