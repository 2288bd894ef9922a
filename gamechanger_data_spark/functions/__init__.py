"""Scalar function library — native Spark column expressions first, Arrow
pandas UDFs where Python is unavoidable. No per-row Python anywhere."""
