"""Scalar-function surface (SURVEY §2.9) plus text-analysis functions."""
