"""Scalar-function packs and numeric helpers."""
