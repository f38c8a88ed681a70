"""Relational + large-scale data-pipeline operators."""
