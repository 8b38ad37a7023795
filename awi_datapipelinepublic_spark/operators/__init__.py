"""Relational + scale-path operators built on DataFrame primitives."""
