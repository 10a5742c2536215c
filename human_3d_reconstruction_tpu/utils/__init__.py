"""Shared geometry / image / logging helpers."""
