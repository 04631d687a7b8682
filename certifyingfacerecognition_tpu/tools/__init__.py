"""Offline conversion tools (host-side, no device code)."""
