"""Contributed components (parity: gsplat/contrib)."""
